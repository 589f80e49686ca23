#!/usr/bin/env python
"""Interleaved same-window remeasure of anomalous BENCHMARKS rows.

Two rows in bench_sweep_r3.jsonl straddle sessions asymmetrically: the
t2t_vit_7 b32 XLA row caught one lucky quiet window (1.332 ms, no std
recorded) while the fused/int8_static rows only have noisy-window samples
(1.63-1.92 ms) — yet at that config the fused dispatch runs the very same
XLA encoder (models/t2t_vit.py:416), so the table's apparent "fused loses
by 22%" is a measurement artifact, not a kernel property.  Same story for
swin_tiny b1 int8_static (recorded 0.2393 from a contended window; a clean
window measured 0.2318).

This tool measures all impls of an anomalous key INTERLEAVED in one
session (alternating impls across rounds) and appends each sample as a
normal sweep row; tools/make_benchmarks_md.py's fastest-quiet-p50 dedup
then supersedes the stale rows.  Usage:

Groups: t2t7 (b32 xla/fused/int8_static), t2t14 (same + b1
fused-vs-int8_static), vit (rows lacking noise evidence), cnn (CNN anchor
rows + pruned-xla fill), swin (b1 int8_static).  Measure with repeats >= 4 and an otherwise idle host —
2-repeat rows are not noise evidence (see make_benchmarks_md.py) and a
loaded host can corrupt whole rounds (a concurrent pytest run produced
fused 12.3 ±5.9 and an xla 0.87 "quiet" undershoot in round 1 here).

    PYTHONPATH=/root/repo:/root/.axon_site \
        python tools/remeasure_rows.py bench_sweep_r3.jsonl [t2t7] [t2t14] [vit] [swin]
"""
import json
import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from edgevisiontransformer_tpu.bench.looptimer import measure_op_time  # noqa: E402
from edgevisiontransformer_tpu.cache import enable_compilation_cache  # noqa: E402

DT = jnp.bfloat16
ROUNDS = 3


def bench(fh, name, batch, fn, args, chain_arg, impl, iters, repeats=4):
    t0 = time.time()
    r = measure_op_time(fn, args, iters=iters, repeats=repeats,
                        chain_arg=chain_arg)
    d = {"name": name, "batch": batch, "fused": impl in ("fused", "int8"),
         "impl": impl, "ms": round(r["p50_ms"], 5),
         "img_per_s": round(batch / (r["p50_ms"] / 1e3), 1),
         "std_ms": round(r["std_ms"], 5), "repeats": r["repeats"],
         "iters": r["iters"], "compile_s": round(time.time() - t0, 1)}
    fh.write(json.dumps(d) + "\n")
    fh.flush()
    print(json.dumps(d), flush=True)


def t2t7_b32(fh):
    from edgevisiontransformer_tpu.models.t2t_vit import (
        T2TViT,
        fused_t2t_apply,
        fused_t2t_apply_int8,
        prepare_t2t_fused,
        prepare_t2t_int8_static,
        t2t_vit_config,
    )

    m = T2TViT(t2t_vit_config(7, dtype=DT))
    v = m.init(jax.random.key(0), jnp.ones((1, 3, 224, 224), DT))
    prep = prepare_t2t_fused(m, v)
    sq = prepare_t2t_int8_static(m, v, calib_batches=[
        np.random.RandomState(i).randn(1, 3, 224, 224).astype("float32")
        for i in range(8)])
    x = jnp.ones((32, 3, 224, 224), DT)
    cases = [
        ("t2t_vit_7", "xla", lambda vv, xx: m.apply(vv, xx), (v, x), 1),
        ("t2t_vit_7_fused", "fused",
         lambda vv, pp, xx: fused_t2t_apply(m, vv, xx, pp), (v, prep, x), 2),
        ("t2t_vit_7_int8_static", "int8",
         lambda vv, qq, pp, xx: fused_t2t_apply_int8(m, vv, xx, qq,
                                                     prepared=pp),
         (v, sq, prep, x), 3),
    ]
    for rnd in range(ROUNDS):
        for name, impl, fn, args, ca in cases:
            bench(fh, name, 32, fn, args, ca, impl, iters=20)


def t2t14_b32(fh):
    from edgevisiontransformer_tpu.models.t2t_vit import (
        T2TViT,
        fused_t2t_apply,
        fused_t2t_apply_int8,
        prepare_t2t_fused,
        prepare_t2t_int8_static,
        t2t_vit_config,
    )

    m = T2TViT(t2t_vit_config(14, dtype=DT))
    v = m.init(jax.random.key(0), jnp.ones((1, 3, 224, 224), DT))
    prep = prepare_t2t_fused(m, v)
    sq = prepare_t2t_int8_static(m, v, calib_batches=[
        np.random.RandomState(i).randn(1, 3, 224, 224).astype("float32")
        for i in range(8)])
    x = jnp.ones((32, 3, 224, 224), DT)
    cases = [
        ("t2t_vit_14", "xla", lambda vv, xx: m.apply(vv, xx), (v, x), 1),
        ("t2t_vit_14_fused", "fused",
         lambda vv, pp, xx: fused_t2t_apply(m, vv, xx, pp), (v, prep, x), 2),
        ("t2t_vit_14_int8_static", "int8",
         lambda vv, qq, pp, xx: fused_t2t_apply_int8(m, vv, xx, qq,
                                                     prepared=pp),
         (v, sq, prep, x), 3),
    ]
    for rnd in range(ROUNDS):
        for name, impl, fn, args, ca in cases:
            bench(fh, name, 32, fn, args, ca, impl, iters=20)
    # b1 int8_static headline claim (~2x over XLA) deserves its own
    # interleaved confirmation against the fused bf16 path
    x1 = jnp.ones((1, 3, 224, 224), DT)
    for rnd in range(ROUNDS):
        bench(fh, "t2t_vit_14_fused", 1,
              lambda vv, pp, xx: fused_t2t_apply(m, vv, xx, pp),
              (v, prep, x1), 2, "fused", iters=100)
        bench(fh, "t2t_vit_14_int8_static", 1,
              lambda vv, qq, pp, xx: fused_t2t_apply_int8(m, vv, xx, qq,
                                                          prepared=pp),
              (v, sq, prep, x1), 3, "int8", iters=100)


def t2t_rest(fh):
    """int8_static b1 rows for the t2t variants the sweep doesn't
    calibrate (10/12), completing the family's quant coverage."""
    from edgevisiontransformer_tpu.models.t2t_vit import (
        T2TViT,
        fused_t2t_apply_int8,
        prepare_t2t_fused,
        prepare_t2t_int8_static,
        t2t_vit_config,
    )

    for var in (10, 12):
        m = T2TViT(t2t_vit_config(var, dtype=DT))
        v = m.init(jax.random.key(0), jnp.ones((1, 3, 224, 224), DT))
        prep = prepare_t2t_fused(m, v)
        sq = prepare_t2t_int8_static(m, v, calib_batches=[
            np.random.RandomState(i).randn(1, 3, 224, 224).astype("float32")
            for i in range(8)])
        x = jnp.ones((1, 3, 224, 224), DT)
        for rnd in range(ROUNDS):
            bench(fh, f"t2t_vit_{var}_int8_static", 1,
                  lambda vv, qq, pp, xx: fused_t2t_apply_int8(
                      m, vv, xx, qq, prepared=pp),
                  (v, sq, prep, x), 3, "int8", iters=100)


def vit_fill(fh):
    """Rows still rendering without noise evidence (legacy tier) or with a
    near-gate std: deit_base_fused b1, deit_small int8_static b128."""
    from edgevisiontransformer_tpu.models.vit import (
        fused_vit_apply,
        fused_vit_apply_int8,
        get_deit_base,
        get_deit_small,
        prepare_vit_int8_static,
    )

    mb = get_deit_base("standard", dtype=DT)
    vb = mb.init(jax.random.key(0), jnp.ones((1, 3, 224, 224), DT))
    xb = jnp.ones((1, 3, 224, 224), DT)
    ms = get_deit_small("standard", dtype=DT)
    vs = ms.init(jax.random.key(0), jnp.ones((1, 3, 224, 224), DT))
    sqs = prepare_vit_int8_static(ms, vs)
    xs = jnp.ones((128, 3, 224, 224), DT)
    for rnd in range(ROUNDS):
        bench(fh, "deit_base_fused", 1,
              lambda vv, xx: fused_vit_apply(mb, vv, xx), (vb, xb), 1,
              "fused", iters=100)
        bench(fh, "deit_small_int8_static", 128,
              lambda vv, ss, xx: fused_vit_apply_int8(ms, vv, xx, ss),
              (vs, sqs, xs), 2, "int8", iters=20)


def cnn_fill(fh):
    """CNN anchor rows + the one pruned-xla row still lacking noise
    evidence: re-measure with repeats so every table row carries std."""
    from edgevisiontransformer_tpu.models.cnn.zoo import get_cnn
    from edgevisiontransformer_tpu.models.vit import ViT, pruned_vit_config

    for name in ("mobilenet_v2", "mobilenet_v3_large", "efficientnet_b0",
                 "resnet50", "inception_v3", "inception_resnet_v2",
                 "shufflenet_v2"):
        m = get_cnn(name)
        size = 299 if "inception" in name else 224
        x = jnp.ones((1, 3, size, size), DT)
        v = m.init(jax.random.key(0), x)
        bench(fh, name, 1, lambda vv, xx: m.apply(vv, xx), (v, x), 1,
              "xla", iters=50)
    cfg = pruned_vit_config("tiny", "all_head1_ffn1.0", dtype=DT)
    m = ViT(cfg)
    x = jnp.ones((1, 3, 224, 224), DT)
    v = m.init(jax.random.key(0), x)
    bench(fh, "pruned_deit_tiny@all_head1_ffn1.0", 1,
          lambda vv, xx: m.apply(vv, xx), (v, x), 1, "xla", iters=150)


def swin_b1(fh):
    from edgevisiontransformer_tpu.models.swin import (
        SwinTransformer,
        fused_swin_apply,
        prepare_swin_fused,
        prepare_swin_int8_static,
        swin_config,
    )

    m = SwinTransformer(swin_config("tiny", dtype=DT))
    v = m.init(jax.random.key(0), jnp.ones((1, 3, 224, 224), DT))
    prep = prepare_swin_fused(m, v)
    qs = prepare_swin_int8_static(m, v)
    x = jnp.ones((1, 3, 224, 224), DT)
    for rnd in range(ROUNDS):
        bench(fh, "swin_tiny_int8_static", 1,
              lambda vv, pp, qq, xx: fused_swin_apply(
                  m, vv, xx, prepared=pp, int8_prepared=qq),
              (v, prep, qs, x), 3, "int8", iters=100)


def tiny_b32(fh):
    """VERDICT r3 weak #2: the 'static int8 beats bf16 everywhere' claim has
    a measured counterexample at deit_tiny b32 (int8_static 1.0420 ±0.019 vs
    fused 0.9595 ±0.032, same session).  Interleaved same-window A/B to
    settle it; the table and the CLAUDE.md claim follow whatever wins."""
    from edgevisiontransformer_tpu.models.vit import (
        fused_vit_apply,
        fused_vit_apply_int8,
        get_deit_tiny,
        prepare_vit_int8_static,
    )

    m = get_deit_tiny("standard", dtype=DT)
    v = m.init(jax.random.key(0), jnp.ones((1, 3, 224, 224), DT))
    sq = prepare_vit_int8_static(m, v)
    x = jnp.ones((32, 3, 224, 224), DT)
    for rnd in range(ROUNDS + 1):
        bench(fh, "deit_tiny_fused", 32,
              lambda vv, xx: fused_vit_apply(m, vv, xx), (v, x), 1,
              "fused", iters=50)
        bench(fh, "deit_tiny_int8_static", 32,
              lambda vv, ss, xx: fused_vit_apply_int8(m, vv, xx, ss),
              (v, sq, x), 2, "int8", iters=50)


def t2t_rest_b32(fh):
    """t2t_vit_10/12 b32 rows (VERDICT r3 weak #3: the family had b1-only
    coverage at those variants): xla / fused / int8_static, interleaved."""
    from edgevisiontransformer_tpu.models.t2t_vit import (
        T2TViT,
        fused_t2t_apply,
        fused_t2t_apply_int8,
        prepare_t2t_fused,
        prepare_t2t_int8_static,
        t2t_vit_config,
    )

    for var in (10, 12):
        m = T2TViT(t2t_vit_config(var, dtype=DT))
        v = m.init(jax.random.key(0), jnp.ones((1, 3, 224, 224), DT))
        prep = prepare_t2t_fused(m, v)
        sq = prepare_t2t_int8_static(m, v, calib_batches=[
            np.random.RandomState(i).randn(1, 3, 224, 224).astype("float32")
            for i in range(8)])
        x = jnp.ones((32, 3, 224, 224), DT)
        cases = [
            (f"t2t_vit_{var}", "xla", lambda vv, xx, m=m: m.apply(vv, xx),
             (v, x), 1),
            (f"t2t_vit_{var}_fused", "fused",
             lambda vv, pp, xx, m=m: fused_t2t_apply(m, vv, xx, pp),
             (v, prep, x), 2),
            (f"t2t_vit_{var}_int8_static", "int8",
             lambda vv, qq, pp, xx, m=m: fused_t2t_apply_int8(
                 m, vv, xx, qq, prepared=pp), (v, sq, prep, x), 3),
        ]
        for rnd in range(ROUNDS):
            for name, impl, fn, args, ca in cases:
                bench(fh, name, 32, fn, args, ca, impl, iters=20)


def cnn_all(fh):
    """CNN zoo to 15/15 at b1 AND b32 (VERDICT r3 weak #4: 7/15, b1-only;
    the reference benchmarks its whole zoo as the ViT-latency comparison
    baseline, run.sh:5-92)."""
    from edgevisiontransformer_tpu.models.cnn.zoo import CNN_ZOO, get_cnn

    new_b1 = {"mobilenet_v1", "mobilenet_v3_small", "squeezenet",
              "resnet50_v2", "efficientnet_lite0", "shufflenet_v1",
              "mnasnet", "proxyless_mobile"}
    for name in CNN_ZOO:
        m = get_cnn(name)
        size = 299 if "inception" in name else 224
        v = m.init(jax.random.key(0), jnp.ones((1, 3, size, size), DT))
        if name in new_b1:
            x1 = jnp.ones((1, 3, size, size), DT)
            bench(fh, name, 1, lambda vv, xx, m=m: m.apply(vv, xx),
                  (v, x1), 1, "xla", iters=100, repeats=5)
        x32 = jnp.ones((32, 3, size, size), DT)
        bench(fh, name, 32, lambda vv, xx, m=m: m.apply(vv, xx),
              (v, x32), 1, "xla", iters=30, repeats=5)


def cnn_noisy_b32(fh):
    """Clean-window re-measure of the b32 zoo rows violating the table's
    own noise discipline (VERDICT r4 weak #4 / directive #5): mobilenet_v2
    b32 published at ±2.63 on 1.27 (non-quiet fallback — unusable),
    mobilenet_v1 (±0.154 on 0.917) and shufflenet_v2 (±0.213 on 1.687)
    quiet-but-loose.  Interleaved rounds, repeats=5, so every published
    b32 zoo row passes std/p50 <= 0.25 with >= 3 repeats."""
    from edgevisiontransformer_tpu.models.cnn.zoo import get_cnn

    names = ("mobilenet_v2", "mobilenet_v1", "shufflenet_v2")
    ms, vs = {}, {}
    for name in names:
        ms[name] = get_cnn(name)
        vs[name] = ms[name].init(jax.random.key(0),
                                 jnp.ones((1, 3, 224, 224), DT))
    x32 = jnp.ones((32, 3, 224, 224), DT)
    for rnd in range(ROUNDS):
        for name in names:
            bench(fh, name, 32,
                  lambda vv, xx, m=ms[name]: m.apply(vv, xx),
                  (vs[name], x32), 1, "xla", iters=40, repeats=5)


def pruned128(fh):
    """pruned int8_static b128 row (VERDICT r3 directive #2 last gap)."""
    from edgevisiontransformer_tpu.models.vit import (
        ViT,
        fused_vit_apply_int8,
        prepare_vit_int8_static,
        pruned_vit_config,
    )

    cfg = pruned_vit_config("tiny", "all_head1_ffn0.3", dtype=DT)
    m = ViT(cfg)
    v = m.init(jax.random.key(0), jnp.ones((1, 3, 224, 224), DT))
    sq = prepare_vit_int8_static(m, v)
    x = jnp.ones((128, 3, 224, 224), DT)
    for rnd in range(ROUNDS):
        bench(fh, "pruned_deit_tiny@all_head1_ffn0.3_int8_static", 128,
              lambda vv, ss, xx: fused_vit_apply_int8(m, vv, xx, ss),
              (v, sq, x), 2, "int8", iters=50)


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "bench_sweep_r3.jsonl"
    which = set(sys.argv[2:]) or {"t2t7", "t2t14", "vit", "cnn", "swin"}
    enable_compilation_cache()
    with open(out, "a") as fh:
        if "t2t7" in which:
            t2t7_b32(fh)
        if "t2t14" in which:
            t2t14_b32(fh)
        if "t2t_rest" in which:
            t2t_rest(fh)
        if "t2t_rest_b32" in which:
            t2t_rest_b32(fh)
        if "vit" in which:
            vit_fill(fh)
        if "tinyb32" in which:
            tiny_b32(fh)
        if "cnn" in which:
            cnn_fill(fh)
        if "cnn_all" in which:
            cnn_all(fh)
        if "cnn_noisy_b32" in which:
            cnn_noisy_b32(fh)
        if "swin" in which:
            swin_b1(fh)
        if "pruned128" in which:
            pruned128(fh)


if __name__ == "__main__":
    main()
