"""Command-line interface — the tools.py analogue.

Mirrors the reference's subcommand surface (/root/reference/tools.py:1011-1086)
where the command still makes sense on TPU:

  benchmark        on-TPU latency/memory (replaces mobile_benchmark/server_benchmark)
  profile          per-op CSV profiling (replaces --enable_op_profiling + pull)
  analyse_op / analyse_attn_ffn / analyse_gelu_ln   (analyse.py subcommands)
  convert          quantized export: float16 | bfloat16 | dynamic-int8 |
                   static-int8 w/ representative-dataset calibration (tf2tflite_cmd)
  quant_accuracy   bf16/dynamic/static logit-drift + argmax table (D1118 methodology)
  export           save model checkpoint (export_tf_deit etc.)
  eval             ImageNet top-1 (eval_deit / eval_tf / eval_onnx ...)
  prune_heads      are16heads head pruning: real Taylor importance from
                   --data-dir, policy, slice, optional retrain + eval
                   (run_classifier.py --do_prune)
  finetune         retrain/finetune driver (classifier_training.py, finetune.py)
  sparse_train     movement-pruning sparse finetune from a preset JSON
                   (deit_pruning/src/train_main.py)
  latency_model    collect / fit / predict RF latency predictor
                   (deit_pruning/src/latency_model.py, get_latency.py)
  logscrape        latency_std | mem | accuracy | markers result scrapers
                   (fetch_latency_std tools.py subcommand, fetch_results.py)
  experiments      fusion_ab | quant_sweep | prune_grid | micro sweeps
                   (experiments.py)
  flops            analytic MACs tables (flops_calculation)
  models           list registry

Run: ``python -m edgevisiontransformer_tpu.cli <subcommand> ...``
"""

from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np


def _build_model(name: str, style: str = "standard", dtype: str = "float32"):
    from .models.registry import build_model

    kw = {}
    if name.startswith("deit") or name.startswith("pruned_deit"):
        kw["style"] = style
    kw["dtype"] = jnp.dtype(dtype)
    return build_model(name, **kw)


def cmd_models(argv):
    from .models.registry import available_models

    print("\n".join(available_models() + ["pruned_deit_{size}@{encoding}"]))


def _load_quantized_artifact(path: str, dtype: str):
    """Load a ``convert --quantization dynamic|int8`` artifact and return
    (model, in_shape, args_tuple, fn) where ``fn(*args_tuple, x)`` runs the
    deployment int8 kernels on it — the consume half of the reference's
    convert -> run loop (tf2tflite -> mobile_benchmark / eval_tflite,
    tools.py:1023-1075).  Works for ViT/DeiT, T2T (stacks rebuilt from the
    saved quantized tree, bit-identical to prepare-time quantization) and
    Swin (saved per-stage kernel stacks + float variables)."""
    from .utils.checkpoint import load_checkpoint, load_meta

    meta = load_meta(path)
    if not meta or meta.get("quantization") not in ("dynamic", "int8"):
        raise SystemExit(
            f"{path}: not a quantized convert artifact (need meta.json with "
            "quantization dynamic|int8; float16/bfloat16 casts load via "
            "--checkpoint)")
    if "config" in meta:
        # artifact built from a sparse_train-compiled checkpoint: rebuild
        # the exact pruned shapes from its embedded config
        from .config import ViTConfig
        from .models.vit import ViT

        cfg = ViTConfig.from_json(json.dumps(meta["config"])).replace(
            dtype=jnp.dtype(dtype))
        model = ViT(cfg)
        in_shape = (3, cfg.image_size, cfg.image_size)
    else:
        model, in_shape = _build_model(meta["model"],
                                       meta.get("style", "standard"), dtype)
    tree = load_checkpoint(path)

    from .models.swin import SwinTransformer, fused_swin_apply, prepare_swin_fused
    from .models.t2t_vit import T2TViT, fused_t2t_apply_int8, prepare_t2t_fused
    from .models.vit import fused_vit_apply_int8, stacks_from_quantized_tree

    if isinstance(model, SwinTransformer):
        if "variables" not in tree:
            raise SystemExit(f"{path}: swin artifact predates the bundled "
                             "float variables — re-run convert")
        # convert saves fp32; float glue follows the requested compute dtype
        # here (exactly like the ViT branch via stacks_from_quantized_tree)
        # so the kernels see the same dtype mix as the prepare-time path:
        # int8 weights and fp32 scales/act_inv keep their artifact dtypes.
        dt = model.config.dtype
        _is_f = lambda a: jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
        v = jax.tree.map(lambda a: a.astype(dt) if _is_f(a) else a,
                         tree["variables"])
        q = {int(k.split("_")[1]): {
                 kk: (s if kk.endswith("_s") or kk == "act_inv"
                      or not _is_f(s) else s.astype(dt))
                 for kk, s in stacked.items()}
             for k, stacked in tree.items() if k.startswith("stage_")}
        prep = prepare_swin_fused(model, v)
        fn = lambda v_, pp_, qq_, x_: fused_swin_apply(
            model, v_, x_, prepared=pp_, int8_prepared=qq_)
        return model, in_shape, (v, prep, q), fn
    stacks = stacks_from_quantized_tree(model.config, tree)
    if isinstance(model, T2TViT):
        prep = prepare_t2t_fused(model, tree)
        fn = lambda v_, sq_, pp_, x_: fused_t2t_apply_int8(
            model, v_, x_, sq_, prepared=pp_)
        return model, in_shape, (tree, stacks, prep), fn
    fn = lambda v_, sq_, x_: fused_vit_apply_int8(model, v_, x_, sq_)
    return model, in_shape, (tree, stacks), fn


def cmd_benchmark(argv):
    p = argparse.ArgumentParser(prog="benchmark")
    p.add_argument("--model", default="deit_tiny")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--style", default="standard")
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--kernel-mode", default="xla",
                   choices=["xla", "pallas", "fused", "int8", "int8_static"])
    p.add_argument("--quantized-checkpoint", default=None,
                   help="benchmark a convert-saved dynamic/int8 artifact "
                        "through the deployment kernels (overrides --model/"
                        "--kernel-mode)")
    p.add_argument("--stem-int8", action="store_true",
                   help="T2T int8_static only: also run the tokenizer "
                        "stem's three big matmuls static-int8 "
                        "(prepare_t2t_stem_int8_static) — for t2t_7 the "
                        "stem is ~60% of the model")
    args = p.parse_args(argv)

    from .bench.looptimer import measure_op_time
    from .cache import enable_compilation_cache

    enable_compilation_cache()
    if args.quantized_checkpoint:
        model, in_shape, qargs, fn = _load_quantized_artifact(
            args.quantized_checkpoint, args.dtype)
        x = jnp.ones((args.batch,) + in_shape, jnp.dtype(args.dtype))
        r = measure_op_time(fn, qargs + (x,), iters=args.iters,
                            repeats=args.repeats, chain_arg=-1)
        r["model"] = args.quantized_checkpoint
        r["batch"] = args.batch
        r["throughput_per_s"] = (args.batch / (r["p50_ms"] / 1e3)
                                 if r["p50_ms"] else None)
        print(f"Avg latency {r['avg_ms']:.4f} ms, Std {r['std_ms']:.4f} ms")
        print(json.dumps(r))
        return r
    model, in_shape = _build_model(args.model, args.style, args.dtype)
    x = jnp.ones((args.batch,) + in_shape, jnp.dtype(args.dtype))
    params = model.init(jax.random.key(0), x)
    extra = ()
    if args.kernel_mode in ("int8", "int8_static"):
        from .models.swin import (
            SwinTransformer,
            fused_swin_apply,
            prepare_swin_fused,
            prepare_swin_int8,
            prepare_swin_int8_static,
        )
        from .models.vit import (
            ViT,
            fused_vit_apply_int8,
            prepare_vit_int8,
            prepare_vit_int8_static,
        )

        if isinstance(model, SwinTransformer):
            prep = prepare_swin_fused(model, params)
            if args.kernel_mode == "int8_static":
                q = prepare_swin_int8_static(model, params)
            else:
                q = prepare_swin_int8(model, params)
            if not q:
                raise SystemExit(
                    f"{args.model}: no stage qualifies for the int8 "
                    "whole-stage kernel — the result would silently be the "
                    "bf16 fused path; use --kernel-mode fused instead")
            n_stages = len(model.config.depths)
            print(f"int8 stages: {sorted(q)} of {list(range(n_stages))} "
                  f"(others run bf16 fused — mixed-precision result)")
            fn = lambda p_, pp_, qq_, x_: fused_swin_apply(
                model, p_, x_, prepared=pp_, int8_prepared=qq_)
            extra = (prep, q)
        elif isinstance(model, ViT):
            if args.kernel_mode == "int8_static":
                sq = prepare_vit_int8_static(model, params)
            else:
                sq = prepare_vit_int8(model, params)
            fn = lambda p_, sq_, x_: fused_vit_apply_int8(model, p_, x_, sq_)
            extra = (sq,)
        else:
            from .models.t2t_vit import (
                T2TViT,
                fused_t2t_apply_int8,
                prepare_t2t_fused,
                prepare_t2t_int8,
                prepare_t2t_int8_static,
            )

            if not isinstance(model, T2TViT):
                raise SystemExit(
                    f"--kernel-mode int8 supports ViT/DeiT, Swin and T2T "
                    f"models, not {type(model).__name__} ({args.model})")
            if args.kernel_mode == "int8_static":
                sq = prepare_t2t_int8_static(model, params)
            else:
                sq = prepare_t2t_int8(model, params)
            prep = prepare_t2t_fused(model, params)
            if args.stem_int8:
                if args.kernel_mode != "int8_static":
                    raise SystemExit("--stem-int8 needs "
                                     "--kernel-mode int8_static")
                from .models.t2t_vit import prepare_t2t_stem_int8_static

                stq = prepare_t2t_stem_int8_static(model, params)
                fn = lambda p_, sq_, pp_, st_, x_: fused_t2t_apply_int8(
                    model, p_, x_, sq_, prepared=pp_, stem_q=st_)
                extra = (sq, prep, stq)
            else:
                fn = lambda p_, sq_, pp_, x_: fused_t2t_apply_int8(
                    model, p_, x_, sq_, prepared=pp_)
                extra = (sq, prep)
    elif args.kernel_mode == "fused":
        from .models.swin import SwinTransformer, fused_swin_apply, prepare_swin_fused
        from .models.t2t_vit import T2TViT, fused_t2t_apply, prepare_t2t_fused

        if isinstance(model, SwinTransformer):
            prep = prepare_swin_fused(model, params)
            fn = lambda p_, pp_, x_: fused_swin_apply(model, p_, x_, prepared=pp_)
            extra = (prep,)
        elif isinstance(model, T2TViT):
            prep = prepare_t2t_fused(model, params)
            fn = lambda p_, pp_, x_: fused_t2t_apply(model, p_, x_, pp_)
            extra = (prep,)
        else:
            from .models.vit import fused_vit_apply

            fn = lambda p_, x_: fused_vit_apply(model, p_, x_)
    else:
        fn = lambda p_, x_: model.apply(p_, x_)
    r = measure_op_time(fn, (params,) + extra + (x,), iters=args.iters,
                        repeats=args.repeats, chain_arg=-1)
    r["model"] = args.model
    r["batch"] = args.batch
    r["throughput_per_s"] = args.batch / (r["p50_ms"] / 1e3) if r["p50_ms"] else None
    # Reference print contract (tools.py:550)
    print(f"Avg latency {r['avg_ms']:.4f} ms, Std {r['std_ms']:.4f} ms")
    print(json.dumps(r))
    return r


def cmd_benchmark_train(argv):
    """TPU training-step benchmark: finetune and sparse (movement-pruning)
    step latency + img/s, incl. the marginal cost of the every-step topK
    binarization over the mask scores (the reference actually measures its
    training loops: deit_pruning/src/train_main.py:387,
    are_16_heads/classifier_training.py:18-184)."""
    p = argparse.ArgumentParser(prog="benchmark_train")
    p.add_argument("--model", default="deit_tiny")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--style", default="standard")
    p.add_argument("--mode", default="both",
                   choices=["finetune", "sparse", "both"])
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--remat", action="store_true",
                   help="per-block gradient rematerialization (memory for "
                        "recompute; ViT-family models)")
    p.add_argument("--qat", action="store_true",
                   help="sparse mode: fake-quant the encoder matmul kernels "
                        "in the training forward (STE; measures the QAT "
                        "marginal step cost)")
    p.add_argument("--report-memory", action="store_true",
                   help="also report the compiled step's static HBM MB")
    args = p.parse_args(argv)
    if args.qat and args.mode != "sparse":
        # sparse-only: with --mode both the sparse-minus-finetune marginal
        # print would silently fold the QAT STE cost into the masking/topK
        # delta, and the qat flag would mislabel the non-QAT finetune row
        raise SystemExit("--qat requires --mode sparse")

    import dataclasses

    import numpy as np
    import optax

    from .bench.looptimer import measure_op_time
    from .cache import enable_compilation_cache
    from .parallel.train import cross_entropy, make_train_step

    enable_compilation_cache()
    model, in_shape = _build_model(args.model, args.style, args.dtype)
    if args.remat:
        from .models.vit import ViT

        if not isinstance(model, ViT):
            raise SystemExit("--remat currently applies to ViT-family models")
        model = ViT(dataclasses.replace(model.config, remat=True))
    cfg = model.config
    x = jnp.asarray(np.random.RandomState(0).randn(args.batch, *in_shape),
                    jnp.dtype(args.dtype))
    labels = jnp.asarray(np.random.RandomState(1).randint(
        0, cfg.num_classes, (args.batch,)))
    variables = model.init(jax.random.key(0), x[:1])
    params = variables["params"]
    # non-"params" collections (e.g. T2T performer random-feature constants)
    # ride through apply untrained; small, so closing over them is safe
    extra_cols = {k: v for k, v in variables.items() if k != "params"}
    results = {}

    if args.mode in ("sparse", "both"):
        from .models.vit import ViT

        if not isinstance(model, ViT):
            raise SystemExit(
                f"benchmark_train --mode sparse needs a ViT-family model "
                f"(mask scores address the ViT param tree); got "
                f"{type(model).__name__} for --model {args.model}")

    if args.mode in ("finetune", "both"):
        opt = optax.sgd(1e-3, momentum=0.9)
        step = make_train_step(
            lambda p_, im: model.apply({**extra_cols, "params": p_}, im),
            opt, cross_entropy)
        opt_state = opt.init(params)
        r = measure_op_time(step, (params, opt_state, x, labels),
                            iters=args.iters, repeats=args.repeats,
                            chain_arg=2)
        if args.report_memory:
            from .bench.harness import compiled_mem_mb

            r["hbm_mb"] = compiled_mem_mb(
                jax.jit(step), (params, opt_state, x, labels))
        results["finetune"] = r

    if args.mode in ("sparse", "both"):
        from .pruning.movement import (
            SparseConfig,
            init_mask_scores,
            schedule_thresholds,
        )
        from .pruning.sparse_train import make_sparse_train_step

        sparse = SparseConfig(qat=args.qat)
        scores = init_mask_scores(cfg, sparse, jax.random.key(2))
        n_scores = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(scores))
        opt_p = optax.adamw(1e-4)
        opt_s = optax.adamw(1e-2)
        step = make_sparse_train_step(
            lambda p_, im: model.apply({"params": p_}, im), cfg, sparse,
            opt_p, opt_s)
        thr_list, regu_mul = schedule_thresholds(500, 1000, cfg, sparse)
        thr = jnp.asarray(thr_list, jnp.float32)
        r = measure_op_time(
            step,
            (params, scores, opt_p.init(params), opt_s.init(scores), x,
             labels, thr, jnp.float32(regu_mul)),
            iters=args.iters, repeats=args.repeats, chain_arg=4)
        r["mask_scores"] = n_scores
        if args.report_memory:
            from .bench.harness import compiled_mem_mb

            r["hbm_mb"] = compiled_mem_mb(
                jax.jit(step),
                (params, scores, opt_p.init(params), opt_s.init(scores), x,
                 labels, thr, jnp.float32(regu_mul)))
        results["sparse"] = r

    for mode, r in results.items():
        ips = args.batch / (r["p50_ms"] / 1e3) if r["p50_ms"] else None
        extra = f" scores={r['mask_scores']}" if "mask_scores" in r else ""
        print(f"{mode}: step {r['p50_ms']:.4f} ms (std {r['std_ms']:.4f}), "
              f"{ips:.1f} img/s{extra}")
    if "finetune" in results and "sparse" in results:
        marg = results["sparse"]["p50_ms"] - results["finetune"]["p50_ms"]
        print(f"sparse marginal (masking+topK+regu+2nd opt): {marg:.4f} ms/step")
    out = {m: {k: v for k, v in r.items()} for m, r in results.items()}
    out.update(model=args.model, batch=args.batch)
    if args.qat:
        out["qat"] = True
    print(json.dumps(out))


def cmd_profile(argv):
    p = argparse.ArgumentParser(prog="profile")
    p.add_argument("--model", default="deit_tiny")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--output", default="profile.csv")
    p.add_argument("--mode", default="micro", choices=["micro", "trace"],
                   help="micro = loop-delta stage decomposition; trace = "
                        "real jax.profiler device trace (per-HLO-op events)")
    p.add_argument("--kernel-mode", default="xla", choices=["xla", "fused"],
                   help="trace mode: which forward to trace")
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args(argv)

    from .bench.profile import profile_trace, profile_vit, write_profile_csv
    from .cache import enable_compilation_cache

    enable_compilation_cache()
    model, in_shape = _build_model(args.model, dtype=args.dtype)
    x = jnp.ones((args.batch,) + in_shape, jnp.dtype(args.dtype))
    params = model.init(jax.random.key(0), x)
    if args.mode == "trace":
        from .bench.looptimer import measure_op_time

        if args.kernel_mode == "fused":
            from .models.swin import (
                SwinTransformer,
                fused_swin_apply,
                prepare_swin_fused,
            )
            from .models.t2t_vit import (
                T2TViT,
                fused_t2t_apply,
                prepare_t2t_fused,
            )
            from .models.vit import fused_vit_apply

            # prepared constants ride as jit ARGUMENTS, not closures —
            # closing over the padded fp32 rel-pos biases bakes them into
            # the HLO (the documented HTTP-413 compile-bloat hazard)
            prep = None
            if isinstance(model, SwinTransformer):
                prep = prepare_swin_fused(model, params)
                fn = jax.jit(lambda p_, pr_, x_: fused_swin_apply(
                    model, p_, x_, prepared=pr_))
            elif isinstance(model, T2TViT):
                prep = prepare_t2t_fused(model, params)
                fn = jax.jit(lambda p_, pr_, x_: fused_t2t_apply(
                    model, p_, x_, pr_))
            else:
                fn = jax.jit(lambda p_, x_: fused_vit_apply(model, p_, x_))
        else:
            prep = None
            fn = jax.jit(lambda p_, x_: model.apply(p_, x_))
        fargs = (params, x) if prep is None else (params, prep, x)
        fn(*fargs).block_until_ready()

        def run_once():
            jax.device_get(fn(*fargs))  # device fetch = true sync (CLAUDE.md)

        rows, total = profile_trace(run_once, iters=args.iters)
        # §4.4 sanity oracle: per-op sums must reconcile with the end-to-end
        # loop-delta latency (reference analyse.py:193-216 cross-check)
        e2e = measure_op_time(fn, fargs, iters=100, repeats=3,
                              chain_arg=len(fargs) - 1)["p50_ms"]
        ratio = total / e2e if e2e else float("nan")
        print(f"trace per-op sum {total:.4f} ms vs end-to-end {e2e:.4f} ms "
              f"(ratio {ratio:.2f})")
    else:
        rows, total = profile_vit(model, params, x)
    write_profile_csv(args.output, rows, total)
    print(f"total {total:.4f} ms -> {args.output}")


def _analyse(which, argv):
    p = argparse.ArgumentParser(prog=which)
    p.add_argument("--file", required=True)
    p.add_argument("--type", default="deit")
    args = p.parse_args(argv)
    from .bench import analyse as an

    if which == "analyse_op":
        table = an.analyse_op(args.file, args.type)
        for k, v in table.items():
            print(f"{k} {v['latency']: .2f} {v['percent']: .2f}")
    elif which == "analyse_attn_ffn":
        print(json.dumps(an.analyse_attn_ffn(args.file, args.type)))
    elif which == "analyse_gelu_ln":
        print(json.dumps(an.analyse_gelu_ln(args.file, args.type)))
    elif which == "fetch_all_op_latency":
        for name, ms in an.fetch_all_op_latency(args.file):
            print(f"{name},{ms}")


def cmd_convert(argv):
    p = argparse.ArgumentParser(prog="convert")
    p.add_argument("--model", default="deit_tiny")
    p.add_argument("--quantization", default="float16",
                   choices=["float16", "bfloat16", "dynamic", "int8"])
    p.add_argument("--checkpoint", default=None, help="input checkpoint dir")
    p.add_argument("--output", required=True)
    p.add_argument("--style", default="standard")
    p.add_argument("--calib-batches", type=int, default=100,
                   help="int8: representative random-normal batches "
                        "(reference utils.py:265-269 uses 100)")
    p.add_argument("--calib-percentile", type=float, default=None,
                   help="int8: abs-percentile calibration instead of absmax")
    p.add_argument("--calib-method", default="absmax",
                   choices=["absmax", "mse"],
                   help="int8: activation-clip calibration — absmax "
                        "(reference min/max semantics) or mse (offline "
                        "MSE-optimal clip search; tighter logit drift)")
    p.add_argument("--smooth-alpha", type=float, default=None,
                   help="int8 (ViT/T2T/Swin): SmoothQuant-style offline "
                        "scale migration before calibration, with this "
                        "strength (exact float re-parameterization). "
                        "Measured best alpha is FAMILY-DEPENDENT: 0.5 for "
                        "DeiT/ViT (alpha probe: 0.5 > 0.25 > 0.75), 0.25 "
                        "for Swin (swin_tiny: 0.25 beats absmax, 0.5/0.75 "
                        "worse) — see docs/WORKFLOWS.md quantization notes")
    args = p.parse_args(argv)
    if args.smooth_alpha is not None and args.quantization != "int8":
        raise SystemExit("--smooth-alpha applies to --quantization int8 only")

    from .ops.quant import cast_params, quantize_vit_params_int8
    from .utils.checkpoint import load_checkpoint, load_meta, save_checkpoint

    meta = {
        "model": args.model, "quantization": args.quantization,
        "style": args.style,
    }
    ck_meta = load_meta(args.checkpoint) if args.checkpoint else None
    if ck_meta and "config" in ck_meta:
        # a sparse_train-compiled (shrunken) checkpoint: its meta carries
        # the exact pruned config — the default-shaped tree would mismatch.
        # Propagating it into the artifact meta keeps the convert->benchmark
        # /eval chain standalone (the reference's train->compile->eval
        # story, deit_pruning/src/train_main.py:387-421 + eval_main.py).
        from .config import ViTConfig
        from .models.vit import ViT

        cfg = ViTConfig.from_json(json.dumps(ck_meta["config"]))
        model = ViT(cfg)
        in_shape = (3, cfg.image_size, cfg.image_size)
        meta["config"] = ck_meta["config"]
        print(f"checkpoint carries a compiled config: heads "
              f"{cfg.heads_per_layer} mlp {cfg.mlp_dim_per_layer}")
    else:
        model, in_shape = _build_model(args.model, args.style)
    x = jnp.ones((1,) + in_shape)
    params = model.init(jax.random.key(0), x)
    if args.checkpoint:
        params = load_checkpoint(args.checkpoint, params)
    from .models.swin import SwinTransformer

    if args.quantization in ("float16", "bfloat16"):
        out = cast_params(params, jnp.float16 if args.quantization == "float16" else jnp.bfloat16)
    elif isinstance(model, SwinTransformer):
        # Swin int8 lives in per-stage stacked kernel arrays, not per-param
        # trees: save the prepare_swin_int8[_static] pytree the whole-stage
        # kernels consume directly (static = calibrated, reference
        # TFLITE_BUILTINS_INT8 analogue utils.py:263-277)
        from .models.swin import prepare_swin_int8, prepare_swin_int8_static

        if args.quantization == "dynamic":
            out = prepare_swin_int8(model, params)
        else:
            if args.calib_percentile is not None:
                raise SystemExit("swin calibration records absmax only "
                                 "(--calib-percentile is ViT/T2T-only)")
            from .cache import enable_compilation_cache

            enable_compilation_cache()
            if args.smooth_alpha is not None:
                from .models.swin import smooth_swin

                params = smooth_swin(model, params, n=args.calib_batches,
                                     alpha=args.smooth_alpha)
                meta["smooth_alpha"] = args.smooth_alpha
                print(f"smoothed swin params (alpha={args.smooth_alpha})")
            out = prepare_swin_int8_static(model, params,
                                           n=args.calib_batches,
                                           method=args.calib_method)
            meta["calib_batches"] = args.calib_batches
            meta["calib_method"] = args.calib_method
        if not out:
            raise SystemExit(f"{args.model}: no stage qualifies for the "
                             "int8 whole-stage kernel")
        out = {f"stage_{si}": stacked for si, stacked in out.items()}
        meta["int8_stages"] = sorted(
            int(k.split("_")[1]) for k in out)
        # bundle the float variables so the artifact is standalone-runnable
        # (patch embed / merges / norms / head stay float, like the ViT
        # tree) — benchmark/eval --quantized-checkpoint consume it
        out["variables"] = params
        print(f"int8 stages: {meta['int8_stages']}")
    elif args.quantization == "dynamic":
        out = quantize_vit_params_int8(params)
        _p = out["params"] if "params" in out else out
        if not any(k.startswith("block_") for k in _p):
            raise SystemExit(
                f"{args.model}: no encoder blocks to quantize — dynamic "
                "int8 targets transformer encoders (ViT/DeiT/T2T)")
    else:  # int8 = FULL-INTEGER static: calibrate on representative data
        # (the converter's TFLITE_BUILTINS_INT8 path, utils.py:263-277)
        from .models.t2t_vit import T2TViT as _T2T
        from .models.vit import ViT as _ViT

        if not isinstance(model, (_ViT, _T2T)):
            raise SystemExit(
                f"{args.model}: static-int8 calibration targets the "
                "ViT/DeiT and T2T families (the calibrators walk those "
                "forwards); CNNs support --quantization float16/bfloat16")
        import numpy as np

        from .cache import enable_compilation_cache
        from .ops.quant import (
            calibrate_t2t,
            calibrate_vit,
            quantize_vit_params_int8_static,
        )

        enable_compilation_cache()

        is_t2t = isinstance(model, _T2T)
        if args.smooth_alpha is not None:
            from .ops.quant import smooth_t2t, smooth_vit

            params = (smooth_t2t if is_t2t else smooth_vit)(
                model, params, n=args.calib_batches, alpha=args.smooth_alpha)
            meta["smooth_alpha"] = args.smooth_alpha
            print(f"smoothed encoder params (alpha={args.smooth_alpha})")
        calibrate = calibrate_t2t if is_t2t else calibrate_vit
        scales = calibrate(model, params, n=args.calib_batches,
                           percentile=args.calib_percentile,
                           method=args.calib_method)
        out = quantize_vit_params_int8_static(params, scales)
        meta["act_scales"] = np.asarray(scales).tolist()
        meta["calib_batches"] = args.calib_batches
        meta["calib_method"] = args.calib_method
        print(f"calibrated {scales.shape[0]} layers x {scales.shape[1]} "
              f"activation scales on {args.calib_batches} batches "
              f"({args.calib_method})")
    save_checkpoint(args.output, out, meta=meta)
    print(f"saved {args.quantization} checkpoint -> {args.output}")


def cmd_quant_accuracy(argv):
    """Quantization accuracy-delta table: fp32 vs bf16 / dynamic-int8 /
    static-int8 logit drift + argmax agreement (the reference's quant-op-test
    methodology, experiments/D1118_quant_op_test.py, applied whole-model)."""
    p = argparse.ArgumentParser(prog="quant_accuracy")
    p.add_argument("--model", default="deit_tiny")
    p.add_argument("--style", default="standard")
    p.add_argument("--from-hf", default=None,
                   help="optional HF checkpoint for real weights")
    p.add_argument("--checkpoint", default=None,
                   help="float checkpoint dir (e.g. a sparse_train output; "
                        "its meta config — pruned shapes, norm/act modes — "
                        "overrides --model when present)")
    p.add_argument("--batches", type=int, default=8)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--calib-batches", type=int, default=32)
    p.add_argument("--with-mse", action="store_true",
                   help="add a static_int8_mse row (MSE-optimal clip "
                        "calibration; ViT/T2T families)")
    p.add_argument("--with-smooth", action="store_true",
                   help="add a static_int8_smooth row (SmoothQuant-style "
                        "offline scale migration before calibration; all "
                        "three families — with --with-mse the ViT/T2T/Swin "
                        "runs also get a static_int8_smooth_mse row)")
    p.add_argument("--smooth-alpha", type=float, default=0.5,
                   help="migration strength for --with-smooth (0..1)")
    args = p.parse_args(argv)

    import numpy as np

    from .ops.quant import (
        calibrate_t2t,
        calibrate_vit,
        cast_params,
        int8_t2t_apply,
        int8_t2t_apply_static,
        int8_vit_apply,
        int8_vit_apply_static,
        quantize_vit_params_int8,
        quantize_vit_params_int8_static,
        representative_batches,
    )

    ck_meta = None
    if args.checkpoint:
        from .utils.checkpoint import load_meta

        ck_meta = load_meta(args.checkpoint)
    if ck_meta and "config" in ck_meta:
        # sparse_train-compiled checkpoint: exact pruned config
        from .config import ViTConfig
        from .models.vit import ViT as _ViTClass

        cfg = ViTConfig.from_json(json.dumps(ck_meta["config"])).replace(
            dtype=jnp.dtype("float32"))
        model = _ViTClass(cfg)
        in_shape = (3, cfg.image_size, cfg.image_size)
        print(f"checkpoint config: heads {cfg.heads_per_layer} "
              f"mlp {cfg.mlp_dim_per_layer}")
    else:
        model, in_shape = _build_model(args.model, args.style,
                                       dtype="float32")
    from .models.swin import SwinTransformer as _Swin
    from .models.t2t_vit import T2TViT as _T2T
    from .models.vit import ViT as _ViT

    if not isinstance(model, (_ViT, _T2T, _Swin)):
        raise SystemExit(
            f"{args.model}: quant_accuracy supports the ViT/DeiT, T2T and "
            "Swin families")
    x0 = jnp.ones((1,) + in_shape)
    if args.from_hf:
        from .utils.hf_import import import_hf_vit

        params = import_hf_vit(args.from_hf, model)
    elif args.checkpoint:
        from .utils.checkpoint import load_checkpoint

        params = load_checkpoint(args.checkpoint,
                                 model.init(jax.random.key(0), x0))
    else:
        params = model.init(jax.random.key(0), x0)

    from .cache import enable_compilation_cache

    enable_compilation_cache()
    import functools

    if isinstance(model, _Swin):
        # Swin int8 IS the whole-stage kernel path (no XLA oracle exists),
        # so the table compares the deployment kernels directly: fp32 XLA
        # reference vs bf16 apply vs dynamic/static int8 whole-stage
        # kernels.  Only qualifying stages run int8 (mixed precision —
        # stages printed); params/preps ride as jit ARGUMENTS.
        from .models.swin import (
            fused_swin_apply,
            prepare_swin_fused,
            prepare_swin_int8,
            prepare_swin_int8_static,
        )

        model_bf, _ = _build_model(args.model, args.style, dtype="bfloat16")
        pbf16 = cast_params(params, jnp.bfloat16)
        prep = prepare_swin_fused(model_bf, pbf16)
        q = prepare_swin_int8(model_bf, pbf16)
        qs = prepare_swin_int8_static(model_bf, pbf16, n=args.calib_batches)
        if not q:
            raise SystemExit(f"{args.model}: no stage qualifies for the "
                             "int8 whole-stage kernel")
        n_stages = len(model.config.depths)
        print(f"int8 stages: {sorted(q)} of {list(range(n_stages))} "
              f"(others run bf16 fused — mixed-precision rows)")

        def _swin_mode(qq, v=pbf16, pr=prep):
            return functools.partial(
                jax.jit(lambda b_, x: fused_swin_apply(
                    model_bf, b_["v"], x.astype(jnp.bfloat16),
                    prepared=b_["prep"], int8_prepared=b_["q"])),
                {"v": v, "prep": pr, "q": qq})

        modes = {
            "bf16": functools.partial(
                jax.jit(lambda p_, x: model_bf.apply(
                    p_, x.astype(jnp.bfloat16))), pbf16),
            "dynamic_int8": _swin_mode(q),
            "static_int8": _swin_mode(qs),
        }
        if args.with_mse:
            modes["static_int8_mse"] = _swin_mode(prepare_swin_int8_static(
                model_bf, pbf16, n=args.calib_batches, method="mse"))
        if args.with_smooth:
            # migration folds on the bf16 tree (the fold math runs fp32,
            # leaves re-cast; the bf16 rounding is far below int8 noise) —
            # then the normal prepare pipeline over the smoothed tree
            from .models.swin import smooth_swin

            psm = cast_params(
                smooth_swin(model_bf, pbf16, n=args.calib_batches,
                            alpha=args.smooth_alpha), jnp.bfloat16)
            prep_sm = prepare_swin_fused(model_bf, psm)
            modes["static_int8_smooth"] = _swin_mode(
                prepare_swin_int8_static(model_bf, psm,
                                         n=args.calib_batches),
                v=psm, pr=prep_sm)
            if args.with_mse:
                modes["static_int8_smooth_mse"] = _swin_mode(
                    prepare_swin_int8_static(model_bf, psm,
                                             n=args.calib_batches,
                                             method="mse"),
                    v=psm, pr=prep_sm)
    else:
        is_t2t = isinstance(model, _T2T)
        calibrate = calibrate_t2t if is_t2t else calibrate_vit
        scales = calibrate(model, params, n=args.calib_batches)
        qdyn = quantize_vit_params_int8(params)
        qstat = quantize_vit_params_int8_static(params, scales)
        pbf16 = cast_params(params, jnp.bfloat16)
        apply_dyn = int8_t2t_apply if is_t2t else int8_vit_apply
        apply_stat = int8_t2t_apply_static if is_t2t else int8_vit_apply_static

        # params/qparams are jit ARGUMENTS (partial over the first slot), not
        # closures: closing over the weight pytree bakes it into the HLO and
        # inflates the serialized compile past the relay request limit (the
        # documented HTTP-413 hazard; cmd_eval does the same).
        modes = {
            "bf16": functools.partial(
                jax.jit(lambda p_, x: model.apply(p_, x.astype(jnp.bfloat16))),
                pbf16),
            "dynamic_int8": functools.partial(
                jax.jit(lambda q_, x: apply_dyn(model, q_, x)), qdyn),
            "static_int8": functools.partial(
                jax.jit(lambda q_, x: apply_stat(model, q_, x)), qstat),
        }
        if args.with_mse:
            scales_mse = calibrate(model, params, n=args.calib_batches,
                                   method="mse")
            qmse = quantize_vit_params_int8_static(params, scales_mse)
            modes["static_int8_mse"] = functools.partial(
                jax.jit(lambda q_, x: apply_stat(model, q_, x)), qmse)
        if args.with_smooth:
            # SmoothQuant-style: fold migration scales (exact float
            # re-parameterization), then the normal calibrate -> quantize
            # pipeline over the smoothed tree.  Same runtime kernels.
            from .ops.quant import smooth_t2t, smooth_vit

            smooth = smooth_t2t if is_t2t else smooth_vit
            psm = smooth(model, params, n=args.calib_batches,
                         alpha=args.smooth_alpha)
            qsm = quantize_vit_params_int8_static(
                psm, calibrate(model, psm, n=args.calib_batches))
            modes["static_int8_smooth"] = functools.partial(
                jax.jit(lambda q_, x: apply_stat(model, q_, x)), qsm)
            if args.with_mse:
                qsm2 = quantize_vit_params_int8_static(
                    psm, calibrate(model, psm, n=args.calib_batches,
                                   method="mse"))
                modes["static_int8_smooth_mse"] = functools.partial(
                    jax.jit(lambda q_, x: apply_stat(model, q_, x)), qsm2)
    # fp32 oracle on the HOST backend: committing params to CPU pins the jit
    # there (uncommitted numpy inputs follow).  Matches the reference's
    # host-TF-fp32 vs device-TFLite comparison (D1118), and avoids a
    # whole-model fp32 compile over the tunnel (~13 min uncached for Swin).
    cpu0 = jax.devices("cpu")[0]
    params_host = jax.device_put(params, cpu0)
    ref_fn = functools.partial(jax.jit(lambda p_, x: model.apply(p_, x)),
                               params_host)

    stats = {m: {"max_abs": 0.0, "max_rel": 0.0, "agree": 0, "n": 0}
             for m in modes}
    for batch in representative_batches(args.batches, args.batch, in_shape,
                                        seed=1234):
        xb = jnp.asarray(batch)
        ref = np.asarray(ref_fn(batch))
        denom = np.abs(ref).max() + 1e-9
        for m, fn in modes.items():
            got = np.asarray(fn(xb)).astype(np.float32)
            st = stats[m]
            st["max_abs"] = max(st["max_abs"], float(np.abs(got - ref).max()))
            st["max_rel"] = max(st["max_rel"], float(np.abs(got - ref).max() / denom))
            st["agree"] += int((got.argmax(-1) == ref.argmax(-1)).sum())
            st["n"] += ref.shape[0]
    print(f"{'mode':<14} {'max|dlogit|':>12} {'max rel':>9} {'argmax agree':>13}")
    for m, st in stats.items():
        print(f"{m:<14} {st['max_abs']:>12.4f} {st['max_rel']:>9.4f} "
              f"{st['agree']}/{st['n']:>8}")
    print(json.dumps({m: {k: v for k, v in st.items()} for m, st in stats.items()}))


def cmd_export(argv):
    p = argparse.ArgumentParser(prog="export")
    p.add_argument("--model", default="deit_tiny")
    p.add_argument("--style", default="standard")
    p.add_argument("--from-hf", default=None, help="HF checkpoint name/path")
    p.add_argument("--format", default="checkpoint",
                   choices=["checkpoint", "stablehlo"])
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--output", required=True)
    args = p.parse_args(argv)

    from .utils.checkpoint import save_checkpoint

    if args.format == "stablehlo":
        from .utils.export import export_forward

        model, in_shape = _build_model(args.model, args.style)
        params = model.init(jax.random.key(0), jnp.ones((1,) + in_shape))
        path = export_forward(
            model.apply, params, (args.batch,) + in_shape, args.output,
            meta={"model": args.model, "style": args.style},
        )
        print(f"saved stablehlo -> {path}")
        return

    if args.from_hf:
        if "t2t" in args.model:
            # official *.pth.tar checkpoint (reference tools.py:360-365)
            from .utils.hf_import import load_t2t_checkpoint

            variant = int(args.model.rsplit("_", 1)[-1])
            cfg, params = load_t2t_checkpoint(args.from_hf, variant)
        else:
            from .utils.hf_import import load_hf_model_params

            family = "swin" if "swin" in args.model else "vit"
            cfg, params = load_hf_model_params(args.from_hf, family)
        meta = {"model": args.model, "hf": args.from_hf}
    else:
        model, in_shape = _build_model(args.model, args.style)
        params = model.init(jax.random.key(0), jnp.ones((1,) + in_shape))
        meta = {"model": args.model, "style": args.style}
    save_checkpoint(args.output, params, meta=meta)
    print(f"saved -> {args.output}")


def cmd_eval(argv):
    p = argparse.ArgumentParser(prog="eval")
    p.add_argument("--model", default="deit_tiny")
    p.add_argument("--data-dir", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--style", default="standard")
    p.add_argument("--marker-dir", default=None)
    # cross-implementation consistency (the reference's cross-runtime eval:
    # onnx vs tflite vs tf, SURVEY.md §4.3) — xla vs fused kernel vs int8
    p.add_argument("--impl", default="xla",
                   choices=["xla", "fused", "int8", "int8_fused",
                            "int8_static", "int8_static_fused"])
    p.add_argument("--calib-method", default="absmax",
                   choices=["absmax", "mse"],
                   help="int8_static impls: activation-clip calibration "
                        "(ViT/T2T families; swin records absmax)")
    p.add_argument("--quantized-checkpoint", default=None,
                   help="evaluate a convert-saved dynamic/int8 artifact "
                        "through the deployment kernels (overrides --model/"
                        "--impl; the reference's eval_tflite on a converted "
                        "model)")
    args = p.parse_args(argv)

    from .utils.checkpoint import load_checkpoint
    from .utils.imagenet import evaluate, write_accuracy_marker

    if args.quantized_checkpoint:
        model, _, qargs, qfn = _load_quantized_artifact(
            args.quantized_checkpoint, "float32")
        acc = evaluate(lambda p_, x_: qfn(*p_, x_), qargs, args.data_dir,
                       batch_size=args.batch, limit=args.limit, progress=True)
        print(f"top1 {acc:.4f}")
        if args.marker_dir:
            write_accuracy_marker(args.marker_dir, acc)
        return

    model, _ = _build_model(args.model, args.style)
    params = model.init(jax.random.key(0), jnp.ones((1, 3, 224, 224)))
    if args.checkpoint:
        params = load_checkpoint(args.checkpoint, params)
    from .models.swin import SwinTransformer

    if isinstance(model, SwinTransformer) and args.impl != "xla":
        # Swin cross-impl eval rides the whole-stage kernels; quantized
        # stacks bundle into the params pytree (jit ARGS, not closures)
        from .models.swin import (
            fused_swin_apply,
            prepare_swin_fused,
            prepare_swin_int8,
            prepare_swin_int8_static,
        )

        prep = prepare_swin_fused(model, params)
        if args.impl in ("int8", "int8_fused"):
            q = prepare_swin_int8(model, params)
        elif args.impl in ("int8_static", "int8_static_fused"):
            q = prepare_swin_int8_static(model, params,
                                         method=args.calib_method)
        else:
            q = None
        if q is not None and not q:
            raise SystemExit(f"{args.model}: no stage qualifies for the "
                             "int8 whole-stage kernel; use --impl fused")
        params = {"v": params, "prep": prep, "q": q}
        apply_fn = lambda p_, x_: fused_swin_apply(
            model, p_["v"], x_, prepared=p_["prep"], int8_prepared=p_["q"])
    elif args.impl == "fused":
        from .models.t2t_vit import T2TViT, fused_t2t_apply, prepare_t2t_fused
        from .models.vit import fused_vit_apply

        if isinstance(model, T2TViT):
            params = {"v": params, "prep": prepare_t2t_fused(model, params)}
            apply_fn = lambda p_, x_: fused_t2t_apply(
                model, p_["v"], x_, p_["prep"])
        else:
            apply_fn = lambda p_, x_: fused_vit_apply(model, p_, x_)
    elif args.impl == "int8":
        from .models.t2t_vit import T2TViT
        from .ops.quant import (
            int8_t2t_apply,
            int8_vit_apply,
            quantize_vit_params_int8,
        )

        params = quantize_vit_params_int8(params)
        if isinstance(model, T2TViT):
            apply_fn = lambda p_, x_: int8_t2t_apply(model, p_, x_)
        else:
            apply_fn = lambda p_, x_: int8_vit_apply(model, p_, x_)
    elif args.impl == "int8_static":
        from .models.t2t_vit import T2TViT
        from .ops.quant import (
            calibrate_t2t,
            calibrate_vit,
            int8_t2t_apply_static,
            int8_vit_apply_static,
            quantize_vit_params_int8_static,
        )

        if isinstance(model, T2TViT):
            params = quantize_vit_params_int8_static(
                params, calibrate_t2t(model, params,
                                      method=args.calib_method))
            apply_fn = lambda p_, x_: int8_t2t_apply_static(model, p_, x_)
        else:
            params = quantize_vit_params_int8_static(
                params, calibrate_vit(model, params,
                                      method=args.calib_method))
            apply_fn = lambda p_, x_: int8_vit_apply_static(model, p_, x_)
    elif args.impl in ("int8_fused", "int8_static_fused"):
        from .models.t2t_vit import (
            T2TViT,
            fused_t2t_apply_int8,
            prepare_t2t_int8,
            prepare_t2t_int8_static,
        )
        from .models.vit import (
            fused_vit_apply_int8,
            prepare_vit_int8,
            prepare_vit_int8_static,
        )

        # bundle the quantized stack into the params pytree so evaluate()'s
        # jit receives it as an argument, not a closed-over HLO constant
        if isinstance(model, T2TViT):
            from .models.t2t_vit import prepare_t2t_fused

            sq = (prepare_t2t_int8_static(model, params,
                                          method=args.calib_method)
                  if args.impl == "int8_static_fused"
                  else prepare_t2t_int8(model, params))
            # prepared stage-1 constants must be built OUTSIDE evaluate()'s
            # jit (build_stage1_weights round-trips through numpy) and ride
            # in the params pytree like the fused branch does
            params = {"v": params, "sq": sq,
                      "prep": prepare_t2t_fused(model, params)}
            apply_fn = lambda p_, x_: fused_t2t_apply_int8(
                model, p_["v"], x_, p_["sq"], prepared=p_["prep"])
        else:
            sq = (prepare_vit_int8_static(model, params,
                                          method=args.calib_method)
                  if args.impl == "int8_static_fused"
                  else prepare_vit_int8(model, params))
            params = {"v": params, "sq": sq}
            apply_fn = lambda p_, x_: fused_vit_apply_int8(
                model, p_["v"], x_, p_["sq"])
    else:
        apply_fn = model.apply
    acc = evaluate(apply_fn, params, args.data_dir, batch_size=args.batch,
                   limit=args.limit, progress=True)
    print(f"top1 {acc:.4f}")
    if args.marker_dir:
        write_accuracy_marker(args.marker_dir, acc)


def _make_batches(args, in_shape):
    """() -> iterable of (images, labels) from --data-dir or --synthetic N.

    The reference trains/evaluates on ImageFolder ImageNet
    (/root/reference/are_16_heads/util.py:94-119); --synthetic provides an
    offline stand-in with the same contract for smoke runs and tests.
    """
    if getattr(args, "data_dir", None):
        from .utils.imagenet import iterate_batches, list_image_folder

        samples, _ = list_image_folder(args.data_dir)
        if getattr(args, "limit", None):
            samples = samples[: args.limit]
        crop = in_shape[-1]
        resize = max(crop, round(crop * 256 / 224))
        return lambda: iterate_batches(samples, args.batch, resize=resize, crop=crop)

    n = getattr(args, "synthetic", 0)
    if not n:
        raise SystemExit("need --data-dir or --synthetic N")
    rng = np.random.RandomState(0)
    data = [
        (rng.randn(args.batch, *in_shape).astype(np.float32),
         rng.randint(0, 1000, size=args.batch).astype(np.int32))
        for _ in range(n)
    ]
    return lambda: list(data)


def cmd_prune_heads(argv):
    p = argparse.ArgumentParser(prog="prune_heads")
    p.add_argument("--model", default="deit_tiny")
    p.add_argument("--importance-file", default=None)
    p.add_argument("--data-dir", default=None,
                   help="compute real Taylor importance from these images")
    p.add_argument("--importance-batches", type=int, default=8)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--random-importance", action="store_true",
                   help="explicit opt-in to random scores (debug only)")
    p.add_argument("--prune-percent", type=float, nargs="+", default=[10.0])
    p.add_argument("--at-least-x-heads-per-layer", type=int, default=1)
    p.add_argument("--eval", action="store_true",
                   help="top-1 eval of the pruned model on --data-dir")
    p.add_argument("--retrain-steps", type=int, default=0,
                   help="SGD retrain steps on --data-dir after pruning")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--output", default=None)
    p.add_argument("--style", default="standard")
    args = p.parse_args(argv)

    from .pruning import (
        calculate_head_importance,
        determine_pruning_sequence,
        load_head_importance_txt,
        prune_heads_params,
        to_pruning_descriptor,
        what_to_prune,
    )
    from .utils.checkpoint import load_checkpoint, save_checkpoint

    model, in_shape = _build_model(args.model, args.style)
    cfg = model.config
    params = model.init(jax.random.key(0), jnp.ones((1,) + in_shape))
    if args.checkpoint:
        params = load_checkpoint(args.checkpoint, params)

    if args.importance_file:
        imp = load_head_importance_txt(args.importance_file)
    elif args.data_dir:
        # Real Taylor importance (reference classifier_eval.py:111-225),
        # the run_classifier.py --do_prune path's importance pass.
        import itertools

        batches = _make_batches(args, in_shape)
        images_only = itertools.islice(
            (x for x, _ in batches()), args.importance_batches)
        imp = calculate_head_importance(cfg, params, images_only)
        print("computed head importance from data:")
        print(np.array2string(np.asarray(imp), precision=4))
    elif args.random_importance:
        print("using uniform random importance (--random-importance)")
        imp = np.random.RandomState(0).rand(cfg.depth, cfg.heads)
    else:
        raise SystemExit(
            "need an importance source: --importance-file, --data-dir, "
            "or --random-importance")

    seq = determine_pruning_sequence(
        None, args.prune_percent, cfg.heads, cfg.depth,
        args.at_least_x_heads_per_layer,
    )
    to_prune = {}
    for step, n in enumerate(seq):
        to_prune = what_to_prune(
            imp, n, to_prune, args.at_least_x_heads_per_layer
        )
        print(f"step {step}: prune {n} -> {to_pruning_descriptor(to_prune)}")
    new_cfg, new_params = prune_heads_params(cfg, params, to_prune)
    print(f"heads_per_layer: {new_cfg.heads_per_layer}")

    if args.retrain_steps and args.data_dir:
        from .models.vit import ViT
        from .utils.finetune import FinetuneConfig, finetune

        new_model = ViT(new_cfg)
        new_params = finetune(
            new_model.apply, new_params, _make_batches(args, in_shape),
            FinetuneConfig(optimizer="sgd", epochs=10**6,
                           max_steps=args.retrain_steps),
        )
    if args.eval and args.data_dir:
        from .models.vit import ViT
        from .utils.imagenet import evaluate

        acc = evaluate(ViT(new_cfg).apply, new_params, args.data_dir,
                       batch_size=args.batch, limit=args.limit)
        print(f"pruned top1 {acc:.4f}")

    if args.output:
        save_checkpoint(args.output, new_params, meta={
            "model": args.model,
            "heads_per_layer": list(new_cfg.heads_per_layer),
            "pruned": to_pruning_descriptor(to_prune),
        })
        print(f"saved -> {args.output}")


def cmd_prune(argv):
    """Standalone magnitude pruner (reference deit_pruning/src/pytorch_prune/
    pruner.py:85-103): hybrid = block on attention + ln_smart on denses."""
    p = argparse.ArgumentParser(prog="prune")
    p.add_argument("--model", default="deit_tiny")
    p.add_argument("--style", default="standard")
    p.add_argument("--func", default="hybrid",
                   choices=["hybrid", "block", "ln_smart_structured",
                            "ln_structured", "l1_unstructured",
                            "random_unstructured"])
    p.add_argument("--amount", type=float, default=0.5)
    p.add_argument("--block-row", type=int, default=None)
    p.add_argument("--block-col", type=int, default=None)
    p.add_argument("--dim", type=int, default=None)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--output", default=None)
    args = p.parse_args(argv)

    from .pruning import magnitude_pruners as mp
    from .pruning.movement import sparsity_report
    from .utils.checkpoint import load_checkpoint, save_checkpoint

    model, in_shape = _build_model(args.model, args.style)
    cfg = model.config
    params = model.init(jax.random.key(0), jnp.ones((1,) + in_shape))
    if args.checkpoint:
        params = load_checkpoint(args.checkpoint, params)

    if args.func == "hybrid":
        params = mp.hybrid_prune_params(
            cfg, params, args.amount, args.block_row, args.block_col)
    else:
        mask_fn = {
            "block": lambda w: mp.block_prune_mask(
                w, args.amount,
                args.block_row or cfg.resolved_head_dim,
                args.block_col or w.shape[1]),
            "ln_smart_structured": lambda w: mp.ln_smart_structured_mask(
                w, args.amount),
            "ln_structured": lambda w: mp.ln_structured_mask(
                w, args.amount, dim=args.dim if args.dim is not None else 0),
            "l1_unstructured": lambda w: mp.l1_unstructured_mask(w, args.amount),
            "random_unstructured": lambda w: mp.random_unstructured_mask(
                w, args.amount),
        }[args.func]

        def prune_leaf(path, leaf):
            # encoder weight matrices only (the reference prunes encoder
            # Linears; embeddings/heads are left dense)
            pstr = "/".join(str(getattr(k, "key", k)) for k in path)
            if leaf.ndim == 2 and "block_" in pstr and "kernel" in pstr:
                w = np.asarray(leaf).T  # torch [out, in] orientation
                return jnp.asarray((w * mask_fn(w)).T, leaf.dtype)
            return leaf

        params = jax.tree_util.tree_map_with_path(prune_leaf, params)

    rep = sparsity_report(params)
    print(json.dumps({"func": args.func, "amount": args.amount,
                      "overall_sparsity": rep["__overall__"]}))
    if args.output:
        save_checkpoint(args.output, params, meta={
            "model": args.model, "func": args.func, "amount": args.amount,
        })
        print(f"saved -> {args.output}")


def cmd_finetune(argv):
    """Retrain/finetune driver (reference classifier_training.py:18-184,
    finetune.py; reachable from tools.py' train recipes)."""
    p = argparse.ArgumentParser(prog="finetune")
    p.add_argument("--model", default="deit_tiny")
    p.add_argument("--style", default="standard")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--data-dir", default=None)
    p.add_argument("--synthetic", type=int, default=0,
                   help="train on N random batches (smoke/test mode)")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--lr", type=float, default=5e-5)
    p.add_argument("--optimizer", default="sgd", choices=["sgd", "adamw"])
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--grad-accum", type=int, default=1)
    p.add_argument("--lr-scale-batch", type=int, default=None,
                   help="if set, lr *= n_dev*batch/512 (train_main.py:225-227)")
    p.add_argument("--resume-dir", default=None,
                   help="mid-training checkpoint dir (resume if present)")
    p.add_argument("--remat", action="store_true",
                   help="per-block gradient rematerialization (ViT family): "
                        "memory-for-recompute at larger batch")
    p.add_argument("--output", default=None)
    args = p.parse_args(argv)

    import dataclasses

    from .utils.checkpoint import load_checkpoint, save_checkpoint
    from .utils.finetune import FinetuneConfig, finetune

    model, in_shape = _build_model(args.model, args.style)
    if args.remat:
        from .models.vit import ViT

        if not isinstance(model, ViT):
            raise SystemExit("--remat currently applies to ViT-family models")
        model = ViT(dataclasses.replace(model.config, remat=True))
    params = model.init(jax.random.key(0), jnp.ones((1,) + in_shape))
    if args.checkpoint:
        params = load_checkpoint(args.checkpoint, params)
    batches = _make_batches(args, in_shape)
    fcfg = FinetuneConfig(
        lr=args.lr, optimizer=args.optimizer, epochs=args.epochs,
        max_steps=args.max_steps, grad_accum=args.grad_accum,
        lr_scale_batch=args.lr_scale_batch, checkpoint_dir=args.resume_dir,
        # the CLI rebinds params and never reuses the caller tree — safe
        donate=True,
    )
    params = finetune(model.apply, params, batches, fcfg)
    if args.output:
        save_checkpoint(args.output, params, meta={
            "model": args.model, "finetuned": True, "optimizer": args.optimizer,
        })
        print(f"saved -> {args.output}")
    print("finetune done")


def cmd_sparse_train(argv):
    """Movement-pruning sparse finetune (reference train_main.py:104-437)."""
    p = argparse.ArgumentParser(prog="sparse_train")
    p.add_argument("--model", default="deit_tiny")
    p.add_argument("--style", default="standard")
    p.add_argument("--preset", default="topk-hybrid-struct-layerwise-tiny",
                   help="preset name in configs/ or a JSON path")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--teacher-checkpoint", default=None,
                   help="distillation teacher params (same arch)")
    p.add_argument("--data-dir", default=None)
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--warmup-steps", type=int, default=None)
    p.add_argument("--lr", type=float, default=5e-5)
    p.add_argument("--mask-lr", type=float, default=1e-2)
    p.add_argument("--layerwise-thresholds", default=None,
                   help='"h_0.5_d_0.3-..." DSL (README.md:78-82)')
    p.add_argument("--final-finetune-steps", type=int, default=0)
    p.add_argument("--no-compile", action="store_true",
                   help="skip compile-to-static-shapes at the end")
    p.add_argument("--output", default=None)
    args = p.parse_args(argv)

    from .pruning.sparse_driver import (
        run_sparse_finetune,
        sparse_config_from_preset,
    )
    from .utils.checkpoint import load_checkpoint, save_checkpoint

    model, in_shape = _build_model(args.model, args.style)
    cfg = model.config
    params = model.init(jax.random.key(0), jnp.ones((1,) + in_shape))
    if args.checkpoint:
        params = load_checkpoint(args.checkpoint, params)
    teacher_apply = teacher_params = None
    if args.teacher_checkpoint:
        # teacher params thread through the jit step as an argument — a
        # closure would embed them as HLO constants (CLAUDE.md: the remote
        # compiler rejects >~300 MB bodies)
        teacher_params = load_checkpoint(args.teacher_checkpoint, params)
        teacher_apply = model.apply

    warmup = args.warmup_steps if args.warmup_steps is not None else max(
        1, args.steps // 10)
    sparse = sparse_config_from_preset(
        args.preset, warmup_steps=warmup,
        layerwise_thresholds=args.layerwise_thresholds,
    )
    batches = _make_batches(args, in_shape)
    res = run_sparse_finetune(
        model.apply, cfg, params, sparse, batches, total_steps=args.steps,
        lr=args.lr, mask_lr=args.mask_lr, teacher_apply=teacher_apply,
        teacher_params=teacher_params,
        do_compile=not args.no_compile,
        final_finetune_steps=args.final_finetune_steps,
    )
    summary = {"steps": args.steps, "preset": args.preset}
    if res.compiled_cfg is not None:
        summary["heads_per_layer"] = list(res.compiled_cfg.heads_per_layer or [])
        summary["mlp_dim_per_layer"] = list(res.compiled_cfg.mlp_dim_per_layer or [])
        summary["sparsity"] = res.sparsity
    print(json.dumps(summary, default=float))
    if args.output:
        out_params = (res.compiled_params
                      if res.compiled_params is not None else res.params)
        meta = {"model": args.model, "preset": args.preset}
        if res.compiled_cfg is not None:
            # The full config is the source of truth for reloading: a
            # transitions-compiled checkpoint (norm_mode="nonorm"/act="relu")
            # fed to a default-config model would silently re-normalize the
            # affine-folded LN params.
            meta["config"] = json.loads(res.compiled_cfg.to_json())
            meta["heads_per_layer"] = list(res.compiled_cfg.heads_per_layer or [])
            meta["mlp_dim_per_layer"] = list(res.compiled_cfg.mlp_dim_per_layer or [])
            meta["norm_mode"] = res.compiled_cfg.norm_mode
            meta["act"] = res.compiled_cfg.act
        save_checkpoint(args.output, out_params, meta=meta)
        print(f"saved -> {args.output}")


def cmd_latency_model(argv):
    """Latency predictor: collect / fit / predict
    (reference latency_model.py:27-92 + get_latency.py:34-152)."""
    p = argparse.ArgumentParser(prog="latency_model")
    p.add_argument("action", choices=["collect", "fit", "predict"])
    p.add_argument("--size", default="tiny")
    p.add_argument("--n", type=int, default=20, help="configs to sample")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data", default=None, help="csv of encoding,ms")
    p.add_argument("--predictor", default=None, help="pickled model path")
    p.add_argument("--encoding", default=None, help='"h_4_d_0.4-..." to predict')
    p.add_argument("--impl", default="fused",
                   choices=["fused", "xla", "int8_static"],
                   help="collect: which inference path to measure — "
                        "int8_static is the deployed path (the dispatch-"
                        "chosen best at nearly every size/batch), so its "
                        "dataset fits a 'deployed latency' predictor")
    p.add_argument("--cv", type=int, default=5,
                   help="fit: also report k-fold cross-validated metrics "
                        "(0 disables)")
    p.add_argument("--max-noise", type=float, default=None,
                   help="fit: drop rows whose measured std_ms/ms exceeds "
                        "this fraction (needs the collect noise columns)")
    p.add_argument("--features", default="physical",
                   choices=["raw", "physical"],
                   help="fit: featurization — 'raw' is the reference-parity "
                        "per-layer (h, d) vector; 'physical' derives "
                        "MACs/weight-bytes/segment features from --size "
                        "(measurably more accurate; the default)")
    p.add_argument("--output", default=None)
    args = p.parse_args(argv)

    import csv

    from .utils.latency_model import (
        LatencyPredictor,
        measure_pruned_deit,
        sample_random_configs,
    )

    if args.action == "collect":
        from .cache import enable_compilation_cache

        enable_compilation_cache()
        depth = 12
        max_heads = {"tiny": 3, "small": 6, "base": 12}[args.size]
        encs = sample_random_configs(args.n, depth, max_heads, seed=args.seed)
        suffix = "" if args.impl == "fused" else f"_{args.impl}"
        bsuffix = "" if args.batch == 1 else f"_b{args.batch}"
        out = args.output or f"latency_{args.size}{suffix}{bsuffix}.csv"
        measure = measure_pruned_deit(args.size, batch=args.batch,
                                      impl=args.impl, detailed=True)
        # incremental writes: a killed multi-hour collect keeps its rows;
        # std/iters columns document each row's own noise floor; the batch
        # column lets fit pool b1+b32 rows behind the batch feature
        with open(out, "w", newline="", buffering=1) as f:
            w = csv.writer(f)
            w.writerow(["encoding", "ms", "std_ms", "iters", "batch"])
            for i, enc in enumerate(encs):
                r = measure(enc)
                w.writerow([enc, r["p50_ms"], r["std_ms"], r["iters"],
                            args.batch])
                print(f"[{i + 1}/{len(encs)}] {enc} {r['p50_ms']:.4f} ms "
                      f"(std {r['std_ms']:.4f}, iters {r['iters']})",
                      flush=True)
        print(f"saved {len(encs)} rows -> {out}")
    elif args.action == "fit":
        if not args.data:
            raise SystemExit("fit needs --data csv")
        with open(args.data) as f:
            rows = list(csv.DictReader(f))
        bad = [r for r in rows if float(r["ms"]) <= 0]
        if bad:
            print(f"dropping {len(bad)} non-positive latency rows "
                  f"(measurement failures)")
            rows = [r for r in rows if float(r["ms"]) > 0]
        if args.max_noise is not None:
            if rows and "std_ms" not in rows[0]:
                raise SystemExit("--max-noise needs a csv with the collect "
                                 "noise columns (encoding,ms,std_ms,iters)")

            def _quiet(r):
                # rows from a resumed/merged collect may lack std values;
                # they can't prove they're below the gate — drop them too
                try:
                    return float(r["std_ms"]) / float(r["ms"]) <= args.max_noise
                except (KeyError, TypeError, ValueError):
                    return False

            kept = [r for r in rows if _quiet(r)]
            if len(kept) != len(rows):
                print(f"dropping {len(rows) - len(kept)} rows with std/p50 > "
                      f"{args.max_noise:g} or missing std "
                      "(own-noise-floor gate)")
                rows = kept
        encs = [r["encoding"] for r in rows]
        ys = [float(r["ms"]) for r in rows]
        # batch column (absent in pre-r5 csvs -> all 1): multiple distinct
        # batches in one dataset turn on the predictor's batch feature so
        # a single fit answers serving-throughput questions
        batches = [int(r.get("batch") or 1) for r in rows]
        use_batch = len(set(batches)) > 1
        if use_batch and args.features != "physical":
            raise SystemExit("multi-batch data needs --features physical "
                             "(raw is the reference-parity b1 vector)")
        pred = LatencyPredictor(features=args.features, size=args.size,
                                batch_feature=use_batch)
        if args.features == "physical":
            # catch a forgotten --size: a config can't have more heads than
            # the size's native head count
            from .utils.latency_model import parse_features as _pf
            native = {"tiny": 3, "small": 6, "base": 12}[args.size]
            seen = max(int(h) for e in encs for h in _pf(e)[0::2])
            if seen > native:
                raise SystemExit(
                    f"--features physical with --size {args.size} "
                    f"(max {native} heads) but the data has configs with "
                    f"{seen} heads — pass the right --size")
        metrics = pred.fit(encs, ys, batches=batches)
        out = args.output or "latency_model.pkl"
        pred.save(out)
        if metrics:
            rmse, rmspe, rel, a5, a10, a15 = metrics
            rec = {
                "features": args.features,
                "batch_feature": use_batch,
                "rmse": rmse, "rmspe_pct": rmspe, "rel_rmse": rel,
                "acc_5pct": a5, "acc_10pct": a10, "acc_15pct": a15,
            }
            if args.cv and len(rows) >= args.cv:
                # pooled out-of-fold metrics: steadier than one 80/20 split
                c_rmse, c_rmspe, c_rel, c5, c10, c15 = pred.cv_metrics(
                    encs, ys, k=args.cv, batches=batches)
                rec.update({
                    "cv_folds": args.cv, "cv_rmse": c_rmse,
                    "cv_rmspe_pct": c_rmspe, "cv_rel_rmse": c_rel,
                    "cv_acc_5pct": c5, "cv_acc_10pct": c10,
                    "cv_acc_15pct": c15,
                })
            print(json.dumps(rec))
        print(f"saved predictor -> {out}")
    else:  # predict
        if not (args.predictor and args.encoding):
            raise SystemExit("predict needs --predictor and --encoding")
        pred = LatencyPredictor.load(args.predictor)
        print(f"{pred.predict(args.encoding, batch=args.batch):.4f} ms")


def cmd_logscrape(argv):
    """Result-collection scrapers (reference fetch_latency_std tools.py
    subcommand, utils.py:409-461 + fetch_results.py:6-40): pull latency/
    std, memory, accuracy series out of benchmark logs, or walk a model
    dir tree for accuracy markers.  Works on our logs AND reference logs
    (same "Avg latency X ms, Std Y ms" contract)."""
    p = argparse.ArgumentParser(prog="logscrape")
    p.add_argument("what", choices=["latency_std", "mem", "accuracy",
                                    "markers"])
    p.add_argument("--file", default=None, help="log file to scrape")
    p.add_argument("--dir", default=None,
                   help="markers: root dir to walk for accuracy*.txt")
    args = p.parse_args(argv)

    from .utils import logscrape as ls

    if args.what == "markers":
        if not args.dir:
            raise SystemExit("markers needs --dir")
        for name, acc in sorted(ls.fetch_results_from_markers(args.dir).items()):
            print(f"{name} {acc:.4f}")
        return
    if not args.file:
        raise SystemExit(f"{args.what} needs --file")
    if args.what == "latency_std":
        for avg, std in ls.fetch_latency_std(args.file):
            print(f"{avg:.4f} {std:.4f}")
    elif args.what == "mem":
        for v in ls.fetch_mem_footprints(args.file):
            print(f"{v:.2f}")
    else:
        for v in ls.fetch_accuracies_from_log(args.file):
            print(f"{v:.4f}")


def cmd_experiments(argv):
    """Fusion/quant/prune experiment generators (reference experiments.py)."""
    p = argparse.ArgumentParser(prog="experiments")
    p.add_argument("which",
                   choices=["fusion_ab", "quant_sweep", "prune_grid", "micro"])
    p.add_argument("--size", default="tiny")
    p.add_argument("--dim", type=int, default=192)
    p.add_argument("--heads", type=int, default=3)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--sizes", type=int, nargs="+", default=[256, 512, 1024, 2048])
    args = p.parse_args(argv)

    from .bench import experiments as ex

    if args.which == "prune_grid":
        print("\n".join(ex.prune_benchmark_grid(args.size)))
        return
    from .cache import enable_compilation_cache

    enable_compilation_cache()
    if args.which == "fusion_ab":
        out = ex.fusion_ab(dim=args.dim, mlp=args.dim * 4,
                           iters=args.iters, repeats=args.repeats)
    elif args.which == "quant_sweep":
        out = ex.quant_op_sweep(sizes=args.sizes, iters=args.iters,
                                repeats=args.repeats)
    else:  # micro
        out = ex.bench_micro_models(dim=args.dim, heads=args.heads,
                                    batch=args.batch, iters=args.iters,
                                    repeats=args.repeats)
    print(json.dumps(out))


def cmd_flops(argv):
    from .utils.flops import MODEL_FLOPS, pruned_deit_grids

    print(json.dumps({
        "model_flops": MODEL_FLOPS,
        "pruned_deit_grids_mmacs": pruned_deit_grids(),
    }, indent=2))


def cmd_plot(argv):
    """Figures (reference draw.py): accuracy-vs-MACs anchor curves and a
    measured latency-vs-MACs scatter from a sweep jsonl."""
    p = argparse.ArgumentParser(prog="plot")
    p.add_argument("which", choices=["macs_accuracy", "latency_macs"])
    p.add_argument("--sweep", default=None, nargs="+",
                   help="latency_macs: bench sweep jsonl(s) of measured "
                        "rows (several files merge; best ms per row wins)")
    p.add_argument("--batch", type=int, default=1,
                   help="latency_macs: which batch's rows to plot")
    p.add_argument("--output", default=None)
    args = p.parse_args(argv)

    from .utils.plots import draw_latency_vs_macs, draw_macs_accuracy_curve

    if args.which == "macs_accuracy":
        out = draw_macs_accuracy_curve(args.output or "macs_accuracy.png")
    else:
        if not args.sweep:
            raise SystemExit("latency_macs needs --sweep <jsonl>")
        from .utils.flops import bench_row_flops

        best = {}
        for path in args.sweep:
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    d = json.loads(line)
                    if "ms" not in d or d.get("batch") != args.batch:
                        continue
                    fl = bench_row_flops(d["name"])
                    if not fl:
                        continue
                    if d["name"] not in best or d["ms"] < best[d["name"]][1]:
                        best[d["name"]] = (fl / 2e9, d["ms"])  # GMACs, ms
        if not best:
            raise SystemExit(f"no plottable b{args.batch} rows in "
                             f"{', '.join(args.sweep)}")
        out = draw_latency_vs_macs(
            best, args.output or "latency_macs.png",
            title=f"TPU v5e latency vs MACs (batch {args.batch})")
    print(f"wrote {out}")


COMMANDS = {
    "models": cmd_models,
    "benchmark": cmd_benchmark,
    "benchmark_train": cmd_benchmark_train,
    "profile": cmd_profile,
    "analyse_op": lambda a: _analyse("analyse_op", a),
    "analyse_attn_ffn": lambda a: _analyse("analyse_attn_ffn", a),
    "analyse_gelu_ln": lambda a: _analyse("analyse_gelu_ln", a),
    "fetch_all_op_latency": lambda a: _analyse("fetch_all_op_latency", a),
    "convert": cmd_convert,
    "quant_accuracy": cmd_quant_accuracy,
    "export": cmd_export,
    "eval": cmd_eval,
    "prune_heads": cmd_prune_heads,
    "prune": cmd_prune,
    "finetune": cmd_finetune,
    "sparse_train": cmd_sparse_train,
    "latency_model": cmd_latency_model,
    "logscrape": cmd_logscrape,
    "experiments": cmd_experiments,
    "flops": cmd_flops,
    "plot": cmd_plot,
}


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] in ("-h", "--help") or argv[0] not in COMMANDS:
        print("usage: python -m edgevisiontransformer_tpu.cli <command> [...]")
        print("commands:", ", ".join(COMMANDS))
        return 1 if argv and argv[0] not in ("-h", "--help") else 0
    ret = COMMANDS[argv[0]](argv[1:])
    # commands may return their result dict for programmatic callers
    # (bench_gate imports cmd_benchmark); only ints are exit codes
    # bool is an int subclass — a command returning True for success must
    # not become exit code 1
    return ret if isinstance(ret, int) and not isinstance(ret, bool) else 0


if __name__ == "__main__":
    sys.exit(main())
