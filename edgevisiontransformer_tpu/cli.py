"""Command-line interface — the tools.py analogue.

Mirrors the reference's subcommand surface (/root/reference/tools.py:1011-1086)
where the command still makes sense on TPU:

  benchmark        on-TPU latency/memory (replaces mobile_benchmark/server_benchmark)
  profile          per-op CSV profiling (replaces --enable_op_profiling + pull)
  analyse_op / analyse_attn_ffn / analyse_gelu_ln   (analyse.py subcommands)
  convert          quantized export: float16 | bfloat16 | dynamic-int8 (tf2tflite_cmd)
  export           save model checkpoint (export_tf_deit etc.)
  eval             ImageNet top-1 (eval_deit / eval_tf / eval_onnx ...)
  prune_heads      are16heads iterative head pruning driver (run_classifier)
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


def cmd_benchmark(argv):
    p = argparse.ArgumentParser(prog="benchmark")
    p.add_argument("--model", default="deit_tiny")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--style", default="standard")
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--kernel-mode", default="xla", choices=["xla", "pallas", "fused"])
    args = p.parse_args(argv)

    from .bench.looptimer import measure_op_time
    from .cache import enable_compilation_cache

    enable_compilation_cache()
    model, in_shape = _build_model(args.model, args.style, args.dtype)
    x = jnp.ones((args.batch,) + in_shape, jnp.dtype(args.dtype))
    params = model.init(jax.random.key(0), x)
    if args.kernel_mode == "fused":
        from .models.vit import fused_vit_apply

        fn = lambda p_, x_: fused_vit_apply(model, p_, x_)
    else:
        fn = lambda p_, x_: model.apply(p_, x_)
    r = measure_op_time(fn, (params, x), iters=args.iters, repeats=args.repeats,
                        chain_arg=1)
    r["model"] = args.model
    r["batch"] = args.batch
    r["throughput_per_s"] = args.batch / (r["p50_ms"] / 1e3) if r["p50_ms"] else None
    # Reference print contract (tools.py:550)
    print(f"Avg latency {r['avg_ms']:.4f} ms, Std {r['std_ms']:.4f} ms")
    print(json.dumps(r))


def cmd_profile(argv):
    p = argparse.ArgumentParser(prog="profile")
    p.add_argument("--model", default="deit_tiny")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--output", default="profile.csv")
    args = p.parse_args(argv)

    from .bench.profile import profile_vit, write_profile_csv
    from .cache import enable_compilation_cache

    enable_compilation_cache()
    model, in_shape = _build_model(args.model, dtype=args.dtype)
    x = jnp.ones((args.batch,) + in_shape, jnp.dtype(args.dtype))
    params = model.init(jax.random.key(0), x)
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
    args = p.parse_args(argv)

    from .ops.quant import cast_params, quantize_vit_params_int8
    from .utils.checkpoint import load_checkpoint, save_checkpoint

    model, in_shape = _build_model(args.model, args.style)
    x = jnp.ones((1,) + in_shape)
    params = model.init(jax.random.key(0), x)
    if args.checkpoint:
        params = load_checkpoint(args.checkpoint, params)

    if args.quantization in ("float16", "bfloat16"):
        out = cast_params(params, jnp.float16 if args.quantization == "float16" else jnp.bfloat16)
    else:  # dynamic / int8
        out = quantize_vit_params_int8(params)
    save_checkpoint(args.output, out, meta={
        "model": args.model, "quantization": args.quantization,
        "style": args.style,
    })
    print(f"saved {args.quantization} checkpoint -> {args.output}")


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
    p.add_argument("--impl", default="xla", choices=["xla", "fused", "int8"])
    args = p.parse_args(argv)

    from .utils.checkpoint import load_checkpoint
    from .utils.imagenet import evaluate, write_accuracy_marker

    model, _ = _build_model(args.model, args.style)
    params = model.init(jax.random.key(0), jnp.ones((1, 3, 224, 224)))
    if args.checkpoint:
        params = load_checkpoint(args.checkpoint, params)
    if args.impl == "fused":
        from .models.vit import fused_vit_apply

        apply_fn = lambda p_, x_: fused_vit_apply(model, p_, x_)
    elif args.impl == "int8":
        from .ops.quant import int8_vit_apply, quantize_vit_params_int8

        params = quantize_vit_params_int8(params)
        apply_fn = lambda p_, x_: int8_vit_apply(model, p_, x_)
    else:
        apply_fn = model.apply
    acc = evaluate(apply_fn, params, args.data_dir, batch_size=args.batch,
                   limit=args.limit, progress=True)
    print(f"top1 {acc:.4f}")
    if args.marker_dir:
        write_accuracy_marker(args.marker_dir, acc)


def cmd_prune_heads(argv):
    p = argparse.ArgumentParser(prog="prune_heads")
    p.add_argument("--model", default="deit_tiny")
    p.add_argument("--importance-file", default=None)
    p.add_argument("--prune-percent", type=float, nargs="+", default=[10.0])
    p.add_argument("--at-least-x-heads-per-layer", type=int, default=1)
    p.add_argument("--output", default=None)
    p.add_argument("--style", default="standard")
    args = p.parse_args(argv)

    from .pruning import (
        determine_pruning_sequence,
        load_head_importance_txt,
        prune_heads_params,
        to_pruning_descriptor,
        what_to_prune,
    )
    from .utils.checkpoint import save_checkpoint

    model, in_shape = _build_model(args.model, args.style)
    cfg = model.config
    params = model.init(jax.random.key(0), jnp.ones((1,) + in_shape))

    if args.importance_file:
        imp = load_head_importance_txt(args.importance_file)
    else:
        print("no --importance-file; using uniform random importance")
        imp = np.random.RandomState(0).rand(cfg.depth, cfg.heads)

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
    if args.output:
        save_checkpoint(args.output, new_params, meta={
            "model": args.model,
            "heads_per_layer": list(new_cfg.heads_per_layer),
            "pruned": to_pruning_descriptor(to_prune),
        })
        print(f"saved -> {args.output}")


def cmd_flops(argv):
    from .utils.flops import MODEL_FLOPS, pruned_deit_grids

    print(json.dumps({
        "model_flops": MODEL_FLOPS,
        "pruned_deit_grids_mmacs": pruned_deit_grids(),
    }, indent=2))


COMMANDS = {
    "models": cmd_models,
    "benchmark": cmd_benchmark,
    "profile": cmd_profile,
    "analyse_op": lambda a: _analyse("analyse_op", a),
    "analyse_attn_ffn": lambda a: _analyse("analyse_attn_ffn", a),
    "analyse_gelu_ln": lambda a: _analyse("analyse_gelu_ln", a),
    "fetch_all_op_latency": lambda a: _analyse("fetch_all_op_latency", a),
    "convert": cmd_convert,
    "export": cmd_export,
    "eval": cmd_eval,
    "prune_heads": cmd_prune_heads,
    "flops": cmd_flops,
}


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] in ("-h", "--help") or argv[0] not in COMMANDS:
        print("usage: python -m edgevisiontransformer_tpu.cli <command> [...]")
        print("commands:", ", ".join(COMMANDS))
        return 1 if argv and argv[0] not in ("-h", "--help") else 0
    return COMMANDS[argv[0]](argv[1:]) or 0


if __name__ == "__main__":
    sys.exit(main())
