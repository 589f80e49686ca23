#!/usr/bin/env python
"""Interleaved A/B: fused score mask-add vs scale-pass + iota-select.

The r5 ablation wall (probe_vit_ablate) showed deit_tiny b128 sdpa-total
at ~1.0-1.15 ms against a ~0.36 ms matmul floor while softmax itself costs
only 0.13-0.21 — the residue is elementwise f32 passes over the padded
[200, 256-lane] scores: a scale multiply pass plus an iota-compare-select
mask pass, per (image, head) = 48x per program-layer.
fused_encoder._SCORE_FMA folds both into ONE multiply-add against a
[1, n_pad] bias row (exactly identical output).  This measures both forms
interleaved, both impls.

Run (TPU, serialized):
    PYTHONPATH=/root/repo:/root/.axon_site timeout 6000 \
        python tools/probe_vit_scoreopt.py --model deit_tiny --batch 128
"""
import argparse
import json
import sys

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import edgevisiontransformer_tpu.ops.pallas.fused_encoder as fe  # noqa: E402
from edgevisiontransformer_tpu.bench.looptimer import measure_op_time  # noqa: E402
from edgevisiontransformer_tpu.cache import enable_compilation_cache  # noqa: E402
from edgevisiontransformer_tpu.cli import _build_model  # noqa: E402
from edgevisiontransformer_tpu.models.vit import (  # noqa: E402
    fused_vit_apply,
    fused_vit_apply_int8,
    prepare_vit_int8_static,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="deit_tiny")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--impls", nargs="+", default=["fused", "int8_static"])
    args = ap.parse_args()

    enable_compilation_cache()
    model, in_shape = _build_model(args.model, "standard", dtype="bfloat16")
    x1 = jnp.ones((1,) + in_shape, jnp.bfloat16)
    v = model.init(jax.random.key(0), x1)
    x = jnp.ones((args.batch,) + in_shape, jnp.bfloat16)

    cases = {}
    if "fused" in args.impls:
        cases["fused"] = (
            lambda vv, xx: fused_vit_apply(model, vv, xx), (v, x), 1)
    if "int8_static" in args.impls:
        sq = prepare_vit_int8_static(model, v, calib_batches=[
            np.random.RandomState(i).randn(1, *in_shape).astype("float32")
            for i in range(8)])
        cases["int8_static"] = (
            lambda vv, qq, xx: fused_vit_apply_int8(model, vv, xx, qq),
            (v, sq, x), 2)

    default = fe._SCORE_FMA
    best = {}
    try:
        for rnd in range(args.rounds):
            for fma in (False, True):
                fe._SCORE_FMA = fma
                for impl, (fn, fargs, ca) in cases.items():
                    r = measure_op_time(fn, fargs, iters=args.iters,
                                        repeats=args.repeats, chain_arg=ca)
                    key = f"{impl}:{'fma' if fma else 'select'}"
                    best[key] = min(best.get(key, 1e9), r["p50_ms"])
                    print(json.dumps({
                        "probe": f"vit_scoreopt_{args.model}",
                        "batch": args.batch, "impl": impl,
                        "mask": "fma" if fma else "select",
                        "round": rnd, "p50_ms": round(r["p50_ms"], 5),
                        "std_ms": round(r["std_ms"], 5)}), flush=True)
    finally:
        fe._SCORE_FMA = default

    print(f"\n== {args.model} b{args.batch} score mask A/B bests:",
          flush=True)
    for impl in cases:
        sE = best[f"{impl}:select"]
        fE = best[f"{impl}:fma"]
        print(f"  {impl:<12} select {sE:.4f} | fma {fE:.4f} "
              f"({fE / sE - 1.0:+.1%})")


if __name__ == "__main__":
    main()
