#!/usr/bin/env python
"""Interleaved A/B: image-batched vs image-unrolled in-kernel attention.

The fused ViT encoder's _attention_rows unrolls a Python loop over the
bm images of a program — at tiny b128 (bm=16, 3 heads) that is 48
separate [200, 64]x[64, 200] + [200, 200]x[200, 64] matmul pairs and 48
softmaxes per LAYER.  The swin whole-block work measured that per-head
BATCHED dot_general beats an unrolled loop (~0.17 us per-issue overhead),
and swin stage-0's wall showed small batched matmuls 35x off roofline on
issue overhead — the same disease suspected behind the deit_tiny b128
51%-SoL wall (VERDICT r4 directive #1).  fused_encoder._BATCHED_ATTN
switches _attention_rows to one 3-D dot_general per head; this probe
alternates both forms (and both impls) across rounds in one session.

Run (TPU, serialized):
    PYTHONPATH=/root/repo:/root/.axon_site timeout 6000 \
        python tools/probe_vit_batched_attn.py --model deit_tiny --batch 128
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

    best = {}
    try:
        for rnd in range(args.rounds):
            for batched in (False, True):
                fe._BATCHED_ATTN = batched
                for impl, (fn, fargs, ca) in cases.items():
                    r = measure_op_time(fn, fargs, iters=args.iters,
                                        repeats=args.repeats, chain_arg=ca)
                    key = f"{impl}:{'batched' if batched else 'unrolled'}"
                    best[key] = min(best.get(key, 1e9), r["p50_ms"])
                    print(json.dumps({
                        "probe": f"vit_batched_attn_{args.model}",
                        "batch": args.batch, "impl": impl,
                        "attn": "batched" if batched else "unrolled",
                        "round": rnd, "p50_ms": round(r["p50_ms"], 5),
                        "std_ms": round(r["std_ms"], 5)}), flush=True)
    finally:
        fe._BATCHED_ATTN = False

    print(f"\n== {args.model} b{args.batch} batched-attn A/B bests:",
          flush=True)
    for impl in cases:
        u = best[f"{impl}:unrolled"]
        b = best[f"{impl}:batched"]
        print(f"  {impl:<12} unrolled {u:.4f} | batched {b:.4f} "
              f"({b / u - 1.0:+.1%})")


if __name__ == "__main__":
    main()
