#!/usr/bin/env python
"""Interleaved A/B: block-diagonal window packing in the Swin whole-stage
stage-0 kernel at b32 (VERDICT r4 directive #3).

The r2 packing measurement was at b1 and PRE-dates the nomax softmax; the
r4 ablation wall then only COMPUTED the b32 claim ("arithmetic gives 2.28
vs 2.36 — inside jitter").  This measures it: the same stage-0 span
(probe_swin_stages_b32.build_spans) compiled with swin_block._PACK = 1
(production), 2, and optionally 4, alternated across rounds in one
session.  Stage 0 is the target because its 0.88 ms of 2048-way batched
[56,32] sdpa matmuls run ~35x off roofline on per-matmul issue overhead —
the cost packing halves — while packing doubles the score FLOPs and the
softmax VPU traffic the nomax change just cut.

Run (TPU, serialized):
    PYTHONPATH=/root/repo:/root/.axon_site timeout 4000 \
        python tools/probe_swin_pack.py [--size tiny] [--batch 32] [--p4]
"""
import argparse
import json
import sys

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import edgevisiontransformer_tpu.ops.pallas.swin_block as swb  # noqa: E402
from edgevisiontransformer_tpu.bench.looptimer import measure_op_time  # noqa: E402
from edgevisiontransformer_tpu.cache import enable_compilation_cache  # noqa: E402
from edgevisiontransformer_tpu.models.swin import (  # noqa: E402
    SwinTransformer,
    prepare_swin_fused,
    swin_config,
)
from probe_swin_stages_b32 import build_spans  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="tiny")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--p4", action="store_true",
                    help="also measure _PACK=4 (use if P=2 is within noise)")
    ap.add_argument("--stage", type=int, default=0)
    args = ap.parse_args()

    enable_compilation_cache()
    cfg = swin_config(args.size, dtype=jnp.bfloat16)
    model = SwinTransformer(cfg)
    x0 = jnp.ones((1, 3, cfg.image_size, cfg.image_size), cfg.dtype)
    variables = model.init(jax.random.key(0), x0)
    prep = prepare_swin_fused(model, variables)
    spans = build_spans(model, variables, prep, None, args.batch)
    fn, fargs = spans[f"stage{args.stage}_bf16"]

    packs = [1, 2] + ([4] if args.p4 else [])
    best = {}
    try:
        for rnd in range(args.rounds):
            for p in packs:
                swb._PACK = p
                r = measure_op_time(fn, fargs, iters=args.iters, repeats=3,
                                    chain_arg=-1)
                best[p] = min(best.get(p, 1e9), r["p50_ms"])
                print(json.dumps({
                    "probe": f"swin_{args.size}_pack",
                    "batch": args.batch, "stage": args.stage, "pack": p,
                    "round": rnd, "p50_ms": round(r["p50_ms"], 5),
                    "std_ms": round(r["std_ms"], 5)}), flush=True)
    finally:
        swb._PACK = 1

    print(f"\n== {args.size} b{args.batch} stage{args.stage} packing bests:",
          flush=True)
    for p in packs:
        rel = best[p] / best[1] - 1.0
        print(f"  pack={p}: {best[p]:.4f} ms ({rel:+.1%} vs unpacked)")


if __name__ == "__main__":
    main()
