#!/usr/bin/env python
"""In-kernel cost attribution for the Swin whole-stage kernel at batch.

Compiles the SAME stage kernel with compile-time ablations
(ops/pallas/swin_block._ABLATE: nosoftmax / noattn / nomlp) and times each
variant per stage at b32 — full minus nosoftmax attributes the padded-lane
VPU softmax (scores are [*, n_pad=56] fp32 in 128-lane vregs: 56% of lanes
are padding), full minus nomlp the MLP, noattn the qkv+LN floor.  This
decides the stage-0/batch attack (VERDICT r3 directive #1b).

Ablated kernels compute WRONG numerics on purpose — diagnostics only.

Run (TPU):
    PYTHONPATH=/root/repo:/root/.axon_site timeout 4000 \
        python tools/probe_swin_ablate.py [--size tiny] [--batch 32]
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
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--stages", type=int, nargs="*", default=None)
    args = ap.parse_args()

    enable_compilation_cache()
    cfg = swin_config(args.size, dtype=jnp.bfloat16)
    model = SwinTransformer(cfg)
    x0 = jnp.ones((1, 3, cfg.image_size, cfg.image_size), cfg.dtype)
    variables = model.init(jax.random.key(0), x0)
    prep = prepare_swin_fused(model, variables)

    spans = build_spans(model, variables, prep, None, args.batch)
    stage_names = [k for k in spans if k.startswith("stage")
                   and k.endswith("_bf16")]
    if args.stages is not None:
        stage_names = [f"stage{s}_bf16" for s in args.stages]

    best = {}
    for rnd in range(args.rounds):
        for ab in (None, "nosoftmax", "nomlp", "noattn"):
            swb._ABLATE = ab
            for name in stage_names:
                fn, fargs = spans[name]
                r = measure_op_time(fn, fargs, iters=args.iters, repeats=3,
                                    chain_arg=-1)
                key = f"{name}:{ab or 'full'}"
                best[key] = min(best.get(key, 1e9), r["p50_ms"])
                print(json.dumps({
                    "probe": f"swin_{args.size}_ablate", "batch": args.batch,
                    "span": name, "ablate": ab or "full", "round": rnd,
                    "p50_ms": round(r["p50_ms"], 5),
                    "std_ms": round(r["std_ms"], 5)}), flush=True)
    swb._ABLATE = None
    print(f"\n== {args.size} b{args.batch} attribution (ms):", flush=True)
    # full = base + sdpa + mlp; noattn = base + mlp; nomlp = base + sdpa
    for name in stage_names:
        f = best[f"{name}:full"]
        ns = best[f"{name}:nosoftmax"]
        nm = best[f"{name}:nomlp"]
        na = best[f"{name}:noattn"]
        print(f"  {name:<14} full {f:7.4f} | softmax {f - ns:7.4f} | "
              f"sdpa-total {f - na:7.4f} | mlp {f - nm:7.4f} | "
              f"base(ln+qkv+proj+perm) {na + nm - f:7.4f}")


if __name__ == "__main__":
    main()
