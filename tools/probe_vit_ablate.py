#!/usr/bin/env python
"""In-kernel cost attribution for the fused ViT encoder at batch.

The deit_tiny b128 rows sit at ~51% bf16-SoL (int8_static ~26% of the int8
roofline) while small b128 hits 82% and base b64 104% from the SAME kernel
family — the largest unexplained efficiency gap left (VERDICT r4 #1).
This probe compiles the SAME streamed encoder kernels with compile-time
ablations (ops/pallas/fused_encoder._ABLATE: nosoftmax / noattn / nomlp /
noln / noquant) and times the whole fused forward per variant, interleaved
across rounds — the probe_swin_ablate methodology pointed at ViT.
Attribution (full = base + softmax + rest-of-sdpa + mlp, all sharing LN):

  softmax        = full - nosoftmax
  sdpa total     = full - noattn
  mlp total      = full - nomlp
  ln (all four)  = full - noln
  act quantize   = full - noquant        (int8 paths only)
  base           = noattn + nomlp - full (ln+qkv+proj+embed+head floor)

Matches the attn-vs-ffn decomposition purpose of the reference's
/root/reference/analyse.py:136-190 (per-span CSV walls), executed as
compile-time kernel ablations because XLA/Mosaic fusion makes runtime
span timers meaningless inside one pallas_call.

Ablated kernels compute WRONG numerics on purpose — diagnostics only.
b128 fused/int8 rows route to the STREAMED kernels (_encoder_kernel /
_encoder_kernel_int8: bm_eff=16 at tiny => iters>96), which carry every
ablation hook; --variant pins the dispatch there explicitly.

Run (TPU, serialized — nothing else may touch the chip):
    PYTHONPATH=/root/repo:/root/.axon_site timeout 4000 \
        python tools/probe_vit_ablate.py --model deit_tiny --batch 128
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

ABLATIONS = (None, "nosoftmax", "noattn", "nomlp", "noln", "noquant")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="deit_tiny")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--rounds", type=int, default=2)
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
            lambda vv, qq, xx: fused_vit_apply_int8(model, vv, xx, qq,
                                                    variant="streamed"),
            (v, sq, x), 2)

    best = {}
    try:
        for rnd in range(args.rounds):
            for ab in ABLATIONS:
                fe._ABLATE = ab
                for impl, (fn, fargs, ca) in cases.items():
                    if ab == "noquant" and impl == "fused":
                        continue  # no quantize in the bf16 path
                    r = measure_op_time(fn, fargs, iters=args.iters,
                                        repeats=args.repeats, chain_arg=ca)
                    key = f"{impl}:{ab or 'full'}"
                    best[key] = min(best.get(key, 1e9), r["p50_ms"])
                    print(json.dumps({
                        "probe": f"vit_ablate_{args.model}",
                        "batch": args.batch, "impl": impl,
                        "ablate": ab or "full", "round": rnd,
                        "p50_ms": round(r["p50_ms"], 5),
                        "std_ms": round(r["std_ms"], 5)}), flush=True)
    finally:
        fe._ABLATE = None

    print(f"\n== {args.model} b{args.batch} attribution (ms):", flush=True)
    for impl in cases:
        f = best[f"{impl}:full"]
        parts = {
            "softmax": f - best[f"{impl}:nosoftmax"],
            "sdpa-total": f - best[f"{impl}:noattn"],
            "mlp": f - best[f"{impl}:nomlp"],
            "ln": f - best[f"{impl}:noln"],
        }
        if f"{impl}:noquant" in best:
            parts["act-quantize"] = f - best[f"{impl}:noquant"]
        base = (best[f"{impl}:noattn"] + best[f"{impl}:nomlp"] - f)
        frag = " | ".join(f"{k} {v:7.4f}" for k, v in parts.items())
        print(f"  {impl:<12} full {f:7.4f} | {frag} | "
              f"base(qkv+proj+embed+head) {base:7.4f}")


if __name__ == "__main__":
    main()
