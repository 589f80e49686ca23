#!/usr/bin/env python
"""Interleaved A/B: tanh-free polynomial GELU vs the tanh-erf form.

The r5 ablation wall put the MLP (fc1+GELU+fc2+LN2) at 1.42-1.53 ms of
deit_tiny b128's ~3.2 — with GELU's hardware tanh worth an estimated
~0.3 ms of it.  mathlib._GELU_POLY swaps the tanh-erf for a degree-12
Chebyshev-fitted Phi polynomial (17 plain VPU ops, |err| 1.3e-6, no
transcendental); it wins only if the hardware tanh costs more than ~8
elementwise passes.  This measures both forms interleaved on the fused
and static-int8 whole-encoder paths.

Run (TPU, serialized):
    PYTHONPATH=/root/repo:/root/.axon_site timeout 6000 \
        python tools/probe_vit_gelu.py --model deit_tiny --batch 128
"""
import argparse
import json
import sys

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import edgevisiontransformer_tpu.ops.pallas.mathlib as ml  # noqa: E402
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
            for poly in (False, True):
                ml._GELU_POLY = poly
                for impl, (fn, fargs, ca) in cases.items():
                    r = measure_op_time(fn, fargs, iters=args.iters,
                                        repeats=args.repeats, chain_arg=ca)
                    key = f"{impl}:{'poly' if poly else 'tanh'}"
                    best[key] = min(best.get(key, 1e9), r["p50_ms"])
                    print(json.dumps({
                        "probe": f"vit_gelu_{args.model}",
                        "batch": args.batch, "impl": impl,
                        "gelu": "poly" if poly else "tanh",
                        "round": rnd, "p50_ms": round(r["p50_ms"], 5),
                        "std_ms": round(r["std_ms"], 5)}), flush=True)
    finally:
        ml._GELU_POLY = False

    print(f"\n== {args.model} b{args.batch} GELU A/B bests:", flush=True)
    for impl in cases:
        tn = best[f"{impl}:tanh"]
        po = best[f"{impl}:poly"]
        print(f"  {impl:<12} tanh {tn:.4f} | poly {po:.4f} "
              f"({po / tn - 1.0:+.1%})")


if __name__ == "__main__":
    main()
