#!/usr/bin/env python
"""A/B: max-free deferred softmax in the Swin whole-stage kernel.

The r4 ablation (BENCHMARKS swin_ablation_b32) attributed ~0.50 ms/stage
at b32 to the padded-lane softmax; the row-max subtraction is one of its
three passes and is mathematically redundant under deferred normalization
(see swin_block._SOFTMAX_NOMAX).  This interleaves stage kernels with the
flag off/on at b32 + whole-model b1, and checks numerics parity on-device.

Run (TPU):
    PYTHONPATH=/root/repo:/root/.axon_site timeout 4000 \
        python tools/probe_swin_nomax.py
"""
import json
import sys

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import edgevisiontransformer_tpu.ops.pallas.swin_block as swb  # noqa: E402
from edgevisiontransformer_tpu.bench.looptimer import measure_op_time  # noqa: E402
from edgevisiontransformer_tpu.cache import enable_compilation_cache  # noqa: E402
from edgevisiontransformer_tpu.models.swin import (  # noqa: E402
    SwinTransformer,
    fused_swin_apply,
    prepare_swin_fused,
    swin_config,
)
from probe_swin_stages_b32 import build_spans  # noqa: E402

ROUNDS = 3


def main():
    enable_compilation_cache()
    cfg = swin_config("tiny", dtype=jnp.bfloat16)
    model = SwinTransformer(cfg)
    x0 = jnp.ones((1, 3, cfg.image_size, cfg.image_size), cfg.dtype)
    variables = model.init(jax.random.key(0), x0)
    prep = prepare_swin_fused(model, variables)

    # numerics parity first (real image-scale inputs)
    xr = jax.random.normal(jax.random.key(1), (2, 3, 224, 224),
                           jnp.float32).astype(jnp.bfloat16)
    swb._SOFTMAX_NOMAX = False
    ref = np.asarray(jax.jit(
        lambda v, p_, x: fused_swin_apply(model, v, x, prepared=p_))(
        variables, prep, xr)).astype(np.float32)
    swb._SOFTMAX_NOMAX = True
    got = np.asarray(jax.jit(
        lambda v, p_, x: fused_swin_apply(model, v, x, prepared=p_))(
        variables, prep, xr)).astype(np.float32)
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    agree = int((got.argmax(-1) == ref.argmax(-1)).sum())
    print(f"parity: max_rel {rel:.2e}, argmax agree {agree}/2", flush=True)

    spans = build_spans(model, variables, prep, None, 32)
    stage_names = [k for k in spans if k.startswith("stage")
                   and k.endswith("_bf16")]
    best = {}
    for rnd in range(ROUNDS):
        for flag in (False, True):
            swb._SOFTMAX_NOMAX = flag
            for name in stage_names:
                fn, fargs = spans[name]
                r = measure_op_time(fn, fargs, iters=30, repeats=3,
                                    chain_arg=-1)
                key = f"{name}:{'nomax' if flag else 'max'}"
                best[key] = min(best.get(key, 1e9), r["p50_ms"])
                print(json.dumps({
                    "probe": "swin_nomax", "batch": 32, "span": name,
                    "nomax": flag, "round": rnd,
                    "p50_ms": round(r["p50_ms"], 5),
                    "std_ms": round(r["std_ms"], 5)}), flush=True)
        # whole model b1 as well
        x1 = jnp.ones((1, 3, 224, 224), jnp.bfloat16)
        for flag in (False, True):
            swb._SOFTMAX_NOMAX = flag
            r = measure_op_time(
                lambda v, p_, x: fused_swin_apply(model, v, x, prepared=p_),
                (variables, prep, x1), iters=100, repeats=3, chain_arg=-1)
            key = f"model_b1:{'nomax' if flag else 'max'}"
            best[key] = min(best.get(key, 1e9), r["p50_ms"])
            print(json.dumps({
                "probe": "swin_nomax", "batch": 1, "span": "model",
                "nomax": flag, "round": rnd,
                "p50_ms": round(r["p50_ms"], 5),
                "std_ms": round(r["std_ms"], 5)}), flush=True)
    swb._SOFTMAX_NOMAX = False
    print("\n== bests (ms):")
    for name in stage_names + ["model_b1"]:
        a = best.get(f"{name}:max", float("nan"))
        b = best.get(f"{name}:nomax", float("nan"))
        print(f"  {name:<14} max {a:7.4f}  nomax {b:7.4f}  "
              f"({(a - b) / a * 100:+.1f}%)")


if __name__ == "__main__":
    main()
