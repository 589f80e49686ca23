#!/usr/bin/env python
"""Headline benchmark: DeiT-Tiny on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Timing uses the loop-delta method (bench/looptimer.py): on this tunneled TPU
runtime, per-dispatch wall timing with block_until_ready reports impossible
numbers (the ack is not a device sync) — chained in-jit iteration with a
scalar-fetch sync and a K-vs-1 difference is the only honest clock, and it
reproduces the v5e bf16 matmul roofline to within ~4%.

The reference publishes no TPU numbers (BASELINE.json "published": {}), so
``vs_baseline`` is the fraction of the v5e roofline (speed-of-light) this
run achieves: vs_baseline = roofline_ms / measured_ms (1.0 = speed of light,
higher is better).
"""

from __future__ import annotations

import json
import sys


def _import_jax_guarded(timeout_s: int = 240):
    """import jax with a hang guard: when the axon tunnel is down, backend
    init inside the import blocks ~30 min in an uninterruptible C call
    before raising UNAVAILABLE (observed 2026-08-17; SIGALRM cannot break
    it).  Probe backend init in a killable SUBPROCESS first and fail fast
    with a clean JSON error line so the driver's bench run isn't stuck."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        raise TimeoutError(f"jax backend init exceeded {timeout_s}s "
                           "(TPU tunnel down?)")
    if r.returncode != 0:
        tail = (r.stderr or "").strip().splitlines()[-1:]
        raise RuntimeError(f"jax backend init failed: {' '.join(tail)}")

    import jax
    import jax.numpy as jnp

    return jax, jnp


# v5e per-chip peaks.
PEAK_BF16_FLOPS = 197e12
PEAK_HBM_BW = 819e9  # bytes/s


def deit_flops(dim: int, depth: int, mlp: int, n_tokens: int = 197) -> float:
    """Forward FLOPs (2*MACs) of a DeiT encoder, patch embed + head included."""
    per_block = (
        2 * n_tokens * dim * 3 * dim  # qkv
        + 2 * n_tokens * n_tokens * dim * 2  # scores + PV
        + 2 * n_tokens * dim * dim  # out proj
        + 2 * n_tokens * dim * mlp * 2  # fc1 + fc2
    )
    patch = 2 * 196 * 768 * dim
    head = 2 * dim * 1000
    return depth * per_block + patch + head


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    kernel_mode = sys.argv[2] if len(sys.argv) > 2 else "fused"
    try:
        jax, jnp = _import_jax_guarded()
    except Exception as e:  # noqa: BLE001 — report, don't hang
        print(json.dumps({
            "metric": f"deit_tiny_b{batch}_bf16_device_ms",
            "value": None, "unit": "ms", "vs_baseline": None,
            "error": f"{type(e).__name__}: {e}",
        }))
        raise SystemExit(1)
    dtype = jnp.bfloat16

    from edgevisiontransformer_tpu.bench.looptimer import measure_op_time
    from edgevisiontransformer_tpu.cache import enable_compilation_cache
    from edgevisiontransformer_tpu.models import get_deit_tiny
    from edgevisiontransformer_tpu.models.vit import fused_vit_apply

    enable_compilation_cache()
    model = get_deit_tiny("standard", dtype=dtype)
    cfg = model.config
    x = jnp.ones((batch, 3, 224, 224), dtype)
    params = model.init(jax.random.key(0), x)

    if kernel_mode == "fused":
        # whole-encoder Pallas kernel; fall back to XLA if it fails to
        # compile on this toolchain
        try:
            apply = lambda p, xx: fused_vit_apply(model, p, xx)
            jax.block_until_ready(jax.jit(apply)(params, x))
        except Exception:
            kernel_mode = "xla"
            apply = model.apply
    else:
        apply = model.apply

    res = measure_op_time(apply, (params, x), iters=100, repeats=5, chain_arg=1)

    # throughput at a serving batch as a secondary number
    bs_thr = 128
    xt = jnp.ones((bs_thr, 3, 224, 224), dtype)
    thr = measure_op_time(apply, (params, xt), iters=30, repeats=3, chain_arg=1)

    # Shipping-best secondary rows: the static-int8 whole-encoder kernel
    # (calibrated per-tensor activation scales, TFLITE_BUILTINS_INT8
    # analogue) beats bf16 at every ViT size/batch on this chip.  Guarded:
    # any failure (cold Pallas compile timeout, tunnel flap) must not cost
    # the headline metric.
    int8_extra = {}
    try:
        from edgevisiontransformer_tpu.models.vit import (
            fused_vit_apply_int8,
            prepare_vit_int8_static,
        )
        from edgevisiontransformer_tpu.ops.quant import representative_batches

        stacked_q = prepare_vit_int8_static(
            model, params,
            calib_batches=representative_batches(n=8, shape=(3, 224, 224)))
        # stacked_q rides as a jit ARGUMENT (not a closure): closing over
        # the weight stack bakes it into the HLO and inflates the serialized
        # compile (the documented HTTP-413 hazard at base scale)
        apply_q = lambda p, sq, xx: fused_vit_apply_int8(model, p, xx, sq)
        q1 = measure_op_time(apply_q, (params, stacked_q, x), iters=100,
                             repeats=5, chain_arg=2)
        qt = measure_op_time(apply_q, (params, stacked_q, xt), iters=30,
                             repeats=3, chain_arg=2)
        int8_extra = {
            "int8_static_ms": round(q1["p50_ms"], 5),
            "int8_static_img_per_s_b128": round(bs_thr / (qt["p50_ms"] / 1e3), 1),
        }
    except Exception as e:  # noqa: BLE001 — secondary row only
        int8_extra = {"int8_static_error": f"{type(e).__name__}: {e}"[:200]}

    from edgevisiontransformer_tpu.bench.harness import compiled_mem_mb, device_mem_mb

    peak_mb, live_mb = device_mem_mb()
    if peak_mb is None:
        # Tunneled backend exposes no allocator stats; report the compiled
        # executable's static HBM footprint (args+outputs+temps+program).
        peak_mb = compiled_mem_mb(jax.jit(apply), (params, x))

    flops = deit_flops(cfg.dim, cfg.depth, cfg.mlp_dim) * batch
    param_bytes = sum(p.size * p.dtype.itemsize for p in jax.tree.leaves(params))
    act_bytes = batch * 3 * 224 * 224 * 2
    roofline_ms = max(flops / PEAK_BF16_FLOPS, (param_bytes + act_bytes) / PEAK_HBM_BW) * 1e3

    print(json.dumps({
        "metric": f"deit_tiny_b{batch}_bf16_device_ms",
        "value": round(res["p50_ms"], 5),
        "unit": "ms",
        "vs_baseline": round(roofline_ms / res["p50_ms"], 4),
        "avg_ms": round(res["avg_ms"], 5),
        "std_ms": round(res["std_ms"], 5),
        "min_ms": round(res["min_ms"], 5),
        "kernel_mode": kernel_mode,
        "throughput_img_per_s_b128": round(bs_thr / (thr["p50_ms"] / 1e3), 1),
        "roofline_ms": round(roofline_ms, 5),
        "peak_hbm_mb": round(peak_mb, 2) if peak_mb is not None else None,
        "live_hbm_mb": round(live_mb, 2) if live_mb is not None else None,
        "device": str(jax.devices()[0]),
        **int8_extra,
    }))


if __name__ == "__main__":
    main()
