#!/usr/bin/env python
"""Headline benchmark: DeiT-Tiny on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

The reference publishes no TPU numbers (BASELINE.json "published": {}), so
``vs_baseline`` is the fraction of the v5e roofline (speed-of-light) this
run achieves for the same workload: vs_baseline = roofline_ms / measured_ms,
where roofline_ms = max(FLOPs/peak_flops, bytes_moved/peak_bw).  1.0 means
speed-of-light; higher is better.
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp

# v5e per-chip peaks.
PEAK_BF16_FLOPS = 394e12  # MXU bf16
PEAK_FP32_FLOPS = 98.5e12
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
    dtype = jnp.bfloat16

    from edgevisiontransformer_tpu.bench import benchmark_fn, benchmark_throughput
    from edgevisiontransformer_tpu.models import get_deit_tiny

    model = get_deit_tiny("standard", dtype=dtype)
    cfg = model.config
    x = jnp.ones((batch, 3, 224, 224), dtype)
    params = model.init(jax.random.key(0), x)

    res = benchmark_fn(
        lambda p, xx: model.apply(p, xx), (params, x),
        name=f"deit_tiny_b{batch}", num_runs=50, warmup_runs=50, batch_size=batch,
    )
    thr = benchmark_throughput(
        lambda p, xx: model.apply(p, xx), (params, x),
        name=f"deit_tiny_b{batch}_thr", num_runs=20, warmup_runs=10,
        batch_size=batch, iters_per_run=20,
    )

    flops = deit_flops(cfg.dim, cfg.depth, cfg.mlp_dim) * batch
    param_bytes = sum(p.size * p.dtype.itemsize for p in jax.tree.leaves(params))
    act_bytes = batch * 3 * 224 * 224 * 2
    roofline_s = max(flops / PEAK_BF16_FLOPS, (param_bytes + act_bytes) / PEAK_HBM_BW)
    roofline_ms = roofline_s * 1e3

    print(json.dumps({
        "metric": f"deit_tiny_b{batch}_bf16_p50_latency_ms",
        "value": round(res.p50_ms, 4),
        "unit": "ms",
        "vs_baseline": round(roofline_ms / res.p50_ms, 4),
        "avg_ms": round(res.avg_ms, 4),
        "std_ms": round(res.std_ms, 4),
        "min_ms": round(res.min_ms, 4),
        "init_ms": round(res.init_ms, 1),
        "throughput_img_per_s": round(thr.throughput_per_s or 0.0, 1),
        "pipelined_ms": round(thr.avg_ms, 4),
        "roofline_ms": round(roofline_ms, 4),
        "peak_hbm_mb": res.peak_hbm_mb,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
