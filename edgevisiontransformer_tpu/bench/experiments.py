"""Experiment generators — the experiments.py analogue.

* ``prune_benchmark_grid``: the ViT_Pruned benchmark grid (reference
  experiments.py:150-204 PruneBenchmark): ffn-only 10-90%, head-only 1..H,
  head+ffn combos, as prune encodings ready for the registry/bench.
* ``fusion_ab``: the TFLite fusion-test methodology (experiments.py:32-87
  FusionTestTransformer) re-expressed for XLA: the same op chain is timed
  fused (one jit body) vs unfused (jax.lax.optimization_barrier between
  stages, which forbids cross-stage fusion) — measuring what XLA fusion buys.
* ``quant_op_sweep``: op-size quantization sweeps (experiments.py:262-404
  quant_op_test): matmul shapes x {bf16, int8-dynamic} latency table.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence

import jax
import jax.numpy as jnp

from ..config import encode_prune_encoding
from .looptimer import measure_op_time

_HEADS = {"tiny": 3, "small": 6, "base": 12}
_MLP = {"tiny": 768, "small": 1536, "base": 3072}


def prune_benchmark_grid(size: str = "tiny", depth: int = 12) -> List[str]:
    """All prune encodings of the reference's PruneBenchmark grid."""
    h_full = _HEADS[size]
    grid: List[str] = []
    # 1) ffn-only: keep 90%..10%
    for keep in range(9, 0, -1):
        grid.append(f"all_head{h_full}_ffn0.{keep}")
    # 2) head-only
    for h in range(1, h_full + 1):
        grid.append(f"all_head{h}_ffn1.0")
    # 3) head+ffn combos (reference: tiny head2 x ffn 0.9/0.8/0.7, etc.)
    combo_heads = {"tiny": [2], "small": [4, 5], "base": [8]}[size]
    for h in combo_heads:
        for keep in (9, 8, 7, 6):
            grid.append(f"all_head{h}_ffn0.{keep}")
    return grid


# ---------------------------------------------------------------------------
# Fusion A/B
# ---------------------------------------------------------------------------


def _barrier(x):
    return jax.lax.optimization_barrier(x)


def fusion_test_transformer_stages(dim: int = 192, mlp: int = 768):
    """The decomposed FFN pipeline the reference uses to probe fusion:
    dense -> bias-add -> gelu -> dense -> bias-add -> residual-add -> LN."""
    k = jax.random.split(jax.random.key(0), 4)
    w1 = jax.random.normal(k[0], (dim, mlp)) * 0.05
    b1 = jnp.zeros((mlp,))
    w2 = jax.random.normal(k[1], (mlp, dim)) * 0.05
    b2 = jnp.zeros((dim,))
    g = jnp.ones((dim,))
    beta = jnp.zeros((dim,))

    def stages(x, barrier: bool):
        sep = _barrier if barrier else (lambda t: t)
        h = sep(x @ w1)
        h = sep(h + b1)
        h = sep(jax.nn.gelu(h, approximate=True))
        y = sep(h @ w2)
        y = sep(y + b2)
        y = sep(y + x)
        mean = y.mean(-1, keepdims=True)
        var = ((y - mean) ** 2).mean(-1, keepdims=True)
        return (y - mean) * jax.lax.rsqrt(var + 1e-5) * g + beta

    return stages


def fusion_ab(
    rows: int = 197, dim: int = 192, mlp: int = 768,
    iters: int = 100, repeats: int = 3,
) -> Dict[str, float]:
    """Measure the decomposed chain fused vs barrier-separated."""
    stages = fusion_test_transformer_stages(dim, mlp)
    x = jax.random.normal(jax.random.key(1), (rows, dim))
    fused = measure_op_time(lambda t: stages(t, False), (x,),
                            iters=iters, repeats=repeats, chain_arg=0)
    unfused = measure_op_time(lambda t: stages(t, True), (x,),
                              iters=iters, repeats=repeats, chain_arg=0)
    return {
        "fused_ms": fused["p50_ms"],
        "unfused_ms": unfused["p50_ms"],
        "fusion_speedup": (unfused["p50_ms"] / fused["p50_ms"])
        if fused["p50_ms"] else float("nan"),
    }


# ---------------------------------------------------------------------------
# Quantized-op sweep
# ---------------------------------------------------------------------------


def quant_op_sweep(
    sizes: Sequence[int] = (256, 512, 1024, 2048),
    iters: int = 50, repeats: int = 3,
) -> List[Dict]:
    """Matmul latency per square size: bf16 vs dynamic-int8 (runtime per-row
    act quant) vs static-int8 (calibrated scale — isolates the dynamic
    overhead that makes int8 lose at small sizes)."""
    from ..ops.quant import (
        int8_matmul_dynamic,
        int8_matmul_static,
        quantize_weight_int8,
    )

    out = []
    for n in sizes:
        x = jax.random.normal(jax.random.key(0), (n, n), jnp.bfloat16)
        w = jax.random.normal(jax.random.key(1), (n, n), jnp.bfloat16)
        wq, ws = quantize_weight_int8(w.astype(jnp.float32))
        act_s = float(jnp.max(jnp.abs(x)) / 127.0)
        comb = (ws * act_s).astype(jnp.float32)
        r_bf16 = measure_op_time(lambda a, b: a @ b, (x, w),
                                 iters=iters, repeats=repeats, chain_arg=0)
        r_int8 = measure_op_time(
            lambda a, q, s: int8_matmul_dynamic(a, q, s), (x, wq, ws),
            iters=iters, repeats=repeats, chain_arg=0)
        r_stat = measure_op_time(
            lambda a, q, c: int8_matmul_static(a, q, c, act_s), (x, wq, comb),
            iters=iters, repeats=repeats, chain_arg=0)
        out.append({
            "size": n,
            "bf16_ms": r_bf16["p50_ms"],
            "int8_dynamic_ms": r_int8["p50_ms"],
            "int8_static_ms": r_stat["p50_ms"],
        })
    return out


# ---------------------------------------------------------------------------
# Micro models (reference utils.py:322-406: get_attention/ffn/dense_plus_input)
# ---------------------------------------------------------------------------


def micro_attention(dim: int = 192, heads: int = 3, n_tokens: int = 197,
                    batch: int = 1, dtype=jnp.float32):
    """Attention-only micro model: (fn, (params-like args…)).  The reference
    exports these as standalone tflite/onnx models to benchmark the op in
    isolation; here they are jittable closures fed to the loop-delta timer."""
    from ..ops.attention import attention_xla

    hd = dim // heads
    k = jax.random.split(jax.random.key(0), 3)
    x = jax.random.normal(k[0], (batch, n_tokens, dim), dtype)
    w_qkv = (jax.random.normal(k[1], (dim, 3 * dim)) * 0.05).astype(dtype)
    w_out = (jax.random.normal(k[2], (dim, dim)) * 0.05).astype(dtype)

    def fn(x, w_qkv, w_out):
        return attention_xla(x, w_qkv, None, w_out, None, heads, hd)

    return fn, (x, w_qkv, w_out)


def micro_ffn(dim: int = 192, hidden: int = 768, n_tokens: int = 197,
              batch: int = 1, dtype=jnp.float32):
    from ..ops.activations import gelu_tanh
    from ..ops.layers import mlp_block

    k = jax.random.split(jax.random.key(1), 3)
    x = jax.random.normal(k[0], (batch, n_tokens, dim), dtype)
    w1 = (jax.random.normal(k[1], (dim, hidden)) * 0.05).astype(dtype)
    w2 = (jax.random.normal(k[2], (hidden, dim)) * 0.05).astype(dtype)

    def fn(x, w1, w2):
        return mlp_block(x, w1, None, w2, None, gelu_tanh)

    return fn, (x, w1, w2)


def micro_dense_plus_input(dim_in: int = 192, dim_out: int = 192,
                           n_tokens: int = 197, batch: int = 1,
                           dtype=jnp.float32):
    """Dense + residual add (the reference's dense_plus_input fusion probe)."""
    k = jax.random.split(jax.random.key(2), 2)
    x = jax.random.normal(k[0], (batch, n_tokens, dim_in), dtype)
    w = (jax.random.normal(k[1], (dim_in, dim_out)) * 0.05).astype(dtype)

    def fn(x, w):
        return x @ w + (x if dim_in == dim_out else 0.0)

    return fn, (x, w)


def bench_micro_models(dim: int = 192, heads: int = 3, batch: int = 1,
                       iters: int = 100, repeats: int = 3) -> Dict[str, float]:
    """Benchmark the three micro models (op-isolation methodology)."""
    out = {}
    for name, (fn, args) in {
        "attention": micro_attention(dim, heads, batch=batch),
        "ffn": micro_ffn(dim, dim * 4, batch=batch),
        "dense_plus_input": micro_dense_plus_input(dim, dim, batch=batch),
    }.items():
        r = measure_op_time(fn, args, iters=iters, repeats=repeats, chain_arg=0)
        out[name] = r["p50_ms"]
    return out
