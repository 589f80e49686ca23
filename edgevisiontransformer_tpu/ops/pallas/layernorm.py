"""Fused LayerNorm (+ optional residual add) Pallas kernel.

The reference profiler singles out LN (+ the decomposed GELU) as a large
share of mobile latency (analyse.py:78-133 "analyse_gelu_ln"); on TPU the
equivalent waste is extra HBM round-trips between the normalize, scale and
residual ops.  This kernel computes fp32 statistics, applies gamma/beta and
(optionally) adds the residual in one VMEM pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import round_up, use_interpret


def _ln_kernel(x_ref, g_ref, b_ref, o_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


def _ln_residual_kernel(x_ref, g_ref, b_ref, o_ref, r_ref, *, eps: float):
    """Writes both LN(x) and LN(x) (for reuse) — see layer_norm_residual."""
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)
    r_ref[:] = y.astype(r_ref.dtype)


def layer_norm(
    x: jax.Array, gamma: jax.Array, beta: jax.Array, eps: float,
    block_rows: int = 512,
) -> jax.Array:
    orig_shape = x.shape
    dim = orig_shape[-1]
    rows = x.size // dim
    x2 = x.reshape(rows, dim)
    bm = min(block_rows, round_up(rows, 8))
    rows_pad = round_up(rows, bm)
    if rows_pad != rows:
        x2 = jnp.pad(x2, ((0, rows_pad - rows), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(rows_pad // bm,),
        in_specs=[
            pl.BlockSpec((bm, dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad, dim), x.dtype),
        interpret=use_interpret(),
    )(x2, gamma.reshape(1, dim), beta.reshape(1, dim))
    return out[:rows].reshape(orig_shape)
