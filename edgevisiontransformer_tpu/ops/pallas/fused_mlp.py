"""Fused GELU-MLP Pallas kernel: gelu(x @ w1 + b1) @ w2 + b2 in one pass.

Replaces the reference FFN (/root/reference/modeling/layers/ffn.py:5-12).
Both weight matrices stay VMEM-resident across the whole kernel; the hidden
activation [bm, mlp_dim] never round-trips to HBM.  Token rows are tiled on
the grid so arbitrary batch*seq sizes stream through while weights are
re-used from VMEM (weight-stationary).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import round_up, use_interpret
from .mathlib import gelu_kernel


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, approx: bool):
    x = x_ref[:]
    h = jax.lax.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[:].astype(jnp.float32)
    h = gelu_kernel(h, approx)
    o = jax.lax.dot(h.astype(x.dtype), w2_ref[:], preferred_element_type=jnp.float32)
    o = o + b2_ref[:].astype(jnp.float32)
    o_ref[:] = o.astype(o_ref.dtype)


def mlp(
    x: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    *,
    approx_gelu: bool = False,
    block_rows: int = 256,
) -> jax.Array:
    """x: [..., dim] -> [..., dim]; w1: [dim, hidden], w2: [hidden, dim]."""
    orig_shape = x.shape
    dim = orig_shape[-1]
    hidden = w1.shape[1]
    rows = 1
    for s in orig_shape[:-1]:
        rows *= s
    x2 = x.reshape(rows, dim)

    bm = min(block_rows, round_up(rows, 8))
    rows_pad = round_up(rows, bm)
    if rows_pad != rows:
        x2 = jnp.pad(x2, ((0, rows_pad - rows), (0, 0)))

    b1r = b1.reshape(1, hidden)
    b2r = b2.reshape(1, dim)

    out = pl.pallas_call(
        functools.partial(_mlp_kernel, approx=approx_gelu),
        grid=(rows_pad // bm,),
        in_specs=[
            pl.BlockSpec((bm, dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad, dim), x.dtype),
        interpret=use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows_pad * dim * hidden * 2,
            bytes_accessed=(rows_pad * dim * 2 + dim * hidden * 2) * x.dtype.itemsize,
            transcendentals=rows_pad * hidden,
        ),
    )(x2, w1, b1r, w2, b2r)
    return out[:rows].reshape(orig_shape)
