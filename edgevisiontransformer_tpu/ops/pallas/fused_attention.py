"""Fused multi-head self-attention Pallas kernel.

Replaces the reference's einsum attention chain
(/root/reference/modeling/layers/attention.py:23-36) for the hot path: one
kernel per (batch*head) computes scores, a numerically-stable softmax and the
PV product entirely in VMEM — the [n, n] score matrix never touches HBM
(XLA's default lowering materializes it between the two dots).

Shape regime: ViT sequences are tiny and static (197 tokens DeiT, 49/window
Swin, ≤3136 T2T — SURVEY.md §5.7), so no KV-blocking/flash streaming is
needed: a whole head's [n_pad, n_pad] fp32 score block fits VMEM easily
(256·256·4 = 256 KB).  Sequence is padded to a lane/sublane-friendly multiple
and padded keys are masked with -inf before the softmax.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import round_up, use_interpret


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, seq_len: int, scale: float):
    q = q_ref[0]  # [n_pad, d]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [n_pad, n_pad]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < seq_len, s, -1e30)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def sdpa(q: jax.Array, k: jax.Array, v: jax.Array, scale: Optional[float] = None):
    """Scaled dot-product attention [b, h, n, d] -> [b, h, n, d] (Pallas)."""
    b, h, n, d = q.shape
    if scale is None:
        scale = d**-0.5
    n_pad = round_up(n, 128)
    pad = [(0, 0), (0, 0), (0, n_pad - n), (0, 0)]
    qp = jnp.pad(q, pad).reshape(b * h, n_pad, d)
    kp = jnp.pad(k, pad).reshape(b * h, n_pad, d)
    vp = jnp.pad(v, pad).reshape(b * h, n_pad, d)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, seq_len=n, scale=scale),
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, n_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, n_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, n_pad, d), q.dtype),
        interpret=use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * (n_pad * n_pad * d * 2),
            bytes_accessed=4 * b * h * n_pad * d * q.dtype.itemsize,
            transcendentals=b * h * n_pad * n_pad,
        ),
    )(qp, kp, vp)
    return out.reshape(b, h, n_pad, d)[:, :, :n, :]


def attention(
    x: jax.Array,
    w_qkv: jax.Array,
    b_qkv: Optional[jax.Array],
    w_out: jax.Array,
    b_out: Optional[jax.Array],
    heads: int,
    head_dim: int,
) -> jax.Array:
    """Full attention block with Pallas SDPA core.

    The qkv / output projections stay as XLA matmuls (they fuse with
    neighbors and hit the MXU at full shape); the softmax chain runs in the
    Pallas kernel.
    """
    from ..attention import merge_heads, qkv_split

    qkv = x @ w_qkv
    if b_qkv is not None:
        qkv = qkv + b_qkv
    q, k, v = qkv_split(qkv, heads, head_dim)
    out = sdpa(q, k, v, scale=head_dim**-0.5)
    out = merge_heads(out)
    out = out @ w_out
    if b_out is not None:
        out = out + b_out
    return out
