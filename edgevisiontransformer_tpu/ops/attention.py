"""Multi-head attention math as pure functions.

The XLA path expresses the reference semantics
(/root/reference/modeling/layers/attention.py:23-36: fused QKV matmul, split
to [b, h, n, d], scaled logits, softmax, PV, merge heads, output projection)
in plain jnp so XLA fuses it; the Pallas path (ops/pallas/fused_attention.py)
is a drop-in replacement validated against this one.

All shapes are static; head count / head_dim may differ per layer for pruned
models (reference transformer_encoder.py:24-36 fixes head_size=64 after
pruning — we keep head_dim explicit for the same reason).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def qkv_split(qkv: jax.Array, heads: int, head_dim: int):
    """Split a fused-QKV activation [b, n, 3*h*d] into q, k, v of [b, h, n, d].

    Matches the reference layout Rearrange('b n (qkv h d) -> qkv b h n d')
    (attention.py:20): the fused axis is ordered (qkv, heads, head_dim).
    """
    b, n, _ = qkv.shape
    qkv = qkv.reshape(b, n, 3, heads, head_dim)
    qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4))
    return qkv[0], qkv[1], qkv[2]


def sdpa(q: jax.Array, k: jax.Array, v: jax.Array, scale: Optional[float] = None):
    """Scaled dot-product attention over [b, h, n, d] operands."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    dots = jnp.einsum("bhid,bhjd->bhij", q, k) * scale
    attn = jax.nn.softmax(dots.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhij,bhjd->bhid", attn, v)


def merge_heads(x: jax.Array) -> jax.Array:
    """[b, h, n, d] -> [b, n, h*d] (reference rearrange_out, attention.py:21)."""
    b, h, n, d = x.shape
    return jnp.transpose(x, (0, 2, 1, 3)).reshape(b, n, h * d)


def attention_xla(
    x: jax.Array,
    w_qkv: jax.Array,
    b_qkv: Optional[jax.Array],
    w_out: jax.Array,
    b_out: Optional[jax.Array],
    heads: int,
    head_dim: int,
) -> jax.Array:
    """Full attention block: x [b,n,dim] -> [b,n,dim].

    w_qkv: [dim, 3*heads*head_dim] fused projection; w_out: [heads*head_dim, dim].
    """
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
