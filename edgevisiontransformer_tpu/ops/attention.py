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


def encoder_forward_xla(
    x: jax.Array,
    stacked: dict,
    *,
    heads: int,
    head_dim: int,
    eps: float,
    reference_residual: bool = False,
    approx_gelu: bool = False,
) -> jax.Array:
    """Plain-XLA encoder stack on the SAME stacked [L, ...] params the Pallas
    kernels consume (ops/pallas/fused_encoder.stack_vit_layer_params) —
    semantics of models/vit.EncoderBlock.

    Exists as (a) the measured comparator for the kernel variants and (b) a
    dispatch target for regimes where XLA wins: at serving batches XLA reads
    each layer's weights ONCE for the whole batch, while the batch-blocked
    kernels re-stream them per grid program (bm-image block) — measured
    t2t_vit_7 (dim 256, mlp 2x) b32: XLA 2.06/2.14 ms vs streamed-kernel
    2.29/2.31 in two same-session A/Bs.
    """
    from .layers import layer_norm

    depth = stacked["qkv_w"].shape[0]
    dt = x.dtype
    for i in range(depth):
        h = layer_norm(x, stacked["ln1_g"][i, 0], stacked["ln1_b"][i, 0], eps)
        a = attention_xla(
            h, stacked["qkv_w"][i].astype(dt), stacked["qkv_b"][i, 0].astype(dt),
            stacked["out_w"][i].astype(dt), stacked["out_b"][i, 0].astype(dt),
            heads, head_dim,
        )
        x = a + (h if reference_residual else x)
        h = layer_norm(x, stacked["ln2_g"][i, 0], stacked["ln2_b"][i, 0], eps)
        m = h @ stacked["fc1_w"][i].astype(dt) + stacked["fc1_b"][i, 0].astype(dt)
        m = jax.nn.gelu(m, approximate=approx_gelu)
        m = m @ stacked["fc2_w"][i].astype(dt) + stacked["fc2_b"][i, 0].astype(dt)
        x = m + (h if reference_residual else x)
    return x
