"""Fused Swin window-attention Pallas kernel.

One program handles a block of windows: for each window and head, scores +
relative-position bias + (optional) shift mask + softmax + PV run entirely in
VMEM.  The XLA path materializes [B*nW, heads, 49, 49] attention tensors in
HBM between the two batched matmuls; here they never leave VMEM.

Shapes: windows are tiny (w*w = 49 tokens, padded to 56 sublanes), so like
the ViT encoder kernel this is a latency/fusion play, not an MXU-utilization
play (head_dim 32 underfills the 128-contraction).  The window partition /
cyclic roll stay in XLA (pure relayouts, fused into neighbors).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import round_up, use_interpret


def _win_attn_kernel(
    *refs,
    wb: int,
    heads: int,
    head_dim: int,
    seq_len: int,
    scale: float,
    has_mask: bool,
):
    if has_mask:
        qkv_ref, bias_ref, mask_ref, o_ref = refs
    else:
        qkv_ref, bias_ref, o_ref = refs
        mask_ref = None
    hd = head_dim
    n_pad = qkv_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
    key_ok = col < seq_len
    for j in range(wb):
        qkv = qkv_ref[j]
        outs = []
        for i in range(heads):
            q = qkv[:, (0 * heads + i) * hd:(0 * heads + i + 1) * hd]
            k = qkv[:, (1 * heads + i) * hd:(1 * heads + i + 1) * hd]
            v = qkv[:, (2 * heads + i) * hd:(2 * heads + i + 1) * hd]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale
            s = s + bias_ref[i].astype(jnp.float32)
            if mask_ref is not None:
                s = s + mask_ref[j].astype(jnp.float32)
            s = jnp.where(key_ok, s, -1e30)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            outs.append(
                jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
            )
        o_ref[j] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def window_sdpa(
    qkv: jax.Array,      # [nW, n, 3*heads*hd] fused-qkv per window
    bias: jax.Array,     # [heads, n, n] relative position bias
    mask: jax.Array | None,  # [nW_mask, n, n] additive mask (None => zeros)
    heads: int,
    head_dim: int,
    window_block: int = 8,
) -> jax.Array:
    """Windowed attention core: returns [nW, n, heads*hd]."""
    nW, n, inner3 = qkv.shape
    n_pad = round_up(n, 8)
    wb = min(window_block, nW)
    nW_pad = round_up(nW, wb)

    qkv_p = jnp.pad(qkv, ((0, nW_pad - nW), (0, n_pad - n), (0, 0)))
    bias_p = jnp.pad(bias, ((0, 0), (0, n_pad - n), (0, n_pad - n)))

    in_specs = [
        pl.BlockSpec((wb, n_pad, 3 * heads * head_dim),
                     lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((heads, n_pad, n_pad), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [qkv_p, bias_p]
    if mask is not None:
        reps = nW // mask.shape[0]
        mask_full = jnp.tile(mask, (reps, 1, 1))
        mask_full = jnp.pad(
            mask_full, ((0, nW_pad - nW), (0, n_pad - n), (0, n_pad - n))
        ).astype(qkv.dtype)
        in_specs.append(
            pl.BlockSpec((wb, n_pad, n_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM))
        operands.append(mask_full)

    out = pl.pallas_call(
        functools.partial(
            _win_attn_kernel,
            wb=wb,
            heads=heads,
            head_dim=head_dim,
            seq_len=n,
            scale=head_dim**-0.5,
            has_mask=mask is not None,
        ),
        grid=(nW_pad // wb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (wb, n_pad, heads * head_dim), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nW_pad, n_pad, heads * head_dim), qkv.dtype),
        interpret=use_interpret(),
    )(*operands)
    return out[:nW, :n, :]
