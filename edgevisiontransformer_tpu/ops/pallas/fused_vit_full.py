"""Whole-MODEL fused Pallas kernel: patch-embed -> encoder -> head in one call.

Extends the whole-encoder kernel (fused_encoder.py): grid step (bi, 0) also
performs the patch-embedding matmul + cls/pos add, and step (bi, L-1)
finishes with the final LayerNorm, cls-token extraction and the classifier
matmul — so a batch-1 DeiT forward is a single pallas_call with zero
out-of-kernel ops (the patch rearrange of the input image is a pure XLA
relayout).

Weights added to the per-layer stream: patch kernel [768, dim], an
"embed bias" [n_pad, dim] precomputed as (cls+pos) on row 0 and
(pos + patch_bias) elsewhere, head kernel [dim, C_pad] and bias.  They use
constant index maps, so Mosaic keeps them VMEM-resident across the grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import round_up, use_interpret
from .fused_encoder import _ln, stack_vit_layer_params
from .mathlib import gelu_kernel


def _full_kernel(
    patches_ref,  # [bm*n_pad, p*p*c]
    patch_w_ref,  # [p*p*c, dim]
    embed_b_ref,  # [n_pad, dim]
    ln1_g_ref, ln1_b_ref, qkv_w_ref, qkv_b_ref, out_w_ref, out_b_ref,
    ln2_g_ref, ln2_b_ref, fc1_w_ref, fc1_b_ref, fc2_w_ref, fc2_b_ref,
    fnorm_g_ref, fnorm_b_ref, head_w_ref, head_b_ref,
    o_ref,        # [bm, C_pad]
    x_scratch,    # [bm*n_pad, dim]
    *,
    bm: int,
    n_pad: int,
    heads: int,
    head_dim: int,
    seq_len: int,
    eps: float,
    scale: float,
    reference_residual: bool,
    approx_gelu: bool,
    final_norm: bool,
):
    li = pl.program_id(1)

    @pl.when(li == 0)
    def _():
        # patch embedding: rows are (image-local) tokens; row 0 of each image
        # has zero patches so x[0] = embed_bias[0] = cls + pos[0]
        emb = jax.lax.dot(
            patches_ref[:], patch_w_ref[:], preferred_element_type=jnp.float32
        )
        eb = embed_b_ref[:].astype(jnp.float32)
        for j in range(bm):
            r0 = j * n_pad
            x_scratch[r0:r0 + n_pad, :] = (
                emb[r0:r0 + n_pad, :] + eb
            ).astype(x_scratch.dtype)

    x = x_scratch[:]
    dtype = x.dtype

    h = _ln(x, ln1_g_ref[0], ln1_b_ref[0], eps).astype(dtype)
    qkv = (
        jax.lax.dot(h, qkv_w_ref[0], preferred_element_type=jnp.float32)
        .astype(dtype)
        + qkv_b_ref[0]
    )

    col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
    key_mask = col < seq_len

    hd = head_dim
    att_rows = []
    for j in range(bm):
        row0 = j * n_pad
        parts = []
        for i in range(heads):
            q = qkv[row0:row0 + n_pad, (0 * heads + i) * hd:(0 * heads + i + 1) * hd]
            k = qkv[row0:row0 + n_pad, (1 * heads + i) * hd:(1 * heads + i + 1) * hd]
            v = qkv[row0:row0 + n_pad, (2 * heads + i) * hd:(2 * heads + i + 1) * hd]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale
            s = jnp.where(key_mask, s, -1e30)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            parts.append(
                jax.lax.dot(p.astype(dtype), v, preferred_element_type=jnp.float32)
            )
        att_rows.append(jnp.concatenate(parts, axis=-1))
    att = jnp.concatenate(att_rows, axis=0).astype(dtype)

    attn_out = (
        jax.lax.dot(att, out_w_ref[0], preferred_element_type=jnp.float32)
        + out_b_ref[0].astype(jnp.float32)
    )
    x = (attn_out + (h if reference_residual else x).astype(jnp.float32)).astype(dtype)

    h2 = _ln(x, ln2_g_ref[0], ln2_b_ref[0], eps).astype(dtype)
    hid = (
        jax.lax.dot(h2, fc1_w_ref[0], preferred_element_type=jnp.float32)
        .astype(dtype)
        + fc1_b_ref[0]
    )
    hid = gelu_kernel(hid, approx_gelu).astype(dtype)
    mlp_out = (
        jax.lax.dot(hid, fc2_w_ref[0], preferred_element_type=jnp.float32)
        + fc2_b_ref[0].astype(jnp.float32)
    )
    x = (mlp_out + (h2 if reference_residual else x).astype(jnp.float32)).astype(dtype)

    x_scratch[:] = x

    @pl.when(li == pl.num_programs(1) - 1)
    def _():
        # final LN + cls-row head for each image in the block
        xf = x
        if final_norm:
            xf = _ln(x, fnorm_g_ref[:], fnorm_b_ref[:], eps).astype(dtype)
        for j in range(bm):
            cls_row = xf[j * n_pad:j * n_pad + 8, :]  # sublane-aligned slab
            logits = jax.lax.dot(
                cls_row, head_w_ref[:], preferred_element_type=jnp.float32
            ) + head_b_ref[:].astype(jnp.float32)
            o_ref[j * 8:(j + 1) * 8, :] = logits.astype(o_ref.dtype)


def vit_full_forward(
    patches: jax.Array,   # [b, n_patches, p*p*c]
    stacked: dict,        # encoder weights (stack_vit_layer_params)
    patch_w: jax.Array,   # [p*p*c, dim]
    embed_bias: jax.Array,  # [n_tokens, dim]  (row0 = cls+pos0; else pos+patch_b)
    fnorm_g: jax.Array, fnorm_b: jax.Array,    # [dim] (ignored if !final_norm)
    head_w: jax.Array, head_b: jax.Array,      # [dim, C], [C]
    *,
    heads: int,
    head_dim: int,
    eps: float,
    reference_residual: bool,
    approx_gelu: bool,
    final_norm: bool,
    batch_block: int | None = None,
) -> jax.Array:
    b, n_patches, pin = patches.shape
    n = n_patches + 1
    dim = patch_w.shape[1]
    depth = stacked["qkv_w"].shape[0]
    inner = stacked["qkv_w"].shape[2]
    mlp = stacked["fc1_w"].shape[2]
    ncls = head_w.shape[1]
    n_pad = round_up(n, 128)
    c_pad = round_up(ncls, 128)

    bm = batch_block if batch_block is not None else max(1, (8 * 192 * 192) // (dim * dim))
    bm = min(bm, b)
    b_pad = round_up(b, bm)

    # rows: token 0 gets zero patches (cls); tokens 1..n get image patches
    pz = jnp.zeros((b, 1, pin), patches.dtype)
    rows = jnp.concatenate([pz, patches], axis=1)
    rows = jnp.pad(rows, ((0, b_pad - b), (0, n_pad - n), (0, 0)))
    rows = rows.reshape(b_pad * n_pad, pin)

    eb = jnp.pad(embed_bias, ((0, n_pad - n), (0, 0)))
    hw = jnp.pad(head_w, ((0, 0), (0, c_pad - ncls)))
    hb = jnp.pad(head_b, ((0, c_pad - ncls),)).reshape(1, c_pad)

    def wspec(shape):
        return pl.BlockSpec((1,) + shape, lambda bi, li: (li,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def cspec(shape):
        return pl.BlockSpec(shape, lambda bi, li: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _full_kernel,
        bm=bm, n_pad=n_pad, heads=heads, head_dim=head_dim, seq_len=n,
        eps=eps, scale=head_dim**-0.5,
        reference_residual=reference_residual, approx_gelu=approx_gelu,
        final_norm=final_norm,
    )

    out = pl.pallas_call(
        kernel,
        grid=(b_pad // bm, depth),
        in_specs=[
            pl.BlockSpec((bm * n_pad, pin), lambda bi, li: (bi, 0),
                         memory_space=pltpu.VMEM),
            cspec((pin, dim)),
            cspec((n_pad, dim)),
            wspec((1, dim)), wspec((1, dim)),
            wspec((dim, inner)), wspec((1, inner)),
            wspec((heads * head_dim, dim)), wspec((1, dim)),
            wspec((1, dim)), wspec((1, dim)),
            wspec((dim, mlp)), wspec((1, mlp)),
            wspec((mlp, dim)), wspec((1, dim)),
            cspec((1, dim)), cspec((1, dim)),
            cspec((dim, c_pad)), cspec((1, c_pad)),
        ],
        out_specs=pl.BlockSpec((bm * 8, c_pad), lambda bi, li: (bi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad * 8, c_pad), patches.dtype),
        scratch_shapes=[pltpu.VMEM((bm * n_pad, dim), patches.dtype)],
        interpret=use_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(100 * 1024 * 1024,
                                 24 * 1024 * 1024 * max(1, dim // 192)),
        ),
    )(
        rows, patch_w, eb,
        stacked["ln1_g"], stacked["ln1_b"],
        stacked["qkv_w"], stacked["qkv_b"],
        stacked["out_w"], stacked["out_b"],
        stacked["ln2_g"], stacked["ln2_b"],
        stacked["fc1_w"], stacked["fc1_b"],
        stacked["fc2_w"], stacked["fc2_b"],
        fnorm_g.reshape(1, dim), fnorm_b.reshape(1, dim),
        hw, hb,
    )
    # row j*8 holds image j's cls logits
    return out.reshape(b_pad, 8, c_pad)[:b, 0, :ncls]
