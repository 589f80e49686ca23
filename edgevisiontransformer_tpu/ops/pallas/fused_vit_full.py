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
from .fused_encoder import _attention_rows, _ln, stack_vit_layer_params
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

    # shared helper: exp2 + deferred normalization + max-free softmax — the
    # measured VPU-wall fixes land in every encoder copy at once
    att = _attention_rows(qkv, bm=bm, n_pad=n_pad, heads=heads,
                          head_dim=head_dim, key_mask=key_mask, scale=scale,
                          dtype=dtype)

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


# ---------------------------------------------------------------------------
# Pipelined whole-model variant: ONE program (no per-layer grid steps) whose
# four per-layer matmul weights double-buffer HBM->VMEM against compute, as
# in fused_encoder._encoder_kernel_pipelined, with the patch-embed matmul as
# prologue and final-LN + cls head as epilogue.
#
# MEASURED (v5e, round 2): slightly SLOWER than patch-embed/head in XLA
# around the pipelined encoder kernel (tiny b1 62 vs 58 us, small b1 109 vs
# 105, tiny b128 4.94 vs 4.61 ms) — in-program XLA glue is much cheaper than
# its standalone-measured cost (fusion + no extra dispatch), while the
# in-kernel prologue serializes ahead of layer 0.  Kept as the single-call
# deployment form (one program, zero out-of-kernel ops); fused_vit_apply
# remains the latency-optimal default.
# ---------------------------------------------------------------------------


def _full_kernel_pipelined(
    patches_ref,              # [bm*n_pad, p*p*c] VMEM (token 0 rows zero)
    patch_w_ref, embed_b_ref,  # VMEM resident
    ln1_g, ln1_b, qkv_b, out_b, ln2_g, ln2_b, fc1_b, fc2_b,  # VMEM [L, 1, d]
    fnorm_g, fnorm_b, head_w_ref, head_b_ref,                # VMEM resident
    qkv_w_hbm, out_w_hbm, fc1_w_hbm, fc2_w_hbm,              # ANY [L, in, out]
    o_ref,                    # [bm, C_pad]
    qkv_buf, out_buf, fc1_buf, fc2_buf,                      # VMEM [2, in, out]
    sems,                                                    # DMA sems [2, 4]
    *,
    depth: int,
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
    unroll: bool,
):
    pairs = (
        (qkv_w_hbm, qkv_buf),
        (out_w_hbm, out_buf),
        (fc1_w_hbm, fc1_buf),
        (fc2_w_hbm, fc2_buf),
    )

    def copies(li, slot):
        return [
            pltpu.make_async_copy(hbm.at[li], buf.at[slot], sems.at[slot, t])
            for t, (hbm, buf) in enumerate(pairs)
        ]

    for dma in copies(0, 0):
        dma.start()

    dtype = o_ref.dtype
    dim = patch_w_ref.shape[1]

    # prologue: patch embed + (cls|pos|patch) bias, overlapped with the
    # layer-0 weight DMA
    emb = jax.lax.dot(patches_ref[:], patch_w_ref[:],
                      preferred_element_type=jnp.float32)
    eb = embed_b_ref[:].astype(jnp.float32)
    x = (emb.reshape(bm, n_pad, dim) + eb[None]).reshape(bm * n_pad, dim)
    x = x.astype(dtype)

    col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
    key_mask = col < seq_len

    def layer(li, slot, x):
        h = _ln(x, ln1_g[li], ln1_b[li], eps).astype(dtype)
        qkv = (
            jax.lax.dot(h, qkv_buf[slot], preferred_element_type=jnp.float32)
            .astype(dtype)
            + qkv_b[li]
        )
        att = _attention_rows(qkv, bm=bm, n_pad=n_pad, heads=heads,
                              head_dim=head_dim, key_mask=key_mask,
                              scale=scale, dtype=dtype)
        attn_out = (
            jax.lax.dot(att, out_buf[slot], preferred_element_type=jnp.float32)[:, :dim]
            + out_b[li].astype(jnp.float32)
        )
        x = (attn_out + (h if reference_residual else x).astype(jnp.float32)).astype(dtype)

        h2 = _ln(x, ln2_g[li], ln2_b[li], eps).astype(dtype)
        hid = (
            jax.lax.dot(h2, fc1_buf[slot], preferred_element_type=jnp.float32)
            .astype(dtype)
            + fc1_b[li]
        )
        hid = gelu_kernel(hid, approx_gelu).astype(dtype)
        mlp_out = (
            jax.lax.dot(hid, fc2_buf[slot], preferred_element_type=jnp.float32)[:, :dim]
            + fc2_b[li].astype(jnp.float32)
        )
        return (mlp_out + (h2 if reference_residual else x).astype(jnp.float32)).astype(dtype)

    if unroll:
        for li in range(depth):
            slot = li % 2
            if li + 1 < depth:
                for dma in copies(li + 1, 1 - slot):
                    dma.start()
            for dma in copies(li, slot):
                dma.wait()
            x = layer(li, slot, x)
    else:
        def body(li, x):
            slot = jax.lax.rem(li, 2)

            @pl.when(li + 1 < depth)
            def _():
                for dma in copies(li + 1, 1 - slot):
                    dma.start()

            for dma in copies(li, slot):
                dma.wait()
            return layer(li, slot, x)

        x = jax.lax.fori_loop(0, depth, body, x)

    # epilogue: cls rows -> final LN -> classifier (rows padded to the
    # 8-sublane output block)
    bm8 = o_ref.shape[0]
    cls = jnp.concatenate(
        [x[j * n_pad:j * n_pad + 1, :] for j in range(bm)]
        + [x[:1, :]] * (bm8 - bm), axis=0)
    if final_norm:
        cls = _ln(cls, fnorm_g[0], fnorm_b[0], eps).astype(dtype)
    logits = jax.lax.dot(cls, head_w_ref[:],
                         preferred_element_type=jnp.float32) \
        + head_b_ref[0].astype(jnp.float32)
    o_ref[:] = logits.astype(o_ref.dtype)


def vit_full_forward_pipelined(
    patches: jax.Array,   # [b, n_patches, p*p*c]
    stacked: dict,
    patch_w: jax.Array,
    embed_bias: jax.Array,
    fnorm_g: jax.Array, fnorm_b: jax.Array,
    head_w: jax.Array, head_b: jax.Array,
    *,
    heads: int,
    head_dim: int,
    eps: float,
    reference_residual: bool,
    approx_gelu: bool,
    final_norm: bool,
    batch_block: int | None = None,
    n_pad_multiple: int = 8,
    unroll: bool | None = None,
) -> jax.Array:
    """Whole model as ONE double-buffered-DMA program (see
    _full_kernel_pipelined).  Same contract as vit_full_forward."""
    from .common import default_batch_block

    b, n_patches, pin = patches.shape
    n = n_patches + 1
    dim = patch_w.shape[1]
    depth = stacked["qkv_w"].shape[0]
    inner = stacked["qkv_w"].shape[2]
    mlp = stacked["fc1_w"].shape[2]
    ncls = head_w.shape[1]
    n_pad = round_up(n, n_pad_multiple)
    c_pad = round_up(ncls, 128)

    bm = batch_block if batch_block is not None else default_batch_block(dim)
    bm = min(bm, b)
    b_pad = round_up(b, bm)
    # output block rows must be 8-aligned unless the block IS the array
    bm8 = bm if bm == b_pad else round_up(bm, 8)
    if unroll is None:
        unroll = depth * heads * bm <= 96

    pz = jnp.zeros((b, 1, pin), patches.dtype)
    rows = jnp.concatenate([pz, patches], axis=1)
    rows = jnp.pad(rows, ((0, b_pad - b), (0, n_pad - n), (0, 0)))
    rows = rows.reshape(b_pad * n_pad, pin)

    eb = jnp.pad(embed_bias, ((0, n_pad - n), (0, 0)))
    hw = jnp.pad(head_w, ((0, 0), (0, c_pad - ncls)))
    hb = jnp.pad(head_b, ((0, c_pad - ncls),)).reshape(1, c_pad)

    def pad_lane(a, m=128):
        pad = (-a.shape[-1]) % m
        if pad == 0:
            return a
        return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])

    inner_p = round_up(inner, 128)
    mlp_p = round_up(mlp, 128)
    dim_p = round_up(dim, 128)
    qkv_w = pad_lane(stacked["qkv_w"])
    qkv_b = pad_lane(stacked["qkv_b"])
    out_w = pad_lane(stacked["out_w"])
    fc1_w = pad_lane(stacked["fc1_w"])
    fc1_b = pad_lane(stacked["fc1_b"])
    fc2_w = jnp.pad(
        stacked["fc2_w"],
        ((0, 0), (0, mlp_p - mlp), (0, dim_p - dim)),
    )

    kernel = functools.partial(
        _full_kernel_pipelined,
        depth=depth, bm=bm, n_pad=n_pad, heads=heads, head_dim=head_dim,
        seq_len=n, eps=eps, scale=head_dim**-0.5,
        reference_residual=reference_residual, approx_gelu=approx_gelu,
        final_norm=final_norm, unroll=unroll,
    )

    itemsize = jnp.dtype(patches.dtype).itemsize
    wbytes2 = 2 * (dim * inner_p + heads * head_dim * dim_p + dim * mlp_p
                   + mlp_p * dim_p) * itemsize
    vmem_limit = min(100 * 1024 * 1024, wbytes2 + 24 * 1024 * 1024)

    vres = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = lambda: pl.BlockSpec(memory_space=pl.ANY)

    flops = depth * b_pad * 2 * n_pad * (
        dim * inner + 2 * n_pad * head_dim * heads + head_dim * heads * dim
        + 2 * dim * mlp
    ) + b_pad * 2 * n_pad * pin * dim + b_pad * 2 * dim * ncls
    out = pl.pallas_call(
        kernel,
        grid=(b_pad // bm,),
        in_specs=[
            pl.BlockSpec((bm * n_pad, pin), lambda bi: (bi, 0),
                         memory_space=pltpu.VMEM),
        ] + [vres()] * 14 + [hbm()] * 4,
        out_specs=pl.BlockSpec((bm8, c_pad), lambda bi: (bi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(((b_pad // bm) * bm8, c_pad),
                                       patches.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, dim, inner_p), patches.dtype),
            pltpu.VMEM((2, heads * head_dim, dim_p), patches.dtype),
            pltpu.VMEM((2, dim, mlp_p), patches.dtype),
            pltpu.VMEM((2, mlp_p, dim_p), patches.dtype),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
        interpret=use_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=int(
                depth * (dim * inner + heads * head_dim * dim + 2 * dim * mlp)
                * itemsize * (b_pad // bm)
            ),
            transcendentals=depth * b_pad * n_pad * (n_pad * heads + mlp),
        ),
    )(
        rows,
        patch_w, eb,
        stacked["ln1_g"], stacked["ln1_b"], qkv_b, stacked["out_b"],
        stacked["ln2_g"], stacked["ln2_b"], fc1_b, stacked["fc2_b"],
        fnorm_g.reshape(1, -1), fnorm_b.reshape(1, -1), hw, hb,
        qkv_w, out_w, fc1_w, fc2_w,
    )
    out = out.reshape(b_pad // bm, bm8, c_pad)[:, :bm].reshape(b_pad, c_pad)
    return out[:b, :ncls]
