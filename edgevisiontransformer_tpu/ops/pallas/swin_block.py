"""Whole-SwinBlock fused Pallas kernel.

The Swin batch-1 forward is relayout/VPU-bound, not FLOP-bound: profiling
(round 2, v5e) showed a stage-0 block at 56 us in XLA, of which ~12 us is the
[nW, n, 3, H, hd] -> [3, nW, H, n, hd] qkv transpose relayout plus fusion
boundaries; the window partition / cyclic roll cost only 1-3 us each.

This kernel runs the ENTIRE block — LN1 -> fused-qkv -> per-window
relative-position-bias attention (+ shifted mask) -> proj -> residual -> LN2
-> GELU-MLP -> residual — as one pallas_call on *window-major* data
[B*nW, n, C].  Because LayerNorm/MLP/residual are per-token, the block
commutes with the window permutation P (roll + partition):
x' = P^-1(block_wm(P(x))) — only the cheap XLA P bracket stays outside
(models/swin.py fused_swin_apply).

Measured design decisions (v5e, stage-0 shapes):
* Per-head *batched* dot_general over [nW, n_pad, hd] — one MXU op per head
  — beats both an unrolled per-(window, head) loop (~0.17 us issue overhead
  each) and block-diagonal window packing (whose padded softmax doubles VPU
  traffic): qkv+sdpa 11.1 us vs 24 us unrolled, vs 15.2 us packed.
* exp2 with the log2(e) factor folded into the score scale and the bias
  pre-scaled (one VPU mul saved per element).
* Softmax normalization DEFERRED past the PV matmul: the divide shrinks from
  [n_pad, n_pad] to [n_pad, hd] (exact reciprocal — approx buys nothing
  measurable here and costs ~6e-3 logit drift).
* fp32 scores (bf16 softmax measured slower: conversion churn).

Capability parity: the reference has no Swin kernels at all (SURVEY.md §1 —
Swin is analytic-only there, flops_calculation.py:313-386); this replaces its
phone-side TFLite execution of window attention (analyse.py:14-18).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import SOFTMAX_CLAMP, round_up, softmax_unnorm, use_interpret
from .fused_encoder import _int8_mm_buf, _int8_mm_static
from .mathlib import gelu_kernel

_NEG = -1e30

# Block-diagonal window packing factor for the whole-stage kernel: P
# consecutive windows of one image share one [P*n_pad, P*n_pad] attention
# (off-diagonal blocks masked to _NEG), trading 2x redundant score FLOPs
# for P-fold fewer batched matmuls (per-matmul issue overhead) and fuller
# score lanes (56 -> 112 of 128 at stage 0).  r2 measured it NEGATIVE at
# b1 (2x padded softmax VPU traffic: softmax was the wall); the r4 nomax
# softmax changed that wall, so the b32 claim must be MEASURED, not
# computed (VERDICT r4 directive #3) — tools/probe_swin_pack.py sets this
# to 2/4 for the interleaved A/B.  1 = production default.
_PACK = 1
_LOG2E = 1.4426950408889634

# Diagnostic-only compile-time ablation for the whole-stage kernel's cost
# attribution (tools/probe_swin_ablate.py): None (production) | "nosoftmax"
# (scores pass through exp-less: attributes the padded-lane VPU softmax) |
# "noattn" (per-head sdpa loop skipped) | "nomlp".  Read at TRACE time, so
# the default path carries zero runtime cost; never set outside probes.
_ABLATE = None

# Max-free softmax: the normalization is already deferred (divide by r
# after PV), so subtracting the row max is mathematically a no-op — its
# only job is overflow safety, which a clamp provides: exp2(min(s, 120))
# stays finite in f32 (2^120 < 3.4e38) and r sums representably.  Skipping
# the max saves one lane-reduce + broadcast-subtract pass over the padded
# [*, n_pad] scores per head per block (the r4 ablation measured softmax
# at ~0.50 ms/stage at b32).  Scores are LN-bounded (O(+-30)); a >120
# score would dominate softmax anyway, so the clamp only ties pathological
# rows.  The r guard covers the all-underflow corner (r=0 -> div-by-0).
# Measured ON (tools/probe_swin_nomax.py, 3 interleaved rounds, b32 bests):
# stage0 2.17 vs 2.28 (+5.1%), stage1 1.05 vs 1.13 (+7.3%), stage2 1.59 vs
# 1.76 (+9.2%), stage3 0.37 vs 0.39 (+5.2%); whole-model b1 0.215 vs 0.224
# (+4.2%).  Output parity vs the max-subtracting form: 4.4e-3 max-rel in
# bf16 (rounding-level), argmax identical.  The shared dtype-aware
# implementation (fp16-safe fallback, clamp rationale) is
# common.softmax_unnorm; it is used by BOTH the whole-stage kernel and the
# per-block fallback kernels, so every Swin code path shares the measured
# softmax.
_SOFTMAX_NOMAX = True
_SOFTMAX_CLAMP = SOFTMAX_CLAMP


def _ln(x, g, b, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return (xf - mean) * jax.lax.rsqrt(var + eps) * g.astype(jnp.float32) + b.astype(
        jnp.float32
    )


def _swin_block_kernel(
    x_ref,
    ln1_g, ln1_b, qkv_w, qkv_b, proj_w, proj_b,
    ln2_g, ln2_b, fc1_w, fc1_b, fc2_w, fc2_b,
    bias_ref,        # [heads, n_pad, n_pad] fp32 rel-pos bias (pre-scaled by log2e)
    mask_ref,        # [gm, n_pad, n_pad] fp32 per-window shifted mask (log2e-scaled)
    o_ref,
    *,
    gm: int,          # windows per program
    n_pad: int,
    heads: int,
    head_dim: int,
    eps: float,
    scale: float,     # head_dim**-0.5 * log2(e)
    approx_gelu: bool,
    use_mask: bool,
):
    x = x_ref[:]  # [gm*n_pad, C]
    dtype = x.dtype
    hd = head_dim
    pn = n_pad

    # ---- attention sublayer ----
    h = _ln(x, ln1_g[0], ln1_b[0], eps).astype(dtype)
    qkv = (
        jax.lax.dot(h, qkv_w[:], preferred_element_type=jnp.float32)
        .astype(dtype)
        + qkv_b[0]
    )  # [gm*pn, 3*H*hd], fused axis ordered (qkv, head, hd)

    outs = []
    for i in range(heads):
        q = qkv[:, (0 * heads + i) * hd:(0 * heads + i + 1) * hd].reshape(gm, pn, hd)
        k = qkv[:, (1 * heads + i) * hd:(1 * heads + i + 1) * hd].reshape(gm, pn, hd)
        v = qkv[:, (2 * heads + i) * hd:(2 * heads + i + 1) * hd].reshape(gm, pn, hd)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        s = s * scale + bias_ref[i][None]
        if use_mask:
            s = s + mask_ref[:]
        p, r = softmax_unnorm(s, dtype, nomax=_SOFTMAX_NOMAX,
                              clamp=_SOFTMAX_CLAMP)
        o = jax.lax.dot_general(
            p.astype(dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o = o * pl.reciprocal(r, approx=False)
        outs.append(o.astype(dtype).reshape(gm * pn, hd))
    att = jnp.concatenate(outs, axis=-1)

    attn_out = (
        jax.lax.dot(att, proj_w[:], preferred_element_type=jnp.float32)
        + proj_b[0].astype(jnp.float32)
    )
    x = (attn_out + x.astype(jnp.float32)).astype(dtype)

    # ---- MLP sublayer ----
    h2 = _ln(x, ln2_g[0], ln2_b[0], eps).astype(dtype)
    hid = (
        jax.lax.dot(h2, fc1_w[:], preferred_element_type=jnp.float32)
        .astype(dtype)
        + fc1_b[0]
    )
    hid = gelu_kernel(hid, approx_gelu).astype(dtype)
    mlp_out = (
        jax.lax.dot(hid, fc2_w[:], preferred_element_type=jnp.float32)
        + fc2_b[0].astype(jnp.float32)
    )
    o_ref[:] = (mlp_out + x.astype(jnp.float32)).astype(dtype)


def _swin_block_kernel_blocked(
    x_ref,
    ln1_g, ln1_b, qkv_w, qkv_b, proj_w, proj_b,
    ln2_g, ln2_b, fc1_w, fc1_b, fc2_w, fc2_b,
    bias_ref, mask_ref,
    o_ref,
    x_scratch,      # [gm*n_pad, C] post-attention activations
    macc,           # [gm*n_pad, C] fp32 MLP accumulator
    *,
    gm: int,
    n_pad: int,
    heads: int,
    head_dim: int,
    eps: float,
    scale: float,
    approx_gelu: bool,
    use_mask: bool,
):
    """MLP-weight-streaming variant: grid (window_groups, S).  The attention
    sublayer runs at substage 0; fc1/fc2 stream in S hidden-dim chunks that
    Mosaic double-buffers — for big-dim stages (swin_tiny stage 3: 14 MB of
    weights) the unblocked kernel serializes a ~17 us weight DMA before any
    compute."""
    si = pl.program_id(1)
    n_sub = pl.num_programs(1)
    hd = head_dim
    pn = n_pad

    @pl.when(si == 0)
    def _():
        x = x_ref[:]
        dtype = x.dtype
        h = _ln(x, ln1_g[0], ln1_b[0], eps).astype(dtype)
        qkv = (
            jax.lax.dot(h, qkv_w[:], preferred_element_type=jnp.float32)
            .astype(dtype)
            + qkv_b[0]
        )
        outs = []
        for i in range(heads):
            q = qkv[:, (0 * heads + i) * hd:(0 * heads + i + 1) * hd].reshape(gm, pn, hd)
            k = qkv[:, (1 * heads + i) * hd:(1 * heads + i + 1) * hd].reshape(gm, pn, hd)
            v = qkv[:, (2 * heads + i) * hd:(2 * heads + i + 1) * hd].reshape(gm, pn, hd)
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            s = s * scale + bias_ref[i][None]
            if use_mask:
                s = s + mask_ref[:]
            p, r = softmax_unnorm(s, dtype, nomax=_SOFTMAX_NOMAX,
                                  clamp=_SOFTMAX_CLAMP)
            o = jax.lax.dot_general(
                p.astype(dtype), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            o = o * pl.reciprocal(r, approx=False)
            outs.append(o.astype(dtype).reshape(gm * pn, hd))
        att = jnp.concatenate(outs, axis=-1)
        attn_out = (
            jax.lax.dot(att, proj_w[:], preferred_element_type=jnp.float32)
            + proj_b[0].astype(jnp.float32)
        )
        x_scratch[:] = (attn_out + x.astype(jnp.float32)).astype(dtype)
        macc[:] = jnp.zeros_like(macc) + fc2_b[0].astype(jnp.float32)

    x = x_scratch[:]
    dtype = x.dtype
    h2 = _ln(x, ln2_g[0], ln2_b[0], eps).astype(dtype)
    hid = (
        jax.lax.dot(h2, fc1_w[:], preferred_element_type=jnp.float32)
        .astype(dtype)
        + fc1_b[0]
    )
    hid = gelu_kernel(hid, approx_gelu).astype(dtype)
    macc[:] = macc[:] + jax.lax.dot(hid, fc2_w[:],
                                    preferred_element_type=jnp.float32)

    @pl.when(si == n_sub - 1)
    def _():
        o_ref[:] = (macc[:] + x.astype(jnp.float32)).astype(dtype)


# ---------------------------------------------------------------------------
# Whole-stage pipelined kernel: ALL blocks of a Swin stage run as ONE
# pallas_call.  The five per-block tensors that dominate memory — the four
# matmul weights plus the rel-pos bias — stay in HBM and the kernel
# double-buffers per-block async copies against compute (same scheme as
# fused_encoder._encoder_kernel_pipelined), removing the per-block serial
# weight DMA (swin_tiny stage 3: 14 MB/block = ~17 us at 819 GB/s, measured
# 43 us/block vs the ~18 us floor) and the per-block kernel-launch and XLA
# fusion-boundary costs.
#
# Shifted stages (window < feature map): the cyclic-roll + re-partition
# bracket between consecutive blocks is a FIXED row permutation of the
# window-major token rows, applied in-kernel as a one-hot matmul on the MXU
# (exact for bf16 inputs with an f32 accumulator; reverse = contracting the
# transpose).  That avoids Mosaic's reshape/relayout restrictions entirely —
# no (8,7) sublane splits, no gathers — at (nW·n_pad)^2·C MAC per transition
# (stage 2: [224,224]x[224,C] ≈ 0.2 us).  Shifted blocks additionally add
# the standard additive window mask (log2e-prescaled, broadcast per image).
# ---------------------------------------------------------------------------


def _frame_order(res: int, w: int, shift: int) -> np.ndarray:
    """Map position of each window-major token: o[k] = y*res + x for the k-th
    token of the (rolled-by-``shift``) window partition."""
    idx = np.arange(res * res).reshape(res, res)
    if shift:
        idx = np.roll(idx, (-shift, -shift), (0, 1))
    nb = res // w
    return idx.reshape(nb, w, nb, w).transpose(0, 2, 1, 3).reshape(-1)


def stage_transition_perm(res: int, w: int, shift: int, n_pad: int):
    """One-hot [nW*n_pad, nW*n_pad] P with P @ x_wm_unshifted = x_wm_shifted
    (row-major f32; padding rows map to zero).  P is orthogonal, so the
    reverse transition is P^T (contract dim 0)."""
    o0 = _frame_order(res, w, 0)
    o1 = _frame_order(res, w, shift)
    pos_to_k0 = np.empty(res * res, np.int64)
    pos_to_k0[o0] = np.arange(o0.size)
    n = w * w
    nwin = (res // w) ** 2
    rows = np.arange(nwin * n)
    k0 = pos_to_k0[o1]
    r1 = (rows // n) * n_pad + rows % n
    r0 = (k0 // n) * n_pad + k0 % n
    P = np.zeros((nwin * n_pad, nwin * n_pad), np.float32)
    P[r1, r0] = 1.0
    return P


def stage_transition_perm_banded(res: int, w: int, shift: int, n_pad: int):
    """Banded factorization of stage_transition_perm for big stages.

    The roll shift (w//2 < w) only ever moves a token's WINDOW ROW by one,
    so in window-major layout the [R, R] one-hot P is block-BI-diagonal over
    the nb = res//w window-row bands of Rb = nb*n_pad rows each:
    band b of P@x sources only from bands {b, (b+1) % nb}.  Returns
    (pL, pR) [nb, Rb, Rb] with

        (P @ x)[band b]  = pL[b] @ x[band b] + pR[b] @ x[band (b+1) % nb]
        (P.T @ x)[band b] = pL[b].T @ x[band b] + pR[b-1].T @ x[band b-1]

    Memory 2*nb*Rb^2 vs R^2: stage 0 (res 56, w 7) drops from 25 MB bf16 to
    6.4 MB, making the whole-stage kernel feasible (VERDICT round-2 item:
    'separable/banded form instead of the 25 MB one-hot perm')."""
    P = stage_transition_perm(res, w, shift, n_pad)
    nb = res // w
    rb = nb * n_pad
    blocks = P.reshape(nb, rb, nb, rb)
    pL = np.empty((nb, rb, rb), np.float32)
    pR = np.empty((nb, rb, rb), np.float32)
    for b in range(nb):
        pL[b] = blocks[b, :, b]
        pR[b] = blocks[b, :, (b + 1) % nb]
        # any mass outside the two bands would silently corrupt the stage
        other = blocks[b].sum() - pL[b].sum() - pR[b].sum()
        assert other == 0.0, (res, w, shift, b, other)
    return pL, pR


def _swin_stage_kernel_pipelined(
    x_ref,
    act_inv_ref,  # SMEM [L, 4] f32 static act scales (dummy [1, 4] dynamic)
    ln1_g, ln1_b, qkv_b, proj_b, ln2_g, ln2_b, fc1_b, fc2_b,  # VMEM [L, 1, d]
    qkv_s, proj_s, fc1_s, fc2_s,  # VMEM [L, 1, out] f32 scales ([L,1,1] bf16 mode)
    mask_ref,    # VMEM [nwin, n_pad, n_pad] f32 (dummy [1,1,1] when unshifted)
    perm_ref,    # VMEM [R, R] one-hot (dummy [1,1] when unshifted/banded)
    permL_ref, permR_ref,  # VMEM [nb, Rb, Rb] banded one-hot (dummy [1,1,1])
    qkv_w_hbm, proj_w_hbm, fc1_w_hbm, fc2_w_hbm,  # ANY  [L, in, out]
    bias_hbm,                                     # ANY  [L, H, n_pad, n_pad]
    o_ref,
    qkv_buf, proj_buf, fc1_buf, fc2_buf,          # VMEM [2, in, out]
    bias_buf,                                     # VMEM [2, H, n_pad, n_pad]
    sems,                                         # DMA sems [2, 5]
    *,
    depth: int,
    gm: int,
    nwin: int,
    n_pad: int,
    heads: int,
    head_dim: int,
    eps: float,
    scale: float,
    approx_gelu: bool,
    shifted: bool,
    unroll: bool,
    int8: bool = False,
    banded: bool = False,
    static_acts: bool = False,
    pack: int = 1,
):
    pairs = (
        (qkv_w_hbm, qkv_buf),
        (proj_w_hbm, proj_buf),
        (fc1_w_hbm, fc1_buf),
        (fc2_w_hbm, fc2_buf),
        (bias_hbm, bias_buf),
    )
    gb = gm * nwin
    hd = head_dim
    pn = n_pad
    dtype = x_ref.dtype

    def copies(li, slot):
        return [
            pltpu.make_async_copy(hbm.at[li], buf.at[slot], sems.at[slot, t])
            for t, (hbm, buf) in enumerate(pairs)
        ]

    def permute(x, reverse):
        # one-hot row permutation per image; exact in bf16 (f32 accumulate)
        r = nwin * pn
        c = x.shape[-1]
        xg = x.reshape(gm, r, c)
        outs = []
        for g in range(gm):
            if banded:
                # block-bi-diagonal form (stage_transition_perm_banded):
                # 2 matmuls of [Rb, Rb] @ [Rb, C] per window-row band instead
                # of one [R, R] @ [R, C]
                nb = permL_ref.shape[0]
                rb = permL_ref.shape[1]
                bands = []
                for b in range(nb):
                    xb = xg[g, b * rb:(b + 1) * rb]
                    if reverse:
                        bp = (b - 1) % nb
                        xp_ = xg[g, bp * rb:(bp + 1) * rb]
                        o = jax.lax.dot_general(
                            permL_ref[b], xb, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        o += jax.lax.dot_general(
                            permR_ref[bp], xp_, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                    else:
                        bn = (b + 1) % nb
                        xn = xg[g, bn * rb:(bn + 1) * rb]
                        o = jax.lax.dot(permL_ref[b], xb,
                                        preferred_element_type=jnp.float32)
                        o += jax.lax.dot(permR_ref[b], xn,
                                         preferred_element_type=jnp.float32)
                    bands.append(o.astype(dtype))
                outs.append(jnp.concatenate(bands, 0))
            elif reverse:
                o = jax.lax.dot_general(
                    perm_ref[:], xg[g], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                outs.append(o.astype(dtype))
            else:
                o = jax.lax.dot(perm_ref[:], xg[g],
                                preferred_element_type=jnp.float32)
                outs.append(o.astype(dtype))
        return jnp.concatenate(outs, 0)

    def block(x, li, slot, use_mask):
        c = x.shape[-1]
        # weight lane dims are zero-padded to 128 multiples (sliced HBM->VMEM
        # DMA needs aligned lanes); pad columns are zeros, so slicing the
        # matmul output back to the real width is exact
        def imm(hh, buf, s_li, j):
            # static mode: calibrated per-tensor scale from SMEM (combined
            # w*act scale prefolded into s_li); dynamic: per-row absmax
            if static_acts:
                return _int8_mm_static(hh, buf, s_li, act_inv_ref[li, j])
            return _int8_mm_buf(hh, buf, s_li)

        h = _ln(x, ln1_g[li], ln1_b[li], eps).astype(dtype)
        if int8:
            qkv = (imm(h, qkv_buf[slot], qkv_s[li], 0)
                   + qkv_b[li].astype(jnp.float32)).astype(dtype)
        else:
            qkv = (
                jax.lax.dot(h, qkv_buf[slot],
                            preferred_element_type=jnp.float32)
                .astype(dtype)
                + qkv_b[li]
            )
        # pack > 1: P consecutive windows share one block-diagonal
        # attention — bias_buf/mask_ref arrive PRE-PACKED [.., P*pn, P*pn]
        # from the launcher (off-diagonal blocks at _NEG)
        gbp, pnp = gb // pack, pack * pn
        outs = []
        for i in range(heads if _ABLATE != "noattn" else 0):
            q = qkv[:, (0 * heads + i) * hd:(0 * heads + i + 1) * hd].reshape(gbp, pnp, hd)
            k = qkv[:, (1 * heads + i) * hd:(1 * heads + i + 1) * hd].reshape(gbp, pnp, hd)
            v = qkv[:, (2 * heads + i) * hd:(2 * heads + i + 1) * hd].reshape(gbp, pnp, hd)
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            s = s * scale + bias_buf[slot, i][:pnp, :pnp][None]
            if use_mask:
                s = (s.reshape(gm, nwin // pack, pnp, pnp) + mask_ref[:][None]
                     ).reshape(gbp, pnp, pnp)
            if _ABLATE == "nosoftmax":
                p, r = s, jnp.float32(1.0)  # diagnostic: wrong numerics
            else:
                p, r = softmax_unnorm(s, dtype, nomax=_SOFTMAX_NOMAX,
                                      clamp=_SOFTMAX_CLAMP)
            o = jax.lax.dot_general(
                p.astype(dtype), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            if _ABLATE != "nosoftmax":
                o = o * pl.reciprocal(r, approx=False)
            outs.append(o.astype(dtype).reshape(gb * pn, hd))
        att = (jnp.concatenate(outs, axis=-1) if outs
               else qkv[:, :heads * hd])
        if int8:
            attn_out = (imm(att, proj_buf[slot], proj_s[li], 1)[:, :c]
                        + proj_b[li].astype(jnp.float32))
        else:
            attn_out = (
                jax.lax.dot(att, proj_buf[slot],
                            preferred_element_type=jnp.float32)[:, :c]
                + proj_b[li].astype(jnp.float32)
            )
        x = (attn_out + x.astype(jnp.float32)).astype(dtype)
        if _ABLATE == "nomlp":
            return x

        h2 = _ln(x, ln2_g[li], ln2_b[li], eps).astype(dtype)
        if int8:
            hid = (imm(h2, fc1_buf[slot], fc1_s[li], 2)
                   + fc1_b[li].astype(jnp.float32)).astype(dtype)
        else:
            hid = (
                jax.lax.dot(h2, fc1_buf[slot],
                            preferred_element_type=jnp.float32)
                .astype(dtype)
                + fc1_b[li]
            )
        hid = gelu_kernel(hid, approx_gelu).astype(dtype)
        if int8:
            mlp_out = (imm(hid, fc2_buf[slot], fc2_s[li], 3)[:, :c]
                       + fc2_b[li].astype(jnp.float32))
        else:
            mlp_out = (
                jax.lax.dot(hid, fc2_buf[slot],
                            preferred_element_type=jnp.float32)[:, :c]
                + fc2_b[li].astype(jnp.float32)
            )
        return (mlp_out + x.astype(jnp.float32)).astype(dtype)

    for dma in copies(0, 0):
        dma.start()
    x = x_ref[:]  # [gm*nwin*n_pad, C]

    if unroll:
        for li in range(depth):
            slot = li % 2
            odd = li % 2 == 1
            if li + 1 < depth:
                for dma in copies(li + 1, 1 - slot):
                    dma.start()
            for dma in copies(li, slot):
                dma.wait()
            if odd and shifted:
                x = permute(x, False)
            x = block(x, li, slot, use_mask=odd and shifted)
            if odd and shifted:
                x = permute(x, True)
    else:
        # fori over block PAIRS so buffer slots and the shift pattern stay
        # static (even block -> slot 0, odd -> slot 1)
        def body(pi, x):
            li0 = 2 * pi

            @pl.when(li0 + 1 < depth)
            def _():
                for dma in copies(li0 + 1, 1):
                    dma.start()

            for dma in copies(li0, 0):
                dma.wait()
            x = block(x, li0, 0, use_mask=False)

            li1 = li0 + 1

            @pl.when(li1 + 1 < depth)
            def _():
                for dma in copies(li1 + 1, 0):
                    dma.start()

            for dma in copies(li1, 1):
                dma.wait()
            if shifted:
                x = permute(x, False)
            x = block(x, li1, 1, use_mask=shifted)
            if shifted:
                x = permute(x, True)
            return x

        x = jax.lax.fori_loop(0, depth // 2, body, x)

    o_ref[:] = x


_STAGE_VMEM_HEADROOM = 40 * 1024 * 1024
_STAGE_VMEM_CAP = 100 * 1024 * 1024
# one-hot transition perms above this R switch to the banded factorization
_PERM_BANDED_THRESHOLD = 1024


def swin_stage_resident_bytes(c: int, hidden: int, itemsize: int, *,
                              nwin: int, n_pad: int, heads: int,
                              act_itemsize: int = 2) -> int:
    """VMEM bytes of the whole-stage kernel's resident tensors: double-
    buffered weight + bias slots, plus (shifted stages) the transition perm
    (full or banded) and window mask.  The SINGLE source for both the fits
    gate and the wrapper's vmem_limit — they must never drift (a limit set
    below the gate's assumption is a compile-time OOM).

    ``itemsize`` is the streamed-WEIGHT itemsize (1 in int8 mode);
    ``act_itemsize`` the activation dtype's — the transition perms are cast
    to the activation dtype (exact one-hot matmul), so f32 models double
    their footprint (measured: b32 f32 stage-0 banded compile-OOM'd by
    5.2 MB when this was hardcoded to bf16)."""
    c_p = round_up(c, 128)
    hid_p = round_up(hidden, 128)
    wb2 = 2 * itemsize * (c * round_up(3 * c, 128) + c * c_p
                          + c * hid_p + hid_p * c_p)
    wb2 += 2 * 4 * heads * n_pad * round_up(n_pad, 128)  # bias slots (f32)
    if nwin > 1:
        r_tot = nwin * n_pad
        if r_tot > _PERM_BANDED_THRESHOLD:
            nb = round(nwin ** 0.5)
            rb = nb * n_pad
            wb2 += 2 * nb * rb * rb * act_itemsize   # banded perm pair
        else:
            wb2 += r_tot * r_tot * act_itemsize      # full one-hot perm
        wb2 += nwin * n_pad * n_pad * 4          # shifted window mask (f32)
    return wb2


def swin_stage_pipelined_fits(c: int, hidden: int, depth: int,
                              itemsize: int = 2, *, nwin: int = 1,
                              n_pad: int = 56, heads: int = 1,
                              act_itemsize: int | None = None) -> bool:
    """True when the whole-stage pipelined kernel applies: double-buffered
    weight+bias slots (+ perm/mask) fit the VMEM budget and the depth
    matches the pair loop.  Big shifted stages (R > 1024, e.g. stage 0's
    R = 3584) use the banded perm factorization instead of being rejected."""
    if nwin > 1 and depth % 2 != 0:
        return False
    wb2 = swin_stage_resident_bytes(
        c, hidden, itemsize, nwin=nwin, n_pad=n_pad, heads=heads,
        act_itemsize=act_itemsize or max(itemsize, 2))
    return (depth % 2 == 0 or depth <= 8) and \
        wb2 + _STAGE_VMEM_HEADROOM <= _STAGE_VMEM_CAP


def swin_stage_forward_pipelined(
    xw: jax.Array,            # [B*nW, n, C] window-major tokens
    stacked: dict,            # block params stacked on a leading [L] axis
    biases: jax.Array,        # [L, H, n_pad, n_pad] fp32 kernel-ready
                              # (padded + log2e-scaled, see _padded_bias)
    *,
    heads: int,
    head_dim: int,
    eps: float,
    approx_gelu: bool = False,
    nwin: int = 1,
    res: int | None = None,
    window: int | None = None,
    mask: jax.Array | None = None,   # [nW, n, n] shifted mask (raw, unscaled)
    images_per_program: int | None = None,
    unroll: bool | None = None,
    int8: bool = False,
    n_valid: int | None = None,
) -> jax.Array:
    """ALL blocks of a Swin stage as one double-buffered-DMA kernel.

    ``nwin == 1`` (window == feature map, every variant's stage 3): no
    inter-block bracket exists at all.  ``nwin > 1``: the roll/partition
    bracket around each odd (shifted) block runs in-kernel as a one-hot
    permutation matmul (see stage_transition_perm) and odd blocks add
    ``mask``.  Input/output are window-major [B*nW, n, C].

    ``int8``: stacked weights are int8 with per-(layer, out-channel) scales
    (fused_encoder.quantize_stacked_int8 keys qkv_s/proj_s/fc1_s/fc2_s);
    activations quantize per row in-kernel and the matmuls run
    int8 x int8 -> int32 on the MXU — HALVES the streamed weight DMA, the
    binding term of the big-dim stages at b1 (base stage 2: 6.3 MB/block).

    ``n_valid``: when given, ``xw`` is ALREADY lane-padded window-major
    [B*nW, n_pad, C] (e.g. straight from swin_merge_forward) with n_valid
    real tokens per window — skips the pad relayout; mask/bias sizing uses
    n_valid.  Pad-row content may be garbage (attention masks pad columns,
    so it never leaks into valid tokens)."""
    bwin, n, c = xw.shape
    assert bwin % nwin == 0
    b = bwin // nwin
    if n_valid is not None:
        assert n == round_up(n_valid, 8), (n, n_valid)
        n = n_valid
    n_pad = round_up(n, 8)
    r_tot = nwin * n_pad
    depth = stacked["qkv_w"].shape[0]
    hidden = stacked["fc1_w"].shape[2]
    shifted = nwin > 1
    if shifted:
        assert depth % 2 == 0 and mask is not None and res and window
    if unroll is None:
        # the fori pair loop handles even depth only — odd depths (possible
        # when nwin == 1) must unroll or the tail block would be skipped
        unroll = depth <= 6 or depth % 2 != 0
    if not unroll and depth % 2 != 0:
        raise ValueError("unroll=False uses the pair loop: depth must be even")

    banded_stage = shifted and r_tot > _PERM_BANDED_THRESHOLD
    if images_per_program is None:
        per_image = r_tot * (18 * c + 8 * n_pad)
        images_per_program = max(1, (16 * 1024 * 1024) // per_image)
        if banded_stage:
            # the banded in-kernel permute materializes ~27 MB/image of fp32
            # band temporaries at R=3584 (measured: gm=2 b32 compile-OOM'd
            # 61.6 vs 48.3 MB scoped vmem; gm=1 fits) — never share a
            # program between images on banded stages
            images_per_program = 1
    gm = max(1, min(images_per_program, b))
    while b % gm != 0:
        gm -= 1

    if n_valid is not None:
        xp = xw.reshape(b * r_tot, c)
    else:
        xp = jnp.pad(xw, ((0, 0), (0, n_pad - n), (0, 0))).reshape(b * r_tot, c)

    def pad_lane(a, m=128):
        pad = (-a.shape[-1]) % m
        if pad == 0:
            return a
        return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])

    inner_p = round_up(3 * c, 128)
    hid_p = round_up(hidden, 128)
    c_p = round_up(c, 128)
    qkv_w = pad_lane(stacked["qkv_w"])
    qkv_b = pad_lane(stacked["qkv_b"])
    proj_w = pad_lane(stacked["proj_w"])
    fc1_w = pad_lane(stacked["fc1_w"])
    fc1_b = pad_lane(stacked["fc1_b"])
    fc2_w = jnp.pad(stacked["fc2_w"],
                    ((0, 0), (0, hid_p - hidden), (0, c_p - c)))
    static_acts = int8 and "act_inv" in stacked
    if int8:
        qkv_s = pad_lane(stacked["qkv_s"])
        proj_s = pad_lane(stacked["proj_s"])
        fc1_s = pad_lane(stacked["fc1_s"])
        fc2_s = pad_lane(stacked["fc2_s"])
    else:
        qkv_s = proj_s = fc1_s = fc2_s = jnp.zeros((depth, 1, 1), jnp.float32)
    act_inv = (stacked["act_inv"].astype(jnp.float32) if static_acts
               else jnp.ones((1, 4), jnp.float32))
    # block-diagonal window packing (probe-gated, see _PACK): pre-pack the
    # rel-pos bias into [L, H, P*n_pad, P*n_pad] with _NEG off-diagonals so
    # the kernel's packed softmax rows zero the cross-window scores
    pack = _PACK if (shifted and _PACK > 1 and nwin % _PACK == 0) else 1
    if pack > 1:
        bL, bH = biases.shape[0], biases.shape[1]
        pnp = pack * n_pad
        bp = jnp.full((bL, bH, pnp, pnp), _NEG, jnp.float32)
        for t in range(pack):
            sl = slice(t * n_pad, (t + 1) * n_pad)
            bp = bp.at[:, :, sl, sl].set(
                biases[:, :, :n_pad, :n_pad].astype(jnp.float32))
        biases = bp

    # sliced HBM->VMEM DMA needs a 128-aligned lane dim; the kernel slices
    # the loaded bias back to [:, :n_pad] before use
    biases = pad_lane(biases)

    banded = banded_stage
    if shifted:
        shift = window // 2
        mp = jnp.zeros((nwin, n_pad, n_pad), jnp.float32)
        mp = mp.at[:, :n, :n].set(mask.astype(jnp.float32) * _LOG2E)
        if pack > 1:
            # group g covers windows (pack*g + t); diagonal blocks carry
            # each window's own shifted mask, off-diagonals stay 0 (the
            # packed bias already holds _NEG there)
            mpr = mp.reshape(nwin // pack, pack, n_pad, n_pad)
            mpk = jnp.zeros((nwin // pack, pack * n_pad, pack * n_pad),
                            jnp.float32)
            for t in range(pack):
                sl = slice(t * n_pad, (t + 1) * n_pad)
                mpk = mpk.at[:, sl, sl].set(mpr[:, t])
            mp = mpk
        if banded:
            pL, pR = stage_transition_perm_banded(res, window, shift, n_pad)
            perm = jnp.zeros((1, 1), xw.dtype)
            permL = jnp.asarray(pL, xw.dtype)
            permR = jnp.asarray(pR, xw.dtype)
        else:
            perm = jnp.asarray(stage_transition_perm(res, window, shift,
                                                     n_pad), xw.dtype)
            permL = permR = jnp.zeros((1, 1, 1), xw.dtype)
    else:
        mp = jnp.zeros((1, 1, 1), jnp.float32)
        perm = jnp.zeros((1, 1), xw.dtype)
        permL = permR = jnp.zeros((1, 1, 1), xw.dtype)

    kernel = functools.partial(
        _swin_stage_kernel_pipelined,
        depth=depth, gm=gm, nwin=nwin, n_pad=n_pad, heads=heads,
        head_dim=head_dim, eps=eps, scale=head_dim**-0.5 * _LOG2E,
        approx_gelu=approx_gelu, shifted=shifted, unroll=unroll,
        int8=int8, banded=banded, static_acts=static_acts, pack=pack,
    )

    itemsize = 1 if int8 else xw.dtype.itemsize
    # headroom covers gm images of activations (fp32 intermediates + the
    # compiler's stack scheduling slack — 24 MB OOM'd by 3.3 MB at gm=16);
    # resident bytes come from the SAME expression as the fits gate
    vmem_limit = min(_STAGE_VMEM_CAP,
                     swin_stage_resident_bytes(c, hidden, itemsize,
                                               nwin=nwin, n_pad=n_pad,
                                               heads=heads,
                                               act_itemsize=xw.dtype.itemsize)
                     + _STAGE_VMEM_HEADROOM)

    vres = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = lambda: pl.BlockSpec(memory_space=pl.ANY)

    flops = depth * 2 * b * r_tot * (
        c * 3 * c + 2 * n_pad * head_dim * heads + c * c + 2 * c * hidden
    )
    out = pl.pallas_call(
        kernel,
        grid=(b // gm,),
        in_specs=[
            pl.BlockSpec((gm * r_tot, c), lambda gi: (gi, 0),
                         memory_space=pltpu.VMEM),
            # act_inv passes WHOLE (full [L, 4] array: a (1, 4) block would
            # violate Mosaic's sublane rule) and is indexed by layer in-kernel
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ] + [vres()] * 16 + [hbm()] * 5,
        out_specs=pl.BlockSpec((gm * r_tot, c), lambda gi: (gi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * r_tot, c), xw.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, c, inner_p), jnp.int8 if int8 else xw.dtype),
            pltpu.VMEM((2, c, c_p), jnp.int8 if int8 else xw.dtype),
            pltpu.VMEM((2, c, hid_p), jnp.int8 if int8 else xw.dtype),
            pltpu.VMEM((2, hid_p, c_p), jnp.int8 if int8 else xw.dtype),
            pltpu.VMEM((2,) + tuple(biases.shape[1:]), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 5)),
        ],
        interpret=use_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=int(
                depth * (3 * c * c + c * c + 2 * c * hidden)
                * itemsize * (b // gm)
            ),
            transcendentals=depth * b * r_tot * (n_pad * heads + hidden),
        ),
    )(
        xp, act_inv,
        stacked["ln1_g"], stacked["ln1_b"], qkv_b, stacked["proj_b"],
        stacked["ln2_g"], stacked["ln2_b"], fc1_b, stacked["fc2_b"],
        qkv_s, proj_s, fc1_s, fc2_s,
        mp, perm, permL, permR,
        qkv_w, proj_w, fc1_w, fc2_w, biases,
    )
    out = out.reshape(bwin, n_pad, c)
    # pre-padded callers chain window-major kernels — keep the pad rows
    return out if n_valid is not None else out[:, :n, :]


def _padded_bias(bias_hnn: jax.Array, n: int, n_pad: int) -> jax.Array:
    """[H, n, n] -> fp32 [H, n_pad, n_pad], padding cols masked, pre-scaled
    by log2(e) so the kernel's exp2 softmax needs no extra multiply."""
    h = bias_hnn.shape[0]
    bias = jnp.full((h, n_pad, n_pad), _NEG, jnp.float32)
    bias = bias.at[:, :, :n].set(0.0)
    bias = bias.at[:, :n, :n].set(bias_hnn.astype(jnp.float32) * _LOG2E)
    return bias


def swin_block_forward(
    xw: jax.Array,            # [B*nW, n, C] window-major tokens (pre-LN)
    params: dict,             # ln1_g ln1_b qkv_w qkv_b proj_w proj_b ln2_g
                              # ln2_b fc1_w fc1_b fc2_w fc2_b (plain arrays)
    bias_hnn: jax.Array,      # [H, n, n] relative position bias
    mask: jax.Array | None,   # [nW, n, n] shifted-window mask or None
    *,
    heads: int,
    head_dim: int,
    eps: float,
    approx_gelu: bool = False,
    windows_per_program: int | None = None,
    bias_prepadded: bool = False,
) -> jax.Array:
    """One full Swin block on window-major data.  Returns [B*nW, n, C].

    ``bias_prepadded``: bias_hnn is already the kernel-ready fp32
    [H, n_pad, n_pad] (see models/swin.py prepare_swin_biases) — skips the
    per-call gather/pad ops that otherwise cost 7-28 us on TPU.
    """
    bw, n, c = xw.shape
    n_pad = round_up(n, 8)

    if windows_per_program is None:
        # Bound the per-program VMEM working set: x/out/qkv/hid activations
        # (~18c bytes/row bf16 + fp32 epilogues) plus the fp32 score buffer.
        # swin_base stage-3 at b32 (c=1024, 32 windows/program) exceeded the
        # compiler's VMEM budget without this cap.
        per_window = n_pad * (18 * c + 8 * n_pad)
        windows_per_program = max(1, (24 * 1024 * 1024) // per_window)
    gm = max(1, min(windows_per_program, bw))
    while bw % gm != 0:
        gm -= 1

    xp = jnp.pad(xw, ((0, 0), (0, n_pad - n), (0, 0))).reshape(bw * n_pad, c)

    bias = bias_hnn if bias_prepadded else _padded_bias(bias_hnn, n, n_pad)
    use_mask = mask is not None
    if use_mask:
        nW = mask.shape[0]
        mp = jnp.zeros((nW, n_pad, n_pad), jnp.float32)
        mp = mp.at[:, :n, :n].set(mask.astype(jnp.float32) * _LOG2E)
        mask_g = jnp.tile(mp, (bw // nW, 1, 1))
    else:
        mask_g = jnp.zeros((bw, 1, 1), jnp.float32)  # placeholder, unread

    def vec(a):  # [d] -> [1, d] so VMEM blocks are 2D
        return a.reshape(1, -1)

    hidden = params["fc1_w"].shape[1]
    mask_dims = (n_pad, n_pad) if use_mask else (1, 1)
    flops = 2 * bw * n_pad * (
        c * 3 * c + 2 * n_pad * head_dim * heads + c * c + 2 * c * hidden
    )
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=int(
            (bw * n_pad * c * 2 + c * 3 * c + c * c + 2 * c * hidden)
            * xw.dtype.itemsize
        ),
        transcendentals=bw * n_pad * (n_pad * heads + hidden),
    )
    args = (
        xp,
        vec(params["ln1_g"]), vec(params["ln1_b"]),
        params["qkv_w"], vec(params["qkv_b"]),
        params["proj_w"], vec(params["proj_b"]),
        vec(params["ln2_g"]), vec(params["ln2_b"]),
        params["fc1_w"], vec(params["fc1_b"]),
        params["fc2_w"], vec(params["fc2_b"]),
        bias,
        mask_g,
    )
    weight_bytes = (c * 3 * c + c * c + 2 * c * hidden) * xw.dtype.itemsize
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    if weight_bytes > 6 * 1024 * 1024 and hidden % 1024 == 0:
        # MLP-weight-streaming path (see _swin_block_kernel_blocked): the fc
        # chunks double-buffer against compute instead of one serial DMA.
        chunk = 1024
        n_sub = hidden // chunk
        kernel = functools.partial(
            _swin_block_kernel_blocked,
            gm=gm, n_pad=n_pad, heads=heads, head_dim=head_dim,
            eps=eps, scale=head_dim**-0.5 * _LOG2E, approx_gelu=approx_gelu,
            use_mask=use_mask,
        )
        full2 = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=(bw // gm, n_sub),
            in_specs=[
                pl.BlockSpec((gm * n_pad, c), lambda gi, si: (gi, 0),
                             memory_space=pltpu.VMEM),
                full2(), full2(),   # ln1
                full2(), full2(),   # qkv w/b
                full2(), full2(),   # proj w/b
                full2(), full2(),   # ln2
                pl.BlockSpec((c, chunk), lambda gi, si: (0, si),
                             memory_space=pltpu.VMEM),      # fc1 chunk
                pl.BlockSpec((1, chunk), lambda gi, si: (0, si),
                             memory_space=pltpu.VMEM),      # fc1_b chunk
                pl.BlockSpec((chunk, c), lambda gi, si: (si, 0),
                             memory_space=pltpu.VMEM),      # fc2 chunk
                full2(),            # fc2_b
                full2(),            # bias
                pl.BlockSpec((gm,) + mask_dims, lambda gi, si: (gi, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((gm * n_pad, c), lambda gi, si: (gi, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bw * n_pad, c), xw.dtype),
            scratch_shapes=[
                pltpu.VMEM((gm * n_pad, c), xw.dtype),
                pltpu.VMEM((gm * n_pad, c), jnp.float32),
            ],
            interpret=use_interpret(),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            cost_estimate=cost,
        )(*args)
        return out.reshape(bw, n_pad, c)[:, :n, :]

    kernel = functools.partial(
        _swin_block_kernel,
        gm=gm, n_pad=n_pad, heads=heads, head_dim=head_dim,
        eps=eps, scale=head_dim**-0.5 * _LOG2E, approx_gelu=approx_gelu,
        use_mask=use_mask,
    )
    out = pl.pallas_call(
        kernel,
        grid=(bw // gm,),
        in_specs=[
            pl.BlockSpec((gm * n_pad, c), lambda gi: (gi, 0),
                         memory_space=pltpu.VMEM),
            full(), full(),   # ln1
            full(), full(),   # qkv w/b
            full(), full(),   # proj w/b
            full(), full(),   # ln2
            full(), full(),   # fc1 w/b
            full(), full(),   # fc2 w/b
            full(),           # bias
            pl.BlockSpec((gm,) + mask_dims, lambda gi: (gi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gm * n_pad, c), lambda gi: (gi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bw * n_pad, c), xw.dtype),
        interpret=use_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=cost,
    )(*args)
    return out.reshape(bw, n_pad, c)[:, :n, :]
