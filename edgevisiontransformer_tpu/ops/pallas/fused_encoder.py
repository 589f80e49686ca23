"""Whole-encoder fused Pallas kernel for ViT-family models.

The batch-1 ViT forward is latency-bound: XLA runs ~50 small ops per layer
with HBM round-trips between them.  This kernel executes the ENTIRE pre-norm
encoder — every layer of LN1 -> fused-QKV attention -> residual -> LN2 ->
GELU-MLP -> residual — as a single pallas_call with grid
(batch_blocks, depth):

* a block of ``bm`` images' token activations [bm*n_pad, dim] lives in a
  VMEM scratch that persists across layer grid-steps (TPU grid execution is
  sequential, batch-major);
* per-layer weights are streamed HBM->VMEM by the BlockSpec pipeline
  (double-buffered by Mosaic); batching bm images per program divides weight
  traffic by bm and feeds the MXU [bm*n_pad, dim] matmuls;
* the [n_pad, n_pad] fp32 score matrices never exist outside VMEM;
* softmax/LN statistics in fp32; matmuls accumulate fp32 on the MXU.

Supports both residual conventions (standard ``x + fn(LN(x))`` and the
reference quirk ``fn(LN(x)) + LN(x)``, /root/reference/modeling/layers/
norm.py:10-12 + residual.py:9) and both GELU variants.

Kernel variants (selected by models/vit.fused_vit_apply):
* ``encoder_forward`` — grid (batch_blocks, depth), weights streamed by the
  BlockSpec pipeline (Mosaic double-buffers them).  ~1.5 us/layer of fixed
  grid-step overhead; best for large batch blocks.
* ``encoder_forward_pipelined`` — ONE program; the four matmul weights stay
  in HBM and the kernel double-buffers per-layer async copies against
  compute.  Removes both the grid-step overhead and the serial weight load,
  and only needs TWO layers of weights in VMEM, so DeiT-Base bf16
  (2 x 14 MB/layer) runs fully overlapped (b1: 262 us vs 350 blocked).
* ``encoder_forward_resident`` — ALL weights VMEM-resident (kept for
  reference/fallback; superseded by pipelined: tiny b1 33 vs 52 us).
* ``encoder_forward_blocked`` — MLP streamed in hidden-dim chunks via a
  third grid axis (fallback for layers too big to double-buffer).
* ``encoder_forward_int8`` / ``_int8_pipelined`` — int8 weight streaming
  with in-kernel dynamic per-row activation quantization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import common
from .common import (default_batch_block, round_up, snap_batch_block,
                     softmax_unnorm, use_interpret)
from .mathlib import gelu_kernel


def _ln(x, g, b, eps):
    xf = x.astype(jnp.float32)
    if _ABLATE == "noln":  # diagnostic: passthrough (wrong numerics)
        return xf
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return (xf - mean) * jax.lax.rsqrt(var + eps) * g.astype(jnp.float32) + b.astype(
        jnp.float32
    )


# Max-free softmax (same as ops/pallas/swin_block._SOFTMAX_NOMAX, measured
# +4-9% there); the shared dtype-aware implementation lives in
# common.softmax_unnorm (fp16-safe fallback + clamp rationale there).
_SOFTMAX_NOMAX = True
_SOFTMAX_CLAMP = common.SOFTMAX_CLAMP

# Compile-time diagnostic ablations for tools/probe_vit_ablate.py (the
# probe_swin_ablate methodology pointed at the ViT-at-batch wall, VERDICT
# r4 directive #1): None / "nosoftmax" / "noattn" / "nomlp" / "noquant"
# (int8 paths: skip the per-row absmax + round/clip activation quantize,
# cast-only).  Ablated kernels compute WRONG numerics on purpose — only a
# probe may set this, and must restore None.
_ABLATE = None

# Apply the key-padding mask as one fused multiply-add (s*scale + bias_row,
# bias_row [1, n_pad] = 0 valid / -1e30 pad) instead of a scale pass plus an
# iota-compare-select pass over the full [n_pad, n_pad] f32 scores.  Exactly
# identical output (valid cols add 0; pad cols land at ~-1e30 either way and
# exp2-underflow to 0 in both softmax branches; interpret-mode parity 0.0).
# Shipped ON after the r5 interleaved A/B (tools/probe_vit_scoreopt.py,
# tiny b128, 3 rounds): fused 3.1950 vs 3.2554 select (-1.9%, wins all 3
# rounds), int8_static 3.1605 vs 3.1919 (-1.0%, wins 2/3) — a small,
# consistent VPU-pass saving.
_SCORE_FMA = True

# Batch the per-program images into one 3-D dot_general per head inside
# _attention_rows (see its docstring).  Identical numerics.  MEASURED
# NEGATIVE at tiny b128 (tools/probe_vit_batched_attn.py, 3 interleaved
# rounds): fused 3.51 batched vs 3.24 unrolled (+8.4%), int8_static 3.38
# vs 3.26 (+3.7%) — at [200, 64] tiles the per-matmul issue overhead the
# batching saves is smaller than the batched-dot_general's own relayout
# cost (unlike swin's [56, 32] windows, where batching won).  Kept
# selectable for future shapes; at bm=1 both forms are the same program.
_BATCHED_ATTN = False


def _attention_rows(qkv, *, bm, n_pad, heads, head_dim, key_mask, scale, dtype):
    """Per-(image, head) exp2-softmax attention over the fused qkv columns.

    Shared by the streamed / resident / int8 encoder kernels so numerics
    fixes cannot diverge between copies.  exp2 with log2(e) folded into
    ``scale``; normalization deferred past PV (divide on [n_pad, hd]) —
    the VPU-wall optimizations measured in swin_block.py.

    ``_BATCHED_ATTN``: batch the bm images of one program into a single
    3-D dot_general per head ([bm, n_pad, hd] batch dims) instead of
    unrolling a Python loop over images — heads*bm separate [n_pad, hd]
    matmul pairs become ``heads`` batched ops (tiny b128: 48 -> 3 MXU
    issues per layer).  The swin kernel measured exactly this trade
    (per-head batched beats the unrolled per-(window, head) loop at
    ~0.17 us/iter issue overhead); identical numerics — every reshape
    splits/merges only the sublane-aligned leading dim (Mosaic-legal).
    """
    hd = head_dim
    scale2 = scale * 1.4426950408889634
    # _SCORE_FMA: one [1, n_pad] additive bias row replaces the per-head
    # [n_pad, n_pad] iota-compare-select (see the flag note)
    key_bias = jnp.where(key_mask[:1], jnp.float32(0.0), jnp.float32(-1e30))

    def masked_scores(s):
        if _SCORE_FMA:
            return s * scale2 + key_bias
        return jnp.where(key_mask, s * scale2, -1e30)

    if _BATCHED_ATTN and _ABLATE is None:
        parts = []
        for i in range(heads):
            q = qkv[:, (0 * heads + i) * hd:(0 * heads + i + 1) * hd].reshape(bm, n_pad, hd)
            k = qkv[:, (1 * heads + i) * hd:(1 * heads + i + 1) * hd].reshape(bm, n_pad, hd)
            v = qkv[:, (2 * heads + i) * hd:(2 * heads + i + 1) * hd].reshape(bm, n_pad, hd)
            s = masked_scores(jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ))
            p, r = softmax_unnorm(s, dtype, nomax=_SOFTMAX_NOMAX,
                                  clamp=_SOFTMAX_CLAMP)
            o = jax.lax.dot_general(
                p.astype(dtype), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            parts.append(o * pl.reciprocal(r, approx=False))
        att = jnp.concatenate(parts, axis=-1)  # [bm, n_pad, heads*hd]
        return att.reshape(bm * n_pad, heads * hd).astype(dtype)
    att_rows = []
    for j in range(bm):
        row0 = j * n_pad
        if _ABLATE == "noattn":  # diagnostic: q columns pass through
            att_rows.append(qkv[row0:row0 + n_pad, :heads * hd])
            continue
        parts = []
        for i in range(heads):
            q = qkv[row0:row0 + n_pad, (0 * heads + i) * hd:(0 * heads + i + 1) * hd]
            k = qkv[row0:row0 + n_pad, (1 * heads + i) * hd:(1 * heads + i + 1) * hd]
            v = qkv[row0:row0 + n_pad, (2 * heads + i) * hd:(2 * heads + i + 1) * hd]
            s = masked_scores(jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ))
            if _ABLATE == "nosoftmax":
                p, r = s, None  # diagnostic: wrong numerics
            else:
                p, r = softmax_unnorm(s, dtype, nomax=_SOFTMAX_NOMAX,
                                      clamp=_SOFTMAX_CLAMP)
            o = jax.lax.dot(p.astype(dtype), v, preferred_element_type=jnp.float32)
            parts.append(o if r is None
                         else o * pl.reciprocal(r, approx=False))
        att_rows.append(jnp.concatenate(parts, axis=-1))
    return jnp.concatenate(att_rows, axis=0).astype(dtype)


def _encoder_kernel(
    x_ref,
    ln1_g_ref, ln1_b_ref, qkv_w_ref, qkv_b_ref, out_w_ref, out_b_ref,
    ln2_g_ref, ln2_b_ref, fc1_w_ref, fc1_b_ref, fc2_w_ref, fc2_b_ref,
    o_ref,
    x_scratch,
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
):
    li = pl.program_id(1)

    @pl.when(li == 0)
    def _():
        x_scratch[:] = x_ref[:]

    x = x_scratch[:]  # [bm*n_pad, dim]
    dtype = x.dtype

    # ---- attention sublayer ----
    h = _ln(x, ln1_g_ref[0], ln1_b_ref[0], eps).astype(dtype)
    qkv = (
        jax.lax.dot(h, qkv_w_ref[0], preferred_element_type=jnp.float32)
        .astype(dtype)  # MXU acc must be fp32; cast in the epilogue
        + qkv_b_ref[0]
    )  # [bm*n_pad, 3*h*hd], fused axis ordered (qkv, head, hd)

    col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
    key_mask = col < seq_len

    # exp2 softmax with log2(e) folded into the score scale, normalization
    # deferred past PV (divide on [n_pad, hd] instead of [n_pad, n_pad]) —
    # same VPU-wall optimizations as ops/pallas/swin_block.py.
    att = _attention_rows(qkv, bm=bm, n_pad=n_pad, heads=heads,
                          head_dim=head_dim, key_mask=key_mask, scale=scale,
                          dtype=dtype)

    attn_out = (
        jax.lax.dot(att, out_w_ref[0], preferred_element_type=jnp.float32)
        + out_b_ref[0].astype(jnp.float32)
    )
    if reference_residual:
        x = (attn_out + h.astype(jnp.float32)).astype(dtype)
    else:
        x = (attn_out + x.astype(jnp.float32)).astype(dtype)

    # ---- MLP sublayer ----
    if _ABLATE != "nomlp":
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
        if reference_residual:
            x = (mlp_out + h2.astype(jnp.float32)).astype(dtype)
        else:
            x = (mlp_out + x.astype(jnp.float32)).astype(dtype)

    x_scratch[:] = x

    @pl.when(li == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = x


def encoder_forward(
    x: jax.Array,
    stacked: dict,
    *,
    heads: int,
    head_dim: int,
    eps: float,
    reference_residual: bool = False,
    approx_gelu: bool = False,
    batch_block: int | None = None,
    n_pad_multiple: int = 8,
) -> jax.Array:
    """Run the full encoder. x: [b, n, dim]; stacked: dict of [L, ...] arrays
    with keys ln1_g ln1_b qkv_w qkv_b out_w out_b ln2_g ln2_b fc1_w fc1_b
    fc2_w fc2_b (vectors stored [L, 1, d]; qkv_b may be zeros).

    n_pad_multiple=8 measured fastest on v5e (197 -> 200 tokens): score
    matrices shrink 39% vs 256-padding and Mosaic handles the non-128 lane
    dimension fine (deit_tiny b1: 0.044 ms vs 0.069 ms at 256-pad)."""
    b, n, dim = x.shape
    depth = stacked["qkv_w"].shape[0]
    inner = stacked["qkv_w"].shape[2]
    mlp = stacked["fc1_w"].shape[2]
    n_pad = round_up(n, n_pad_multiple)

    if batch_block is not None:
        bm = min(batch_block, b)
    else:
        bm = snap_batch_block(default_batch_block(dim), b)
    b_pad = round_up(b, bm)

    xp = jnp.pad(x, ((0, b_pad - b), (0, n_pad - n), (0, 0)))
    # flatten to rows so each program sees [bm*n_pad, dim]
    xp = xp.reshape(b_pad * n_pad, dim)

    def wspec(shape):
        # per-layer weight block: leading L axis indexed by layer grid dim
        return pl.BlockSpec(
            (1,) + shape, lambda bi, li: (li,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    kernel = functools.partial(
        _encoder_kernel,
        bm=bm,
        n_pad=n_pad,
        heads=heads,
        head_dim=head_dim,
        seq_len=n,
        eps=eps,
        scale=head_dim**-0.5,
        reference_residual=reference_residual,
        approx_gelu=approx_gelu,
    )

    flops = depth * b_pad * 2 * n_pad * (
        dim * inner + 2 * n_pad * head_dim * heads + head_dim * heads * dim + 2 * dim * mlp
    )

    out = pl.pallas_call(
        kernel,
        grid=(b_pad // bm, depth),
        in_specs=[
            pl.BlockSpec(
                (bm * n_pad, dim), lambda bi, li: (bi, 0), memory_space=pltpu.VMEM
            ),
            wspec((1, dim)),         # ln1_g
            wspec((1, dim)),         # ln1_b
            wspec((dim, inner)),     # qkv_w
            wspec((1, inner)),       # qkv_b
            wspec((heads * head_dim, dim)),  # out_w
            wspec((1, dim)),         # out_b
            wspec((1, dim)),         # ln2_g
            wspec((1, dim)),         # ln2_b
            wspec((dim, mlp)),       # fc1_w
            wspec((1, mlp)),         # fc1_b
            wspec((mlp, dim)),       # fc2_w
            wspec((1, dim)),         # fc2_b
        ],
        out_specs=pl.BlockSpec(
            (bm * n_pad, dim), lambda bi, li: (bi, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad * n_pad, dim), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm * n_pad, dim), x.dtype)],
        interpret=use_interpret(),
        compiler_params=pltpu.CompilerParams(
            # sized for bf16; f32 models double every block/scratch buffer
            # (measured: f32 tiny b128 needs 26.9 MB where bf16 fits in 24)
            vmem_limit_bytes=min(
                100 * 1024 * 1024,
                24 * 1024 * 1024 * max(1, dim // 192)
                * max(1, x.dtype.itemsize // 2),
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=int(
                depth * (dim * inner + heads * head_dim * dim + 2 * dim * mlp)
                * x.dtype.itemsize * (b_pad // bm)
            ),
            transcendentals=depth * b_pad * n_pad * (n_pad * heads + mlp),
        ),
    )(
        xp,
        stacked["ln1_g"], stacked["ln1_b"],
        stacked["qkv_w"], stacked["qkv_b"],
        stacked["out_w"], stacked["out_b"],
        stacked["ln2_g"], stacked["ln2_b"],
        stacked["fc1_w"], stacked["fc1_b"],
        stacked["fc2_w"], stacked["fc2_b"],
    )
    return out.reshape(b_pad, n_pad, dim)[:b, :n, :]


def pipelined_weights_fit(dim: int, inner: int, mlp: int, heads: int,
                          head_dim: int, itemsize: int = 2) -> bool:
    """True when TWO layers of lane-128-padded weights (the double-buffered
    slots of the pipelined kernels) fit the VMEM budget.  The single source
    for the dispatch gates in models/vit.py — must mirror the wbytes2 /
    vmem_limit computation in encoder_forward_pipelined and
    fused_vit_full.vit_full_forward_pipelined."""
    rup = lambda v: round_up(v, 128)
    wb2 = 2 * itemsize * (dim * rup(inner) + heads * head_dim * rup(dim)
                          + dim * rup(mlp) + rup(mlp) * rup(dim))
    return wb2 + 24 * 1024 * 1024 <= 100 * 1024 * 1024


def stack_vit_layer_params(params: dict, depth: int, qkv_bias: bool,
                           start: int = 0) -> dict:
    """Stack per-block flax params into [L, ...] arrays for encoder_forward.

    params: the "params" sub-tree of a ViT variables dict (models/vit.py).
    Vectors become [L, 1, d] so their VMEM blocks have a 2D trailing shape.
    ``start``: first block index — lets layerwise-pruned models stack each
    run of identically-shaped consecutive layers into its own segment.
    """
    def stack(getter):
        arrs = [getter(params[f"block_{i}"]) for i in range(start, start + depth)]
        out = jnp.stack(arrs)
        if out.ndim == 2:  # [L, dim] vectors -> [L, 1, dim]
            out = out[:, None, :]
        return out

    inner = params[f"block_{start}"]["attn"]["qkv_kernel"].shape[1]
    return {
        "ln1_g": stack(lambda b: b["ln1"]["scale"]),
        "ln1_b": stack(lambda b: b["ln1"]["bias"]),
        "qkv_w": stack(lambda b: b["attn"]["qkv_kernel"]),
        "qkv_b": stack(lambda b: b["attn"]["qkv_bias"]) if qkv_bias
        else jnp.zeros((depth, 1, inner),
                       params[f"block_{start}"]["attn"]["qkv_kernel"].dtype),
        "out_w": stack(lambda b: b["attn"]["out_kernel"]),
        "out_b": stack(lambda b: b["attn"]["out_bias"]),
        "ln2_g": stack(lambda b: b["ln2"]["scale"]),
        "ln2_b": stack(lambda b: b["ln2"]["bias"]),
        "fc1_w": stack(lambda b: b["ffn"]["fc1_kernel"]),
        "fc1_b": stack(lambda b: b["ffn"]["fc1_bias"]),
        "fc2_w": stack(lambda b: b["ffn"]["fc2_kernel"]),
        "fc2_b": stack(lambda b: b["ffn"]["fc2_bias"]),
    }


def stack_vit_layer_params_packed(params: dict, heads_per_layer,
                                  mlp_per_layer, head_dim: int,
                                  qkv_bias: bool) -> dict:
    """Head-packed stack for NON-uniform layerwise-pruned models: every
    layer's params are zero-padded to (max heads, max mlp) so the whole
    depth runs as ONE pipelined kernel instead of one pallas_call per
    uniform segment (SURVEY §7 "head-packing" hard part; VERDICT r2 #7).

    Numerically EXACT, not approximate: a padded head has zero v-columns
    (its attention output is 0 @ v = 0) and zero out-proj rows, so it
    contributes nothing; a padded MLP column has zero fc1 weight+bias
    (gelu(0) = 0) and a zero fc2 row.  The cost is the padded layers'
    extra FLOPs — a win only where per-call overheads dominate (batch 1),
    which the fused_vit_apply dispatch gates on.
    """
    depth = len(heads_per_layer)
    hmax = max(heads_per_layer)
    mlp_max = max(mlp_per_layer)
    dt = params["block_0"]["attn"]["qkv_kernel"].dtype

    def pad_qkv(a, h, axis):
        # [.., 3*h*hd] -> [.., 3*hmax*hd]: pad each q/k/v section to hmax
        secs = jnp.split(a, 3, axis=axis)
        pad = [(0, 0)] * a.ndim
        pad[axis] = (0, (hmax - h) * head_dim)
        return jnp.concatenate([jnp.pad(s, pad) for s in secs], axis=axis)

    def pad_to(a, size, axis):
        pad = [(0, 0)] * a.ndim
        pad[axis] = (0, size - a.shape[axis])
        return jnp.pad(a, pad)

    rows = []
    for i in range(depth):
        b, h, m = params[f"block_{i}"], heads_per_layer[i], mlp_per_layer[i]
        qb = (b["attn"]["qkv_bias"] if qkv_bias
              else jnp.zeros((3 * h * head_dim,), dt))
        rows.append({
            "ln1_g": b["ln1"]["scale"], "ln1_b": b["ln1"]["bias"],
            "qkv_w": pad_qkv(b["attn"]["qkv_kernel"], h, 1),
            "qkv_b": pad_qkv(qb, h, 0),
            "out_w": pad_to(b["attn"]["out_kernel"], hmax * head_dim, 0),
            "out_b": b["attn"]["out_bias"],
            "ln2_g": b["ln2"]["scale"], "ln2_b": b["ln2"]["bias"],
            "fc1_w": pad_to(b["ffn"]["fc1_kernel"], mlp_max, 1),
            "fc1_b": pad_to(b["ffn"]["fc1_bias"], mlp_max, 0),
            "fc2_w": pad_to(b["ffn"]["fc2_kernel"], mlp_max, 0),
            "fc2_b": b["ffn"]["fc2_bias"],
        })
    out = {k: jnp.stack([r[k] for r in rows]) for k in rows[0]}
    for k, v in out.items():
        if v.ndim == 2:  # [L, d] vectors -> [L, 1, d]
            out[k] = v[:, None, :]
    return out


# ---------------------------------------------------------------------------
# Weights-resident variant: ALL layers' weights live in VMEM for the whole
# call and the kernel loops over layers in a static python loop — no per-layer
# grid steps.  Each grid step of the streamed variant costs ~1.5 us of fixed
# overhead (measured round 2: all_head1_ffn0.3 encoder 37 us streamed vs
# 21.6 us resident; unpruned tiny 54 -> 40.5 us), which dominates b1 latency
# for small/pruned models whose weights fit VMEM (DeiT-Tiny 11 MB bf16).
# ---------------------------------------------------------------------------


def _encoder_kernel_resident(
    x_ref,
    ln1_g, ln1_b, qkv_w, qkv_b, out_w, out_b,
    ln2_g, ln2_b, fc1_w, fc1_b, fc2_w, fc2_b,
    o_ref,
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
):
    x = x_ref[:]
    dtype = x.dtype
    hd = head_dim
    col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
    key_mask = col < seq_len

    for li in range(depth):
        h = _ln(x, ln1_g[li], ln1_b[li], eps).astype(dtype)
        qkv = (
            jax.lax.dot(h, qkv_w[li], preferred_element_type=jnp.float32)
            .astype(dtype)
            + qkv_b[li]
        )
        att = _attention_rows(qkv, bm=bm, n_pad=n_pad, heads=heads,
                              head_dim=head_dim, key_mask=key_mask,
                              scale=scale, dtype=dtype)

        attn_out = (
            jax.lax.dot(att, out_w[li], preferred_element_type=jnp.float32)
            + out_b[li].astype(jnp.float32)
        )
        x = (attn_out + (h if reference_residual else x).astype(jnp.float32)).astype(dtype)

        h2 = _ln(x, ln2_g[li], ln2_b[li], eps).astype(dtype)
        hid = (
            jax.lax.dot(h2, fc1_w[li], preferred_element_type=jnp.float32)
            .astype(dtype)
            + fc1_b[li]
        )
        hid = gelu_kernel(hid, approx_gelu).astype(dtype)
        mlp_out = (
            jax.lax.dot(hid, fc2_w[li], preferred_element_type=jnp.float32)
            + fc2_b[li].astype(jnp.float32)
        )
        x = (mlp_out + (h2 if reference_residual else x).astype(jnp.float32)).astype(dtype)

    o_ref[:] = x


def encoder_forward_resident(
    x: jax.Array,
    stacked: dict,
    *,
    heads: int,
    head_dim: int,
    eps: float,
    reference_residual: bool = False,
    approx_gelu: bool = False,
    batch_block: int | None = None,
    n_pad_multiple: int = 8,
) -> jax.Array:
    """Whole-encoder kernel with ALL weights VMEM-resident (see above)."""
    b, n, dim = x.shape
    depth = stacked["qkv_w"].shape[0]
    n_pad = round_up(n, n_pad_multiple)

    if batch_block is not None:
        bm = min(batch_block, b)
    else:
        bm = snap_batch_block(default_batch_block(dim), b)
    b_pad = round_up(b, bm)

    xp = jnp.pad(x, ((0, b_pad - b), (0, n_pad - n), (0, 0)))
    xp = xp.reshape(b_pad * n_pad, dim)

    kernel = functools.partial(
        _encoder_kernel_resident,
        depth=depth, bm=bm, n_pad=n_pad, heads=heads, head_dim=head_dim,
        seq_len=n, eps=eps, scale=head_dim**-0.5,
        reference_residual=reference_residual, approx_gelu=approx_gelu,
    )

    # Right-size the VMEM budget: a blanket-high limit measurably hurts
    # (deit_tiny b1: 0.0707 ms at 120 MB vs 0.0607 at 48 MB — the reservation
    # starves surrounding ops), so ask only for weights + working set.
    wbytes = sum(int(a.size) * a.dtype.itemsize for a in stacked.values())
    vmem_limit = min(96 * 1024 * 1024, int(wbytes * 1.25) + 24 * 1024 * 1024)

    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b_pad // bm,),
        in_specs=[
            pl.BlockSpec((bm * n_pad, dim), lambda bi: (bi, 0),
                         memory_space=pltpu.VMEM),
        ] + [full()] * 12,
        out_specs=pl.BlockSpec((bm * n_pad, dim), lambda bi: (bi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad * n_pad, dim), x.dtype),
        interpret=use_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit,
        ),
    )(
        xp,
        stacked["ln1_g"], stacked["ln1_b"],
        stacked["qkv_w"], stacked["qkv_b"],
        stacked["out_w"], stacked["out_b"],
        stacked["ln2_g"], stacked["ln2_b"],
        stacked["fc1_w"], stacked["fc1_b"],
        stacked["fc2_w"], stacked["fc2_b"],
    )
    return out.reshape(b_pad, n_pad, dim)[:b, :n, :]


# ---------------------------------------------------------------------------
# Pipelined variant: weights stay in HBM and the kernel double-buffers
# per-layer async copies of the four matmul weights against compute — one
# program, no per-layer grid steps.  This removes BOTH fixed costs measured
# on v5e: the resident variant's serial whole-model weight DMA before any
# compute (~13 us for DeiT-Tiny's 11 MB at 819 GB/s) and the streamed
# variant's ~1.5 us/layer grid-step overhead.  Because only TWO layers of
# weights need VMEM at once, it also runs DeiT-Base bf16 (2 x 14 MB) with
# full DMA/compute overlap — the shape the whole-model-resident kernel can
# never hold.
# ---------------------------------------------------------------------------


def _encoder_kernel_pipelined(
    x_ref,
    ln1_g, ln1_b, qkv_b, out_b, ln2_g, ln2_b, fc1_b, fc2_b,  # VMEM [L, 1, d]
    qkv_w_hbm, out_w_hbm, fc1_w_hbm, fc2_w_hbm,              # ANY  [L, in, out]
    o_ref,
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

    dtype = x_ref.dtype
    col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
    key_mask = col < seq_len

    def layer(li, slot, x):
        dim = x.shape[-1]
        h = _ln(x, ln1_g[li], ln1_b[li], eps).astype(dtype)
        # weight lane dims are zero-padded to 128 multiples (Mosaic requires
        # aligned lane dims for sliced HBM->VMEM DMA); the pad columns carry
        # zeros, so slicing the matmul output back to the real width is exact
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

    x = x_ref[:]
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

    o_ref[:] = x


def encoder_forward_pipelined(
    x: jax.Array,
    stacked: dict,
    *,
    heads: int,
    head_dim: int,
    eps: float,
    reference_residual: bool = False,
    approx_gelu: bool = False,
    batch_block: int | None = None,
    n_pad_multiple: int = 8,
    unroll: bool | None = None,
) -> jax.Array:
    """Whole-encoder kernel with manually double-buffered weight DMA
    (see _encoder_kernel_pipelined).  Same contract as encoder_forward.

    ``unroll``: python-unroll the depth loop (best for b1); False uses
    lax.fori_loop with dynamic slot indices — ~depth-times smaller program,
    for large batch blocks where the unrolled form would blow up compile
    time.  None resolves from the actual in-kernel iteration count
    (depth * heads * batch_block <= 96) so callers need not re-derive the
    kernel's internal batch-block policy."""
    b, n, dim = x.shape
    depth = stacked["qkv_w"].shape[0]
    inner = stacked["qkv_w"].shape[2]
    mlp = stacked["fc1_w"].shape[2]
    n_pad = round_up(n, n_pad_multiple)

    bm = (min(batch_block, b) if batch_block is not None
          else snap_batch_block(default_batch_block(dim), b))
    b_pad = round_up(b, bm)
    if unroll is None:
        unroll = depth * heads * bm <= 96

    xp = jnp.pad(x, ((0, b_pad - b), (0, n_pad - n), (0, 0)))
    xp = xp.reshape(b_pad * n_pad, dim)

    # Mosaic requires 128-aligned lane dims for sliced HBM->VMEM DMA: zero-pad
    # weight output columns (and the matching bias lanes / fc2 input rows) up
    # to multiples of 128.  No-op for dims already aligned (small/base).
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
        _encoder_kernel_pipelined,
        depth=depth, bm=bm, n_pad=n_pad, heads=heads, head_dim=head_dim,
        seq_len=n, eps=eps, scale=head_dim**-0.5,
        reference_residual=reference_residual, approx_gelu=approx_gelu,
        unroll=unroll,
    )

    itemsize = jnp.dtype(x.dtype).itemsize
    wbytes2 = 2 * (dim * inner_p + heads * head_dim * dim_p + dim * mlp_p
                   + mlp_p * dim_p) * itemsize
    vmem_limit = min(100 * 1024 * 1024, wbytes2 + 24 * 1024 * 1024)

    vres = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)   # small resident vecs
    hbm = lambda: pl.BlockSpec(memory_space=pl.ANY)     # big streamed weights

    flops = depth * b_pad * 2 * n_pad * (
        dim * inner + 2 * n_pad * head_dim * heads + head_dim * heads * dim
        + 2 * dim * mlp
    )
    out = pl.pallas_call(
        kernel,
        grid=(b_pad // bm,),
        in_specs=[
            pl.BlockSpec((bm * n_pad, dim), lambda bi: (bi, 0),
                         memory_space=pltpu.VMEM),
        ] + [vres()] * 8 + [hbm()] * 4,
        out_specs=pl.BlockSpec((bm * n_pad, dim), lambda bi: (bi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad * n_pad, dim), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, dim, inner_p), x.dtype),
            pltpu.VMEM((2, heads * head_dim, dim_p), x.dtype),
            pltpu.VMEM((2, dim, mlp_p), x.dtype),
            pltpu.VMEM((2, mlp_p, dim_p), x.dtype),
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
        xp,
        stacked["ln1_g"], stacked["ln1_b"], qkv_b, stacked["out_b"],
        stacked["ln2_g"], stacked["ln2_b"], fc1_b, stacked["fc2_b"],
        qkv_w, out_w, fc1_w, fc2_w,
    )
    return out.reshape(b_pad, n_pad, dim)[:b, :n, :]


# ---------------------------------------------------------------------------
# Int8-weight variant: weights stream as int8 (+ per-output-channel fp32
# scales), activations are dynamically quantized per row in-kernel, matmuls
# run int8 x int8 -> int32 on the MXU (SURVEY §2.3 "int8 Pallas matmul
# kernels"; semantics = ops/quant.int8_matmul_dynamic == TFLite dynamic-range
# mode, /root/reference/utils.py:260-262).  Halves the weight HBM traffic —
# the binding constraint for DeiT-Base b1 (170 MB bf16 weights = 208 us of
# HBM at 819 GB/s vs the 0.386 ms XLA forward).
# ---------------------------------------------------------------------------


def _quant_rows_kernel(h):
    """Per-row symmetric int8 quantization (in-kernel).  Matches
    ops/quant.quantize_activation_rows."""
    hf = h.astype(jnp.float32)
    if _ABLATE == "noquant":  # diagnostic: cast-only, no absmax/round/clip
        return hf.astype(jnp.int8), jnp.ones((hf.shape[0], 1), jnp.float32)
    a = jnp.max(jnp.abs(hf), axis=-1, keepdims=True)
    s = jnp.where(a > 0, a / 127.0, 1.0)
    q = jnp.clip(jnp.round(hf * pl.reciprocal(s, approx=False)), -127, 127)
    return q.astype(jnp.int8), s


def _int8_mm(h, wq_ref, ws_ref):
    """h [m, k] float -> int8 dynamic matmul vs streamed weight block."""
    q, s = _quant_rows_kernel(h)
    acc = jax.lax.dot_general(
        q, wq_ref[0], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return acc.astype(jnp.float32) * s * ws_ref[0]


def _int8_mm_static(h, wq, cs, inv_a):
    """Static-scale int8 matmul: quantize h with the CALIBRATED per-tensor
    scale (scalar ``inv_a`` = 1/act_scale from SMEM) — no per-row absmax
    reduction or reciprocal — then dequantize with the combined
    (w_scale * act_scale) per-channel row ``cs``.  The full-integer analogue
    of _int8_mm (TFLITE_BUILTINS_INT8, /root/reference/utils.py:263-277).
    ``wq``/``cs`` are VALUES (works for both streamed blocks and pipelined
    buffers)."""
    hf = h.astype(jnp.float32)
    if _ABLATE == "noquant":  # diagnostic: cast-only quantize
        q = hf.astype(jnp.int8)
    else:
        q = jnp.clip(jnp.round(hf * inv_a), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        q, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return acc.astype(jnp.float32) * cs


def _encoder_kernel_int8(
    x_ref,
    act_inv_ref,
    ln1_g_ref, ln1_b_ref,
    qkv_w_ref, qkv_s_ref, qkv_b_ref,
    out_w_ref, out_s_ref, out_b_ref,
    ln2_g_ref, ln2_b_ref,
    fc1_w_ref, fc1_s_ref, fc1_b_ref,
    fc2_w_ref, fc2_s_ref, fc2_b_ref,
    o_ref,
    x_scratch,
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
    static_acts: bool = False,
):
    li = pl.program_id(1)

    @pl.when(li == 0)
    def _():
        x_scratch[:] = x_ref[:]

    x = x_scratch[:]
    dtype = x.dtype

    def mm(h, w_ref, s_ref, j):
        if static_acts:
            # act_inv arrives as the FULL [L, 4] SMEM array (a (1, 4) block
            # violates Mosaic's sublane-divisibility rule for [12, 4]);
            # index the layer row with the grid id
            return _int8_mm_static(h, w_ref[0], s_ref[0], act_inv_ref[li, j])
        return _int8_mm(h, w_ref, s_ref)

    # ---- attention sublayer ----
    h = _ln(x, ln1_g_ref[0], ln1_b_ref[0], eps).astype(dtype)
    qkv = (mm(h, qkv_w_ref, qkv_s_ref, 0)
           + qkv_b_ref[0].astype(jnp.float32)).astype(dtype)

    col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
    key_mask = col < seq_len
    att = _attention_rows(qkv, bm=bm, n_pad=n_pad, heads=heads,
                          head_dim=head_dim, key_mask=key_mask, scale=scale,
                          dtype=dtype)

    attn_out = mm(att, out_w_ref, out_s_ref, 1) + out_b_ref[0].astype(jnp.float32)
    if reference_residual:
        x = (attn_out + h.astype(jnp.float32)).astype(dtype)
    else:
        x = (attn_out + x.astype(jnp.float32)).astype(dtype)

    # ---- MLP sublayer ----
    if _ABLATE != "nomlp":
        h2 = _ln(x, ln2_g_ref[0], ln2_b_ref[0], eps).astype(dtype)
        hid = (mm(h2, fc1_w_ref, fc1_s_ref, 2)
               + fc1_b_ref[0].astype(jnp.float32)).astype(dtype)
        hid = gelu_kernel(hid, approx_gelu).astype(dtype)
        mlp_out = mm(hid, fc2_w_ref, fc2_s_ref, 3) + fc2_b_ref[0].astype(jnp.float32)
        if reference_residual:
            x = (mlp_out + h2.astype(jnp.float32)).astype(dtype)
        else:
            x = (mlp_out + x.astype(jnp.float32)).astype(dtype)

    x_scratch[:] = x

    @pl.when(li == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = x


def quantize_stacked_int8(stacked: dict,
                          keys=("qkv_w", "out_w", "fc1_w", "fc2_w")) -> dict:
    """Quantize a stacked-[L, in, out] weight dict to int8 with
    per-(layer, output-channel) scales (ops/quant.quantize_weight_int8
    semantics applied per layer).  ``keys`` selects the weight entries
    (the Swin stage dict uses proj_w instead of out_w)."""
    out = dict(stacked)
    for key in keys:
        w = stacked[key].astype(jnp.float32)  # [L, in, out]
        absmax = jnp.max(jnp.abs(w), axis=1, keepdims=True)  # [L, 1, out]
        s = jnp.where(absmax > 0, absmax / 127.0, 1.0)
        out[key] = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
        out[key.replace("_w", "_s")] = s.astype(jnp.float32)
    return out


def quantize_stacked_int8_static(stacked: dict, act_scales,
                                 keys=("qkv_w", "out_w", "fc1_w", "fc2_w")) -> dict:
    """Static (full-integer-style) int8 stack: quantize_stacked_int8 plus
    calibrated per-(layer, matmul) activation scales.

    ``act_scales`` [L, len(keys)] fp32 (ops/quant.calibrate_vit output) is
    FOLDED into the per-channel weight scales (one dequant multiply in-kernel)
    and exported inverted as ``act_inv`` [L, len(keys)] for the SMEM
    quantization scalars."""
    import numpy as np

    out = quantize_stacked_int8(stacked, keys)
    act = jnp.asarray(np.asarray(act_scales, np.float32))
    for j, key in enumerate(keys):
        skey = key.replace("_w", "_s")
        out[skey] = out[skey] * act[:, j][:, None, None]
    out["act_inv"] = (1.0 / act).astype(jnp.float32)
    return out


def encoder_forward_int8(
    x: jax.Array,
    stacked_q: dict,
    *,
    heads: int,
    head_dim: int,
    eps: float,
    reference_residual: bool = False,
    approx_gelu: bool = False,
    batch_block: int | None = None,
    n_pad_multiple: int = 8,
) -> jax.Array:
    """Whole-encoder kernel with int8 weight streaming + dynamic activation
    quantization.  stacked_q = quantize_stacked_int8(stack_vit_layer_params(...)).

    If ``stacked_q`` carries ``act_inv`` (quantize_stacked_int8_static), the
    kernel runs in STATIC mode: activations quantize with calibrated
    per-tensor scales from SMEM instead of per-row dynamic absmax.
    """
    b, n, dim = x.shape
    depth = stacked_q["qkv_w"].shape[0]
    inner = stacked_q["qkv_w"].shape[2]
    mlp = stacked_q["fc1_w"].shape[2]
    n_pad = round_up(n, n_pad_multiple)
    static_acts = "act_inv" in stacked_q
    act_inv = (stacked_q["act_inv"] if static_acts
               else jnp.ones((depth, 4), jnp.float32))

    if batch_block is not None:
        bm = min(batch_block, b)
    else:
        bm = snap_batch_block(default_batch_block(dim), b)
    b_pad = round_up(b, bm)

    xp = jnp.pad(x, ((0, b_pad - b), (0, n_pad - n), (0, 0)))
    xp = xp.reshape(b_pad * n_pad, dim)

    def wspec(shape):
        return pl.BlockSpec(
            (1,) + shape, lambda bi, li: (li,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    kernel = functools.partial(
        _encoder_kernel_int8,
        bm=bm, n_pad=n_pad, heads=heads, head_dim=head_dim, seq_len=n,
        eps=eps, scale=head_dim**-0.5,
        reference_residual=reference_residual, approx_gelu=approx_gelu,
        static_acts=static_acts,
    )

    out = pl.pallas_call(
        kernel,
        grid=(b_pad // bm, depth),
        in_specs=[
            pl.BlockSpec(
                (bm * n_pad, dim), lambda bi, li: (bi, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),         # act_inv [L, 4]
            wspec((1, dim)), wspec((1, dim)),              # ln1
            wspec((dim, inner)), wspec((1, inner)), wspec((1, inner)),   # qkv
            wspec((heads * head_dim, dim)), wspec((1, dim)), wspec((1, dim)),  # out
            wspec((1, dim)), wspec((1, dim)),              # ln2
            wspec((dim, mlp)), wspec((1, mlp)), wspec((1, mlp)),         # fc1
            wspec((mlp, dim)), wspec((1, dim)), wspec((1, dim)),         # fc2
        ],
        out_specs=pl.BlockSpec(
            (bm * n_pad, dim), lambda bi, li: (bi, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad * n_pad, dim), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm * n_pad, dim), x.dtype)],
        interpret=use_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=depth * b_pad * 2 * n_pad * (
                dim * inner + 2 * n_pad * head_dim * heads
                + head_dim * heads * dim + 2 * dim * mlp
            ),
            bytes_accessed=int(
                depth * (dim * inner + heads * head_dim * dim + 2 * dim * mlp)
                * (b_pad // bm)
            ),
            transcendentals=depth * b_pad * n_pad * (n_pad * heads + mlp),
        ),
    )(
        xp,
        act_inv,
        stacked_q["ln1_g"], stacked_q["ln1_b"],
        stacked_q["qkv_w"], stacked_q["qkv_s"], stacked_q["qkv_b"],
        stacked_q["out_w"], stacked_q["out_s"], stacked_q["out_b"],
        stacked_q["ln2_g"], stacked_q["ln2_b"],
        stacked_q["fc1_w"], stacked_q["fc1_s"], stacked_q["fc1_b"],
        stacked_q["fc2_w"], stacked_q["fc2_s"], stacked_q["fc2_b"],
    )
    return out.reshape(b_pad, n_pad, dim)[:b, :n, :]


# ---------------------------------------------------------------------------
# Int8 pipelined variant: int8 weights stay in HBM and double-buffer against
# compute like _encoder_kernel_pipelined — the int8 counterpart halves the
# streamed bytes again (DeiT-Base: 85 MB -> ~104 us of HBM at 819 GB/s,
# fully overlapped under the int8 MXU compute).
# ---------------------------------------------------------------------------


def _int8_mm_buf(h, wq, ws):
    """h [m, k] float x int8 weight VALUE (not ref) -> fp32, dynamic per-row
    activation quantization (same semantics as _int8_mm)."""
    q, s = _quant_rows_kernel(h)
    acc = jax.lax.dot_general(
        q, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return acc.astype(jnp.float32) * s * ws


def _encoder_kernel_int8_pipelined(
    x_ref,
    act_inv,                                     # SMEM [L, 4] f32
    ln1_g, ln1_b, qkv_s, qkv_b, out_s, out_b,
    ln2_g, ln2_b, fc1_s, fc1_b, fc2_s, fc2_b,   # VMEM [L, 1, d]
    qkv_w_hbm, out_w_hbm, fc1_w_hbm, fc2_w_hbm,  # ANY [L, in, out] int8
    o_ref,
    qkv_buf, out_buf, fc1_buf, fc2_buf,          # VMEM [2, in, out] int8
    sems,
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
    unroll: bool,
    static_acts: bool = False,
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

    dtype = x_ref.dtype
    col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
    key_mask = col < seq_len

    def layer(li, slot, x):
        dim = x.shape[-1]

        def mm(h, buf, s, j):
            if static_acts:
                return _int8_mm_static(h, buf[slot], s[li], act_inv[li, j])
            return _int8_mm_buf(h, buf[slot], s[li])

        h = _ln(x, ln1_g[li], ln1_b[li], eps).astype(dtype)
        qkv = (mm(h, qkv_buf, qkv_s, 0)
               + qkv_b[li].astype(jnp.float32)).astype(dtype)
        att = _attention_rows(qkv, bm=bm, n_pad=n_pad, heads=heads,
                              head_dim=head_dim, key_mask=key_mask,
                              scale=scale, dtype=dtype)
        attn_out = (mm(att, out_buf, out_s, 1)[:, :dim]
                    + out_b[li].astype(jnp.float32))
        x = (attn_out + (h if reference_residual else x).astype(jnp.float32)).astype(dtype)

        h2 = _ln(x, ln2_g[li], ln2_b[li], eps).astype(dtype)
        hid = (mm(h2, fc1_buf, fc1_s, 2)
               + fc1_b[li].astype(jnp.float32)).astype(dtype)
        hid = gelu_kernel(hid, approx_gelu).astype(dtype)
        mlp_out = (mm(hid, fc2_buf, fc2_s, 3)[:, :dim]
                   + fc2_b[li].astype(jnp.float32))
        return (mlp_out + (h2 if reference_residual else x).astype(jnp.float32)).astype(dtype)

    x = x_ref[:]
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

    o_ref[:] = x


def encoder_forward_int8_pipelined(
    x: jax.Array,
    stacked_q: dict,
    *,
    heads: int,
    head_dim: int,
    eps: float,
    reference_residual: bool = False,
    approx_gelu: bool = False,
    batch_block: int | None = None,
    n_pad_multiple: int = 8,
    unroll: bool = True,
) -> jax.Array:
    """Int8-weight whole-encoder kernel with double-buffered weight DMA.
    Same contract (and numerics) as encoder_forward_int8 — including the
    STATIC mode when ``stacked_q`` carries ``act_inv``."""
    b, n, dim = x.shape
    depth = stacked_q["qkv_w"].shape[0]
    inner = stacked_q["qkv_w"].shape[2]
    mlp = stacked_q["fc1_w"].shape[2]
    n_pad = round_up(n, n_pad_multiple)
    static_acts = "act_inv" in stacked_q
    act_inv = (stacked_q["act_inv"] if static_acts
               else jnp.ones((depth, 4), jnp.float32))

    bm = (min(batch_block, b) if batch_block is not None
          else snap_batch_block(default_batch_block(dim), b))
    b_pad = round_up(b, bm)

    xp = jnp.pad(x, ((0, b_pad - b), (0, n_pad - n), (0, 0)))
    xp = xp.reshape(b_pad * n_pad, dim)

    def pad_lane(a, m=128):
        pad = (-a.shape[-1]) % m
        if pad == 0:
            return a
        return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])

    inner_p = round_up(inner, 128)
    mlp_p = round_up(mlp, 128)
    dim_p = round_up(dim, 128)
    qkv_w = pad_lane(stacked_q["qkv_w"])
    qkv_s = pad_lane(stacked_q["qkv_s"])
    qkv_b = pad_lane(stacked_q["qkv_b"])
    out_w = pad_lane(stacked_q["out_w"])
    out_s = pad_lane(stacked_q["out_s"])
    fc1_w = pad_lane(stacked_q["fc1_w"])
    fc1_s = pad_lane(stacked_q["fc1_s"])
    fc1_b = pad_lane(stacked_q["fc1_b"])
    fc2_w = jnp.pad(stacked_q["fc2_w"],
                    ((0, 0), (0, mlp_p - mlp), (0, dim_p - dim)))
    fc2_s = pad_lane(stacked_q["fc2_s"])

    kernel = functools.partial(
        _encoder_kernel_int8_pipelined,
        depth=depth, bm=bm, n_pad=n_pad, heads=heads, head_dim=head_dim,
        seq_len=n, eps=eps, scale=head_dim**-0.5,
        reference_residual=reference_residual, approx_gelu=approx_gelu,
        unroll=unroll, static_acts=static_acts,
    )

    wbytes2 = 2 * (dim * inner_p + heads * head_dim * dim_p + dim * mlp_p
                   + mlp_p * dim_p)
    vmem_limit = min(100 * 1024 * 1024, wbytes2 + 24 * 1024 * 1024)

    vres = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = lambda: pl.BlockSpec(memory_space=pl.ANY)

    out = pl.pallas_call(
        kernel,
        grid=(b_pad // bm,),
        in_specs=[
            pl.BlockSpec((bm * n_pad, dim), lambda bi: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),       # act_inv [L, 4]
        ] + [vres()] * 12 + [hbm()] * 4,
        out_specs=pl.BlockSpec((bm * n_pad, dim), lambda bi: (bi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad * n_pad, dim), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, dim, inner_p), jnp.int8),
            pltpu.VMEM((2, heads * head_dim, dim_p), jnp.int8),
            pltpu.VMEM((2, dim, mlp_p), jnp.int8),
            pltpu.VMEM((2, mlp_p, dim_p), jnp.int8),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
        interpret=use_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit,
        ),
        cost_estimate=pl.CostEstimate(
            flops=depth * b_pad * 2 * n_pad * (
                dim * inner + 2 * n_pad * head_dim * heads
                + head_dim * heads * dim + 2 * dim * mlp
            ),
            bytes_accessed=int(
                depth * (dim * inner + heads * head_dim * dim + 2 * dim * mlp)
                * (b_pad // bm)
            ),
            transcendentals=depth * b_pad * n_pad * (n_pad * heads + mlp),
        ),
    )(
        xp,
        act_inv,
        stacked_q["ln1_g"], stacked_q["ln1_b"], qkv_s, qkv_b,
        out_s, stacked_q["out_b"],
        stacked_q["ln2_g"], stacked_q["ln2_b"], fc1_s, fc1_b,
        fc2_s, stacked_q["fc2_b"],
        qkv_w, out_w, fc1_w, fc2_w,
    )
    return out.reshape(b_pad, n_pad, dim)[:b, :n, :]


# ---------------------------------------------------------------------------
# MLP-blocked variant: supports models whose per-layer weights exceed VMEM
# (DeiT-Base: 2x14 MB double-buffered).  Grid (batch_blocks, depth, S): the
# attention sublayer runs at substage 0; the MLP streams fc1/fc2 in S
# hidden-dim chunks accumulated in an fp32 scratch.
# ---------------------------------------------------------------------------


def _encoder_kernel_blocked(
    x_ref,
    ln1_g_ref, ln1_b_ref, qkv_w_ref, qkv_b_ref, out_w_ref, out_b_ref,
    ln2_g_ref, ln2_b_ref, fc1_w_ref, fc1_b_ref, fc2_w_ref, fc2_b_ref,
    o_ref,
    x_scratch,
    macc,          # [bm*n_pad, dim] fp32 MLP accumulator
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
):
    li = pl.program_id(1)
    si = pl.program_id(2)
    n_sub = pl.num_programs(2)

    @pl.when(jnp.logical_and(li == 0, si == 0))
    def _():
        x_scratch[:] = x_ref[:]

    dtype = x_scratch.dtype

    # ---- attention sublayer (substage 0 only) ----
    @pl.when(si == 0)
    def _():
        x = x_scratch[:]
        h = _ln(x, ln1_g_ref[0], ln1_b_ref[0], eps).astype(dtype)
        qkv = (
            jax.lax.dot(h, qkv_w_ref[0], preferred_element_type=jnp.float32)
            .astype(dtype)
            + qkv_b_ref[0]
        )
        col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
        key_mask = col < seq_len
        att = _attention_rows(qkv, bm=bm, n_pad=n_pad, heads=heads,
                              head_dim=head_dim, key_mask=key_mask,
                              scale=scale, dtype=dtype)
        attn_out = (
            jax.lax.dot(att, out_w_ref[0], preferred_element_type=jnp.float32)
            + out_b_ref[0].astype(jnp.float32)
        )
        xa = (attn_out + (h if reference_residual else x).astype(jnp.float32)).astype(dtype)
        x_scratch[:] = xa
        # init MLP accumulator with the fc2 bias
        macc[:] = jnp.zeros_like(macc) + fc2_b_ref[0].astype(jnp.float32)

    # ---- MLP chunk (every substage) ----
    x = x_scratch[:]
    h2 = _ln(x, ln2_g_ref[0], ln2_b_ref[0], eps).astype(dtype)
    hid = (
        jax.lax.dot(h2, fc1_w_ref[0], preferred_element_type=jnp.float32)
        .astype(dtype)
        + fc1_b_ref[0]
    )
    hid = gelu_kernel(hid, approx_gelu).astype(dtype)
    macc[:] = macc[:] + jax.lax.dot(hid, fc2_w_ref[0],
                                    preferred_element_type=jnp.float32)

    @pl.when(si == n_sub - 1)
    def _():
        xm = (macc[:] + (h2 if reference_residual else x).astype(jnp.float32)).astype(dtype)
        x_scratch[:] = xm

        @pl.when(li == pl.num_programs(1) - 1)
        def _():
            o_ref[:] = xm


def encoder_forward_blocked(
    x: jax.Array,
    stacked: dict,
    *,
    heads: int,
    head_dim: int,
    eps: float,
    reference_residual: bool = False,
    approx_gelu: bool = False,
    batch_block: int | None = None,
    n_pad_multiple: int = 8,
    mlp_chunk: int = 768,
) -> jax.Array:
    """MLP-blocked whole-encoder kernel (for dim >= 768 models)."""
    b, n, dim = x.shape
    depth = stacked["qkv_w"].shape[0]
    inner = stacked["qkv_w"].shape[2]
    mlp = stacked["fc1_w"].shape[2]
    if mlp % mlp_chunk != 0:
        raise ValueError(f"mlp {mlp} not divisible by chunk {mlp_chunk}")
    n_sub = mlp // mlp_chunk
    n_pad = round_up(n, n_pad_multiple)

    bm = batch_block if batch_block is not None else 1
    bm = min(max(bm, 1), b)
    b_pad = round_up(b, bm)

    xp = jnp.pad(x, ((0, b_pad - b), (0, n_pad - n), (0, 0)))
    xp = xp.reshape(b_pad * n_pad, dim)

    def wspec(shape):
        return pl.BlockSpec((1,) + shape, lambda bi, li, si: (li,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _encoder_kernel_blocked,
        bm=bm, n_pad=n_pad, heads=heads, head_dim=head_dim, seq_len=n,
        eps=eps, scale=head_dim**-0.5,
        reference_residual=reference_residual, approx_gelu=approx_gelu,
    )

    out = pl.pallas_call(
        kernel,
        grid=(b_pad // bm, depth, n_sub),
        in_specs=[
            pl.BlockSpec((bm * n_pad, dim), lambda bi, li, si: (bi, 0),
                         memory_space=pltpu.VMEM),
            wspec((1, dim)), wspec((1, dim)),
            wspec((dim, inner)), wspec((1, inner)),
            wspec((heads * head_dim, dim)), wspec((1, dim)),
            wspec((1, dim)), wspec((1, dim)),
            # fc1 chunked over hidden cols; fc2 over hidden rows
            pl.BlockSpec((1, dim, mlp_chunk), lambda bi, li, si: (li, 0, si),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, mlp_chunk), lambda bi, li, si: (li, 0, si),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mlp_chunk, dim), lambda bi, li, si: (li, si, 0),
                         memory_space=pltpu.VMEM),
            wspec((1, dim)),
        ],
        out_specs=pl.BlockSpec((bm * n_pad, dim), lambda bi, li, si: (bi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad * n_pad, dim), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bm * n_pad, dim), x.dtype),
            pltpu.VMEM((bm * n_pad, dim), jnp.float32),
        ],
        interpret=use_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        xp,
        stacked["ln1_g"], stacked["ln1_b"],
        stacked["qkv_w"], stacked["qkv_b"],
        stacked["out_w"], stacked["out_b"],
        stacked["ln2_g"], stacked["ln2_b"],
        stacked["fc1_w"], stacked["fc1_b"],
        stacked["fc2_w"], stacked["fc2_b"],
    )
    return out.reshape(b_pad, n_pad, dim)[:b, :n, :]
