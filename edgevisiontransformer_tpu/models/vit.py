"""ViT / DeiT family, TPU-first.

Capability parity with /root/reference/modeling/models/vit.py (ViT, ViT_Pruned,
get_deit_{tiny,small,base}) and /root/reference/modeling/layers/* — re-designed
as Flax modules whose hot math lives in edgevisiontransformer_tpu.ops so the
XLA and Pallas paths are interchangeable.

Two variants exist per SURVEY.md §2.1 #7:
  * reference-style (``**REFERENCE_STYLE``): reproduces the TF reference's
    pre-norm quirk ``fn(LN(x)) + LN(x)`` and 2-layer MLP classifier head.
  * standard-style: real DeiT semantics, loadable from HF/timm weights.

Pruned shapes (ViT_Pruned, vit.py:58-97) are expressed as *static* per-layer
(heads, mlp_dim) tuples in the config, so XLA compiles shape-specialized
programs — the TPU analogue of the reference's physically-shrunken GEMMs.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import REFERENCE_STYLE, STANDARD_STYLE, ViTConfig, decode_prune_encoding
from ..ops.activations import get_act, get_gelu
from ..ops.attention import attention_xla
from ..ops.layers import layer_norm, mlp_block, patch_embed


class Attention(nn.Module):
    """Fused-QKV multi-head self-attention (reference attention.py:5-36)."""

    config: ViTConfig
    layer_idx: int = 0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        heads = cfg.layer_heads(self.layer_idx)
        head_dim = cfg.resolved_head_dim
        dim = cfg.dim
        inner = 3 * heads * head_dim

        w_qkv = self.param(
            "qkv_kernel", nn.initializers.xavier_uniform(), (dim, inner), cfg.param_dtype
        )
        b_qkv = (
            self.param("qkv_bias", nn.initializers.zeros_init(), (inner,), cfg.param_dtype)
            if cfg.qkv_bias
            else None
        )
        w_out = self.param(
            "out_kernel",
            nn.initializers.xavier_uniform(),
            (heads * head_dim, dim),
            cfg.param_dtype,
        )
        b_out = self.param("out_bias", nn.initializers.zeros_init(), (dim,), cfg.param_dtype)

        x = x.astype(cfg.dtype)
        w_qkv = w_qkv.astype(cfg.dtype)
        w_out = w_out.astype(cfg.dtype)
        b_qkv_c = b_qkv.astype(cfg.dtype) if b_qkv is not None else None
        b_out_c = b_out.astype(cfg.dtype)

        if cfg.kernel_mode == "pallas":
            from ..ops.pallas import fused_attention

            return fused_attention.attention(
                x, w_qkv, b_qkv_c, w_out, b_out_c, heads, head_dim
            )
        return attention_xla(x, w_qkv, b_qkv_c, w_out, b_out_c, heads, head_dim)


class FeedForward(nn.Module):
    """Dense(hidden, gelu) -> Dense(dim) (reference ffn.py:5-12)."""

    config: ViTConfig
    layer_idx: int = 0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        hidden = cfg.layer_mlp_dim(self.layer_idx)
        dim = cfg.dim
        w1 = self.param(
            "fc1_kernel", nn.initializers.xavier_uniform(), (dim, hidden), cfg.param_dtype
        )
        b1 = self.param("fc1_bias", nn.initializers.zeros_init(), (hidden,), cfg.param_dtype)
        w2 = self.param(
            "fc2_kernel", nn.initializers.xavier_uniform(), (hidden, dim), cfg.param_dtype
        )
        b2 = self.param("fc2_bias", nn.initializers.zeros_init(), (dim,), cfg.param_dtype)

        act = get_act(cfg)
        x = x.astype(cfg.dtype)
        if cfg.kernel_mode == "pallas" and cfg.act != "relu":
            from ..ops.pallas import fused_mlp

            return fused_mlp.mlp(
                x,
                w1.astype(cfg.dtype),
                b1.astype(cfg.dtype),
                w2.astype(cfg.dtype),
                b2.astype(cfg.dtype),
                approx_gelu=cfg.gelu_approx,
            )
        return mlp_block(
            x,
            w1.astype(cfg.dtype),
            b1.astype(cfg.dtype),
            w2.astype(cfg.dtype),
            b2.astype(cfg.dtype),
            act,
        )


class LayerNormP(nn.Module):
    """Parameterized LayerNorm over last axis.

    With cfg.norm_mode == "nonorm" the same params act as a plain affine —
    the compiled endpoint of the Layer2NoNorm transition (vendor
    nonorm.py:92-103 compile(): running stats folded into scale/bias).
    """

    config: ViTConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        gamma = self.param("scale", nn.initializers.ones_init(), (x.shape[-1],), cfg.param_dtype)
        beta = self.param("bias", nn.initializers.zeros_init(), (x.shape[-1],), cfg.param_dtype)
        if cfg.norm_mode == "nonorm":
            return x * gamma + beta
        return layer_norm(x, gamma, beta, cfg.layernorm_eps)


class EncoderBlock(nn.Module):
    """One pre-norm transformer block.

    reference_residual=True reproduces LayerNorm(Residual(fn), pre=True) ==
    ``fn(LN(x)) + LN(x)`` (reference norm.py:10-12 + residual.py:9); otherwise
    the standard ``x + fn(LN(x))``.
    """

    config: ViTConfig
    layer_idx: int = 0

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        cfg = self.config
        attn = Attention(cfg, self.layer_idx, name="attn")
        ffn = FeedForward(cfg, self.layer_idx, name="ffn")
        ln1 = LayerNormP(cfg, name="ln1")
        ln2 = LayerNormP(cfg, name="ln2")
        drop = nn.Dropout(cfg.dropout_rate, deterministic=not train or cfg.dropout_rate == 0.0)
        if cfg.reference_residual:
            h = ln1(x)
            x = drop(attn(h)) + h
            h = ln2(x)
            x = drop(ffn(h)) + h
        else:
            x = x + drop(attn(ln1(x)))
            x = x + drop(ffn(ln2(x)))
        return x


class ViT(nn.Module):
    """Vision Transformer encoder + classifier (reference vit.py:9-55)."""

    config: ViTConfig

    @nn.compact
    def __call__(self, img: jax.Array, train: bool = False) -> jax.Array:
        cfg = self.config
        p, c, dim = cfg.patch_size, cfg.in_channels, cfg.dim
        n = cfg.num_patches

        w_patch = self.param(
            "patch_kernel",
            nn.initializers.xavier_uniform(),
            (p * p * c, dim),
            cfg.param_dtype,
        )
        b_patch = self.param(
            "patch_bias", nn.initializers.zeros_init(), (dim,), cfg.param_dtype
        )
        cls_token = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, dim), cfg.param_dtype
        )
        pos_embedding = self.param(
            "pos_embedding", nn.initializers.normal(0.02), (n + 1, dim), cfg.param_dtype
        )

        img = img.astype(cfg.dtype)
        x = patch_embed(img, w_patch.astype(cfg.dtype), b_patch.astype(cfg.dtype), p)

        cls = jnp.broadcast_to(cls_token.astype(cfg.dtype), (x.shape[0], 1, dim))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + pos_embedding.astype(cfg.dtype)

        # cfg.remat: checkpoint each block so the backward rematerializes
        # block internals one layer at a time (param tree is unchanged —
        # nn.remat preserves module names).  train rides as a static arg.
        block_cls = (nn.remat(EncoderBlock, static_argnums=(2,))
                     if cfg.remat else EncoderBlock)
        for i in range(cfg.depth):
            x = block_cls(cfg, i, name=f"block_{i}")(x, train)

        if cfg.final_norm:
            x = LayerNormP(cfg, name="final_norm")(x)

        x = x[:, 0]  # cls token

        if cfg.mlp_head:
            # Reference 2-layer head (vit.py:38-39).
            h = nn.Dense(cfg.mlp_dim, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="head_fc1")(x)
            h = get_gelu(cfg.gelu_approx)(h)
            return nn.Dense(
                cfg.num_classes, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="head_fc2"
            )(h)
        return nn.Dense(
            cfg.num_classes, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="head"
        )(x)


# ---------------------------------------------------------------------------
# Factories (reference vit.py:100-109)
# ---------------------------------------------------------------------------

_DEIT_SHAPES = {
    "tiny": dict(dim=192, depth=12, heads=3, mlp_dim=768),
    "small": dict(dim=384, depth=12, heads=6, mlp_dim=1536),
    "base": dict(dim=768, depth=12, heads=12, mlp_dim=3072),
}


def deit_config(size: str = "tiny", style: str = "standard", **overrides) -> ViTConfig:
    """Build a DeiT config. style in {"standard", "reference"}."""
    shape = _DEIT_SHAPES[size]
    style_kw = REFERENCE_STYLE if style == "reference" else STANDARD_STYLE
    return ViTConfig(**{**shape, **style_kw, **overrides})


def get_deit_tiny(style: str = "standard", **kw) -> ViT:
    return ViT(deit_config("tiny", style, **kw))


def get_deit_small(style: str = "standard", **kw) -> ViT:
    return ViT(deit_config("small", style, **kw))


def get_deit_base(style: str = "standard", **kw) -> ViT:
    return ViT(deit_config("base", style, **kw))


def encoder_segments(cfg) -> list:
    """Segment consecutive layers with identical (heads, mlp) shapes —
    each run becomes one pallas_call (the reference's ViT_Pruned layerwise
    encodings, vit.py:58-97).  Returns [(start, depth, heads, mlp_dim)]."""
    shapes = [(cfg.layer_heads(i), cfg.layer_mlp_dim(i)) for i in range(cfg.depth)]
    segments = []
    for i, sh in enumerate(shapes):
        if segments and segments[-1][2:] == sh:
            start, d, h_, m_ = segments[-1]
            segments[-1] = (start, d + 1, h_, m_)
        else:
            segments.append((i, 1, sh[0], sh[1]))
    return segments


def fused_vit_apply(model: ViT, variables, img: jax.Array,
                    batch_block: int | None = None,
                    n_pad_multiple: int = 8,
                    pack_layers: bool | None = None) -> jax.Array:
    """Forward pass using the whole-encoder Pallas kernel.

    Same params as ``model.apply`` (bit-for-bit interchangeable); the encoder
    stack runs as one pallas_call (ops/pallas/fused_encoder.py) instead of
    per-layer XLA ops.  Non-uniform (layerwise-pruned) models are segmented:
    each run of consecutive identically-shaped layers becomes one pallas_call
    (the reference's ViT_Pruned layerwise encodings, vit.py:58-97 — their
    latency must track MACs, BASELINE.md).

    ``pack_layers``: head-pack a many-segment layerwise model into ONE
    zero-padded uniform kernel (exact; see stack_vit_layer_params_packed).
    MEASURED NEGATIVE RESULT (SURVEY §7 head-packing hard part): on v5e,
    h2d0.5/h1d0.3 alternating (12 segments, the worst case for per-call
    overhead), interleaved A/B x5: packed 40.8 us p50 vs segmented 38.6 —
    the padded layers' extra FLOPs (~2x MACs for this config) cost more
    than the ~1.5 us/call grid-step overhead the packing saves, even at
    batch 1.  So the default (None) never packs; the path is kept
    selectable (pack_layers=True) for configs with near-uniform shapes
    where padding is nearly free, and as the compile-count bound for
    latency-predictor collection sweeps.
    """
    from ..ops.pallas.fused_encoder import (
        encoder_forward,
        encoder_forward_blocked,
        encoder_forward_pipelined,
        stack_vit_layer_params,
        stack_vit_layer_params_packed,
    )

    cfg = model.config
    if cfg.norm_mode != "layernorm" or cfg.act != "gelu":
        # transitions-compiled (NoNorm / ReLU) models: the kernels compute
        # real LayerNorm + GELU — refuse loudly rather than silently
        # re-normalizing affine-folded params
        raise ValueError(
            "fused encoder supports norm_mode='layernorm' + act='gelu' only; "
            f"got norm_mode={cfg.norm_mode!r}, act={cfg.act!r} (use model.apply)"
        )
    p = variables["params"]

    img = img.astype(cfg.dtype)
    x = patch_embed(
        img,
        p["patch_kernel"].astype(cfg.dtype),
        p["patch_bias"].astype(cfg.dtype),
        cfg.patch_size,
    )
    cls = jnp.broadcast_to(p["cls_token"].astype(cfg.dtype), (x.shape[0], 1, cfg.dim))
    x = jnp.concatenate([cls, x], axis=1) + p["pos_embedding"].astype(cfg.dtype)

    segments = encoder_segments(cfg)

    base_kw = dict(
        head_dim=cfg.resolved_head_dim,
        eps=cfg.layernorm_eps,
        reference_residual=cfg.reference_residual,
        approx_gelu=cfg.gelu_approx,
        batch_block=batch_block,
        n_pad_multiple=n_pad_multiple,
    )

    if pack_layers and len(segments) > 1:
        from ..ops.pallas.fused_encoder import pipelined_weights_fit

        hmax = max(s[2] for s in segments)
        mlp_max = max(s[3] for s in segments)
        itemsize = jnp.dtype(cfg.dtype).itemsize
        if pipelined_weights_fit(cfg.dim, 3 * hmax * cfg.resolved_head_dim,
                                 mlp_max, hmax, cfg.resolved_head_dim,
                                 itemsize):
            from ..ops.pallas.common import default_batch_block, snap_batch_block

            stacked = stack_vit_layer_params_packed(
                p, [cfg.layer_heads(i) for i in range(cfg.depth)],
                [cfg.layer_mlp_dim(i) for i in range(cfg.depth)],
                cfg.resolved_head_dim, cfg.qkv_bias)
            stacked = jax.tree.map(lambda a: a.astype(cfg.dtype), stacked)
            bm_eff = (min(batch_block, img.shape[0]) if batch_block is not None
                      else snap_batch_block(default_batch_block(cfg.dim),
                                            img.shape[0]))
            x = encoder_forward_pipelined(
                x, stacked, heads=hmax,
                unroll=cfg.depth * hmax * bm_eff <= 96, **base_kw)
            segments = []

    for start, seg_depth, heads, mlp_d in segments:
        stacked = stack_vit_layer_params(p, seg_depth, cfg.qkv_bias, start=start)
        stacked = jax.tree.map(lambda a: a.astype(cfg.dtype), stacked)
        inner = stacked["qkv_w"].shape[2]
        itemsize = jnp.dtype(cfg.dtype).itemsize
        layer_bytes = itemsize * (
            cfg.dim * inner + heads * cfg.resolved_head_dim * cfg.dim
            + 2 * cfg.dim * mlp_d
        )
        from ..ops.pallas.common import default_batch_block, snap_batch_block

        # mirror the kernel wrappers' divisor snap so the unroll gate sees
        # the bm the kernel will actually use
        bm_eff = (min(batch_block, img.shape[0]) if batch_block is not None
                  else snap_batch_block(default_batch_block(cfg.dim),
                                        img.shape[0]))
        from ..ops.pallas.fused_encoder import pipelined_weights_fit

        fits = pipelined_weights_fit(cfg.dim, inner, mlp_d, heads,
                                     cfg.resolved_head_dim, itemsize)
        iters = seg_depth * heads * bm_eff
        if fits and (iters <= 96 or bm_eff == 1):
            # manually double-buffered weight DMA in one program: overlaps
            # the weight stream with compute AND avoids per-layer grid-step
            # overhead (measured v5e b1: tiny 33 vs 52 us resident / 46
            # streamed; small 88 vs 96; base 262 vs 350 MLP-blocked).  Over
            # ~96 in-kernel attention iterations the depth loop switches to
            # lax.fori_loop (the unrolled base form exceeds the remote
            # compiler's budget).  Large batch blocks keep the streamed
            # variant below — measured faster there (tiny b128 bm16: 4.40 ms
            # streamed vs 4.57 pipelined-fori).
            x = encoder_forward_pipelined(
                x, stacked, heads=heads, unroll=iters <= 96, **base_kw)
        elif 2 * layer_bytes > 16 * 1024 * 1024 and mlp_d % 768 == 0:
            # per-layer weights too big to double-buffer: stream the MLP in
            # hidden-dim chunks
            x = encoder_forward_blocked(x, stacked, mlp_chunk=768, heads=heads,
                                        **base_kw)
        else:
            x = encoder_forward(x, stacked, heads=heads, **base_kw)

    if cfg.final_norm:
        x = layer_norm(
            x, p["final_norm"]["scale"], p["final_norm"]["bias"], cfg.layernorm_eps
        )
    x = x[:, 0]
    act = get_gelu(cfg.gelu_approx)
    if cfg.mlp_head:
        h = x @ p["head_fc1"]["kernel"].astype(cfg.dtype) + p["head_fc1"]["bias"].astype(cfg.dtype)
        h = act(h)
        return h @ p["head_fc2"]["kernel"].astype(cfg.dtype) + p["head_fc2"]["bias"].astype(cfg.dtype)
    return x @ p["head"]["kernel"].astype(cfg.dtype) + p["head"]["bias"].astype(cfg.dtype)


def prepare_vit_int8(model: ViT, variables) -> dict:
    """Quantize the encoder stack to int8 once (per-layer, per-output-channel
    scales).  Pure function of the params — hoist out of the forward; the
    result feeds fused_vit_apply_int8.

    Uniform models return one stacked dict; layerwise-pruned models return
    {"segments": [stacked, ...]} — one int8 stack per uniform run of layers
    (the same segmentation as fused_vit_apply)."""
    from ..ops.pallas.fused_encoder import (
        quantize_stacked_int8,
        stack_vit_layer_params,
    )

    cfg = model.config
    p = variables["params"]
    segs = encoder_segments(cfg)
    if len(segs) == 1:
        return quantize_stacked_int8(
            stack_vit_layer_params(p, cfg.depth, cfg.qkv_bias))
    return {"segments": [
        quantize_stacked_int8(
            stack_vit_layer_params(p, d, cfg.qkv_bias, start=s))
        for s, d, _, _ in segs
    ]}


def stacks_from_quantized_tree(cfg, qtree) -> dict:
    """Rebuild the fused int8 kernel stacks from a CONVERT-SAVED quantized
    param tree (quantize_vit_params_int8[_static] output restored from an
    orbax checkpoint) — the consume half of the reference's convert -> run
    loop (tf2tflite -> mobile_benchmark/eval_tflite, tools.py:1023-1075).

    The saved tree keeps kernel leaves as {"q": int8, "scale": f32[out]
    [, "act_scale": f32 scalar]} and everything else float; quantization
    already happened at convert time, so this is pure re-stacking — the
    result is bit-identical to prepare_vit_int8[_static] on the original
    float params.  Returns the same uniform-or-{"segments": [...]} shape."""
    import numpy as np

    p = qtree["params"] if "params" in qtree else qtree
    keymap = (("qkv_w", lambda b: b["attn"]["qkv_kernel"]),
              ("out_w", lambda b: b["attn"]["out_kernel"]),
              ("fc1_w", lambda b: b["ffn"]["fc1_kernel"]),
              ("fc2_w", lambda b: b["ffn"]["fc2_kernel"]))

    def one_segment(start: int, depth: int) -> dict:
        def stack(getter):
            arrs = [getter(p[f"block_{i}"])
                    for i in range(start, start + depth)]
            out = jnp.stack([jnp.asarray(a) for a in arrs])
            if out.ndim == 2:
                out = out[:, None, :]
            return out

        inner = np.asarray(p[f"block_{start}"]["attn"]["qkv_kernel"]["q"]).shape[1]
        stacked = {
            "ln1_g": stack(lambda b: b["ln1"]["scale"]),
            "ln1_b": stack(lambda b: b["ln1"]["bias"]),
            "qkv_b": stack(lambda b: b["attn"]["qkv_bias"]) if cfg.qkv_bias
            else jnp.zeros((depth, 1, inner), jnp.float32),
            "out_b": stack(lambda b: b["attn"]["out_bias"]),
            "ln2_g": stack(lambda b: b["ln2"]["scale"]),
            "ln2_b": stack(lambda b: b["ln2"]["bias"]),
            "fc1_b": stack(lambda b: b["ffn"]["fc1_bias"]),
            "fc2_b": stack(lambda b: b["ffn"]["fc2_bias"]),
        }
        static = "act_scale" in p[f"block_{start}"]["attn"]["qkv_kernel"]
        act_inv = np.ones((depth, 4), np.float32)
        for j, (key, getter) in enumerate(keymap):
            stacked[key] = stack(lambda b: getter(b)["q"]).astype(jnp.int8)
            # saved [out] scales (dynamic: weight; static: combined w*act)
            # -> the stacked [L, 1, out] form
            stacked[key.replace("_w", "_s")] = stack(
                lambda b: getter(b)["scale"]).astype(jnp.float32)
            if static:
                for li in range(depth):
                    act_inv[li, j] = 1.0 / float(np.asarray(
                        p[f"block_{start + li}"]["attn" if j < 2 else "ffn"][
                            ("qkv_kernel", "out_kernel", "fc1_kernel",
                             "fc2_kernel")[j]]["act_scale"]))
        if static:
            stacked["act_inv"] = jnp.asarray(act_inv)
        # float glue (ln/bias) follows the model compute dtype, like the
        # prepare-time stacks; scales/act_inv stay fp32, weights int8
        for k in ("ln1_g", "ln1_b", "ln2_g", "ln2_b",
                  "qkv_b", "out_b", "fc1_b", "fc2_b"):
            stacked[k] = stacked[k].astype(cfg.dtype)
        return stacked

    segs = encoder_segments(cfg)
    if len(segs) == 1:
        return one_segment(0, cfg.depth)
    return {"segments": [one_segment(s, d) for s, d, _, _ in segs]}


def prepare_vit_int8_static(model: ViT, variables,
                            act_scales=None, calib_batches=None,
                            percentile: float | None = None,
                            method: str = "absmax") -> dict:
    """Static (full-integer-style) int8 prep: calibrate activation scales on
    representative data (ops/quant.calibrate_vit — the converter's
    representative_data_gen analogue, /root/reference/utils.py:263-277) and
    fold them into the quantized stack.  The result feeds
    fused_vit_apply_int8, which then quantizes activations with FIXED
    per-tensor scales — no per-row dynamic absmax at inference.

    Layerwise-pruned models return {"segments": [...]}, each segment's
    stack folded with its slice of the per-layer calibrated scales."""
    from ..ops.pallas.fused_encoder import (
        quantize_stacked_int8_static,
        stack_vit_layer_params,
    )
    from ..ops.quant import calibrate_vit

    cfg = model.config
    if act_scales is None:
        act_scales = calibrate_vit(model, variables, batches=calib_batches,
                                   percentile=percentile, method=method)
    p = variables["params"]
    segs = encoder_segments(cfg)
    if len(segs) == 1:
        return quantize_stacked_int8_static(
            stack_vit_layer_params(p, cfg.depth, cfg.qkv_bias), act_scales)
    return {"segments": [
        quantize_stacked_int8_static(
            stack_vit_layer_params(p, d, cfg.qkv_bias, start=s),
            act_scales[s:s + d])
        for s, d, _, _ in segs
    ]}


def _int8_encoder_dispatch(x: jax.Array, sq: dict, *, heads: int, depth: int,
                           cfg, batch_block: int | None,
                           variant: str) -> jax.Array:
    """Shared int8 kernel-variant gate (ViT segments and the T2T encoder):
    double-buffered pipelined when two layers of int8 weights fit VMEM and
    the unroll budget allows (the bf16 gate with itemsize=1), else the
    grid-streamed kernel."""
    from ..ops.pallas.common import default_batch_block, snap_batch_block
    from ..ops.pallas.fused_encoder import (
        encoder_forward_int8,
        encoder_forward_int8_pipelined,
        pipelined_weights_fit,
    )

    inner = sq["qkv_w"].shape[2]
    mlp_d = sq["fc1_w"].shape[2]
    bm_eff = (min(batch_block, x.shape[0]) if batch_block is not None
              else snap_batch_block(default_batch_block(cfg.dim), x.shape[0]))
    iters = depth * heads * bm_eff
    fits = pipelined_weights_fit(cfg.dim, inner, mlp_d, heads,
                                 cfg.resolved_head_dim, itemsize=1)
    kw = dict(head_dim=cfg.resolved_head_dim, eps=cfg.layernorm_eps,
              reference_residual=cfg.reference_residual,
              approx_gelu=cfg.gelu_approx, batch_block=batch_block)
    if variant == "pipelined" or (
        variant == "auto" and fits and (iters <= 96 or bm_eff == 1)
    ):
        return encoder_forward_int8_pipelined(
            x, sq, heads=heads, unroll=iters <= 96, **kw)
    return encoder_forward_int8(x, sq, heads=heads, **kw)


def fused_vit_apply_int8(model: ViT, variables, img: jax.Array,
                         stacked_q: dict | None = None,
                         batch_block: int | None = None,
                         variant: str = "auto") -> jax.Array:
    """Forward with the int8-weight-streaming whole-encoder kernel.

    With a ``prepare_vit_int8`` stack: dynamic-range semantics ==
    ops/quant.int8_vit_apply (per-row activation quant x per-channel weight
    scales, the TFLite dynamic mode analogue,
    /root/reference/utils.py:260-262) — but the weights cross HBM as int8,
    halving the traffic that bounds DeiT-Base b1.  With a
    ``prepare_vit_int8_static`` stack: full-integer-style static scales
    (TFLITE_BUILTINS_INT8 analogue).  Embedding and head stay float in both.

    ``variant``: "auto" picks double-buffered pipelined when two layers of
    int8 weights fit VMEM and the unroll budget allows (the bf16 gate of
    fused_vit_apply, with itemsize=1); "streamed"/"pipelined" force a kernel.

    Layerwise-pruned models run one int8 kernel per uniform segment (the
    fused_vit_apply segmentation; stacks from prepare_vit_int8[_static]'s
    {"segments": [...]} form).
    """
    cfg = model.config
    if cfg.norm_mode != "layernorm" or cfg.act != "gelu":
        raise ValueError(
            "int8 fused encoder supports norm_mode='layernorm' + act='gelu' "
            f"only; got norm_mode={cfg.norm_mode!r}, act={cfg.act!r}"
        )
    if stacked_q is None:
        stacked_q = prepare_vit_int8(model, variables)
    segs = encoder_segments(cfg)
    seg_stacks = (stacked_q["segments"] if "segments" in stacked_q
                  else [stacked_q])
    if len(seg_stacks) != len(segs):
        raise ValueError(
            f"stacked_q has {len(seg_stacks)} segment(s) but the config "
            f"segments into {len(segs)} — re-run prepare_vit_int8[_static] "
            "for this model")

    p = variables["params"]
    img = img.astype(cfg.dtype)
    x = patch_embed(
        img, p["patch_kernel"].astype(cfg.dtype),
        p["patch_bias"].astype(cfg.dtype), cfg.patch_size,
    )
    cls = jnp.broadcast_to(p["cls_token"].astype(cfg.dtype), (x.shape[0], 1, cfg.dim))
    x = jnp.concatenate([cls, x], axis=1) + p["pos_embedding"].astype(cfg.dtype)

    for (start, seg_depth, heads, _), sq in zip(segs, seg_stacks):
        x = _int8_encoder_dispatch(x, sq, heads=heads, depth=seg_depth,
                                   cfg=cfg, batch_block=batch_block,
                                   variant=variant)

    if cfg.final_norm:
        x = layer_norm(
            x, p["final_norm"]["scale"], p["final_norm"]["bias"], cfg.layernorm_eps
        )
    x = x[:, 0]
    act = get_gelu(cfg.gelu_approx)
    if cfg.mlp_head:
        h = x @ p["head_fc1"]["kernel"].astype(cfg.dtype) + p["head_fc1"]["bias"].astype(cfg.dtype)
        h = act(h)
        return h @ p["head_fc2"]["kernel"].astype(cfg.dtype) + p["head_fc2"]["bias"].astype(cfg.dtype)
    return x @ p["head"]["kernel"].astype(cfg.dtype) + p["head"]["bias"].astype(cfg.dtype)


def fully_fused_vit_apply(model: ViT, variables, img: jax.Array,
                          batch_block: int | None = None) -> jax.Array:
    """Forward pass as ONE Pallas kernel (patch-embed + encoder + head).

    Standard-style models only (single linear head); same params as
    ``model.apply``.  The only XLA op is the patch rearrange of the input.
    Dispatches to the double-buffered-DMA pipelined program when two layers
    of (lane-padded) weights fit VMEM; falls back to the layer-grid
    streamed kernel otherwise.
    """
    from ..ops.pallas.fused_vit_full import (
        vit_full_forward,
        vit_full_forward_pipelined,
    )
    from ..ops.pallas.fused_encoder import stack_vit_layer_params

    cfg = model.config
    if cfg.mlp_head or cfg.heads_per_layer is not None or cfg.mlp_dim_per_layer is not None:
        raise ValueError("fully-fused path requires standard head + uniform layers")
    p = variables["params"]
    dt = cfg.dtype

    b = img.shape[0]
    ps = cfg.patch_size
    gh = cfg.image_size // ps
    img = img.astype(dt)
    patches = img.reshape(b, cfg.in_channels, gh, ps, gh, ps)
    patches = jnp.transpose(patches, (0, 2, 4, 3, 5, 1)).reshape(
        b, gh * gh, ps * ps * cfg.in_channels
    )

    pos = p["pos_embedding"].astype(dt)
    embed_bias = pos.at[0].add(p["cls_token"].astype(dt)[0, 0])
    embed_bias = embed_bias.at[1:].add(p["patch_bias"].astype(dt))

    stacked = stack_vit_layer_params(p, cfg.depth, cfg.qkv_bias)
    stacked = jax.tree.map(lambda a: a.astype(dt), stacked)
    if cfg.final_norm:
        fg = p["final_norm"]["scale"].astype(dt)
        fb = p["final_norm"]["bias"].astype(dt)
    else:
        fg = jnp.ones((cfg.dim,), dt)
        fb = jnp.zeros((cfg.dim,), dt)
    from ..ops.pallas.fused_encoder import pipelined_weights_fit

    forward = (vit_full_forward_pipelined
               if pipelined_weights_fit(cfg.dim, stacked["qkv_w"].shape[2],
                                        stacked["fc1_w"].shape[2], cfg.heads,
                                        cfg.resolved_head_dim,
                                        jnp.dtype(dt).itemsize)
               else vit_full_forward)
    return forward(
        patches, stacked,
        p["patch_kernel"].astype(dt), embed_bias,
        fg, fb,
        p["head"]["kernel"].astype(dt), p["head"]["bias"].astype(dt),
        heads=cfg.heads, head_dim=cfg.resolved_head_dim,
        eps=cfg.layernorm_eps,
        reference_residual=cfg.reference_residual,
        approx_gelu=cfg.gelu_approx,
        final_norm=cfg.final_norm,
        batch_block=batch_block,
    )


def pruned_vit_config(
    size: str = "tiny",
    prune_encoding: str = "all_head12_ffn1.0",
    head_dim: Optional[int] = 64,
    style: str = "standard",
    **overrides,
) -> ViTConfig:
    """ViT_Pruned analogue (reference vit.py:58-97): static per-layer shapes.

    Note the reference fixes head_size=64 for pruned models regardless of the
    unpruned dim/heads (transformer_encoder.py:31); we keep that default but
    allow overriding.
    """
    base = deit_config(size, style, **overrides)
    heads_per_layer, mlp_per_layer = decode_prune_encoding(
        prune_encoding, base.depth, base.mlp_dim
    )
    return base.replace(
        heads_per_layer=heads_per_layer,
        mlp_dim_per_layer=mlp_per_layer,
        head_dim=head_dim,
    )


def get_pruned_vit(**kw) -> ViT:
    return ViT(pruned_vit_config(**kw))
