"""Swin Transformer, TPU-first.

The reference has no in-repo Swin implementation (README.md:6 points to
rishigami/Swin-Transformer-TF; utils.py:14-47 imports an external PyTorch
repo for export) yet its profiler knows Swin ops (analyse.py:14-18: ROLL,
window ops) and flops_calculation.SwinFlops models it analytically
(flops_calculation.py:313-386).  Our build implements Swin first-class.

TPU design notes:
* window partition/merge are pure reshapes/transposes — free relayouts XLA
  fuses into the surrounding matmuls.
* cyclic shift is ``jnp.roll`` (lowered to two concatenated slices — cheap);
  the shifted-window attention mask is computed **statically at trace time**
  with numpy, so the kernel sees a constant additive mask.
* relative-position-bias gather is precomputed to a constant index table; the
  bias add fuses into the attention softmax input.
* All shapes static; batch-of-windows attention maps onto the MXU as
  [nW*B, heads, 49, d] batched matmuls.
"""

from __future__ import annotations

import collections
import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.activations import get_gelu
from ..ops.layers import layer_norm, mlp_block


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    image_size: int = 224
    patch_size: int = 4
    in_channels: int = 3
    num_classes: int = 1000
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    layernorm_eps: float = 1e-5
    gelu_approx: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    kernel_mode: str = "xla"
    # fp32 softmax is the default (parity); bf16 halves the HBM traffic of
    # the [B*nW, heads, 49, 49] attention intermediates for serving
    softmax_fp32: bool = True
    # Pack p windows per attention matmul with a block-diagonal mask.
    # Halves MXU tile passes for the 49-token score matmuls, but in the XLA
    # path the 2x-larger masked softmax costs more than the passes save
    # (measured b1: 0.55 ms packed vs 0.44 ms unpacked) — default off; the
    # fused whole-block kernel (fused_swin_apply) is the fast path instead.
    window_pack: int = 1

    def replace(self, **kw) -> "SwinConfig":
        return dataclasses.replace(self, **kw)


def window_partition(x: jax.Array, w: int) -> jax.Array:
    """[b, H, W, c] -> [b*nW, w*w, c]."""
    b, h, ww_, c = x.shape
    x = x.reshape(b, h // w, w, ww_ // w, w, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(-1, w * w, c)


def window_reverse(windows: jax.Array, w: int, h: int, ww_: int) -> jax.Array:
    """[b*nW, w*w, c] -> [b, H, W, c]."""
    c = windows.shape[-1]
    b = windows.shape[0] // ((h // w) * (ww_ // w))
    x = windows.reshape(b, h // w, ww_ // w, w, w, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h, ww_, c)


def relative_position_index(w: int) -> np.ndarray:
    """Constant [w*w, w*w] index into the (2w-1)^2 bias table."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))
    coords = coords.reshape(2, -1)  # [2, w*w]
    rel = coords[:, :, None] - coords[:, None, :]  # [2, w*w, w*w]
    rel = rel.transpose(1, 2, 0) + (w - 1)
    return (rel[..., 0] * (2 * w - 1) + rel[..., 1]).astype(np.int32)


def shifted_window_mask(h: int, ww_: int, w: int, shift: int) -> np.ndarray:
    """Constant additive mask [nW, w*w, w*w] for shifted windows (0 / -100)."""
    img_mask = np.zeros((h, ww_), np.float32)
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
        for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
            img_mask[hs, ws] = cnt
            cnt += 1
    # pure-numpy window partition (runs under jax.eval_shape tracing too)
    mw = (
        img_mask.reshape(h // w, w, ww_ // w, w)
        .transpose(0, 2, 1, 3)
        .reshape(-1, w * w)
    )
    attn_mask = mw[:, None, :] - mw[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)


_PACK_NEG = -1e9  # additive mask for cross-window logits in packed attention


def pack_window_bias(bias_hnn: jax.Array, p: int) -> jax.Array:
    """[h, n, n] relative-position bias -> block-diagonal [h, p*n, p*n] with
    cross-window positions masked to _PACK_NEG."""
    h, n, _ = bias_hnn.shape
    eye = jnp.asarray(np.eye(p, dtype=bool))[None, :, :, None, None]  # [1,p,p,1,1]
    exp = bias_hnn[:, None, None, :, :]  # [h, 1, 1, n, n]
    out = jnp.where(eye, exp, jnp.asarray(_PACK_NEG, bias_hnn.dtype))
    # [h, i, j, a, b] -> [h, i, a, j, b] -> [h, p*n, p*n]
    return jnp.transpose(out, (0, 1, 3, 2, 4)).reshape(h, p * n, p * n)


def pack_window_mask(mask: jax.Array, p: int) -> jax.Array:
    """[nW, n, n] shifted-window mask -> [nW/p, p*n, p*n] block diagonal.
    Off-diagonal blocks get _PACK_NEG (subsumed by the bias mask but kept so
    either alone is sufficient)."""
    nW, n, _ = mask.shape
    m = mask.reshape(nW // p, p, n, n)
    eye = jnp.asarray(np.eye(p, dtype=bool))[None, :, :, None, None]
    exp = m[:, :, None, :, :]  # [g, i, 1, n, n] broadcast over j
    out = jnp.where(eye, exp, jnp.asarray(_PACK_NEG, mask.dtype))
    return jnp.transpose(out, (0, 1, 3, 2, 4)).reshape(nW // p, p * n, p * n)


class WindowAttention(nn.Module):
    """W-MSA / SW-MSA with relative position bias.

    With cfg.window_pack = p > 1, groups of p consecutive windows run as one
    (p*n)-token attention with a block-diagonal additive mask: same numerics
    (cross-window logits underflow to exactly 0 after softmax), ~p x better
    MXU tile utilization for the n=49 score/PV matmuls.
    """

    config: SwinConfig
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array | None,
                 n_windows: int = 0) -> jax.Array:
        cfg = self.config
        w = cfg.window_size
        n = w * w
        head_dim = self.dim // self.heads
        scale = head_dim**-0.5

        if (self.is_mutable_collection("acts")
                and not self.is_initializing()):
            # static-int8 calibration pass: per-tensor absmax of every
            # matmul INPUT (the whole-stage kernel's quant points).  The
            # is_initializing guard keeps the collection out of model.init
            # output (it would break checkpoint-restore structure matching).
            self.sow("acts", "qkv_in_absmax",
                     jnp.max(jnp.abs(x.astype(jnp.float32))))
        if (self.is_mutable_collection("acts_full")
                and not self.is_initializing()):
            # MSE clip-search pass: the full tensor (quant-MSE reduced
            # in-jit by calibrate_swin; never fetched)
            self.sow("acts_full", "qkv_in", x.astype(jnp.float32))
        if (self.is_mutable_collection("acts_ch")
                and not self.is_initializing()):
            # smooth_swin pass: per-CHANNEL absmax (SmoothQuant migration)
            self.sow("acts_ch", "qkv_in_ch",
                     jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(0, 1)))
        qkv = nn.Dense(self.dim * 3, use_bias=cfg.qkv_bias, dtype=cfg.dtype,
                       param_dtype=cfg.param_dtype, name="qkv")(x)
        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.normal(0.02),
            ((2 * w - 1) ** 2, self.heads),
            cfg.param_dtype,
        )
        rpi = self.variable(
            "constants", "relative_position_index",
            lambda: jnp.asarray(relative_position_index(w)),
        ).value

        bw, _, _ = qkv.shape  # [b*nW, n, 3*dim]
        bias = bias_table[rpi.reshape(-1)].reshape(n, n, self.heads)
        bias_hnn = jnp.transpose(bias, (2, 0, 1))

        if cfg.kernel_mode == "pallas":
            # fused window-attention kernel; the Dense qkv output's fused
            # axis is already ordered (qkv, head, hd) as the kernel slices it
            from ..ops.pallas.window_attention import window_sdpa

            out = window_sdpa(
                qkv, bias_hnn.astype(cfg.dtype), mask, self.heads, head_dim
            )
        else:
            # Effective packing: consecutive windows share an image iff
            # n_windows % p == 0, so the per-window shifted masks line up;
            # for the last stage (n_windows == 1, never shifted) packing
            # across the batch is equally valid.
            p = cfg.window_pack
            if p > 1 and bw % p == 0 and (n_windows % p == 0 or n_windows <= 1):
                pack = p
            else:
                pack = 1
            pn = pack * n

            qkv = qkv.reshape(bw // pack, pn, 3, self.heads, head_dim)
            qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4))
            q, k, v = qkv[0], qkv[1], qkv[2]

            bias_p = pack_window_bias(bias_hnn, pack) if pack > 1 else bias_hnn
            attn = jnp.einsum("bhid,bhjd->bhij", q * scale, k)
            attn = attn + bias_p[None].astype(attn.dtype)
            if mask is not None:
                mask_p = pack_window_mask(mask, pack) if pack > 1 else mask
                nG = mask_p.shape[0]
                attn = attn.reshape(bw // pack // nG, nG, self.heads, pn, pn)
                attn = attn + mask_p[None, :, None].astype(attn.dtype)
                attn = attn.reshape(bw // pack, self.heads, pn, pn)
            if cfg.softmax_fp32:
                attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
            else:
                attn = jax.nn.softmax(attn, axis=-1)

            out = jnp.einsum("bhij,bhjd->bhid", attn, v)
            out = jnp.transpose(out, (0, 2, 1, 3)).reshape(bw, n, self.dim)
        if (self.is_mutable_collection("acts")
                and not self.is_initializing()):
            self.sow("acts", "proj_in_absmax",
                     jnp.max(jnp.abs(out.astype(jnp.float32))))
        if (self.is_mutable_collection("acts_full")
                and not self.is_initializing()):
            self.sow("acts_full", "proj_in", out.astype(jnp.float32))
        if (self.is_mutable_collection("acts_ch")
                and not self.is_initializing()):
            self.sow("acts_ch", "proj_in_ch",
                     jnp.max(jnp.abs(out.astype(jnp.float32)), axis=(0, 1)))
        return nn.Dense(self.dim, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                        name="proj")(out)


class SwinBlock(nn.Module):
    config: SwinConfig
    dim: int
    heads: int
    resolution: int  # feature map side
    shift: int       # 0 or window_size // 2

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        h = ww_ = self.resolution
        w = min(cfg.window_size, self.resolution)
        shift = self.shift if w < self.resolution else 0
        b, n, c = x.shape

        g1 = self.param("ln1_scale", nn.initializers.ones_init(), (c,), cfg.param_dtype)
        b1 = self.param("ln1_bias", nn.initializers.zeros_init(), (c,), cfg.param_dtype)
        g2 = self.param("ln2_scale", nn.initializers.ones_init(), (c,), cfg.param_dtype)
        b2 = self.param("ln2_bias", nn.initializers.zeros_init(), (c,), cfg.param_dtype)

        shortcut = x
        xn = layer_norm(x, g1, b1, cfg.layernorm_eps).reshape(b, h, ww_, c)
        if shift > 0:
            xn = jnp.roll(xn, (-shift, -shift), axis=(1, 2))
            mask = self.variable(
                "constants", "attn_mask",
                lambda: jnp.asarray(shifted_window_mask(h, ww_, w, shift)),
            ).value
        else:
            mask = None
        windows = window_partition(xn, w)
        n_windows = (h // w) * (ww_ // w)
        attn = WindowAttention(cfg, self.dim, self.heads, name="attn")(
            windows, mask, n_windows)
        xn = window_reverse(attn, w, h, ww_)
        if shift > 0:
            xn = jnp.roll(xn, (shift, shift), axis=(1, 2))
        x = shortcut + xn.reshape(b, n, c)

        hidden = int(self.dim * cfg.mlp_ratio)
        w1 = self.param("mlp_fc1_kernel", nn.initializers.xavier_uniform(), (c, hidden), cfg.param_dtype)
        bb1 = self.param("mlp_fc1_bias", nn.initializers.zeros_init(), (hidden,), cfg.param_dtype)
        w2 = self.param("mlp_fc2_kernel", nn.initializers.xavier_uniform(), (hidden, c), cfg.param_dtype)
        bb2 = self.param("mlp_fc2_bias", nn.initializers.zeros_init(), (c,), cfg.param_dtype)
        xn = layer_norm(x, g2, b2, cfg.layernorm_eps)
        if (self.is_mutable_collection("acts")
                and not self.is_initializing()):
            # calibration: fc1 input + (recomputed) post-GELU fc2 input;
            # only traced when the "acts" collection is mutable
            self.sow("acts", "fc1_in_absmax",
                     jnp.max(jnp.abs(xn.astype(jnp.float32))))
            hid_c = get_gelu(cfg.gelu_approx)(
                xn @ w1.astype(cfg.dtype) + bb1.astype(cfg.dtype))
            self.sow("acts", "fc2_in_absmax",
                     jnp.max(jnp.abs(hid_c.astype(jnp.float32))))
        if (self.is_mutable_collection("acts_ch")
                and not self.is_initializing()):
            self.sow("acts_ch", "fc1_in_ch",
                     jnp.max(jnp.abs(xn.astype(jnp.float32)), axis=(0, 1)))
        if (self.is_mutable_collection("acts_full")
                and not self.is_initializing()):
            self.sow("acts_full", "fc1_in", xn.astype(jnp.float32))
            hid_f = get_gelu(cfg.gelu_approx)(
                xn @ w1.astype(cfg.dtype) + bb1.astype(cfg.dtype))
            self.sow("acts_full", "fc2_in", hid_f.astype(jnp.float32))
        x = x + mlp_block(xn, w1.astype(cfg.dtype), bb1.astype(cfg.dtype),
                          w2.astype(cfg.dtype), bb2.astype(cfg.dtype),
                          get_gelu(cfg.gelu_approx))
        return x


class PatchMerging(nn.Module):
    """Downsample 2x: concat 2x2 neighbors, LN, Dense(2C)."""

    config: SwinConfig
    dim: int
    resolution: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        h = ww_ = self.resolution
        b, n, c = x.shape
        x = x.reshape(b, h, ww_, c)
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1).reshape(b, n // 4, 4 * c)
        g = self.param("norm_scale", nn.initializers.ones_init(), (4 * c,), cfg.param_dtype)
        bb = self.param("norm_bias", nn.initializers.zeros_init(), (4 * c,), cfg.param_dtype)
        x = layer_norm(x, g, bb, cfg.layernorm_eps)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=cfg.dtype,
                        param_dtype=cfg.param_dtype, name="reduction")(x)


class SwinTransformer(nn.Module):
    config: SwinConfig

    @nn.compact
    def __call__(self, img: jax.Array) -> jax.Array:
        cfg = self.config
        p = cfg.patch_size
        res = cfg.image_size // p

        # Patch embed as matmul (NCHW input like the rest of the package).
        from ..ops.layers import patch_embed

        w_patch = self.param(
            "patch_kernel", nn.initializers.xavier_uniform(),
            (p * p * cfg.in_channels, cfg.embed_dim), cfg.param_dtype,
        )
        b_patch = self.param("patch_bias", nn.initializers.zeros_init(),
                             (cfg.embed_dim,), cfg.param_dtype)
        x = patch_embed(img.astype(cfg.dtype), w_patch.astype(cfg.dtype),
                        b_patch.astype(cfg.dtype), p)
        g = self.param("embed_norm_scale", nn.initializers.ones_init(),
                       (cfg.embed_dim,), cfg.param_dtype)
        bb = self.param("embed_norm_bias", nn.initializers.zeros_init(),
                        (cfg.embed_dim,), cfg.param_dtype)
        x = layer_norm(x, g, bb, cfg.layernorm_eps)

        dim = cfg.embed_dim
        for si, (depth, heads) in enumerate(zip(cfg.depths, cfg.num_heads)):
            for bi in range(depth):
                x = SwinBlock(
                    cfg, dim, heads, res,
                    shift=0 if bi % 2 == 0 else cfg.window_size // 2,
                    name=f"stage_{si}_block_{bi}",
                )(x)
            if si < len(cfg.depths) - 1:
                x = PatchMerging(cfg, dim, res, name=f"downsample_{si}")(x)
                dim *= 2
                res //= 2

        gf = self.param("final_norm_scale", nn.initializers.ones_init(), (dim,), cfg.param_dtype)
        bf = self.param("final_norm_bias", nn.initializers.zeros_init(), (dim,), cfg.param_dtype)
        x = layer_norm(x, gf, bf, cfg.layernorm_eps)
        x = jnp.mean(x, axis=1)  # global average pool
        return nn.Dense(cfg.num_classes, dtype=cfg.dtype,
                        param_dtype=cfg.param_dtype, name="head")(x)


def _merge_perm(c: int) -> np.ndarray:
    """Feature permutation mapping the transpose-form merge order (dy, dx, c)
    onto the reference concat order [x0;x1;x2;x3] = [(0,0);(1,0);(0,1);(1,1)]
    so permuted params make both forms bit-equivalent."""
    k_of = {(0, 0): 0, (1, 0): 1, (0, 1): 2, (1, 1): 3}
    perm = np.empty(4 * c, np.int32)
    for dy in range(2):
        for dx in range(2):
            for ci in range(c):
                perm[dy * 2 * c + dx * c + ci] = k_of[(dy, dx)] * c + ci
    return perm


def prepare_swin_fused(model: "SwinTransformer", variables) -> dict:
    """Precompute the inference-constant pieces of the fused forward:

    * each block's relative-position bias, gathered from its (2w-1)^2 table
      and kernel-ready padded (the gather costs 7-28 us per block on TPU and
      cannot fuse into a pallas call);
    * patch-merging params permuted for the transpose-form downsample
      (18 us vs 37 us for the reference's 4-strided-slice form).

    Pure functions of the params — hoist out of the forward and pass to
    ``fused_swin_apply(..., prepared=...)``."""
    from ..ops.pallas.common import round_up
    from ..ops.pallas.swin_block import _padded_bias

    cfg = model.config
    p = variables["params"]
    out = {}
    for g in _stage_geometry(cfg, p):
        rpi = relative_position_index(g.w).reshape(-1)
        for bi in range(g.depth):
            table = p[f"stage_{g.si}_block_{bi}"]["attn"][
                "relative_position_bias_table"]
            bias = jnp.transpose(
                table[rpi].reshape(g.n, g.n, g.heads), (2, 0, 1))
            # kernel-ready: padded, fp32, pre-scaled by log2(e)
            out[f"{g.si}_{bi}"] = _padded_bias(bias, g.n, g.n_pad)

    dim = cfg.embed_dim
    for si in range(len(cfg.depths) - 1):
        ds = p[f"downsample_{si}"]
        perm = _merge_perm(dim)
        out[f"merge_{si}"] = {
            "norm_scale": ds["norm_scale"][perm],
            "norm_bias": ds["norm_bias"][perm],
            "kernel": ds["reduction"]["kernel"][perm, :],
        }
        dim *= 2
    return out


# Back-compat alias (round-2 intermediate name).
prepare_swin_biases = prepare_swin_fused


StageGeom = collections.namedtuple(
    "StageGeom", "si depth heads w res dim n n_pad nwin hidden")


def _stage_geometry(cfg, params):
    """Per-stage geometry shared by prepare_swin_fused / prepare_swin_int8 /
    fused_swin_apply — the SINGLE source of the res/window/n_pad/nwin
    progression (mirrors SwinTransformer.__call__: res //= 2 per merge)."""
    res = cfg.image_size // cfg.patch_size
    dim = cfg.embed_dim
    for si, (depth, heads) in enumerate(zip(cfg.depths, cfg.num_heads)):
        w = min(cfg.window_size, res)
        n = w * w
        hidden = params[f"stage_{si}_block_0"]["mlp_fc1_kernel"].shape[1]
        yield StageGeom(si, depth, heads, w, res, dim, n,
                        -(-n // 8) * 8,
                        (res // w) ** 2 if res % w == 0 else 0, hidden)
        res //= 2
        dim *= 2


def _stack_stage_params(p, si: int, depth: int, dim: int, dt) -> dict:
    """Stack a stage's per-block kernel params on a leading [L] axis."""
    stacked_l: dict = {}
    for bi in range(depth):
        blk = p[f"stage_{si}_block_{bi}"]
        for key, val in _block_kernel_params(blk, dim, dt).items():
            v2 = val.reshape(1, -1) if val.ndim == 1 else val
            stacked_l.setdefault(key, []).append(v2[None])
    return {k: jnp.concatenate(v) for k, v in stacked_l.items()}


def _block_kernel_params(blk: dict, dim: int, dt) -> dict:
    """Per-block flax params -> the kernel param dict (shared by the
    whole-stage and per-block fused paths so they cannot diverge)."""
    cast = lambda a: a.astype(dt)
    qkv = blk["attn"]["qkv"]
    return {
        "ln1_g": blk["ln1_scale"], "ln1_b": blk["ln1_bias"],
        "qkv_w": cast(qkv["kernel"]),
        "qkv_b": cast(qkv["bias"]) if "bias" in qkv
        else jnp.zeros((3 * dim,), dt),
        "proj_w": cast(blk["attn"]["proj"]["kernel"]),
        "proj_b": cast(blk["attn"]["proj"]["bias"]),
        "ln2_g": blk["ln2_scale"], "ln2_b": blk["ln2_bias"],
        "fc1_w": cast(blk["mlp_fc1_kernel"]),
        "fc1_b": cast(blk["mlp_fc1_bias"]),
        "fc2_w": cast(blk["mlp_fc2_kernel"]),
        "fc2_b": cast(blk["mlp_fc2_bias"]),
    }


def prepare_swin_int8(model: "SwinTransformer", variables,
                      min_dim: int = 128) -> dict:
    """Per-stage int8-quantized stacked weight dicts for the whole-stage
    kernel's int8 mode (``fused_swin_apply(..., int8_prepared=...)``).
    Quantization (per-layer, per-output-channel — the tf2tflite dynamic-range
    contract, reference utils.py:260-262) runs ONCE here, outside jit."""
    from ..ops.pallas.fused_encoder import quantize_stacked_int8
    from ..ops.pallas.swin_block import swin_stage_pipelined_fits

    cfg = model.config
    dt = cfg.dtype
    p = variables["params"]
    out = {}
    for g in _stage_geometry(cfg, p):
        # int8 pays by halving the streamed weight DMA — only a win where
        # that DMA binds (big dims).  Stage 0 (dim<128) measured a LOSS:
        # swin_tiny b1 int8-all-stages 0.294 vs bf16 0.266 ms (the per-row
        # dynamic act quant at R=3584 rows costs more than the ~150 KB/block
        # weight saving), int8 stages 1-3 won round 2.  Re-probed round 4
        # with STATIC scales (tools/probe_swin_stage0_int8.py, 3 interleaved
        # rounds): still loses — b1 0.0821 vs 0.0815, b32 2.431 vs 2.385
        # (-0.8%/-1.9%) — stage 0 is VPU-floor-bound (64-window softmax at
        # dim 96), not weight-DMA-bound, so the int8 MXU rate buys nothing.
        # Keep big dims only (tests override min_dim for tiny configs).
        if g.dim < min_dim:
            continue
        if g.nwin >= 1 and swin_stage_pipelined_fits(
                g.dim, g.hidden, g.depth, 1, nwin=g.nwin, n_pad=g.n_pad,
                heads=g.heads, act_itemsize=jnp.dtype(dt).itemsize):
            stacked = _stack_stage_params(p, g.si, g.depth, g.dim, dt)
            out[g.si] = quantize_stacked_int8(
                stacked, keys=("qkv_w", "proj_w", "fc1_w", "fc2_w"))
    return out


def _strip_absmax_names(tree):
    """acts tree ({...: {"qkv_in_absmax": (scalar,)}}) -> same paths with
    the "_absmax" suffix dropped and the sow 1-tuples unwrapped — the key
    layout of the "acts_full" collection, so the two trees zip in
    jax.tree.map for the MSE pass."""
    if isinstance(tree, dict):
        return {k.replace("_absmax", ""): _strip_absmax_names(v)
                for k, v in tree.items()}
    return tree[0]


def calibrate_swin(model: "SwinTransformer", variables, batches=None,
                   n: int = 32, percentile=None,
                   method: str = "absmax") -> dict:
    """Representative-dataset activation calibration for static int8 Swin
    (the converter's TFLITE_BUILTINS_INT8 pass, reference utils.py:263-277,
    applied to the whole-stage kernel's quant points).

    The modules sow per-tensor absmax scalars into the "acts" collection
    (WindowAttention qkv/proj inputs, SwinBlock fc1/fc2 inputs); scales
    accumulate on device across batches, ONE final fetch.  Returns
    {si: [depth, 4] fp32} act scales in (qkv, proj, fc1, fc2) order.

    ``method="mse"`` adds a second pass over the same batches: the modules
    sow the FULL activations into "acts_full", the quant MSE for each
    candidate clip ratio*absmax (ops.quant.MSE_CLIP_RATIOS) is reduced
    in-jit (tensors never leave the device), and each tensor keeps the
    argmin clip — the Swin analogue of calibrate_vit's clip search.

    ``percentile`` is accepted for API symmetry with calibrate_vit but the
    sow pass records absmax only (fixed-percentile clipping also measured
    strictly worse on the ViT oracle); None is required.
    """
    import numpy as np

    if percentile is not None:
        raise NotImplementedError("swin calibration records absmax only")
    if method not in ("absmax", "mse"):
        raise ValueError(f"unknown calibration method {method!r}")
    cfg = model.config
    if batches is None:
        from ..ops.quant import representative_batches

        batches = representative_batches(
            n=n, shape=(cfg.in_channels, cfg.image_size, cfg.image_size))
    if method == "mse":
        batches = list(batches)  # two passes

    # variables as a jit ARG (never a closure: the 413 lesson); absmax
    # scalars accumulate in the returned pytree
    def collect(v, im):
        _, acts = model.apply(v, im, mutable=["acts"])
        return acts["acts"]

    collect = jax.jit(collect)
    run_dev = None
    for batch in batches:
        acts = collect(variables, jnp.asarray(batch))
        run_dev = acts if run_dev is None else jax.tree.map(
            jnp.maximum, run_dev, acts)

    msum = None
    if method == "mse":
        from ..ops.quant import MSE_CLIP_RATIOS

        ratios = jnp.asarray(MSE_CLIP_RATIOS, jnp.float32)
        amax = _strip_absmax_names(run_dev)

        def collect_mse(v, im, am):
            _, fa = model.apply(v, im, mutable=["acts_full"])

            def leaf_mse(a_t, m):
                a = a_t[0]
                s = jnp.maximum(m, 1e-30) * ratios / 127.0  # [R]
                q = jnp.clip(jnp.round(a[..., None] / s), -127, 127) * s
                return jnp.mean(jnp.square(a[..., None] - q),
                                axis=tuple(range(a.ndim)))

            return jax.tree.map(leaf_mse, fa["acts_full"], am,
                                is_leaf=lambda t: isinstance(t, tuple))

        collect_mse = jax.jit(collect_mse)
        mse_dev = None
        for batch in batches:
            m = collect_mse(variables, jnp.asarray(batch), amax)
            mse_dev = m if mse_dev is None else jax.tree.map(
                jnp.add, mse_dev, m)
        msum = jax.device_get(mse_dev)

    run = jax.device_get(run_dev)  # sow leaves are 1-tuples of scalars
    from ..ops.quant import MSE_CLIP_RATIOS

    out = {}
    names = ("qkv_in", "proj_in", "fc1_in", "fc2_in")
    for g in _stage_geometry(cfg, variables["params"]):
        rows = np.ones((g.depth, 4), np.float32)
        for bi in range(g.depth):
            blk = run[f"stage_{g.si}_block_{bi}"]
            for j, name in enumerate(names):
                sub = blk["attn"] if j < 2 else blk
                m = float(sub[f"{name}_absmax"][0])
                if msum is not None and m > 0:
                    mblk = msum[f"stage_{g.si}_block_{bi}"]
                    msub = mblk["attn"] if j < 2 else mblk
                    m *= MSE_CLIP_RATIOS[int(np.argmin(msub[name]))]
                rows[bi, j] = m / 127.0 if m > 0 else 1.0
        out[g.si] = rows
    return out


def smooth_swin(model: "SwinTransformer", variables, batches=None,
                n: int = 32, alpha: float = 0.5) -> dict:
    """SmoothQuant-style offline scale migration for Swin (the ViT-family
    analogue is ops/quant.smooth_vit; same math, same caveats).

    Valid folds: window partition / cyclic roll / reverse permute TOKENS
    only (channels intact) and each block's residual branches off BEFORE
    the LN (SwinBlock: ``shortcut = x``), so
      * qkv_in, fc1_in — per-channel 1/s into ln1/ln2 scale+bias, s into
        the qkv/fc1 kernel rows (exact);
      * proj_in — the merged attention context; channel order is (head,
        head_dim), matching the v-section columns [2*dim, 3*dim) of the
        fused qkv kernel, so 1/s folds there (+ bias) and s into the proj
        kernel rows (exact; rel-pos bias and masks ride the LOGITS, not v).
    fc2_in sits behind the GELU and stays with the clip calibrators.

    Returns a new float variables tree (forward exactly equivalent) to pipe
    through prepare_swin_int8_static as usual — runtime kernels unchanged.
    """
    import numpy as np

    from ..ops.quant import _smooth_s, representative_batches

    cfg = model.config
    if batches is None:
        batches = representative_batches(
            n=n, shape=(cfg.in_channels, cfg.image_size, cfg.image_size))

    def collect(v, im):
        _, acts = model.apply(v, im, mutable=["acts_ch"])
        return acts["acts_ch"]

    collect = jax.jit(collect)
    run_dev = None
    for batch in batches:
        acts = collect(variables, jnp.asarray(batch))
        run_dev = acts if run_dev is None else jax.tree.map(
            jnp.maximum, run_dev, acts)
    run = jax.device_get(run_dev)  # sow leaves are 1-tuples

    p = dict(variables["params"])
    for g in _stage_geometry(cfg, variables["params"]):
        for bi in range(g.depth):
            name = f"stage_{g.si}_block_{bi}"
            blk = jax.tree.map(lambda x: x, p[name])  # fresh containers
            ch = run[name]
            qkv_w = jnp.asarray(blk["attn"]["qkv"]["kernel"], jnp.float32)

            # qkv_in: ln1 -> qkv matmul
            s = _smooth_s(np.asarray(ch["attn"]["qkv_in_ch"][0]),
                          np.asarray(jnp.max(jnp.abs(qkv_w), axis=1)), alpha)
            sj = jnp.asarray(s)
            blk["ln1_scale"] = blk["ln1_scale"] / sj
            blk["ln1_bias"] = blk["ln1_bias"] / sj
            qkv_w = qkv_w * sj[:, None]

            # proj_in: v-columns of qkv (+ bias) -> proj rows
            proj_w = jnp.asarray(blk["attn"]["proj"]["kernel"], jnp.float32)
            v0 = 2 * (qkv_w.shape[1] // 3)
            s = _smooth_s(np.asarray(ch["attn"]["proj_in_ch"][0]),
                          np.asarray(jnp.max(jnp.abs(proj_w), axis=1)), alpha)
            sj = jnp.asarray(s)
            qkv_w = qkv_w.at[:, v0:].multiply(1.0 / sj[None, :])
            if "bias" in blk["attn"]["qkv"]:
                qb = jnp.asarray(blk["attn"]["qkv"]["bias"], jnp.float32)
                blk["attn"]["qkv"]["bias"] = qb.at[v0:].multiply(1.0 / sj)
            blk["attn"]["qkv"]["kernel"] = qkv_w
            blk["attn"]["proj"]["kernel"] = proj_w * sj[:, None]

            # fc1_in: ln2 -> fc1 matmul
            fc1_w = jnp.asarray(blk["mlp_fc1_kernel"], jnp.float32)
            s = _smooth_s(np.asarray(ch["fc1_in_ch"][0]),
                          np.asarray(jnp.max(jnp.abs(fc1_w), axis=1)), alpha)
            sj = jnp.asarray(s)
            blk["ln2_scale"] = blk["ln2_scale"] / sj
            blk["ln2_bias"] = blk["ln2_bias"] / sj
            blk["mlp_fc1_kernel"] = fc1_w * sj[:, None]
            p[name] = blk
    return {**variables, "params": p}


def prepare_swin_int8_static(model: "SwinTransformer", variables,
                             batches=None, n: int = 32,
                             min_dim: int = 128,
                             method: str = "absmax") -> dict:
    """prepare_swin_int8 + calibrated static activation scales: per-stage
    int8 stacks whose per-channel scales FOLD in the per-(block, matmul)
    activation scale, plus ``act_inv`` [depth, 4] for the kernel's SMEM
    quantizers — no per-row absmax/reciprocal at inference (full-integer
    analogue, mirrors the ViT encoder's static mode)."""
    # quantize/qualify FIRST: the n-batch device calibration is the
    # expensive step, so bail out before it when no stage passes the
    # whole-stage fits gate (callers raise on an empty dict)
    out = prepare_swin_int8(model, variables, min_dim=min_dim)
    if not out:
        return out
    act_scales = calibrate_swin(model, variables, batches=batches, n=n,
                                method=method)
    keys = ("qkv_w", "proj_w", "fc1_w", "fc2_w")
    for si, stacked in out.items():
        act = jnp.asarray(act_scales[si])  # [depth, 4]
        for j, key in enumerate(keys):
            skey = key.replace("_w", "_s")
            stacked[skey] = stacked[skey] * act[:, j][:, None, None]
        stacked["act_inv"] = (1.0 / act).astype(jnp.float32)
    return out


def _block_bias(blk: dict, prepared: dict | None, si: int, bi: int,
                rpi, w: int, heads: int):
    """(bias, prepadded?) — prepared biases are kernel-ready fp32 padded."""
    if prepared is not None:
        return prepared[f"{si}_{bi}"], True
    table = blk["attn"]["relative_position_bias_table"]
    return jnp.transpose(
        table[rpi].reshape(w * w, w * w, heads), (2, 0, 1)), False


def fused_swin_apply(model: "SwinTransformer", variables, img: jax.Array,
                     pallas_stages: tuple = (0, 1, 2, 3),
                     prepared: dict | None = None,
                     int8_prepared: dict | None = None,
                     merge_kernel: bool = True) -> jax.Array:
    """Forward pass with every Swin block as ONE whole-block Pallas kernel
    (ops/pallas/swin_block.py).  Same params as ``model.apply``.

    LayerNorm/MLP/residual are per-token, so each block commutes with the
    window permutation P (cyclic roll + partition):
    x' = P^-1( fused_block_window_major( P(x) ) ) — only the cheap P bracket
    (measured 1-3 us each) stays in XLA.

    When consecutive stages run as whole-stage kernels the tokens stay
    PADDED WINDOW-MAJOR between them, and (``merge_kernel``, prepared-only)
    patch merging runs as the fused banded-perm kernel
    (ops/pallas/swin_merge.py) — the 2x2-s2d relayout (measured 21 us at
    stage 0, the XLA floor) and the window_reverse/partition brackets
    between stages all disappear.
    """
    from ..ops.layers import patch_embed
    from ..ops.pallas.swin_block import (
        _padded_bias,
        swin_block_forward,
        swin_stage_forward_pipelined,
        swin_stage_pipelined_fits,
    )
    from ..ops.pallas.swin_merge import swin_merge_forward

    cfg = model.config
    dt = cfg.dtype
    p = variables["params"]
    cast = lambda a: a.astype(dt)

    x = patch_embed(img.astype(dt), cast(p["patch_kernel"]),
                    cast(p["patch_bias"]), cfg.patch_size)
    x = layer_norm(x, p["embed_norm_scale"], p["embed_norm_bias"],
                   cfg.layernorm_eps)

    b = x.shape[0]
    xw = None  # padded window-major [b*nW, n_pad, dim] chained between stages
    for g in _stage_geometry(cfg, p):
        # geometry shared with the prepare_* functions — keeps the fits
        # gates and n_pad/nwin in exact agreement across the three sites
        si, depth, heads, w, res, dim = (g.si, g.depth, g.heads, g.w, g.res,
                                         g.dim)
        n, n_pad, nwin, hidden = g.n, g.n_pad, g.nwin, g.hidden
        rpi = relative_position_index(w).reshape(-1)

        use_int8 = int8_prepared is not None and si in int8_prepared
        if (si in pallas_stages and nwin >= 1
                and swin_stage_pipelined_fits(dim, hidden, depth,
                                              1 if use_int8
                                              else jnp.dtype(dt).itemsize,
                                              nwin=nwin, n_pad=n_pad,
                                              heads=heads,
                                              act_itemsize=jnp.dtype(
                                                  dt).itemsize)):
            # Whole-stage double-buffered-DMA kernel: every block's weight
            # (+ rel-pos-bias) stream overlaps the previous block's compute
            # (the per-block kernel serializes the weight DMA — measured
            # 43 us/block vs the ~18 us HBM floor at dim 768).  For shifted
            # stages the roll/partition bracket runs in-kernel as a one-hot
            # permutation matmul (ops/pallas/swin_block.py).
            biases = []
            for bi in range(depth):
                blk = p[f"stage_{si}_block_{bi}"]
                bias, prepadded = _block_bias(blk, prepared, si, bi, rpi, w,
                                              heads)
                biases.append(bias if prepadded
                              else _padded_bias(bias, n, n_pad))
            stacked = (int8_prepared[si] if use_int8 else
                       _stack_stage_params(p, si, depth, dim, dt))
            mask = (jnp.asarray(shifted_window_mask(res, res, w, w // 2))
                    if nwin > 1 and depth > 1 else None)
            if xw is None:
                pw = window_partition(x.reshape(b, res, res, dim), w)
                xw = jnp.pad(pw, ((0, 0), (0, n_pad - n), (0, 0)))
            xw = swin_stage_forward_pipelined(
                xw, stacked, jnp.stack(biases),
                heads=heads, head_dim=dim // heads,
                eps=cfg.layernorm_eps, approx_gelu=cfg.gelu_approx,
                nwin=nwin, res=res, window=w, mask=mask, int8=use_int8,
                n_valid=n,
            )
            x = None
            blocks_range = ()
        else:
            if xw is not None:
                x = window_reverse(xw[:, :n, :], w, res,
                                   res).reshape(b, res * res, dim)
                xw = None
            blocks_range = range(depth)

        for bi in blocks_range:
            blk = p[f"stage_{si}_block_{bi}"]
            shift = (cfg.window_size // 2) if (bi % 2 == 1 and w < res) else 0

            if si not in pallas_stages:
                x, _ = SwinBlock(
                    cfg, dim, heads, res,
                    shift=0 if bi % 2 == 0 else cfg.window_size // 2,
                ).apply({"params": blk}, x, mutable=["constants"])
                continue

            bias_hnn, prepadded = _block_bias(blk, prepared, si, bi, rpi, w,
                                              heads)
            mask = (jnp.asarray(shifted_window_mask(res, res, w, shift))
                    if shift > 0 else None)
            bparams = _block_kernel_params(blk, dim, dt)

            xs = x.reshape(b, res, res, dim)
            if shift > 0:
                xs = jnp.roll(xs, (-shift, -shift), axis=(1, 2))
            pw = window_partition(xs, w)
            out = swin_block_forward(
                pw, bparams,
                bias_hnn if prepadded else bias_hnn.astype(dt),
                mask,
                heads=heads, head_dim=dim // heads,
                eps=cfg.layernorm_eps, approx_gelu=cfg.gelu_approx,
                bias_prepadded=prepadded,
            )
            xs = window_reverse(out, w, res, res)
            if shift > 0:
                xs = jnp.roll(xs, (shift, shift), axis=(1, 2))
            x = xs.reshape(b, res * res, dim)

        if si < len(cfg.depths) - 1:
            if xw is not None and prepared is not None and merge_kernel:
                # fused banded-perm merge on window-major tokens — no
                # window_reverse / s2d relayout / window_partition bracket
                xw = swin_merge_forward(xw, prepared[f"merge_{si}"],
                                        res=res, window=w,
                                        eps=cfg.layernorm_eps)
                dim *= 2
                res //= 2
                continue
            if xw is not None:
                x = window_reverse(xw[:, :n, :], w, res,
                                   res).reshape(b, res * res, dim)
                xw = None
            if prepared is not None:
                # transpose-form merge (features ordered (dy, dx, c)) with
                # permuted params — bit-equivalent, 2x faster than the
                # 4-strided-slice form on TPU (18 us vs 37 us at stage 0)
                mp_ = prepared[f"merge_{si}"]
                xs = x.reshape(b, res // 2, 2, res // 2, 2, dim)
                xs = jnp.transpose(xs, (0, 1, 3, 2, 4, 5))
                xs = xs.reshape(b, (res // 2) ** 2, 4 * dim)
                xs = layer_norm(xs, mp_["norm_scale"], mp_["norm_bias"],
                                cfg.layernorm_eps)
                x = xs @ cast(mp_["kernel"])
            else:
                ds = p[f"downsample_{si}"]
                xs = x.reshape(b, res, res, dim)
                x0, x1 = xs[:, 0::2, 0::2], xs[:, 1::2, 0::2]
                x2, x3 = xs[:, 0::2, 1::2], xs[:, 1::2, 1::2]
                xs = jnp.concatenate([x0, x1, x2, x3], axis=-1)
                xs = xs.reshape(b, (res // 2) ** 2, 4 * dim)
                xs = layer_norm(xs, ds["norm_scale"], ds["norm_bias"],
                                cfg.layernorm_eps)
                x = xs @ cast(ds["reduction"]["kernel"])
            dim *= 2
            res //= 2

    if xw is not None:
        if nwin > 1:
            x = window_reverse(xw[:, :n, :], w, res,
                               res).reshape(b, res * res, dim)
        else:
            # mean-pool is token-order-invariant; just drop the pad rows
            x = xw[:, :n, :]
    x = layer_norm(x, p["final_norm_scale"], p["final_norm_bias"],
                   cfg.layernorm_eps)
    x = jnp.mean(x, axis=1)
    return (x @ cast(p["head"]["kernel"]) + cast(p["head"]["bias"]))


_SWIN_SHAPES = {
    "tiny": dict(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24)),
    "small": dict(embed_dim=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24)),
    "base": dict(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32)),
}


def swin_config(size: str = "tiny", **overrides) -> SwinConfig:
    return SwinConfig(**{**_SWIN_SHAPES[size], **overrides})


def get_swin(size: str = "tiny", **kw) -> SwinTransformer:
    return SwinTransformer(swin_config(size, **kw))
