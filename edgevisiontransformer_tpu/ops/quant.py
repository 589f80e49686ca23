"""Quantization: fp16/bf16 casting + dynamic-range / static int8.

TPU-native replacement for the reference's TFLite converter modes
(/root/reference/utils.py:242-294 ``tf2tflite``):

* ``float16`` -> parameter cast (fp16 storage) / bf16 compute path;
* ``dynamic`` -> per-output-channel int8 weights + on-the-fly per-row
  activation absmax scales (TFLite dynamic-range semantics);
* ``int8``    -> static quantization with activation scales calibrated on a
  representative dataset (the converter's representative_data_gen,
  utils.py:263-277).

Weights are quantized symmetrically (zero-point 0) per output channel, like
TFLite's per-channel conv/matmul quantization.  The int8 matmul itself runs
on the MXU with int32 accumulation (v5e int8 peak is 2x bf16).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Casting (float16 / bfloat16 mode)
# ---------------------------------------------------------------------------


def cast_params(params, dtype=jnp.bfloat16):
    """float16/bfloat16 parameter cast (tf2tflite float16 mode analogue)."""
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        params,
    )


# ---------------------------------------------------------------------------
# Int8 weight quantization
# ---------------------------------------------------------------------------


def quantize_weight_int8(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-output-channel symmetric int8: w [in, out] -> (q int8, scale [out])."""
    absmax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def dequantize_weight_int8(q: jax.Array, scale: jax.Array, dtype=jnp.float32):
    return q.astype(dtype) * scale[None, :].astype(dtype)


def _fake_quant_impl(w: jax.Array) -> jax.Array:
    q, scale = quantize_weight_int8(w)
    return dequantize_weight_int8(q, scale, w.dtype)


@jax.custom_vjp
def fake_quant_ste(w: jax.Array) -> jax.Array:
    """Quantize-aware-training fake quant: per-output-channel symmetric int8
    round-trip with a straight-through gradient (the TPU-native analogue of
    the vendored FX QAT, nn_pruning/modules/quantization.py — fake-quant
    observers replaced by the deployment quantizer itself)."""
    return _fake_quant_impl(w)


def _fq_fwd(w):
    return _fake_quant_impl(w), None


def _fq_bwd(_, g):
    return (g,)


fake_quant_ste.defvjp(_fq_fwd, _fq_bwd)


def fake_quant_tree(params, min_ndim: int = 2):
    """Fake-quantize every >=2D weight in a pytree (QAT training forward)."""
    return jax.tree.map(
        lambda l: fake_quant_ste(l) if getattr(l, "ndim", 0) >= min_ndim else l,
        params,
    )


def fake_quant_vit_encoder(params):
    """QAT fake-quant restricted to the matmul kernels the int8 deployment
    paths actually quantize (_VIT_MATMUL_KEYS — encoder_forward_int8 /
    int8_vit_apply keep embeddings and heads float, so quantizing them in
    training would optimize against noise absent at deployment)."""
    had_wrapper = "params" in params
    p = dict(params["params"] if had_wrapper else params)
    for name in list(p):
        if not name.startswith("block_"):
            continue
        blk = dict(p[name])
        for sub, key in _VIT_MATMUL_KEYS:
            sd = dict(blk[sub])
            sd[key] = fake_quant_ste(sd[key])
            blk[sub] = sd
        p[name] = blk
    return {"params": p} if had_wrapper else p


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def fake_quant_act_ste(x: jax.Array, scale: float) -> jax.Array:
    """Static-QAT activation fake quant: symmetric int8 round-trip at a
    FIXED calibrated scale with a straight-through gradient.  Composes with
    the weight STE into a static-int8-aware training forward
    (fake_quant_vit_apply_static) — the analogue of the reference FX-QAT's
    activation observers (vendor nn_pruning/modules/quantization.py), which
    weight-only QAT lacks (measured: 300-step weight-only QAT *hurts*
    static-int8 drift while helping dynamic — BENCHMARKS qat_payoff).
    For scales that UPDATE during training use fake_quant_act (traced
    scale) + fake_quant_vit_apply_observed instead."""
    q = jnp.clip(jnp.round(x / scale), -127, 127)
    return (q * scale).astype(x.dtype)


def _fqa_fwd(x, scale):
    # fwd takes the primal signature; bwd gets nondiff args first.  Save
    # the clip mask: the forward is flat where |x| > 127*scale, so standard
    # STE zeroes the cotangent there — an identity gradient would let
    # training push activations deeper into saturation with no corrective
    # signal.
    mask = jnp.abs(x / scale) <= 127.0
    return fake_quant_act_ste(x, scale), mask


def _fqa_bwd(scale, mask, g):
    return (jnp.where(mask, g, 0.0),)


fake_quant_act_ste.defvjp(_fqa_fwd, _fqa_bwd)


def fake_quant_act(x: jax.Array, scale: jax.Array) -> jax.Array:
    """Traced-scale variant of fake_quant_act_ste: ``scale`` may be a jax
    scalar that CHANGES during training (the live-observer QAT path —
    custom_vjp nondiff args must be static, so a scale update there forces
    a recompile; here it is a plain operand).  Same numerics, same
    clip-masked STE, expressed with the stop_gradient identity:
    forward = fq(x), backward = identity inside the clip range, 0 in the
    saturated region (the forward is flat there)."""
    xs = x.astype(jnp.float32) / scale
    q = (jnp.clip(jnp.round(xs), -127, 127) * scale).astype(x.dtype)
    mask = (jnp.abs(xs) <= 127.0).astype(x.dtype)
    passthrough = x * mask
    return passthrough + jax.lax.stop_gradient(q - passthrough)


def fake_quant_vit_apply_static(model, params, act_scales, img: jax.Array):
    """Differentiable ViT forward that sees exactly the static-int8
    deployment quantization: every encoder matmul runs fq(x; calibrated
    scale) @ fq(w) with STE grads (embeddings/head float, like the
    deployment kernels).  ``act_scales`` [depth, 4] from calibrate_vit —
    fixed during training (calibrate once at init).  Scales are threaded
    as a traced array (not baked into the HLO), so callers may also pass
    updated scales without a recompile."""
    import itertools

    cfg = model.config
    p = params["params"] if "params" in params else params
    scales = jnp.asarray(act_scales, jnp.float32)
    counter = itertools.count()

    def mm(x_, w):
        k = next(counter)
        i, j = divmod(k, 4)
        xq = fake_quant_act(x_, scales[i, j])
        return xq @ fake_quant_ste(w).astype(xq.dtype)

    x = _int8_encoder_blocks(cfg, p, _embed_vit(cfg, p, img), mm)
    return _vit_head(cfg, p, x)


def fake_quant_vit_apply_observed(model, params, act_scales, img: jax.Array):
    """Static-aware QAT forward WITH live activation observers: like
    fake_quant_vit_apply_static, but additionally returns the per-matmul
    batch absmax ``[depth, 4]`` this forward saw, so the training loop can
    update the scales it trains against (EMA / running max) — the
    reference FX-QAT behavior, whose MovingAverage observers track the
    TRAINING batches as the weights drift
    (vendor nn_pruning_v1/nn_pruning/modules/quantization.py).  Closes the
    measured init-frozen-scale staleness cap (BENCHMARKS qat_payoff r4)."""
    import itertools

    cfg = model.config
    p = params["params"] if "params" in params else params
    scales = jnp.asarray(act_scales, jnp.float32)
    counter = itertools.count()
    seen = []

    def mm(x_, w):
        k = next(counter)
        i, j = divmod(k, 4)
        seen.append(jnp.max(jnp.abs(x_)).astype(jnp.float32))
        xq = fake_quant_act(x_, scales[i, j])
        return xq @ fake_quant_ste(w).astype(xq.dtype)

    x = _int8_encoder_blocks(cfg, p, _embed_vit(cfg, p, img), mm)
    logits = _vit_head(cfg, p, x)
    return logits, jax.lax.stop_gradient(
        jnp.stack(seen).reshape(cfg.depth, 4))


def quantize_activation_rows(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-row dynamic activation quant: x [m, k] -> (q int8, scale [m, 1])."""
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_matmul_dynamic(x: jax.Array, wq: jax.Array, w_scale: jax.Array) -> jax.Array:
    """Dynamic-range int8 matmul: quantize x per row at runtime, int8 x int8
    MXU matmul with int32 accumulation, dequantize with row*col scales."""
    orig_shape = x.shape
    x2 = x.reshape(-1, orig_shape[-1])
    xq, x_scale = quantize_activation_rows(x2)
    acc = jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    out = acc.astype(jnp.float32) * x_scale * w_scale[None, :]
    return out.astype(x.dtype).reshape(orig_shape[:-1] + (wq.shape[1],))


# ---------------------------------------------------------------------------
# Whole-model int8 (ViT)
# ---------------------------------------------------------------------------

_VIT_MATMUL_KEYS = (
    ("attn", "qkv_kernel"),
    ("attn", "out_kernel"),
    ("ffn", "fc1_kernel"),
    ("ffn", "fc2_kernel"),
)


def quantize_vit_params_int8(params: Dict) -> Dict:
    """Quantize every encoder matmul kernel of a ViT param tree to int8.

    Returns a new tree where each targeted kernel leaf becomes
    {"q": int8, "scale": f32[out]}.  Embedding/patch/head stay float (TFLite
    dynamic mode also leaves non-matmul ops float).
    """
    p = params["params"] if "params" in params else params
    new_p = dict(p)
    for name, blk in p.items():
        if not name.startswith("block_"):
            continue
        blk = jax.tree.map(lambda x: x, blk)
        for sub, key in _VIT_MATMUL_KEYS:
            w = blk[sub][key]
            q, s = quantize_weight_int8(w)
            blk[sub] = dict(blk[sub])
            blk[sub][key] = {"q": q, "scale": s}
        new_p[name] = blk
    # preserve sibling collections (e.g. T2T "constants") alongside params
    return {**params, "params": new_p} if "params" in params else new_p


def _mm_int8_dynamic(x_: jax.Array, leaf: Dict) -> jax.Array:
    return int8_matmul_dynamic(x_, leaf["q"], leaf["scale"])


def _mm_int8_static(x_: jax.Array, leaf: Dict) -> jax.Array:
    return int8_matmul_static(x_, leaf["q"], leaf["scale"], leaf["act_scale"])


def _int8_encoder_blocks(cfg, p: Dict, x: jax.Array, mm) -> jax.Array:
    """Family-agnostic int8 encoder walk over embedded tokens: every matmul
    routed through ``mm(x, quantized_leaf)`` (dynamic or static)."""
    from .activations import get_gelu
    from .attention import merge_heads, qkv_split, sdpa
    from .layers import layer_norm

    act = get_gelu(cfg.gelu_approx)
    hd = cfg.resolved_head_dim
    for i in range(cfg.depth):
        blk = p[f"block_{i}"]
        heads = cfg.layer_heads(i)
        h = layer_norm(x, blk["ln1"]["scale"], blk["ln1"]["bias"], cfg.layernorm_eps)
        qkv = mm(h, blk["attn"]["qkv_kernel"])
        if cfg.qkv_bias:
            qkv = qkv + blk["attn"]["qkv_bias"].astype(qkv.dtype)
        q, k, v = qkv_split(qkv, heads, hd)
        ctx = merge_heads(sdpa(q, k, v, scale=hd**-0.5))
        attn_out = mm(ctx, blk["attn"]["out_kernel"])
        attn_out = attn_out + blk["attn"]["out_bias"].astype(attn_out.dtype)
        x = (attn_out + h) if cfg.reference_residual else (x + attn_out)

        h2 = layer_norm(x, blk["ln2"]["scale"], blk["ln2"]["bias"], cfg.layernorm_eps)
        hid = act(mm(h2, blk["ffn"]["fc1_kernel"])
                  + blk["ffn"]["fc1_bias"].astype(x.dtype))
        mlp = mm(hid, blk["ffn"]["fc2_kernel"])
        mlp = mlp + blk["ffn"]["fc2_bias"].astype(mlp.dtype)
        x = (mlp + h2) if cfg.reference_residual else (x + mlp)
    return x


def _vit_head(cfg, p: Dict, x: jax.Array) -> jax.Array:
    """ViT epilogue: optional final norm, cls select, 1- or 2-layer head."""
    from .activations import get_gelu
    from .layers import layer_norm

    if cfg.final_norm:
        x = layer_norm(x, p["final_norm"]["scale"], p["final_norm"]["bias"],
                       cfg.layernorm_eps)
    x = x[:, 0]
    if cfg.mlp_head:
        act = get_gelu(cfg.gelu_approx)
        h = act(x @ p["head_fc1"]["kernel"] + p["head_fc1"]["bias"])
        return h @ p["head_fc2"]["kernel"] + p["head_fc2"]["bias"]
    return x @ p["head"]["kernel"] + p["head"]["bias"]


def int8_vit_apply(model, qparams: Dict, img: jax.Array) -> jax.Array:
    """Forward pass with int8 dynamic-range encoder matmuls.

    Same math as models/vit.py ViT.__call__, with each encoder matmul routed
    through int8_matmul_dynamic.
    """
    cfg = model.config
    p = qparams["params"] if "params" in qparams else qparams
    x = _int8_encoder_blocks(cfg, p, _embed_vit(cfg, p, img), _mm_int8_dynamic)
    return _vit_head(cfg, p, x)


def int8_t2t_apply(model, qparams: Dict, img: jax.Array) -> jax.Array:
    """T2T forward with int8 dynamic-range ENCODER matmuls (the
    tokens-to-token stem stays float, like the ViT patch embed; the
    reference's dynamic mode also leaves non-matmul ops float,
    utils.py:260-262).  qparams from quantize_vit_params_int8 over the T2T
    tree — the encoder blocks share the ViT layout."""
    from ..models.t2t_vit import t2t_tokenize

    cfg = model.config
    p = qparams["params"] if "params" in qparams else qparams
    x = t2t_tokenize(model, qparams if "params" in qparams else {"params": qparams},
                     img, fast=False)
    x = _int8_encoder_blocks(cfg, p, x, _mm_int8_dynamic)
    return _vit_head(cfg, p, x)


def int8_t2t_apply_static(model, qparams: Dict, img: jax.Array) -> jax.Array:
    """T2T forward with static (full-integer-style) int8 encoder matmuls —
    the XLA-level numerics oracle for fused_t2t_apply_int8 with a
    prepare_t2t_int8_static stack."""
    from ..models.t2t_vit import t2t_tokenize

    cfg = model.config
    p = qparams["params"] if "params" in qparams else qparams
    x = t2t_tokenize(model, qparams if "params" in qparams else {"params": qparams},
                     img, fast=False)
    x = _int8_encoder_blocks(cfg, p, x, _mm_int8_static)
    return _vit_head(cfg, p, x)


# ---------------------------------------------------------------------------
# Static int8 calibration (representative dataset)
# ---------------------------------------------------------------------------


def calibrate_activation_scales(
    apply_collect: Callable[[jax.Array], Dict[str, jax.Array]],
    batches,
    percentile: float | None = None,
) -> Dict[str, float]:
    """Run representative batches, record per-tensor absmax -> scale.

    ``apply_collect`` returns {tensor_name: activation} per batch (the
    analogue of the converter's representative_data_gen pass,
    utils.py:263-277: 100 random-normal batches in the reference).

    ``percentile`` (e.g. 99.9) clips outliers: the per-batch abs-percentile
    is taken instead of absmax, and the max over batches is kept (an
    approximation of the global percentile that avoids storing every
    activation)."""
    maxes: Dict[str, jax.Array] = {}
    for batch in batches:
        acts = apply_collect(jnp.asarray(batch))
        for name, a in acts.items():
            aa = jnp.abs(a)
            m = (jnp.percentile(aa, percentile) if percentile is not None
                 else jnp.max(aa))
            # running max stays ON DEVICE — a float() here would cost one
            # ~30 ms tunnel round trip per tensor per batch (4800 fetches
            # for a default deit calibration)
            maxes[name] = m if name not in maxes else jnp.maximum(maxes[name], m)
    names = list(maxes)
    vals = np.asarray(jnp.stack([maxes[k] for k in names]))  # ONE fetch
    return {k: (float(v) / 127.0 if v > 0 else 1.0)
            for k, v in zip(names, vals)}


# Per-layer matmul-input names, in the order the static kernels consume them.
VIT_ACT_KEYS = ("qkv_in", "out_in", "fc1_in", "fc2_in")


def encoder_collect_matmul_inputs(cfg, p: Dict, x: jax.Array) -> Dict[str, jax.Array]:
    """Float encoder walk over embedded tokens ``x`` recording every matmul
    INPUT activation — the family-agnostic core of the calibration pass
    (ViT starts from patch_embed, T2T from the tokens-to-token stem)."""
    from .activations import get_gelu
    from .attention import merge_heads, qkv_split, sdpa
    from .layers import layer_norm

    act = get_gelu(cfg.gelu_approx)
    hd = cfg.resolved_head_dim
    out: Dict[str, jax.Array] = {}
    for i in range(cfg.depth):
        blk = p[f"block_{i}"]
        heads = cfg.layer_heads(i)
        h = layer_norm(x, blk["ln1"]["scale"], blk["ln1"]["bias"], cfg.layernorm_eps)
        out[f"block_{i}/qkv_in"] = h
        qkv = h @ blk["attn"]["qkv_kernel"].astype(h.dtype)
        if cfg.qkv_bias:
            qkv = qkv + blk["attn"]["qkv_bias"].astype(qkv.dtype)
        q, k, v = qkv_split(qkv, heads, hd)
        ctx = merge_heads(sdpa(q, k, v, scale=hd**-0.5))
        out[f"block_{i}/out_in"] = ctx
        attn_out = ctx @ blk["attn"]["out_kernel"].astype(ctx.dtype)
        attn_out = attn_out + blk["attn"]["out_bias"].astype(attn_out.dtype)
        x = (attn_out + h) if cfg.reference_residual else (x + attn_out)

        h2 = layer_norm(x, blk["ln2"]["scale"], blk["ln2"]["bias"], cfg.layernorm_eps)
        out[f"block_{i}/fc1_in"] = h2
        hid = act(h2 @ blk["ffn"]["fc1_kernel"].astype(h2.dtype)
                  + blk["ffn"]["fc1_bias"].astype(h2.dtype))
        out[f"block_{i}/fc2_in"] = hid
        mlp = hid @ blk["ffn"]["fc2_kernel"].astype(hid.dtype)
        mlp = mlp + blk["ffn"]["fc2_bias"].astype(mlp.dtype)
        x = (mlp + h2) if cfg.reference_residual else (x + mlp)
    return out


def _embed_vit(cfg, p: Dict, img: jax.Array) -> jax.Array:
    """ViT embedding prologue: patch embed + cls + learned pos."""
    from .layers import patch_embed

    img = img.astype(cfg.dtype)
    x = patch_embed(img, p["patch_kernel"].astype(cfg.dtype),
                    p["patch_bias"].astype(cfg.dtype), cfg.patch_size)
    cls = jnp.broadcast_to(p["cls_token"].astype(cfg.dtype), (x.shape[0], 1, cfg.dim))
    return jnp.concatenate([cls, x], axis=1) + p["pos_embedding"].astype(cfg.dtype)


def vit_collect_matmul_inputs(model, variables, img: jax.Array) -> Dict[str, jax.Array]:
    """Float forward that records every encoder matmul INPUT activation.

    Returns {"block_{i}/qkv_in" | "out_in" | "fc1_in" | "fc2_in": array}.
    These are the tensors the static-int8 kernels quantize with calibrated
    per-tensor scales (the converter's representative-dataset pass,
    /root/reference/utils.py:263-277).
    """
    cfg = model.config
    p = variables["params"] if "params" in variables else variables
    return encoder_collect_matmul_inputs(cfg, p, _embed_vit(cfg, p, img))


# Candidate clip fractions for method="mse" (of the pass-1 absmax).
MSE_CLIP_RATIOS = (0.6, 0.7, 0.8, 0.85, 0.9, 0.95, 1.0)


def _calibrate_encoder(embed_fn, model, variables, batches=None, n: int = 100,
                       percentile: float | None = None,
                       method: str = "absmax") -> np.ndarray:
    """Shared calibration driver: embed each representative batch with
    ``embed_fn(variables, img)`` and reduce the encoder matmul-input absmaxes
    to act_scales [depth, 4] (VIT_ACT_KEYS order).

    ``method="mse"`` adds a second pass that picks, per tensor, the clip
    c = ratio * absmax (ratio in MSE_CLIP_RATIOS) minimizing the int8
    quantization MSE over the calibration set — strictly offline cost, same
    runtime kernels.  Measured on the deit_tiny logit oracle it tightens
    every drift metric vs plain absmax (max|dlogit| 0.155 vs 0.187, max rel
    0.041 vs 0.048, argmax agreement 57 vs 56/64); fixed-percentile clipping
    (the TFLite-style knob) trades max-drift *up* and is kept only for
    parity."""
    if batches is None:
        batches = representative_batches(
            n=n, shape=(3, model.config.image_size, model.config.image_size))
    if method == "mse":
        batches = list(batches)  # two passes
    elif method != "absmax":
        raise ValueError(f"unknown calibration method {method!r}")
    depth = model.config.depth

    # variables is a jit ARGUMENT, not a closure: closing over the weight
    # pytree embeds it as HLO constants and inflates the serialized compile
    # past the relay's request limit (HTTP 413 — the looptimer lesson).
    # The per-batch reduction to [depth, 4] also happens on device; only the
    # final accumulated array is fetched.
    def _collect_maxes(v, im):
        p = v["params"] if "params" in v else v
        acts = encoder_collect_matmul_inputs(model.config, p, embed_fn(v, im))
        rows = []
        for i in range(depth):
            cols = []
            for key in VIT_ACT_KEYS:
                aa = jnp.abs(acts[f"block_{i}/{key}"]).astype(jnp.float32)
                cols.append(jnp.percentile(aa, percentile)
                            if percentile is not None else jnp.max(aa))
            rows.append(jnp.stack(cols))
        return jnp.stack(rows)

    collect = jax.jit(_collect_maxes)
    run_max = None
    for batch in batches:
        m = collect(variables, jnp.asarray(batch))
        run_max = m if run_max is None else jnp.maximum(run_max, m)

    if method == "mse":
        ratios = jnp.asarray(MSE_CLIP_RATIOS, jnp.float32)

        def _collect_mse(v, im, amax):
            p = v["params"] if "params" in v else v
            acts = encoder_collect_matmul_inputs(model.config, p,
                                                 embed_fn(v, im))
            rows = []
            for i in range(depth):
                cols = []
                for key in VIT_ACT_KEYS:
                    a = acts[f"block_{i}/{key}"].astype(jnp.float32)
                    j = VIT_ACT_KEYS.index(key)
                    # zero guard (same as calibrate_swin's leaf_mse): an
                    # all-zero activation would make every candidate MSE
                    # NaN via 0/0 and poison the argmin
                    s = jnp.maximum(amax[i, j], 1e-30) * ratios / 127.0  # [R]
                    q = jnp.clip(jnp.round(a[..., None] / s), -127, 127) * s
                    cols.append(jnp.mean(
                        jnp.square(a[..., None] - q),
                        axis=tuple(range(a.ndim))))  # [R]
                rows.append(jnp.stack(cols))
            return jnp.stack(rows)  # [depth, 4, R]

        collect_mse = jax.jit(_collect_mse)
        mse_sum = None
        for batch in batches:
            m = collect_mse(variables, jnp.asarray(batch), run_max)
            mse_sum = m if mse_sum is None else mse_sum + m
        best = np.asarray(ratios)[np.asarray(mse_sum).argmin(-1)]
        run_max = run_max * jnp.asarray(best, jnp.float32)

    out = np.asarray(run_max, np.float32)  # one device->host fetch
    out = out / 127.0
    out[out <= 0] = 1.0
    return out


def calibrate_vit(model, variables, batches=None, n: int = 100,
                  percentile: float | None = None,
                  method: str = "absmax") -> np.ndarray:
    """Calibrate a ViT's encoder matmul-input scales on representative data.

    Returns act_scales [depth, 4] fp32 (columns in VIT_ACT_KEYS order) — the
    input to prepare_vit_int8_static / quantize_vit_params_int8_static.
    ``batches`` defaults to the reference's 100 random-normal images
    (utils.py:265-269).  ``method``: "absmax" (reference min/max semantics)
    or "mse" (offline MSE-optimal clip search — see _calibrate_encoder).
    """
    def embed(v, im):
        p = v["params"] if "params" in v else v
        return _embed_vit(model.config, p, im)

    return _calibrate_encoder(embed, model, variables, batches=batches, n=n,
                              percentile=percentile, method=method)


def calibrate_t2t(model, variables, batches=None, n: int = 100,
                  percentile: float | None = None,
                  method: str = "absmax") -> np.ndarray:
    """calibrate_vit for the T2T family: the tokens-to-token stem embeds
    (and stays float at deployment, like the ViT patch embed); the encoder
    matmul inputs are collected identically.  Uses the plain-unfold
    tokenizer form — the exact (non-shift-expanded) stage-1 math."""
    from ..models.t2t_vit import t2t_tokenize

    def embed(v, im):
        # same bare-or-wrapped contract as calibrate_vit
        return t2t_tokenize(model, v if "params" in v else {"params": v},
                            im, fast=False)

    return _calibrate_encoder(embed, model, variables, batches=batches, n=n,
                              percentile=percentile, method=method)


def quantize_activation_static(x: jax.Array, scale) -> jax.Array:
    """Per-tensor static activation quant with a precomputed (calibrated)
    scale — no runtime absmax reduction (the full-integer analogue of
    quantize_activation_rows)."""
    return jnp.clip(jnp.round(x * (1.0 / scale)), -127, 127).astype(jnp.int8)


def int8_matmul_static(x: jax.Array, wq: jax.Array, comb_scale: jax.Array,
                       act_scale) -> jax.Array:
    """Static int8 matmul: int8(x/act_scale) @ int8 weights -> int32,
    dequantized by the COMBINED per-channel scale (w_scale * act_scale,
    folded at prep time)."""
    orig_shape = x.shape
    xq = quantize_activation_static(x.reshape(-1, orig_shape[-1]), act_scale)
    acc = jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    out = acc.astype(jnp.float32) * comb_scale[None, :]
    return out.astype(x.dtype).reshape(orig_shape[:-1] + (wq.shape[1],))


def quantize_vit_params_int8_static(params: Dict, act_scales: np.ndarray) -> Dict:
    """Static-int8 ViT param tree: each encoder matmul kernel leaf becomes
    {"q": int8, "scale": f32[out] COMBINED (w*act), "act_scale": f32 scalar}.

    The TFLITE_BUILTINS_INT8 analogue of quantize_vit_params_int8
    (/root/reference/utils.py:263-277): activation scales are fixed at
    convert time from calibration, not computed per row at runtime."""
    act_scales = np.asarray(act_scales, np.float32)
    p = params["params"] if "params" in params else params
    new_p = dict(p)
    for name, blk in p.items():
        if not name.startswith("block_"):
            continue
        i = int(name.split("_")[1])
        blk = jax.tree.map(lambda x: x, blk)
        for j, (sub, key) in enumerate(_VIT_MATMUL_KEYS):
            w = blk[sub][key]
            q, s = quantize_weight_int8(w)
            a = float(act_scales[i, j])
            blk[sub] = dict(blk[sub])
            blk[sub][key] = {"q": q, "scale": s * a,
                             "act_scale": jnp.float32(a)}
        new_p[name] = blk
    # preserve sibling collections (e.g. T2T "constants") alongside params
    return {**params, "params": new_p} if "params" in params else new_p


def int8_vit_apply_static(model, qparams: Dict, img: jax.Array) -> jax.Array:
    """Forward pass with static (full-integer-style) int8 encoder matmuls.

    Same structure as int8_vit_apply but every activation is quantized with
    its calibrated per-tensor scale (qparams from
    quantize_vit_params_int8_static) — the XLA-level numerics oracle for the
    static fused kernels."""
    cfg = model.config
    p = qparams["params"] if "params" in qparams else qparams
    x = _int8_encoder_blocks(cfg, p, _embed_vit(cfg, p, img), _mm_int8_static)
    return _vit_head(cfg, p, x)


def representative_batches(n: int = 100, batch: int = 1, shape=(3, 224, 224), seed=0):
    """Random-normal representative dataset, like utils.py:265-269."""
    rng = np.random.RandomState(seed)
    for _ in range(n):
        yield rng.randn(batch, *shape).astype(np.float32)


# ---------------------------------------------------------------------------
# SmoothQuant-style offline scale migration (static-int8 preprocessing)
# ---------------------------------------------------------------------------

# Matmul inputs whose per-channel outlier spread can be migrated into the
# weights by an EXACT float refactoring:
#   qkv_in, fc1_in — produced by a LayerNorm, so a per-channel 1/s folds into
#     the LN scale/bias (valid only when the LN output feeds ONLY the matmul,
#     i.e. standard residual; the reference-quirk residual reuses LN(x) as
#     the skip, models/vit.py pre-norm quirk, so those folds are gated off);
#   out_in — the merged attention context; channel c is v-channel c (softmax
#     mixes tokens, not channels), so 1/s folds into the v-section columns of
#     the fused qkv kernel (+ bias) and s into the out_kernel rows — valid in
#     BOTH residual modes.
# fc2_in sits behind the GELU (nonlinear), so it cannot be folded and is left
# to the clip calibrators.
SMOOTH_KEYS = ("qkv_in", "out_in", "fc1_in")


def _collect_channel_maxes(embed_fn, model, variables, batches=None,
                           n: int = 32):
    """Per-CHANNEL activation absmax of the smoothable matmul inputs.

    Returns {"block_i": {key: np.float32[channels]}} for key in SMOOTH_KEYS.
    Same device discipline as _calibrate_encoder: per-batch reduction jitted
    with variables as an argument, running max on device, one final fetch.
    """
    if batches is None:
        batches = representative_batches(
            n=n, shape=(3, model.config.image_size, model.config.image_size))
    depth = model.config.depth

    def _collect(v, im):
        p = v["params"] if "params" in v else v
        acts = encoder_collect_matmul_inputs(model.config, p, embed_fn(v, im))
        out = {}
        for i in range(depth):
            out[f"block_{i}"] = {
                key: jnp.max(jnp.abs(acts[f"block_{i}/{key}"]
                                     .astype(jnp.float32)),
                             axis=tuple(range(acts[f"block_{i}/{key}"].ndim - 1)))
                for key in SMOOTH_KEYS
            }
        return out

    collect = jax.jit(_collect)
    run_max = None
    for batch in batches:
        m = collect(variables, jnp.asarray(batch))
        run_max = m if run_max is None else jax.tree.map(jnp.maximum, run_max, m)
    return jax.tree.map(lambda a: np.asarray(a, np.float32), run_max)


def _smooth_s(act_max: np.ndarray, w_in_max: np.ndarray,
              alpha: float) -> np.ndarray:
    """SmoothQuant migration strength: s_j = max|X_j|^a / max|W_j|^(1-a).

    Channels the calibration set never activates (act_max 0) keep s=1; s is
    clipped to [1e-3, 1e3] so a dead weight row cannot explode the fold."""
    a = np.maximum(act_max.astype(np.float64), 1e-12)
    w = np.maximum(w_in_max.astype(np.float64), 1e-12)
    s = a ** alpha / w ** (1.0 - alpha)
    s = np.where(act_max > 0, s, 1.0)
    return np.clip(s, 1e-3, 1e3).astype(np.float32)


def smooth_encoder_params(cfg, params: Dict, ch_maxes: Dict,
                          alpha: float = 0.5) -> Dict:
    """Fold per-channel smoothing scales into an encoder param tree.

    Returns a new float tree whose forward is EXACTLY equivalent (same math,
    re-parameterized) but whose smoothed matmul-input activations have their
    outlier channels shrunk toward the weights — so the per-TENSOR static
    activation scales the int8 kernels use (int8_matmul_static) lose less
    resolution.  Offline only: the deployment kernels are unchanged.

    With cfg.reference_residual (the TF pre-norm quirk), the LN outputs also
    feed the skip path, so only the out_in fold applies.
    """
    p = params["params"] if "params" in params else params
    new_p = dict(p)
    ln_foldable = not cfg.reference_residual
    for name in p:
        if not name.startswith("block_"):
            continue
        import collections.abc as _abc
        blk = {k: (dict(v) if isinstance(v, _abc.Mapping) else v)
               for k, v in p[name].items()}
        mx = ch_maxes[name]
        qkv_w = jnp.asarray(blk["attn"]["qkv_kernel"], jnp.float32)

        if ln_foldable:
            # qkv_in: LN -> qkv matmul
            s = _smooth_s(mx["qkv_in"],
                          np.asarray(jnp.max(jnp.abs(qkv_w), axis=1)), alpha)
            sj = jnp.asarray(s)
            blk["ln1"]["scale"] = blk["ln1"]["scale"] / sj
            blk["ln1"]["bias"] = blk["ln1"]["bias"] / sj
            qkv_w = qkv_w * sj[:, None]

            # fc1_in: LN -> fc1 matmul
            fc1_w = jnp.asarray(blk["ffn"]["fc1_kernel"], jnp.float32)
            s = _smooth_s(mx["fc1_in"],
                          np.asarray(jnp.max(jnp.abs(fc1_w), axis=1)), alpha)
            sj = jnp.asarray(s)
            blk["ln2"]["scale"] = blk["ln2"]["scale"] / sj
            blk["ln2"]["bias"] = blk["ln2"]["bias"] / sj
            blk["ffn"]["fc1_kernel"] = fc1_w * sj[:, None]

        # out_in: v-section columns of qkv (+ bias) -> out_kernel rows.
        # Fused-qkv layout is (qkv, heads, head_dim) on the last axis
        # (ops/attention.qkv_split), so v = columns [2*W/3, W); merge_heads
        # keeps (head, head_dim) order, so ctx channel c == v column v0+c.
        out_w = jnp.asarray(blk["attn"]["out_kernel"], jnp.float32)
        v0 = 2 * (qkv_w.shape[1] // 3)
        s = _smooth_s(mx["out_in"],
                      np.asarray(jnp.max(jnp.abs(out_w), axis=1)), alpha)
        sj = jnp.asarray(s)
        qkv_w = qkv_w.at[:, v0:].multiply(1.0 / sj[None, :])
        if cfg.qkv_bias:
            qb = jnp.asarray(blk["attn"]["qkv_bias"], jnp.float32)
            blk["attn"]["qkv_bias"] = qb.at[..., v0:].multiply(1.0 / sj)
        blk["attn"]["qkv_kernel"] = qkv_w
        blk["attn"]["out_kernel"] = out_w * sj[:, None]
        new_p[name] = blk
    return {**params, "params": new_p} if "params" in params else new_p


def smooth_vit(model, variables, batches=None, n: int = 32,
               alpha: float = 0.5) -> Dict:
    """SmoothQuant-style preprocessing for the ViT family: collect per-channel
    activation maxima on representative data, fold migration scales into the
    param tree.  Pipe the result through calibrate_vit +
    quantize_vit_params_int8_static as usual."""
    def embed(v, im):
        p = v["params"] if "params" in v else v
        return _embed_vit(model.config, p, im)

    ch = _collect_channel_maxes(embed, model, variables, batches=batches, n=n)
    return smooth_encoder_params(model.config, variables, ch, alpha=alpha)


def smooth_t2t(model, variables, batches=None, n: int = 32,
               alpha: float = 0.5) -> Dict:
    """smooth_vit for the T2T family (tokens-to-token stem embeds and stays
    float; encoder blocks share the ViT layout)."""
    from ..models.t2t_vit import t2t_tokenize

    def embed(v, im):
        return t2t_tokenize(model, v if "params" in v else {"params": v},
                            im, fast=False)

    ch = _collect_channel_maxes(embed, model, variables, batches=batches, n=n)
    return smooth_encoder_params(model.config, variables, ch, alpha=alpha)
