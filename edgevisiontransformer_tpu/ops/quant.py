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
    return {"params": new_p} if "params" in params else new_p


def int8_vit_apply(model, qparams: Dict, img: jax.Array) -> jax.Array:
    """Forward pass with int8 dynamic-range encoder matmuls.

    Same math as models/vit.py ViT.__call__, with each encoder matmul routed
    through int8_matmul_dynamic.
    """
    from ..models.vit import ViT  # noqa
    from .activations import get_gelu
    from .attention import merge_heads, qkv_split, sdpa
    from .layers import layer_norm, patch_embed

    cfg = model.config
    p = qparams["params"] if "params" in qparams else qparams
    img = img.astype(cfg.dtype)
    x = patch_embed(img, p["patch_kernel"].astype(cfg.dtype),
                    p["patch_bias"].astype(cfg.dtype), cfg.patch_size)
    cls = jnp.broadcast_to(p["cls_token"].astype(cfg.dtype), (x.shape[0], 1, cfg.dim))
    x = jnp.concatenate([cls, x], axis=1) + p["pos_embedding"].astype(cfg.dtype)

    act = get_gelu(cfg.gelu_approx)
    hd = cfg.resolved_head_dim
    for i in range(cfg.depth):
        blk = p[f"block_{i}"]
        heads = cfg.layer_heads(i)
        h = layer_norm(x, blk["ln1"]["scale"], blk["ln1"]["bias"], cfg.layernorm_eps)
        qkv = int8_matmul_dynamic(h, blk["attn"]["qkv_kernel"]["q"],
                                  blk["attn"]["qkv_kernel"]["scale"])
        if cfg.qkv_bias:
            qkv = qkv + blk["attn"]["qkv_bias"].astype(qkv.dtype)
        q, k, v = qkv_split(qkv, heads, hd)
        ctx = merge_heads(sdpa(q, k, v, scale=hd**-0.5))
        attn_out = int8_matmul_dynamic(ctx, blk["attn"]["out_kernel"]["q"],
                                       blk["attn"]["out_kernel"]["scale"])
        attn_out = attn_out + blk["attn"]["out_bias"].astype(attn_out.dtype)
        x = (attn_out + h) if cfg.reference_residual else (x + attn_out)

        h2 = layer_norm(x, blk["ln2"]["scale"], blk["ln2"]["bias"], cfg.layernorm_eps)
        hid = int8_matmul_dynamic(h2, blk["ffn"]["fc1_kernel"]["q"],
                                  blk["ffn"]["fc1_kernel"]["scale"])
        hid = act(hid + blk["ffn"]["fc1_bias"].astype(hid.dtype))
        mlp = int8_matmul_dynamic(hid, blk["ffn"]["fc2_kernel"]["q"],
                                  blk["ffn"]["fc2_kernel"]["scale"])
        mlp = mlp + blk["ffn"]["fc2_bias"].astype(mlp.dtype)
        x = (mlp + h2) if cfg.reference_residual else (x + mlp)

    if cfg.final_norm:
        x = layer_norm(x, p["final_norm"]["scale"], p["final_norm"]["bias"],
                       cfg.layernorm_eps)
    x = x[:, 0]
    if cfg.mlp_head:
        h = act(x @ p["head_fc1"]["kernel"] + p["head_fc1"]["bias"])
        return h @ p["head_fc2"]["kernel"] + p["head_fc2"]["bias"]
    return x @ p["head"]["kernel"] + p["head"]["bias"]


# ---------------------------------------------------------------------------
# Static int8 calibration (representative dataset)
# ---------------------------------------------------------------------------


def calibrate_activation_scales(
    apply_collect: Callable[[jax.Array], Dict[str, jax.Array]],
    batches,
) -> Dict[str, float]:
    """Run representative batches, record per-tensor absmax -> scale.

    ``apply_collect`` returns {tensor_name: activation} per batch (the
    analogue of the converter's representative_data_gen pass,
    utils.py:263-277: 100 random-normal batches in the reference)."""
    maxes: Dict[str, float] = {}
    for batch in batches:
        acts = apply_collect(jnp.asarray(batch))
        for name, a in acts.items():
            m = float(jnp.max(jnp.abs(a)))
            maxes[name] = max(maxes.get(name, 0.0), m)
    return {k: (v / 127.0 if v > 0 else 1.0) for k, v in maxes.items()}


def representative_batches(n: int = 100, batch: int = 1, shape=(3, 224, 224), seed=0):
    """Random-normal representative dataset, like utils.py:265-269."""
    rng = np.random.RandomState(seed)
    for _ in range(n):
        yield rng.randn(batch, *shape).astype(np.float32)
