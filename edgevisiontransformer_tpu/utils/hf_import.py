"""HuggingFace -> native weight conversion.

Replaces the reference's model getters (`get_torch_deit` via torch.hub,
`get_huggingface_vit`, /root/reference/utils.py:52-118): instead of wrapping
torch modules we convert their state dicts into our Flax param pytrees once,
then run everything through the JAX/XLA path.

Supported: ViT/DeiT (`ViTForImageClassification`) and Swin
(`SwinForImageClassification`).  Conversion is pure numpy over a state-dict
mapping — no torch tensors leak into the JAX world.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from ..config import ViTConfig
from ..models.swin import SwinConfig


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def vit_config_from_hf(hf_config, num_classes: int | None = None) -> ViTConfig:
    """Build our standard-style config from a transformers ViTConfig."""
    return ViTConfig(
        image_size=hf_config.image_size,
        patch_size=hf_config.patch_size,
        num_classes=num_classes
        if num_classes is not None
        else getattr(hf_config, "num_labels", 1000),
        dim=hf_config.hidden_size,
        depth=hf_config.num_hidden_layers,
        heads=hf_config.num_attention_heads,
        mlp_dim=hf_config.intermediate_size,
        in_channels=hf_config.num_channels,
        reference_residual=False,
        mlp_head=False,
        final_norm=True,
        qkv_bias=hf_config.qkv_bias,
        gelu_approx=False,
        layernorm_eps=hf_config.layer_norm_eps,
    )


def import_hf_vit(state_dict: Mapping[str, "np.ndarray"], cfg: ViTConfig) -> Dict:
    """Convert a ViTForImageClassification state dict to our ViT params.

    Layout notes:
    * HF patch embedding is a conv [dim, c, p, p]; ours is a matmul kernel
      [p*p*c, dim] over patches flattened as (p1, p2, c) — so transpose to
      (ph, pw, c, dim).
    * HF has separate q/k/v Linears (torch weight [out, in]); our fused
      qkv_kernel is [dim, 3*h*hd] with the fused axis ordered (qkv, h, hd),
      so concat the three transposed weights along the output axis.
    """
    sd = {k: _np(v) for k, v in state_dict.items()}
    pfx = "vit." if any(k.startswith("vit.") for k in sd) else ""

    p = cfg.patch_size
    c = cfg.in_channels
    dim = cfg.dim

    conv_w = sd[f"{pfx}embeddings.patch_embeddings.projection.weight"]
    params: Dict = {
        "cls_token": sd[f"{pfx}embeddings.cls_token"],
        "pos_embedding": sd[f"{pfx}embeddings.position_embeddings"][0],
        "patch_kernel": conv_w.transpose(2, 3, 1, 0).reshape(p * p * c, dim),
        "patch_bias": sd[f"{pfx}embeddings.patch_embeddings.projection.bias"],
    }

    for i in range(cfg.depth):
        lp = f"{pfx}encoder.layer.{i}."
        wq = sd[lp + "attention.attention.query.weight"].T
        wk = sd[lp + "attention.attention.key.weight"].T
        wv = sd[lp + "attention.attention.value.weight"].T
        blk = {
            "attn": {
                "qkv_kernel": np.concatenate([wq, wk, wv], axis=1),
                "out_kernel": sd[lp + "attention.output.dense.weight"].T,
                "out_bias": sd[lp + "attention.output.dense.bias"],
            },
            "ffn": {
                "fc1_kernel": sd[lp + "intermediate.dense.weight"].T,
                "fc1_bias": sd[lp + "intermediate.dense.bias"],
                "fc2_kernel": sd[lp + "output.dense.weight"].T,
                "fc2_bias": sd[lp + "output.dense.bias"],
            },
            "ln1": {
                "scale": sd[lp + "layernorm_before.weight"],
                "bias": sd[lp + "layernorm_before.bias"],
            },
            "ln2": {
                "scale": sd[lp + "layernorm_after.weight"],
                "bias": sd[lp + "layernorm_after.bias"],
            },
        }
        if cfg.qkv_bias:
            blk["attn"]["qkv_bias"] = np.concatenate(
                [
                    sd[lp + "attention.attention.query.bias"],
                    sd[lp + "attention.attention.key.bias"],
                    sd[lp + "attention.attention.value.bias"],
                ]
            )
        params[f"block_{i}"] = blk

    params["final_norm"] = {
        "scale": sd[f"{pfx}layernorm.weight"],
        "bias": sd[f"{pfx}layernorm.bias"],
    }
    if "classifier.weight" in sd:
        params["head"] = {
            "kernel": sd["classifier.weight"].T,
            "bias": sd["classifier.bias"],
        }
    else:  # headless backbone: zero classifier
        params["head"] = {
            "kernel": np.zeros((dim, cfg.num_classes), np.float32),
            "bias": np.zeros((cfg.num_classes,), np.float32),
        }
    return {"params": _to_jnp(params)}


def _to_jnp(tree):
    import jax.numpy as jnp

    if isinstance(tree, dict):
        return {k: _to_jnp(v) for k, v in tree.items()}
    return jnp.asarray(tree)


def swin_config_from_hf(hf_config, num_classes: int | None = None) -> SwinConfig:
    return SwinConfig(
        image_size=hf_config.image_size,
        patch_size=hf_config.patch_size,
        in_channels=hf_config.num_channels,
        num_classes=num_classes
        if num_classes is not None
        else getattr(hf_config, "num_labels", 1000),
        embed_dim=hf_config.embed_dim,
        depths=tuple(hf_config.depths),
        num_heads=tuple(hf_config.num_heads),
        window_size=hf_config.window_size,
        mlp_ratio=hf_config.mlp_ratio,
        qkv_bias=hf_config.qkv_bias,
        layernorm_eps=hf_config.layer_norm_eps,
        gelu_approx=False,
    )


def import_hf_swin(state_dict: Mapping[str, "np.ndarray"], cfg: SwinConfig):
    """Convert a SwinForImageClassification state dict to our params.

    Returns (params_dict, constants_dict) — Swin carries constant
    relative-position-index / attn-mask tables in a separate collection; the
    HF relative_position_index buffers are recomputed natively, so only the
    bias *table* is imported.
    """
    sd = {k: _np(v) for k, v in state_dict.items()}
    pfx = "swin." if any(k.startswith("swin.") for k in sd) else ""

    p = cfg.patch_size
    c = cfg.in_channels
    conv_w = sd[f"{pfx}embeddings.patch_embeddings.projection.weight"]
    params: Dict = {
        "patch_kernel": conv_w.transpose(2, 3, 1, 0).reshape(
            p * p * c, cfg.embed_dim
        ),
        "patch_bias": sd[f"{pfx}embeddings.patch_embeddings.projection.bias"],
        "embed_norm_scale": sd[f"{pfx}embeddings.norm.weight"],
        "embed_norm_bias": sd[f"{pfx}embeddings.norm.bias"],
        "final_norm_scale": sd[f"{pfx}layernorm.weight"],
        "final_norm_bias": sd[f"{pfx}layernorm.bias"],
    }

    for si, depth in enumerate(cfg.depths):
        for bi in range(depth):
            lp = f"{pfx}encoder.layers.{si}.blocks.{bi}."
            wq = sd[lp + "attention.self.query.weight"].T
            wk = sd[lp + "attention.self.key.weight"].T
            wv = sd[lp + "attention.self.value.weight"].T
            blk = {
                "ln1_scale": sd[lp + "layernorm_before.weight"],
                "ln1_bias": sd[lp + "layernorm_before.bias"],
                "ln2_scale": sd[lp + "layernorm_after.weight"],
                "ln2_bias": sd[lp + "layernorm_after.bias"],
                "mlp_fc1_kernel": sd[lp + "intermediate.dense.weight"].T,
                "mlp_fc1_bias": sd[lp + "intermediate.dense.bias"],
                "mlp_fc2_kernel": sd[lp + "output.dense.weight"].T,
                "mlp_fc2_bias": sd[lp + "output.dense.bias"],
                "attn": {
                    "qkv": {
                        "kernel": np.concatenate([wq, wk, wv], axis=1),
                        "bias": np.concatenate(
                            [
                                sd[lp + "attention.self.query.bias"],
                                sd[lp + "attention.self.key.bias"],
                                sd[lp + "attention.self.value.bias"],
                            ]
                        ),
                    },
                    "proj": {
                        "kernel": sd[lp + "attention.output.dense.weight"].T,
                        "bias": sd[lp + "attention.output.dense.bias"],
                    },
                    "relative_position_bias_table": sd[
                        lp + "attention.self.relative_position_bias_table"
                    ],
                },
            }
            params[f"stage_{si}_block_{bi}"] = blk
        if si < len(cfg.depths) - 1:
            dp = f"{pfx}encoder.layers.{si}.downsample."
            params[f"downsample_{si}"] = {
                "norm_scale": sd[dp + "norm.weight"],
                "norm_bias": sd[dp + "norm.bias"],
                "reduction": {"kernel": sd[dp + "reduction.weight"].T},
            }

    if "classifier.weight" in sd:
        params["head"] = {
            "kernel": sd["classifier.weight"].T,
            "bias": sd["classifier.bias"],
        }
    return {"params": _to_jnp(params)}


def load_hf_model_params(name_or_path: str, family: str = "vit"):
    """Load a pretrained HF checkpoint and convert (needs local cache/files).

    This is the `get_torch_deit` / `get_huggingface_vit` replacement
    (reference utils.py:52-118): e.g. ``facebook/deit-tiny-patch16-224``.
    """
    if family == "vit":
        from transformers import ViTForImageClassification

        hf = ViTForImageClassification.from_pretrained(name_or_path)
        cfg = vit_config_from_hf(hf.config)
        return cfg, import_hf_vit(hf.state_dict(), cfg)
    elif family == "swin":
        from transformers import SwinForImageClassification

        hf = SwinForImageClassification.from_pretrained(name_or_path)
        cfg = swin_config_from_hf(hf.config)
        return cfg, import_hf_swin(hf.state_dict(), cfg)
    raise ValueError(f"unknown family {family!r}")
