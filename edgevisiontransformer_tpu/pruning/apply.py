"""Structural pruning application: weight slicing at static shapes.

The reference prunes via HF ``model.vit.prune_heads`` (torch in-place Linear
surgery, run_classifier.py:247-250) or soft masks.  TPU-native equivalent:
produce a NEW param pytree sliced to the remaining heads/FFN units plus a
config with per-layer static shapes (heads_per_layer / mlp_dim_per_layer) —
XLA then compiles shape-specialized kernels, which is where the latency win
comes from (SURVEY.md §7.6).
"""

from __future__ import annotations

from typing import Dict, Sequence, Set

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ViTConfig


def _remaining(heads: int, pruned: Set[int]) -> np.ndarray:
    return np.asarray([h for h in range(heads) if h not in pruned], dtype=np.int32)


def prune_heads_params(
    cfg: ViTConfig, params: dict, to_prune: Dict[int, Set[int]]
):
    """Slice fused-qkv / out-proj weights to the remaining heads.

    Returns (new_cfg, new_params).  qkv kernels are [dim, 3*H*hd] with fused
    axis ordered (qkv, head, hd) — reshaped to [dim, 3, H, hd] for the head
    gather; out kernels are [H*hd, dim] -> [H, hd, dim].
    """
    p = params["params"] if "params" in params else params
    p = jax.tree.map(lambda x: x, p)  # shallow copy of dicts below
    hd = cfg.resolved_head_dim
    new_heads = []
    new_params = dict(p)
    for i in range(cfg.depth):
        heads_i = cfg.layer_heads(i)
        pruned = to_prune.get(i, set())
        keep = _remaining(heads_i, pruned)
        new_heads.append(len(keep))
        if len(keep) == heads_i:
            continue
        blk = dict(p[f"block_{i}"])
        attn = dict(blk["attn"])
        dim = attn["qkv_kernel"].shape[0]

        w = attn["qkv_kernel"].reshape(dim, 3, heads_i, hd)
        attn["qkv_kernel"] = w[:, :, keep, :].reshape(dim, 3 * len(keep) * hd)
        if "qkv_bias" in attn:
            bqkv = attn["qkv_bias"].reshape(3, heads_i, hd)
            attn["qkv_bias"] = bqkv[:, keep, :].reshape(3 * len(keep) * hd)
        wo = attn["out_kernel"].reshape(heads_i, hd, -1)
        attn["out_kernel"] = wo[keep].reshape(len(keep) * hd, -1)
        blk["attn"] = attn
        new_params[f"block_{i}"] = blk

    new_cfg = cfg.replace(heads_per_layer=tuple(new_heads), head_dim=hd)
    out = {"params": new_params} if "params" in params else new_params
    return new_cfg, out


def prune_ffn_params(
    cfg: ViTConfig, params: dict, keep_units: Dict[int, Sequence[int]]
):
    """Physically slice FFN hidden units per layer (reference optimize_model
    semantics, inference_model_patcher.py:266-317: zero rows of fc1 ∧ zero
    cols of fc2 are removed)."""
    p = params["params"] if "params" in params else params
    new_mlp = []
    new_params = dict(p)
    for i in range(cfg.depth):
        full = cfg.layer_mlp_dim(i)
        keep = np.asarray(list(keep_units.get(i, range(full))), dtype=np.int32)
        new_mlp.append(len(keep))
        if len(keep) == full:
            continue
        blk = dict(p[f"block_{i}"])
        ffn = dict(blk["ffn"])
        ffn["fc1_kernel"] = ffn["fc1_kernel"][:, keep]
        ffn["fc1_bias"] = ffn["fc1_bias"][keep]
        ffn["fc2_kernel"] = ffn["fc2_kernel"][keep, :]
        blk["ffn"] = ffn
        new_params[f"block_{i}"] = blk
    new_cfg = cfg.replace(mlp_dim_per_layer=tuple(new_mlp))
    out = {"params": new_params} if "params" in params else new_params
    return new_cfg, out


def mask_heads_params(cfg: ViTConfig, params: dict, to_prune: Dict[int, Set[int]]):
    """Soft masking (reference ``mask_heads`` path, run_classifier.py:250):
    zero the out-projection rows of masked heads so outputs are exactly as if
    pruned, without shape changes.  Useful for eval-before-commit."""
    p = params["params"] if "params" in params else params
    hd = cfg.resolved_head_dim
    new_params = dict(p)
    for i, pruned in to_prune.items():
        if not pruned:
            continue
        heads_i = cfg.layer_heads(i)
        blk = dict(p[f"block_{i}"])
        attn = dict(blk["attn"])
        wo = np.array(attn["out_kernel"]).reshape(heads_i, hd, -1)
        for h in pruned:
            wo[h] = 0.0
        attn["out_kernel"] = jnp.asarray(wo.reshape(heads_i * hd, -1))
        blk["attn"] = attn
        new_params[f"block_{i}"] = blk
    return {"params": new_params} if "params" in params else new_params
