"""Model-level tests for the ViT/DeiT family.

Covers: shape correctness for all sizes/styles, pruned static shapes, the
reference-residual quirk semantics, and golden behavior of the ops kit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edgevisiontransformer_tpu.config import decode_prune_encoding
from edgevisiontransformer_tpu.models.vit import (
    ViT,
    deit_config,
    pruned_vit_config,
)
from edgevisiontransformer_tpu.ops.attention import attention_xla, qkv_split
from edgevisiontransformer_tpu.ops.layers import layer_norm, patch_embed


def _tiny_cfg(style="standard", **kw):
    # Small-depth config for fast tests.
    base = dict(image_size=32, patch_size=16, dim=64, depth=2, heads=2, mlp_dim=128,
                num_classes=10)
    base.update(kw)
    return deit_config("tiny", style).replace(**base)


@pytest.mark.parametrize("style", ["standard", "reference"])
def test_vit_forward_shapes(style):
    cfg = deit_config("tiny", style).replace(
        image_size=32, patch_size=16, dim=64, depth=2, heads=2, mlp_dim=128, num_classes=10
    )
    model = ViT(cfg)
    x = jnp.ones((2, 3, 32, 32))
    params = model.init(jax.random.key(0), x)
    y = model.apply(params, x)
    assert y.shape == (2, 10)
    assert jnp.isfinite(y).all()


def test_deit_param_counts():
    """DeiT-Tiny standard form must match the published ~5.7M params."""
    cfg = deit_config("tiny", "standard")
    model = ViT(cfg)
    params = model.init(jax.random.key(0), jnp.ones((1, 3, 224, 224)))
    n = sum(np.prod(p.shape) for p in jax.tree.leaves(params))
    assert 5.5e6 < n < 5.8e6, f"got {n}"


def test_prune_encoding_roundtrip():
    heads, mlps = decode_prune_encoding("all_head2_ffn0.5", depth=4, mlp_dim=768)
    assert heads == (2, 2, 2, 2)
    assert mlps == (384, 384, 384, 384)
    heads, mlps = decode_prune_encoding(
        "layerwise_h2-d1.0_h3-d0.5", depth=2, mlp_dim=100
    )
    assert heads == (2, 3)
    assert mlps == (100, 50)


def test_pruned_vit_shapes():
    cfg = pruned_vit_config(
        size="tiny", prune_encoding="layerwise_" + "_".join(["h2-d0.5"] * 12)
    )
    model = ViT(cfg)
    x = jnp.ones((1, 3, 224, 224))
    params = model.init(jax.random.key(0), x)
    # per-layer qkv kernel is [dim, 3*2*64]
    qkv = params["params"]["block_0"]["attn"]["qkv_kernel"]
    assert qkv.shape == (192, 3 * 2 * 64)
    fc1 = params["params"]["block_0"]["ffn"]["fc1_kernel"]
    assert fc1.shape == (192, 384)
    y = model.apply(params, x)
    assert y.shape == (1, 1000)


def test_reference_residual_quirk():
    """reference style: block(x) == ffn_part(attn_part) with skip = LN(x)."""
    cfg = _tiny_cfg(style="reference").replace(
        reference_residual=True, depth=1
    )
    model = ViT(cfg)
    x = jax.random.normal(jax.random.key(1), (1, 3, 32, 32))
    params = model.init(jax.random.key(0), x)

    # Manually recompute the first block with the quirk semantics.
    from edgevisiontransformer_tpu.ops.layers import mlp_block
    from edgevisiontransformer_tpu.ops.activations import get_gelu

    p = params["params"]
    img = x
    emb = patch_embed(img, p["patch_kernel"], p["patch_bias"], cfg.patch_size)
    cls = jnp.broadcast_to(p["cls_token"], (1, 1, cfg.dim))
    h0 = jnp.concatenate([cls, emb], axis=1) + p["pos_embedding"]

    blk = p["block_0"]
    ln1 = layer_norm(h0, blk["ln1"]["scale"], blk["ln1"]["bias"], cfg.layernorm_eps)
    a = attention_xla(
        ln1,
        blk["attn"]["qkv_kernel"],
        None,
        blk["attn"]["out_kernel"],
        blk["attn"]["out_bias"],
        cfg.heads,
        cfg.resolved_head_dim,
    )
    h1 = a + ln1  # the quirk: skip path is LN(x), not x
    ln2 = layer_norm(h1, blk["ln2"]["scale"], blk["ln2"]["bias"], cfg.layernorm_eps)
    f = mlp_block(
        ln2,
        blk["ffn"]["fc1_kernel"],
        blk["ffn"]["fc1_bias"],
        blk["ffn"]["fc2_kernel"],
        blk["ffn"]["fc2_bias"],
        get_gelu(True),
    )
    h2 = f + ln2

    head = h2[:, 0]
    head = head @ p["head_fc1"]["kernel"] + p["head_fc1"]["bias"]
    head = get_gelu(True)(head)
    expect = head @ p["head_fc2"]["kernel"] + p["head_fc2"]["bias"]

    got = model.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=1e-5, atol=1e-5)


def test_qkv_split_layout():
    """Fused axis order must be (qkv, heads, head_dim) like the reference."""
    b, n, h, d = 2, 5, 3, 4
    qkv = jnp.arange(b * n * 3 * h * d, dtype=jnp.float32).reshape(b, n, 3 * h * d)
    q, k, v = qkv_split(qkv, h, d)
    assert q.shape == (b, h, n, d)
    # element (b0, n0, qkv=1, h=2, d=3) should land at k[0, 2, 0, 3]
    flat_idx = (1 * h + 2) * d + 3
    assert k[0, 2, 0, 3] == qkv[0, 0, flat_idx]


def test_layer_norm_matches_jnp():
    x = jax.random.normal(jax.random.key(0), (4, 7, 16))
    g = jax.random.normal(jax.random.key(1), (16,)) + 1.0
    b = jax.random.normal(jax.random.key(2), (16,))
    got = layer_norm(x, g, b, 1e-5)
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    expect = (x - mean) / jnp.sqrt(var + 1e-5) * g + b
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=1e-5, atol=1e-5)


def test_patch_embed_matches_explicit_gather():
    img = jax.random.normal(jax.random.key(0), (1, 3, 8, 8))
    w = jax.random.normal(jax.random.key(1), (4 * 4 * 3, 5))
    out = patch_embed(img, w, None, 4)
    assert out.shape == (1, 4, 5)
    # First patch: img[:, :, :4, :4] flattened as (p1 p2 c).
    patch = np.transpose(np.asarray(img[0, :, :4, :4]), (1, 2, 0)).reshape(-1)
    np.testing.assert_allclose(np.asarray(out[0, 0]), patch @ np.asarray(w), rtol=1e-5)


def test_bf16_compute():
    cfg = _tiny_cfg().replace(dtype=jnp.bfloat16)
    model = ViT(cfg)
    x = jnp.ones((1, 3, 32, 32))
    params = model.init(jax.random.key(0), x)
    y = model.apply(params, x)
    assert y.dtype == jnp.bfloat16
    assert jnp.isfinite(y.astype(jnp.float32)).all()


def test_dropout_train_mode():
    """train=True + dropout_rate produces stochastic outputs; eval is
    deterministic and matches rate-0."""
    cfg = _tiny_cfg().replace(dropout_rate=0.5)
    model = ViT(cfg)
    x = jnp.ones((2, 3, 32, 32))
    params = model.init(jax.random.key(0), x)
    # eval mode: deterministic, equals the rate-0 model
    y1 = model.apply(params, x)
    y2 = model.apply(params, x)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    ref = ViT(_tiny_cfg()).apply(params, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(ref), rtol=1e-6)
    # train mode: differs across rng draws
    t1 = model.apply(params, x, train=True, rngs={"dropout": jax.random.key(1)})
    t2 = model.apply(params, x, train=True, rngs={"dropout": jax.random.key(2)})
    assert np.abs(np.asarray(t1) - np.asarray(t2)).max() > 0
