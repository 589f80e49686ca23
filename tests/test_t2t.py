"""T2T-ViT tests: unfold vs torch.nn.Unfold oracle, performer numerics, model shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edgevisiontransformer_tpu.models.t2t_vit import (
    T2TViT,
    TokenPerformer,
    sinusoid_encoding,
    t2t_vit_config,
)
from edgevisiontransformer_tpu.ops.unfold import unfold, unfold_output_size


@pytest.mark.parametrize("k,s,p", [(7, 4, 2), (3, 2, 1)])
def test_unfold_matches_torch(k, s, p):
    torch = pytest.importorskip("torch")
    x = np.random.RandomState(0).randn(2, 3, 16, 16).astype(np.float32)
    ours = np.asarray(unfold(jnp.asarray(x), k, s, p))
    ref = torch.nn.functional.unfold(
        torch.from_numpy(x), kernel_size=k, stride=s, padding=p
    ).numpy()  # [b, c*k*k, n]
    ref = np.transpose(ref, (0, 2, 1))
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


def test_unfold_tf_order():
    """tf order is (kh, kw, c) per patch — check against manual permute."""
    x = np.arange(2 * 2 * 4 * 4, dtype=np.float32).reshape(2, 2, 4, 4)
    t = np.asarray(unfold(jnp.asarray(x), 3, 2, 1, channel_order="torch"))
    f = np.asarray(unfold(jnp.asarray(x), 3, 2, 1, channel_order="tf"))
    b, n, ckk = t.shape
    perm = t.reshape(b, n, 2, 9).transpose(0, 1, 3, 2).reshape(b, n, ckk)
    np.testing.assert_array_equal(f, perm)


def test_unfold_output_size():
    assert unfold_output_size(224, 7, 4, 2) == 56
    assert unfold_output_size(56, 3, 2, 1) == 28
    assert unfold_output_size(28, 3, 2, 1) == 14


def test_sinusoid_encoding_values():
    t = sinusoid_encoding(4, 6)
    assert t.shape == (4, 6)
    np.testing.assert_allclose(t[0, 0::2], 0.0, atol=1e-8)  # sin(0)
    np.testing.assert_allclose(t[0, 1::2], 1.0, atol=1e-8)  # cos(0)
    np.testing.assert_allclose(t[2, 0], np.sin(2.0), rtol=1e-6)


def test_token_performer_forward():
    m = TokenPerformer(hidden_size=64)
    x = jax.random.normal(jax.random.key(0), (2, 10, 64))
    variables = m.init(jax.random.key(1), x)
    y = m.apply(variables, x)
    assert y.shape == (2, 10, 64)
    assert jnp.isfinite(y).all()


def test_token_performer_stability_large_inputs():
    """prm_exp must not overflow for large activations (fp32 exp guard)."""
    m = TokenPerformer(hidden_size=64)
    x = 30.0 * jax.random.normal(jax.random.key(0), (1, 8, 64))
    variables = m.init(jax.random.key(1), x)
    y = m.apply(variables, x)
    assert jnp.isfinite(y).all()


@pytest.mark.parametrize("variant,dim,depth", [(7, 256, 7), (14, 384, 14)])
def test_t2t_config_shapes(variant, dim, depth):
    cfg = t2t_vit_config(variant)
    assert cfg.dim == dim and cfg.depth == depth


def test_t2t_vit_forward_small():
    # Shrink image to keep CPU test fast: 64px -> t2t tokens 4x4.
    cfg = t2t_vit_config(7, image_size=64, depth=2, num_classes=10)
    model = T2TViT(cfg)
    x = jnp.ones((1, 3, 64, 64))
    variables = model.init(jax.random.key(0), x)
    y = model.apply(variables, x)
    assert y.shape == (1, 10)
    assert jnp.isfinite(y).all()
    # sinusoid pos table is a non-trainable constant
    assert "constants" in variables
