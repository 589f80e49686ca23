"""Pipeline (pp) and sequence (sp) parallel encoder tests on the 8-device
virtual CPU mesh (conftest.py sets it up)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from edgevisiontransformer_tpu.models.vit import EncoderBlock, ViT, deit_config
from edgevisiontransformer_tpu.ops.pallas.fused_encoder import (
    stack_vit_layer_params,
)
from edgevisiontransformer_tpu.parallel.pipeline import (
    pipeline_encoder_apply,
    sequence_sharded_encoder_apply,
    vit_block_apply,
)


def _small_model(depth=4, heads=2, dim=32):
    cfg = deit_config("tiny").replace(
        image_size=32, patch_size=16, dim=dim, depth=depth, heads=heads,
        mlp_dim=2 * dim, num_classes=8,
    )
    model = ViT(cfg)
    x = jnp.ones((2, 3, 32, 32))
    params = model.init(jax.random.key(0), x)["params"]
    stacked = stack_vit_layer_params(params, depth, cfg.qkv_bias)
    return cfg, model, params, stacked


def _reference_encoder(cfg, params, h):
    for i in range(cfg.depth):
        h = EncoderBlock(cfg, i).apply({"params": params[f"block_{i}"]}, h)
    return h


def test_vit_block_apply_matches_module():
    cfg, model, params, stacked = _small_model()
    h = jax.random.normal(jax.random.key(1), (3, 16, cfg.dim))
    ref = EncoderBlock(cfg, 0).apply({"params": params["block_0"]}, h)
    pl = jax.tree.map(lambda a: a[0], stacked)
    got = vit_block_apply(pl, h, heads=cfg.heads, eps=cfg.layernorm_eps,
                          approx_gelu=cfg.gelu_approx,
                          reference_residual=cfg.reference_residual)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("pp,microbatches", [(2, 2), (4, 2), (2, 4)])
def test_pipeline_encoder_matches_sequential(pp, microbatches):
    cfg, model, params, stacked = _small_model(depth=4)
    devices = jax.devices()[:pp]
    mesh = Mesh(np.asarray(devices), ("pp",))
    h = jax.random.normal(jax.random.key(2), (4, 16, cfg.dim))
    ref = _reference_encoder(cfg, params, h)
    got = pipeline_encoder_apply(
        stacked, h, mesh, microbatches=microbatches, heads=cfg.heads,
        eps=cfg.layernorm_eps, approx_gelu=cfg.gelu_approx,
        reference_residual=cfg.reference_residual)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_shape_guards():
    cfg, model, params, stacked = _small_model(depth=4)
    mesh = Mesh(np.asarray(jax.devices()[:3]), ("pp",))
    h = jnp.ones((4, 16, cfg.dim))
    with pytest.raises(ValueError, match="not divisible by pp"):
        pipeline_encoder_apply(stacked, h, mesh, microbatches=2,
                               heads=cfg.heads)
    mesh2 = Mesh(np.asarray(jax.devices()[:2]), ("pp",))
    with pytest.raises(ValueError, match="not divisible by microbatches"):
        pipeline_encoder_apply(stacked, h, mesh2, microbatches=3,
                               heads=cfg.heads)


def test_pipeline_train_step_grads_match_single_device():
    """Grads THROUGH the GPipe forward == single-device autodiff (round-2
    review: pp was forward-only).  pp=4 stages, depth 8, 4 microbatches."""
    from edgevisiontransformer_tpu.parallel.pipeline import (
        make_pipeline_train_step,
    )

    cfg, model, params, stacked = _small_model(depth=8)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("pp",))
    b = 4
    h = jax.random.normal(jax.random.key(4), (b, 16, cfg.dim))
    head_w = jax.random.normal(jax.random.key(5), (cfg.dim, 8)) * 0.02
    labels = jnp.arange(b, dtype=jnp.int32) % 8
    lr = 1e-2

    step = make_pipeline_train_step(
        mesh, microbatches=4, heads=cfg.heads, eps=cfg.layernorm_eps,
        approx_gelu=cfg.gelu_approx,
        reference_residual=cfg.reference_residual, learning_rate=lr)
    new_stacked, new_head, loss = step(stacked, head_w, h, labels)

    def ref_loss(stk, hw):
        # sequential forward from the stacked layout (same math as pp path)
        hh = h
        for i in range(cfg.depth):
            pl = jax.tree.map(lambda a: a[i], stk)
            hh = vit_block_apply(pl, hh, heads=cfg.heads,
                                 eps=cfg.layernorm_eps,
                                 approx_gelu=cfg.gelu_approx,
                                 reference_residual=cfg.reference_residual)
        logits = hh.mean(axis=1) @ hw
        logp = jax.nn.log_softmax(logits.astype(jnp.float32))
        return -jnp.take_along_axis(logp, labels[:, None], axis=1).mean()

    ref_l, (ref_gs, ref_gh) = jax.value_and_grad(ref_loss, argnums=(0, 1))(
        stacked, head_w)
    np.testing.assert_allclose(float(loss), float(ref_l), rtol=1e-5)
    ref_new = jax.tree.map(lambda p, g: p - lr * g, stacked, ref_gs)
    for k in stacked:
        np.testing.assert_allclose(
            np.asarray(new_stacked[k]), np.asarray(ref_new[k]),
            rtol=2e-4, atol=2e-5, err_msg=k)
    np.testing.assert_allclose(np.asarray(new_head),
                               np.asarray(head_w - lr * ref_gh),
                               rtol=2e-4, atol=2e-5)


def test_sequence_sharded_encoder_matches_sequential():
    from edgevisiontransformer_tpu.parallel import make_mesh

    cfg, model, params, stacked = _small_model(depth=2, heads=2)
    mesh = make_mesh(dp=4, tp=2)
    h = jax.random.normal(jax.random.key(3), (4, 16, cfg.dim))
    ref = _reference_encoder(cfg, params, h)
    with mesh:
        got = jax.jit(lambda s, hh: sequence_sharded_encoder_apply(
            s, hh, mesh, heads=cfg.heads, eps=cfg.layernorm_eps,
            approx_gelu=cfg.gelu_approx,
            reference_residual=cfg.reference_residual))(stacked, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_sequence_sharded_encoder_grads_match():
    """Grads through the sp-constrained forward == unconstrained autodiff
    (sharding constraints are identity in the backward)."""
    from edgevisiontransformer_tpu.parallel import make_mesh

    cfg, model, params, stacked = _small_model(depth=2, heads=2)
    mesh = make_mesh(dp=4, tp=2)
    h = jax.random.normal(jax.random.key(6), (4, 16, cfg.dim))

    def loss_sp(stk):
        out = sequence_sharded_encoder_apply(
            stk, h, mesh, heads=cfg.heads, eps=cfg.layernorm_eps,
            approx_gelu=cfg.gelu_approx,
            reference_residual=cfg.reference_residual)
        return jnp.sum(out ** 2)

    def loss_ref(stk):
        from edgevisiontransformer_tpu.parallel.pipeline import (
            vit_block_apply,
        )
        hh = h
        for i in range(cfg.depth):
            pl = jax.tree.map(lambda a: a[i], stk)
            hh = vit_block_apply(pl, hh, heads=cfg.heads,
                                 eps=cfg.layernorm_eps,
                                 approx_gelu=cfg.gelu_approx,
                                 reference_residual=cfg.reference_residual)
        return jnp.sum(hh ** 2)

    with mesh:
        g_sp = jax.jit(jax.grad(loss_sp))(stacked)
    g_ref = jax.grad(loss_ref)(stacked)
    for k in stacked:
        np.testing.assert_allclose(np.asarray(g_sp[k]), np.asarray(g_ref[k]),
                                   rtol=5e-4, atol=5e-5, err_msg=k)
