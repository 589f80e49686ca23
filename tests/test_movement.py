"""Movement/topK structured sparsity tests (nn_pruning port)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edgevisiontransformer_tpu.models.vit import ViT, deit_config
from edgevisiontransformer_tpu.pruning.movement import (
    SparseConfig,
    apply_masks,
    compile_sparse_model,
    distillation_loss,
    expand_block_mask,
    format_layerwise_thresholds,
    init_mask_scores,
    parse_layerwise_thresholds,
    regularization_loss,
    schedule_thresholds,
    sparsity_report,
    threshold_mask,
    topk_mask,
    unzero_params,
)


def _cfg():
    return deit_config("tiny").replace(
        image_size=32, patch_size=16, dim=64, depth=2, heads=4, mlp_dim=128,
        num_classes=10, head_dim=16,
    )


def test_topk_mask_fraction():
    scores = jnp.arange(10.0)
    m = np.asarray(topk_mask(scores, 0.3))
    assert m.sum() == 3
    assert (m[-3:] == 1).all()


def test_topk_mask_ste_gradient():
    scores = jnp.arange(8.0)

    def f(s):
        return jnp.sum(topk_mask(s, 0.5) * jnp.arange(8.0))

    g = jax.grad(f)(scores)
    # STE: gradient = downstream grad, everywhere (not just kept entries)
    np.testing.assert_allclose(np.asarray(g), np.arange(8.0))


def test_threshold_mask_floor():
    # all scores low -> floor keeps at least 1 element
    scores = -10.0 + jnp.zeros((20,)).at[3].set(5.0)  # index 3 highest (-5)
    m = np.asarray(threshold_mask(scores, 0.9))
    assert m.sum() >= 1
    assert m[3] == 1


def test_expand_block_mask():
    m = jnp.array([[1.0, 0.0], [0.0, 1.0]])
    e = np.asarray(expand_block_mask(m, 4, 6))
    assert e.shape == (4, 6)
    assert (e[:2, :3] == 1).all() and (e[:2, 3:] == 0).all()


def test_layerwise_dsl_roundtrip():
    s = "h_0.5_d_0.3-h_0.4_d_0.2"
    pairs = parse_layerwise_thresholds(s, 2)
    assert pairs == [(0.5, 0.3), (0.4, 0.2)]
    assert format_layerwise_thresholds(pairs) == s
    with pytest.raises(ValueError):
        parse_layerwise_thresholds(s, 3)


def test_schedule_cubic_shape():
    cfg = _cfg()
    sp = SparseConfig(final_threshold=0.5, warmup_steps=10, initial_warmup=1,
                      final_warmup=1)
    thr0, r0 = schedule_thresholds(0, 100, cfg, sp)
    assert thr0[0] == (1.0, 1.0) and r0 == 0.0
    thr_end, r_end = schedule_thresholds(100, 100, cfg, sp)
    assert thr_end[0] == (0.5, 0.5) and r_end == 1.0
    thr_mid, _ = schedule_thresholds(50, 100, cfg, sp)
    assert 0.5 < thr_mid[0][0] < 1.0
    # monotone decreasing
    vals = [schedule_thresholds(s, 100, cfg, sp)[0][0][0] for s in range(0, 101, 10)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_apply_masks_threshold_one_is_identity():
    cfg = _cfg()
    model = ViT(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 3, 32, 32))
    params = model.init(jax.random.key(1), x)
    sp = SparseConfig()
    scores = init_mask_scores(cfg, sp, jax.random.key(2))
    thr = [(1.0, 1.0)] * cfg.depth
    masked = apply_masks(cfg, params, scores, thr, sp)
    ref = model.apply(params, x)
    got = model.apply(masked, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)


def test_apply_masks_half_threshold_zeroes_heads():
    cfg = _cfg()
    model = ViT(cfg)
    x = jax.random.normal(jax.random.key(0), (1, 3, 32, 32))
    params = model.init(jax.random.key(1), x)
    sp = SparseConfig()
    scores = init_mask_scores(cfg, sp, jax.random.key(2))
    thr = [(0.5, 0.5)] * cfg.depth
    masked = apply_masks(cfg, params, scores, thr, sp)
    p = masked["params"]["block_0"]["attn"]["qkv_kernel"]
    # half the head column-blocks must be exactly zero
    cols_zero = (np.asarray(p) == 0).all(axis=0)
    assert cols_zero.sum() == p.shape[1] // 2
    rep = sparsity_report(masked)
    assert rep["__overall__"] > 0.1


def test_mask_training_gradients_flow_to_scores():
    cfg = _cfg()
    model = ViT(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 3, 32, 32))
    params = model.init(jax.random.key(1), x)
    sp = SparseConfig()
    scores = init_mask_scores(cfg, sp, jax.random.key(2))
    thr = [(0.5, 0.5)] * cfg.depth

    def loss(scores):
        masked = apply_masks(cfg, params, scores, thr, sp)
        return jnp.sum(model.apply(masked, x) ** 2)

    g = jax.grad(loss)(scores)
    gq = np.asarray(g["block_0"]["q"])
    assert np.abs(gq).sum() > 0  # STE delivers nonzero score grads


def test_regularization_loss():
    cfg = _cfg()
    sp = SparseConfig(regularization="l1", regu_lambda_attention=2.0,
                      regu_lambda_dense=1.0)
    scores = init_mask_scores(cfg, sp, jax.random.key(0))
    val = regularization_loss(scores, sp, regu_mul=1.0)
    assert 0 < float(val) < 3.0  # sigmoid means ~0.5 -> ~lambda*0.5 each
    assert regularization_loss(scores, SparseConfig(), 1.0) == 0.0


def test_distillation_loss_zero_when_equal():
    logits = jax.random.normal(jax.random.key(0), (4, 10))
    ce = jnp.asarray(1.0)
    val = distillation_loss(logits, logits, ce, alpha=0.5, temperature=2.0)
    np.testing.assert_allclose(float(val), 0.5, atol=1e-5)


def test_compile_sparse_model_shrinks():
    cfg = _cfg()
    model = ViT(cfg)
    x = jax.random.normal(jax.random.key(0), (1, 3, 32, 32))
    params = model.init(jax.random.key(1), x)
    sp = SparseConfig(layerwise_thresholds="h_0.5_d_0.5-h_0.75_d_0.25")
    scores = init_mask_scores(cfg, sp, jax.random.key(2))

    new_cfg, new_params, report = compile_sparse_model(cfg, params, scores, sp)
    assert new_cfg.heads_per_layer == (2, 3)
    assert new_cfg.mlp_dim_per_layer[0] <= 64 and new_cfg.mlp_dim_per_layer[1] <= 32
    y = ViT(new_cfg).apply(new_params, x)
    assert y.shape == (1, 10)
    # compiled model must equal the masked model when mask == what survived
    # (heads kept are exactly those with top scores at the final threshold)
    assert report[0]["heads_kept"] == 2


def test_unzero_params():
    params = {"w": jnp.zeros((4, 4)).at[0, 0].set(1.0), "b": jnp.zeros((3,))}
    out = unzero_params(params, jax.random.key(0))
    assert (np.asarray(out["w"]) != 0).all()  # zeros re-seeded
    assert np.asarray(out["w"])[0, 0] == 1.0  # nonzeros untouched
    assert (np.asarray(out["b"]) == 0).all()  # 1-D left alone


def test_sparse_train_step_reduces_loss_and_moves_scores():
    import optax
    from edgevisiontransformer_tpu.pruning.movement import schedule_thresholds
    from edgevisiontransformer_tpu.pruning.sparse_train import make_sparse_train_step

    cfg = _cfg()
    model = ViT(cfg)
    x = jax.random.normal(jax.random.key(0), (4, 3, 32, 32))
    labels = jnp.arange(4) % 10
    params = model.init(jax.random.key(1), x)
    sp = SparseConfig(regularization="l1", regu_lambda_attention=0.1,
                      regu_lambda_dense=0.1, warmup_steps=2, final_threshold=0.5)
    scores = init_mask_scores(cfg, sp, jax.random.key(2))

    step = jax.jit(make_sparse_train_step(
        model.apply, cfg, sp, optax.adam(1e-3), optax.adam(1e-2)))
    opt_p = optax.adam(1e-3).init(params)
    opt_s = optax.adam(1e-2).init(scores)

    losses = []
    s0 = np.asarray(scores["block_0"]["fc1"]).copy()
    p, sc = params, scores
    for i in range(6):
        thr, regu_mul = schedule_thresholds(i, 6, cfg, sp)
        thr_arr = jnp.asarray(thr)
        p, sc, opt_p, opt_s, metrics = step(p, sc, opt_p, opt_s, x, labels,
                                            thr_arr, jnp.asarray(regu_mul))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert np.abs(np.asarray(sc["block_0"]["fc1"]) - s0).max() > 0  # scores learned


def test_sparse_train_step_compiles_once():
    """The jitted sparse step must NOT recompile across steps: thresholds and
    the regu multiplier are runtime arrays, not static values (the host-side
    schedule feeds them in — sparse_train.py module docstring contract; the
    reference's topK-every-step concern from SURVEY §7 is only viable if the
    step stays one executable)."""
    import optax
    from edgevisiontransformer_tpu.pruning.movement import schedule_thresholds
    from edgevisiontransformer_tpu.pruning.sparse_train import make_sparse_train_step

    cfg = _cfg()
    model = ViT(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 3, 32, 32))
    labels = jnp.arange(2) % 10
    params = model.init(jax.random.key(1), x)
    sp = SparseConfig(warmup_steps=2, final_threshold=0.5)
    scores = init_mask_scores(cfg, sp, jax.random.key(2))
    step = jax.jit(make_sparse_train_step(
        model.apply, cfg, sp, optax.adam(1e-3), optax.adam(1e-2)))
    opt_p = optax.adam(1e-3).init(params)
    opt_s = optax.adam(1e-2).init(scores)
    p, sc = params, scores
    for i in range(4):
        thr, regu_mul = schedule_thresholds(i, 4, cfg, sp)
        p, sc, opt_p, opt_s, _ = step(p, sc, opt_p, opt_s, x, labels,
                                      jnp.asarray(thr), jnp.asarray(regu_mul))
    assert step._cache_size() == 1, step._cache_size()


def test_sparse_train_with_teacher():
    import optax
    from edgevisiontransformer_tpu.pruning.sparse_train import make_sparse_train_step

    cfg = _cfg()
    model = ViT(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 3, 32, 32))
    labels = jnp.arange(2)
    params = model.init(jax.random.key(1), x)
    teacher_params = model.init(jax.random.key(5), x)
    sp = SparseConfig()
    scores = init_mask_scores(cfg, sp, jax.random.key(2))
    step = jax.jit(make_sparse_train_step(
        model.apply, cfg, sp, optax.sgd(1e-3), optax.sgd(1e-2),
        teacher_apply=lambda img: model.apply(teacher_params, img)))
    thr = jnp.ones((cfg.depth, 2))
    p, sc, op, os_, m = step(params, scores, optax.sgd(1e-3).init(params),
                             optax.sgd(1e-2).init(scores), x, labels, thr,
                             jnp.asarray(0.0))
    assert np.isfinite(float(m["loss"]))


def test_l0_gate_and_penalty():
    from edgevisiontransformer_tpu.pruning.movement import l0_gate, l0_penalty

    scores = jnp.array([-10.0, 0.0, 10.0])
    g = np.asarray(l0_gate(scores))
    assert g[0] == 0.0 and g[2] == 1.0 and 0.0 < g[1] < 1.0
    # stochastic draw differs but stays in [0,1]
    gs = np.asarray(l0_gate(scores, jax.random.key(0)))
    assert (gs >= 0).all() and (gs <= 1).all()
    # penalty decreases as scores go negative (sparser)
    assert float(l0_penalty(jnp.full((4,), -5.0))) < float(l0_penalty(jnp.zeros((4,))))
    # gradient flows (differentiable gate, no STE needed)
    grad = jax.grad(lambda s: jnp.sum(l0_gate(s)))(jnp.zeros((3,)))
    assert np.abs(np.asarray(grad)).sum() > 0


def test_l0_method_in_apply_masks():
    cfg = _cfg()
    model = ViT(cfg)
    x = jax.random.normal(jax.random.key(0), (1, 3, 32, 32))
    params = model.init(jax.random.key(1), x)
    sp = SparseConfig(method="l0", regularization="l0",
                      regu_lambda_attention=1.0, regu_lambda_dense=1.0)
    scores = init_mask_scores(cfg, sp, jax.random.key(2))
    masked = apply_masks(cfg, params, scores, [(0.5, 0.5)] * cfg.depth, sp)
    y = model.apply(masked, x)
    assert jnp.isfinite(y).all()
    assert float(regularization_loss(scores, sp, 1.0)) > 0


def test_generic_block_masks_32x32():
    """topk-hybrid 32x32 preset path: 2D block masks on all matrices."""
    cfg = _cfg()  # dim 64, heads 4, head_dim 16, mlp 128
    model = ViT(cfg)
    x = jax.random.normal(jax.random.key(0), (1, 3, 32, 32))
    params = model.init(jax.random.key(1), x)
    sp = SparseConfig(attn_block_rows=32, attn_block_cols=32,
                      dense_pruning="blocks", dense_block_rows=32,
                      dense_block_cols=32)
    scores = init_mask_scores(cfg, sp, jax.random.key(2))
    # q scores: out=64, in=64, blocks 32x32 -> [2, 2]
    assert scores["block_0"]["q"].shape == (2, 2)
    assert scores["block_0"]["fc1"].shape == (128 // 32, 64 // 32)
    masked = apply_masks(cfg, params, scores, [(0.5, 0.5)] * cfg.depth, sp)
    y = model.apply(masked, x)
    assert jnp.isfinite(y).all()
    # half the blocks must be zeroed in q's slice of the fused qkv kernel
    qk = np.asarray(masked["params"]["block_0"]["attn"]["qkv_kernel"][:, :64])
    zero_frac = (qk == 0).mean()
    assert 0.4 < zero_frac < 0.6

    # compile works with generic masks (head alive if any row-block nonzero)
    new_cfg, new_params, report = compile_sparse_model(cfg, params, scores, sp)
    assert new_cfg.heads_per_layer is not None


def test_unstructured_masks():
    cfg = _cfg()
    sp = SparseConfig(attn_block_rows=1, attn_block_cols=1,
                      dense_pruning="blocks", dense_block_rows=1,
                      dense_block_cols=1)
    scores = init_mask_scores(cfg, sp, jax.random.key(0))
    assert scores["block_0"]["q"].shape == (64, 64)  # elementwise
    assert scores["block_0"]["fc1"].shape == (128, 64)
