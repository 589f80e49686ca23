"""End-to-end driver tests: iterative head pruning, finetune loop, sparse
finetune from presets (tiny shapes, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from edgevisiontransformer_tpu.models.vit import ViT, deit_config
from edgevisiontransformer_tpu.pruning.iterative import (
    IterativePruneConfig,
    iterative_head_prune,
)
from edgevisiontransformer_tpu.pruning.sparse_driver import (
    run_sparse_finetune,
    sparse_config_from_preset,
)
from edgevisiontransformer_tpu.utils.finetune import FinetuneConfig, finetune


def _cfg():
    return deit_config("tiny").replace(
        image_size=32, patch_size=16, dim=64, depth=2, heads=4, mlp_dim=128,
        num_classes=10, head_dim=16,
    )


def _batches(n=2, b=4):
    rng = np.random.RandomState(0)

    def gen():
        for _ in range(n):
            yield (rng.randn(b, 3, 32, 32).astype(np.float32),
                   rng.randint(0, 10, (b,)))

    return gen


def test_finetune_runs_and_bounds_steps():
    cfg = _cfg()
    model = ViT(cfg)
    params = model.init(jax.random.key(0), jnp.ones((1, 3, 32, 32)))
    logs = []
    out = finetune(model.apply, params, _batches(5),
                   FinetuneConfig(lr=1e-3, max_steps=3, epochs=10, log_every=1),
                   log=logs.append)
    assert any("step 3" in l for l in logs)
    assert not any("step 4" in l for l in logs)
    # params changed
    l0 = np.asarray(jax.tree.leaves(params)[0])
    l1 = np.asarray(jax.tree.leaves(out)[0])
    assert np.abs(l1 - l0).max() > 0


def test_iterative_head_prune_structural(tmp_path):
    cfg = _cfg()
    model = ViT(cfg)
    params = model.init(jax.random.key(0), jnp.ones((1, 3, 32, 32)))

    def batches():
        yield np.random.RandomState(0).randn(2, 3, 32, 32).astype(np.float32)

    pc = IterativePruneConfig(
        prune_percents=[12.5, 25.0], at_least_x_heads_per_layer=1,
        output_dir=str(tmp_path), model_tag="t",
    )
    evals = []

    def eval_fn(c, p):
        y = ViT(c).apply(p, jnp.ones((1, 3, 32, 32)))
        evals.append(c.heads_per_layer)
        return float(jnp.mean(y))

    results = list(iterative_head_prune(
        cfg, params, pc, importance_batches=batches, eval_fn=eval_fn,
        save=True,
    ))
    assert len(results) == 2
    # 8 heads total; 12.5% -> 1 pruned, 25% -> 2 total
    assert results[0].n_pruned_total == 1
    assert results[1].n_pruned_total == 2
    assert sum(results[1].cfg.heads_per_layer) == 6
    assert results[0].save_dir is not None
    assert results[0].accuracy is not None
    # accuracy marker idempotence: second run would reuse marker
    from edgevisiontransformer_tpu.utils.imagenet import has_accuracy_marker

    assert has_accuracy_marker(results[0].save_dir) is not None


def test_iterative_prune_masks_mode():
    cfg = _cfg()
    model = ViT(cfg)
    params = model.init(jax.random.key(0), jnp.ones((1, 3, 32, 32)))

    def batches():
        yield np.random.RandomState(0).randn(2, 3, 32, 32).astype(np.float32)

    pc = IterativePruneConfig(prune_percents=[25.0], actually_prune=False)
    (res,) = list(iterative_head_prune(cfg, params, pc, importance_batches=batches))
    assert res.cfg.heads_per_layer is None  # shapes unchanged in mask mode
    y = ViT(res.cfg).apply(res.params, jnp.ones((1, 3, 32, 32)))
    assert jnp.isfinite(y).all()


def test_sparse_preset_loading():
    sp = sparse_config_from_preset("topk-hybrid-struct-layerwise-tiny",
                                   layerwise_thresholds="h_0.5_d_0.5-h_0.5_d_0.5")
    assert sp.method == "topk"
    assert sp.attn_block_rows == 64
    assert sp.regularization == "l1"
    assert sp.regu_lambda_attention == 20
    assert sp.regu_lambda_dense == pytest.approx(5.0)
    sp2 = sparse_config_from_preset("sigmoied_threshold-hybrid")
    assert sp2.method == "sigmoied_threshold"
    assert sp2.final_threshold == 0.1


def test_run_sparse_finetune_end_to_end():
    cfg = _cfg()
    model = ViT(cfg)
    params = model.init(jax.random.key(0), jnp.ones((1, 3, 32, 32)))
    sp = sparse_config_from_preset(
        "topk-hybrid-struct-layerwise-tiny",
        warmup_steps=1,
        layerwise_thresholds="h_0.5_d_0.5-h_0.75_d_0.5",
    )
    logs = []
    result = run_sparse_finetune(
        model.apply, cfg, params, sp, _batches(6), total_steps=6,
        lr=1e-4, do_compile=True, final_finetune_steps=2, log=logs.append,
    )
    assert result.compiled_cfg.heads_per_layer == (2, 3)
    assert result.compiled_cfg.mlp_dim_per_layer is not None
    y = ViT(result.compiled_cfg).apply(
        result.compiled_params, jnp.ones((1, 3, 32, 32)))
    assert jnp.isfinite(y).all()
    assert result.sparsity is not None


def test_finetune_checkpoint_resume(tmp_path):
    """Mid-training resume: kill after 2 steps, resume, reach same state as
    an uninterrupted run (same data order)."""
    from edgevisiontransformer_tpu.utils.finetune import FinetuneConfig, finetune

    cfg = _cfg()
    model = ViT(cfg)
    params = model.init(jax.random.key(0), jnp.ones((1, 3, 32, 32)))
    ckdir = str(tmp_path / "ck")

    # uninterrupted 4 steps
    full = finetune(model.apply, params, _batches(4),
                    FinetuneConfig(lr=1e-2, max_steps=4), log=lambda s: None)

    # run 2 steps with checkpointing, then "crash" and resume for 2 more
    fc = FinetuneConfig(lr=1e-2, max_steps=2, checkpoint_dir=ckdir,
                        checkpoint_every=1)
    finetune(model.apply, params, _batches(4), fc, log=lambda s: None)

    def tail_batches():
        gen = _batches(4)()
        next(gen), next(gen)  # resume consumed the first two in real life
        yield from gen

    fc2 = FinetuneConfig(lr=1e-2, max_steps=4, checkpoint_dir=ckdir,
                         checkpoint_every=10)
    resumed = finetune(model.apply, params, lambda: tail_batches(), fc2,
                       log=lambda s: None)

    a = np.asarray(jax.tree.leaves(full)[0])
    b = np.asarray(jax.tree.leaves(resumed)[0])
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_remat_grad_parity_and_param_tree():
    """cfg.remat wraps each block in jax.checkpoint: identical param tree,
    same gradients (rematerialized backward), so checkpoints/optimizers are
    interchangeable between the two."""
    cfg = _cfg()
    model = ViT(cfg)
    model_r = ViT(cfg.replace(remat=True))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 3, 32, 32), jnp.float32)
    params = model.init(jax.random.key(0), x)
    paths = [jax.tree_util.keystr(k) for k, _ in
             jax.tree_util.tree_flatten_with_path(
                 model_r.init(jax.random.key(0), x))[0]]
    paths0 = [jax.tree_util.keystr(k) for k, _ in
              jax.tree_util.tree_flatten_with_path(params)[0]]
    assert paths == paths0

    def loss(p, mod):
        return jnp.sum(mod.apply(p, x).astype(jnp.float32) ** 2)

    g0 = jax.grad(loss)(params, model)
    g1 = jax.grad(loss)(params, model_r)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_finetune_donate_matches_undonated():
    """FinetuneConfig.donate=True (in-place param/opt buffers) reaches the
    same weights as the default copy-through step."""
    cfg = _cfg()
    model = ViT(cfg)
    params = model.init(jax.random.key(0), jnp.ones((1, 3, 32, 32)))
    ref = finetune(model.apply, params, _batches(3),
                   FinetuneConfig(lr=1e-2, max_steps=3), log=lambda s: None)
    don = finetune(model.apply, jax.tree.map(jnp.copy, params), _batches(3),
                   FinetuneConfig(lr=1e-2, max_steps=3, donate=True),
                   log=lambda s: None)
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(don)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
