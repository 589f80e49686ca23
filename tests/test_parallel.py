"""Multi-device sharding tests on the 8-virtual-CPU mesh (conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from edgevisiontransformer_tpu.models.vit import ViT, deit_config
from edgevisiontransformer_tpu.parallel import (
    cross_entropy,
    jit_sharded_train_step,
    make_eval_step,
    make_mesh,
    make_train_step,
    param_partition_spec,
    scaled_lr,
    shard_params,
)
from jax.sharding import PartitionSpec as P


def _small_model():
    cfg = deit_config("tiny").replace(
        image_size=32, patch_size=16, dim=64, depth=2, heads=2, mlp_dim=128,
        num_classes=16,
    )
    return ViT(cfg)


def test_mesh_shapes():
    mesh = make_mesh(dp=4, tp=2)
    assert mesh.shape == {"dp": 4, "tp": 2}
    with pytest.raises(ValueError):
        make_mesh(dp=3, tp=2)


def test_param_partition_rules():
    assert param_partition_spec("params/block_0/attn/qkv_kernel") == P(None, "tp")
    assert param_partition_spec("params/block_3/ffn/fc2_kernel") == P("tp", None)
    assert param_partition_spec("params/cls_token") == P()


def test_scaled_lr():
    # reference train_main.py:225-227
    assert scaled_lr(5e-4, 4, 128) == pytest.approx(5e-4 * 4 * 128 / 512)


@pytest.mark.parametrize("tp", [1, 2])
def test_sharded_train_step_runs_and_matches_single_device(tp):
    model = _small_model()
    x = jax.random.normal(jax.random.key(0), (8, 3, 32, 32))
    labels = jnp.arange(8) % 16
    params = model.init(jax.random.key(1), x)
    optimizer = optax.sgd(0.1)
    step = make_train_step(model.apply, optimizer)

    # Single-device reference.
    opt0 = optimizer.init(params)
    ref_params, _, ref_metrics = jax.jit(step)(params, opt0, x, labels)

    mesh = make_mesh(dp=8 // tp, tp=tp)
    with mesh:
        sp = shard_params(params, mesh)
        opt_state = optimizer.init(sp)
        jstep = jit_sharded_train_step(step, mesh, params)
        new_params, _, metrics = jstep(sp, opt_state, x, labels)
        jax.block_until_ready(new_params)

    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5
    )
    # Updated params must match the single-device result.
    ref_leaf = np.asarray(jax.tree.leaves(ref_params)[0])
    got_leaf = np.asarray(jax.tree.leaves(new_params)[0])
    np.testing.assert_allclose(got_leaf, ref_leaf, rtol=1e-4, atol=1e-5)


def test_grad_accum_equivalence():
    """grad_accum=2 must match a single big-batch step (linear loss avg)."""
    model = _small_model()
    x = jax.random.normal(jax.random.key(0), (8, 3, 32, 32))
    labels = jnp.arange(8) % 16
    params = model.init(jax.random.key(1), x)
    optimizer = optax.sgd(0.1)

    s1 = jax.jit(make_train_step(model.apply, optimizer, grad_accum=1))
    s2 = jax.jit(make_train_step(model.apply, optimizer, grad_accum=2))
    p1, _, m1 = s1(params, optimizer.init(params), x, labels)
    p2, _, m2 = s2(params, optimizer.init(params), x, labels)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(p1)[0]), np.asarray(jax.tree.leaves(p2)[0]),
        rtol=1e-4, atol=1e-6,
    )


def test_eval_step():
    model = _small_model()
    x = jax.random.normal(jax.random.key(0), (8, 3, 32, 32))
    params = model.init(jax.random.key(1), x)
    logits = model.apply(params, x)
    labels = jnp.argmax(logits, axis=-1)  # force all-correct
    ev = jax.jit(make_eval_step(model.apply))
    correct, total = ev(params, x, labels)
    assert int(correct) == 8 and int(total) == 8


def test_cross_entropy_matches_optax():
    logits = jax.random.normal(jax.random.key(0), (4, 10))
    labels = jnp.array([1, 2, 3, 4])
    ours = cross_entropy(logits, labels)
    theirs = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-6)


def test_dryrun_multichip_entry():
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_evaluate_sharded_matches_single(tmp_path):
    """dp-sharded eval == single-device eval on the same ImageFolder."""
    import pytest as _pytest

    _pytest.importorskip("PIL")
    from PIL import Image

    from edgevisiontransformer_tpu.utils.imagenet import evaluate, evaluate_sharded

    rng = np.random.RandomState(0)
    for cls in ["a", "b"]:
        d = tmp_path / "val" / cls
        d.mkdir(parents=True)
        for i in range(8):
            Image.fromarray(rng.randint(0, 255, (40, 40, 3), np.uint8)).save(
                d / f"{i}.jpg")

    model = _small_model()
    params = model.init(jax.random.key(0), jnp.ones((1, 3, 32, 32)))
    apply_fn = lambda p, x: model.apply(p, x)
    a1 = evaluate(apply_fn, params, str(tmp_path / "val"), batch_size=8,
                  resize=36, crop=32)
    mesh = make_mesh(dp=8, tp=1)
    a2 = evaluate_sharded(apply_fn, params, str(tmp_path / "val"), mesh,
                          batch_size=8, resize=36, crop=32)
    assert a1 == a2
