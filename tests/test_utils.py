"""Tests for eval pipeline pieces and checkpointing."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edgevisiontransformer_tpu.utils.checkpoint import (
    load_checkpoint,
    load_meta,
    save_checkpoint,
)
from edgevisiontransformer_tpu.utils.imagenet import (
    evaluate,
    has_accuracy_marker,
    iterate_batches,
    list_image_folder,
    preprocess_image,
    write_accuracy_marker,
)


@pytest.fixture
def image_folder(tmp_path):
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    rng = np.random.RandomState(0)
    for cls in ["class_a", "class_b"]:
        d = tmp_path / "val" / cls
        d.mkdir(parents=True)
        for i in range(3):
            arr = rng.randint(0, 255, (40, 48, 3), np.uint8)
            Image.fromarray(arr).save(d / f"img_{i}.jpg")
    return str(tmp_path / "val")


def test_preprocess_shapes_and_range():
    from PIL import Image

    img = Image.fromarray(np.full((100, 80, 3), 128, np.uint8))
    out = preprocess_image(img, resize=32, crop=16)
    assert out.shape == (3, 16, 16)
    # 128/255 normalized with imagenet stats ~ small values
    assert np.all(np.abs(out) < 3.0)


def test_list_image_folder_sorted_classes(image_folder):
    samples, classes = list_image_folder(image_folder)
    assert classes == ["class_a", "class_b"]
    assert len(samples) == 6
    labels = sorted({l for _, l in samples})
    assert labels == [0, 1]


def test_iterate_batches_tail(image_folder):
    samples, _ = list_image_folder(image_folder)
    batches = list(iterate_batches(samples, 4, resize=32, crop=16))
    assert batches[0][0].shape == (4, 3, 16, 16)
    assert batches[1][0].shape == (2, 3, 16, 16)


def test_evaluate_with_constant_model(image_folder):
    # Model that always predicts class 0 -> accuracy = share of class_a.
    def apply_fn(params, x):
        b = x.shape[0]
        logits = jnp.zeros((b, 2)).at[:, 0].set(1.0)
        return logits

    acc = evaluate(apply_fn, {}, image_folder, batch_size=4, resize=32, crop=16)
    assert acc == pytest.approx(0.5)


def test_accuracy_marker_roundtrip(tmp_path):
    d = str(tmp_path / "model_dir")
    assert has_accuracy_marker(d) is None
    p = write_accuracy_marker(d, 0.7217)
    assert os.path.basename(p) == "accuracy7217.txt"
    assert has_accuracy_marker(d) == pytest.approx(0.7217)


def test_checkpoint_roundtrip(tmp_path):
    tree = {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 3))}}
    path = str(tmp_path / "ckpt" / "step_1")
    save_checkpoint(path, tree, meta={"model": "deit_tiny", "acc": 0.72})
    restored = load_checkpoint(path, jax.tree.map(np.zeros_like, tree))
    np.testing.assert_array_equal(np.asarray(restored["a"]), np.arange(4.0))
    assert load_meta(path)["model"] == "deit_tiny"
