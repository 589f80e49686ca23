"""Native C++ preprocessing vs PIL oracle."""

import numpy as np
import pytest

from edgevisiontransformer_tpu.utils import native_preprocess as npre
from edgevisiontransformer_tpu.utils.imagenet import preprocess_image


@pytest.fixture(scope="module")
def lib_available():
    if not npre.available():
        pytest.skip("g++ / native lib unavailable")


def test_resize_matches_pil(lib_available):
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (75, 93, 3), np.uint8)
    ours = npre.resize_bicubic_native(img, 32, 40)
    ref = np.asarray(
        Image.fromarray(img).resize((40, 32), Image.BICUBIC), np.float32
    )
    # PIL rounds to uint8; compare after rounding/clamping
    ours_u8 = np.clip(np.round(ours), 0, 255)
    diff = np.abs(ours_u8 - ref)
    assert np.mean(diff) < 0.5, np.mean(diff)
    assert np.percentile(diff, 99) <= 2.0


def test_preprocess_matches_python_pipeline(lib_available):
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (300, 260, 3), np.uint8)
    ref = preprocess_image(Image.fromarray(img), resize=64, crop=48,
                           native=False)
    got = npre.preprocess_native(img, resize=64, crop=48)
    assert got.shape == ref.shape == (3, 48, 48)
    # both normalize by /std (~0.225): 2/255 pixel tolerance -> ~0.04
    diff = np.abs(got - ref)
    assert np.mean(diff) < 0.02, np.mean(diff)
    assert np.percentile(diff, 99) < 0.06


def test_native_faster_than_pil_for_batches(lib_available):
    # Not a strict perf assertion (CI noise) — just exercise the path & report.
    import time

    from PIL import Image

    rng = np.random.RandomState(2)
    imgs = [rng.randint(0, 255, (512, 384, 3), np.uint8) for _ in range(8)]

    t0 = time.perf_counter()
    for im in imgs:
        npre.preprocess_native(im)
    t_native = time.perf_counter() - t0

    t0 = time.perf_counter()
    for im in imgs:
        preprocess_image(Image.fromarray(im), native=False)
    t_pil = time.perf_counter() - t0
    print(f"native {t_native*1e3:.1f} ms vs PIL {t_pil*1e3:.1f} ms for 8 images")
    assert t_native > 0


def test_preprocess_image_auto_dispatches_native(lib_available):
    from PIL import Image

    rng = np.random.RandomState(3)
    img = rng.randint(0, 255, (120, 100, 3), np.uint8)
    auto = preprocess_image(Image.fromarray(img), resize=64, crop=48)
    forced = preprocess_image(Image.fromarray(img), resize=64, crop=48,
                              native=True)
    np.testing.assert_array_equal(auto, forced)


def test_threaded_loader_matches_sync(tmp_path):
    from PIL import Image

    from edgevisiontransformer_tpu.utils.imagenet import (
        iterate_batches, list_image_folder)

    rng = np.random.RandomState(4)
    for cls in ("a", "b"):
        d = tmp_path / cls
        d.mkdir()
        for i in range(5):
            Image.fromarray(
                rng.randint(0, 255, (40, 40, 3), np.uint8)
            ).save(d / f"{i}.png")
    samples, _ = list_image_folder(str(tmp_path))
    sync = list(iterate_batches(samples, 4, resize=32, crop=16, workers=0))
    thr = list(iterate_batches(samples, 4, resize=32, crop=16, workers=4))
    assert len(sync) == len(thr)
    for (xs, ys), (xt, yt) in zip(sync, thr):
        np.testing.assert_array_equal(xs, xt)
        np.testing.assert_array_equal(ys, yt)
    dropped = list(iterate_batches(samples, 4, resize=32, crop=16, workers=4,
                                   drop_remainder=True))
    assert len(dropped) == 2 and all(x.shape[0] == 4 for x, _ in dropped)
