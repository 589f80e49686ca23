#!/usr/bin/env python
"""Host-side data-pipeline throughput: JPEG decode + preprocess img/s.

The reference's eval/training throughput rides torchvision DataLoader
workers (/root/reference/deit_pruning/src/train_main.py dataloaders,
utils.py:593-615 transforms); our analogue is utils/imagenet.iterate_batches
(worker threads + batch prefetch) with the resize/crop/normalize hot loop in
native C++ (native/preprocess.cpp).  End-to-end eval throughput THROUGH THE
TPU is not reportable honestly on this tunneled runtime (host->device rides
a ~40 MB/s tunnel — it would measure the tunnel, not the framework), so this
benchmarks the host half on a synthetic ImageFolder and records:

  - python-PIL fallback, workers=0 (the baseline a pure-Python port gets)
  - native hot loop, workers=0 (the C++ kernel's single-thread win)
  - native, workers=8 (the shipping pipeline)

Appends {"data_pipeline": {...}} to the sweep jsonl.

Run (idle host — CPU-bound): PYTHONPATH=/root/repo \
    python tools/data_pipeline_bench.py [bench_sweep_r3.jsonl]
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def make_synthetic_imagefolder(root: str, n: int = 512, classes: int = 8):
    """n JPEGs of ImageNet-val-like sizes across `classes` class dirs."""
    from PIL import Image

    rng = np.random.RandomState(0)
    sizes = [(500, 375), (640, 480), (375, 500), (500, 333)]
    paths = []
    for i in range(n):
        cls = os.path.join(root, f"class_{i % classes}")
        os.makedirs(cls, exist_ok=True)
        w, h = sizes[i % len(sizes)]
        img = Image.fromarray(rng.randint(0, 256, (h, w, 3), np.uint8))
        p = os.path.join(cls, f"img_{i}.jpg")
        img.save(p, quality=85)
        paths.append(p)
    return paths


def bench_variant(samples, *, workers: int, native: bool, batch: int = 64):
    from edgevisiontransformer_tpu.utils import imagenet
    from edgevisiontransformer_tpu.utils import native_preprocess as npre

    if native and not npre.available():
        return {"error": "native library unavailable"}
    # route preprocess_image's auto-detect: force the python path by
    # patching available() (the documented fallback switch)
    orig = npre.available
    npre.available = (lambda: False) if not native else orig
    try:
        n = 0
        t0 = time.perf_counter()
        for x, y in imagenet.iterate_batches(samples, batch, workers=workers):
            n += x.shape[0]
        dt = time.perf_counter() - t0
    finally:
        npre.available = orig
    return {"img_per_s": round(n / dt, 1), "n": n, "wall_s": round(dt, 2)}


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    from edgevisiontransformer_tpu.utils.imagenet import list_image_folder

    with tempfile.TemporaryDirectory() as root:
        make_synthetic_imagefolder(root, n=512)
        samples, _ = list_image_folder(root)
        # warm OS page cache + native .so build
        bench_variant(samples[:64], workers=0, native=True)
        res = {
            "python_w0": bench_variant(samples, workers=0, native=False),
            "native_w0": bench_variant(samples, workers=0, native=True),
            "native_w8": bench_variant(samples, workers=8, native=True),
            "batch": 64, "images": len(samples),
            # threading headroom is bounded by host cores: on a 1-core
            # host w8 ~= w0 (thread overhead only) — record it so the
            # w8 row is interpretable
            "host_cpus": os.cpu_count(),
        }
    print(json.dumps({"data_pipeline": res}, indent=2))
    if out_path:
        with open(out_path, "a") as fh:
            fh.write(json.dumps({"data_pipeline": res}) + "\n")


if __name__ == "__main__":
    main()
