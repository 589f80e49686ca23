"""ImageNet-1k eval pipeline.

Port of the reference protocol (/root/reference/utils.py:593-663):
Resize(shorter side 256, bicubic) -> CenterCrop(224) -> ToTensor ->
Normalize(ImageNet mean/std), over an ImageFolder-layout directory, reporting
top-1 accuracy.  The reference fans out over onnxruntime/tflite/TF runtimes
(utils.py:666-828); here there is one runtime — a jit'd XLA forward — and
data parallelism is a dp-sharded batch instead of a multiprocessing Pool.

Also keeps the reference's idempotence convention: an empty marker file
``accuracy{int(acc*10000)}.txt`` written into the model directory
(evaluate_iterative_pruned_deit.py:44-46).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Callable, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".webp"}


def preprocess_image(
    img, resize: int = 256, crop: int = 224, native: Optional[bool] = None
) -> np.ndarray:
    """PIL image -> normalized CHW float32 (reference transform, utils.py:604-609).

    The hot loop (antialiased bicubic resize -> center crop -> normalize ->
    CHW) runs in the native C++ library (native/preprocess.cpp) when it is
    available — the analogue of torchvision's C-backed transforms — with the
    pure-PIL path as fallback.  ``native=None`` auto-detects."""
    from PIL import Image

    if img.mode != "RGB":
        img = img.convert("RGB")
    if native is None or native:
        from . import native_preprocess as npre

        if npre.available():
            return npre.preprocess_native(np.asarray(img, np.uint8),
                                          resize, crop)
        if native:
            raise RuntimeError("native preprocessing requested but unavailable")
    w, h = img.size
    if w < h:
        nw, nh = resize, int(round(h * resize / w))
    else:
        nw, nh = int(round(w * resize / h)), resize
    img = img.resize((nw, nh), Image.BICUBIC)
    left = (nw - crop) // 2
    top = (nh - crop) // 2
    img = img.crop((left, top, left + crop, top + crop))
    arr = np.asarray(img, np.float32) / 255.0
    arr = (arr - IMAGENET_MEAN) / IMAGENET_STD
    return arr.transpose(2, 0, 1)  # CHW


def list_image_folder(root: str) -> Tuple[List[Tuple[str, int]], List[str]]:
    """ImageFolder layout: root/<class>/<img>; classes sorted by name."""
    rootp = Path(root)
    classes = sorted(d.name for d in rootp.iterdir() if d.is_dir())
    samples = []
    for idx, cls in enumerate(classes):
        for f in sorted((rootp / cls).rglob("*")):
            if f.suffix.lower() in _EXTS:
                samples.append((str(f), idx))
    return samples, classes


def _load_one(path: str, resize: int, crop: int) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return preprocess_image(im, resize, crop)


def iterate_batches(
    samples: Sequence[Tuple[str, int]],
    batch_size: int,
    resize: int = 256,
    crop: int = 224,
    drop_remainder: bool = False,
    workers: int = 8,
    prefetch_batches: int = 2,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Batched loader with worker-thread decode+preprocess and batch
    prefetch — the reference DataLoader(num_workers, prefetch_factor)
    analogue (train_main.py dataloaders).  JPEG decode (PIL) and the native
    resize loop both release the GIL, so threads scale; ``workers=0`` falls
    back to fully synchronous iteration."""
    if workers <= 0:
        buf_x, buf_y = [], []
        for path, label in samples:
            buf_x.append(_load_one(path, resize, crop))
            buf_y.append(label)
            if len(buf_x) == batch_size:
                yield np.stack(buf_x), np.asarray(buf_y, np.int32)
                buf_x, buf_y = [], []
        if buf_x and not drop_remainder:
            yield np.stack(buf_x), np.asarray(buf_y, np.int32)
        return

    import concurrent.futures as cf
    from collections import deque

    batches = [samples[i:i + batch_size]
               for i in range(0, len(samples), batch_size)]
    if drop_remainder and batches and len(batches[-1]) < batch_size:
        batches.pop()

    with cf.ThreadPoolExecutor(max_workers=workers) as pool:
        def submit(batch):
            xs = [pool.submit(_load_one, path, resize, crop)
                  for path, _ in batch]
            ys = np.asarray([label for _, label in batch], np.int32)
            return xs, ys

        window: deque = deque()
        it = iter(batches)
        for _ in range(prefetch_batches + 1):
            nxt = next(it, None)
            if nxt is not None:
                window.append(submit(nxt))
        while window:
            xs, ys = window.popleft()
            nxt = next(it, None)
            if nxt is not None:
                window.append(submit(nxt))
            yield np.stack([f.result() for f in xs]), ys


def evaluate(
    apply_fn: Callable,
    params,
    data_dir: str,
    batch_size: int = 64,
    limit: Optional[int] = None,
    crop: int = 224,
    resize: int = 256,
    progress: bool = False,
) -> float:
    """Top-1 accuracy over an ImageFolder val set (utils.py:631-663 analogue)."""
    samples, _ = list_image_folder(data_dir)
    if limit:
        samples = samples[:limit]

    @jax.jit
    def step(params, x):
        return jnp.argmax(apply_fn(params, x), axis=-1)

    correct = total = 0
    for x, y in iterate_batches(samples, batch_size, resize, crop):
        if x.shape[0] != batch_size:  # pad the tail to keep shapes static
            pad = batch_size - x.shape[0]
            xp = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
            pred = np.asarray(step(params, jnp.asarray(xp)))[: x.shape[0]]
        else:
            pred = np.asarray(step(params, jnp.asarray(x)))
        correct += int((pred == y).sum())
        total += len(y)
        if progress and total % (batch_size * 50) == 0:
            print(f"eval {total}/{len(samples)}: top1={correct / total:.4f}")
    return correct / max(total, 1)


def evaluate_sharded(
    apply_fn: Callable,
    params,
    data_dir: str,
    mesh,
    batch_size: int = 64,
    limit: Optional[int] = None,
    crop: int = 224,
    resize: int = 256,
) -> float:
    """Data-parallel top-1 eval over a mesh: the batch is dp-sharded and the
    correct-count psum is inserted by XLA (replaces the reference's
    DistributedSampler + dist.reduce protocol, classifier_eval.py:37-106)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    samples, _ = list_image_folder(data_dir)
    if limit:
        samples = samples[:limit]
    batch_sharding = NamedSharding(mesh, P("dp"))

    @jax.jit
    def step(params, x):
        return jnp.argmax(apply_fn(params, x), axis=-1)

    correct = total = 0
    with mesh:
        for x, y in iterate_batches(samples, batch_size, resize, crop):
            if x.shape[0] != batch_size:
                pad = batch_size - x.shape[0]
                xp = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
            else:
                pad, xp = 0, x
            xs = jax.device_put(jnp.asarray(xp), batch_sharding)
            pred = np.asarray(step(params, xs))[: x.shape[0]]
            correct += int((pred == y).sum())
            total += len(y)
    return correct / max(total, 1)


def write_accuracy_marker(model_dir: str, acc: float) -> str:
    """Reference marker-file convention (evaluate_iterative_pruned_deit.py:44-46)."""
    os.makedirs(model_dir, exist_ok=True)
    path = os.path.join(model_dir, f"accuracy{int(acc * 10000)}.txt")
    Path(path).touch()
    return path


def has_accuracy_marker(model_dir: str) -> Optional[float]:
    """Idempotence guard: return recorded accuracy if present."""
    if not os.path.isdir(model_dir):
        return None
    for f in os.listdir(model_dir):
        if f.startswith("accuracy") and f.endswith(".txt"):
            try:
                return int(f[len("accuracy"):-len(".txt")]) / 10000.0
            except ValueError:
                continue
    return None
