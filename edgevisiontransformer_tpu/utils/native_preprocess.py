"""ctypes bindings for the native preprocessing library (native/preprocess.cpp).

Compiled on demand with g++ (cached as native/libevtpre.so); falls back to
the pure-PIL path in utils/imagenet.py when a compiler is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libevtpre.so"))

_lib: Optional[ctypes.CDLL] = None
_lib_checked = False  # failure is cached too: no per-image g++ re-probe
_lib_lock = threading.Lock()


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "preprocess.cpp")
    if not os.path.exists(src):
        return False
    # write to a temp path and rename: concurrent loaders (threaded
    # iterate_batches workers) must never CDLL a half-written .so
    tmp = f"{_LIB_PATH}.build.{os.getpid()}"
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-funroll-loops", "-fPIC", "-shared",
             "-std=c++17", "-o", tmp, src],
            check=True, capture_output=True,
        )
        os.replace(tmp, _LIB_PATH)
        return True
    except (OSError, subprocess.CalledProcessError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def load_library() -> Optional[ctypes.CDLL]:
    global _lib, _lib_checked
    if _lib is not None or _lib_checked:
        return _lib
    with _lib_lock:
        if _lib is not None or _lib_checked:
            return _lib
        return _load_library_locked()


def _load_library_locked() -> Optional[ctypes.CDLL]:
    global _lib, _lib_checked
    _lib_checked = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.evt_preprocess.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        f32p, f32p, f32p,
    ]
    lib.evt_resize_bicubic.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        f32p, ctypes.c_int, ctypes.c_int,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return load_library() is not None


def preprocess_native(
    rgb: np.ndarray, resize: int = 256, crop: int = 224,
    mean=None, std=None,
) -> np.ndarray:
    """uint8 HWC image -> normalized float32 CHW (native hot loop)."""
    from .imagenet import IMAGENET_MEAN, IMAGENET_STD

    lib = load_library()
    if lib is None:
        raise RuntimeError("native preprocessing library unavailable")
    mean = np.ascontiguousarray(mean if mean is not None else IMAGENET_MEAN, np.float32)
    std = np.ascontiguousarray(std if std is not None else IMAGENET_STD, np.float32)
    rgb = np.ascontiguousarray(rgb, np.uint8)
    h, w, c = rgb.shape
    assert c == 3
    out = np.empty((3, crop, crop), np.float32)
    lib.evt_preprocess(
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, resize, crop,
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def resize_bicubic_native(rgb: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    lib = load_library()
    if lib is None:
        raise RuntimeError("native preprocessing library unavailable")
    rgb = np.ascontiguousarray(rgb, np.uint8)
    h, w, c = rgb.shape
    out = np.empty((out_h, out_w, c), np.float32)
    lib.evt_resize_bicubic(
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out_h, out_w,
    )
    return out
