"""Native (C++) host-runtime components.

The compute path is JAX/XLA/Pallas on the TPU; the host runtime around it is
native where it is hot. Currently: the fused augmentation loop feeding the
training input pipeline (augment.cpp), compiled on first use with g++ and
bound through ctypes (no pybind11 in this environment). Every native entry
point has a numpy fallback — ``available()`` reports which path is live.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "augment.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_lib() -> Optional[str]:
    """Compile augment.cpp → shared lib in a cache dir; None on failure."""
    cache = os.environ.get(
        "VTTPU_NATIVE_CACHE",
        os.path.join(tempfile.gettempdir(), "vttpu_native"),
    )
    os.makedirs(cache, exist_ok=True)
    out = os.path.join(cache, "libvtaugment.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(_SRC):
        return out
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", out, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return out
    except (subprocess.SubprocessError, FileNotFoundError):
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        path = _build_lib()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
            lib.fused_augment.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p,
            ]
            lib.fused_augment.restype = None
            _LIB = lib
        except OSError:
            _LIB = None
        return _LIB


def available() -> bool:
    return _load() is not None


def fused_augment(images: np.ndarray, rng: np.random.RandomState,
                  pad: int = 4, flip_p: float = 0.5,
                  brightness: float = 63 / 255) -> Optional[np.ndarray]:
    """Fused crop+flip+brightness over a uint8 NHWC batch.

    Returns None when the native library is unavailable (callers fall back
    to the numpy pipeline). RNG draws match the numpy path's order so the
    two paths are seed-compatible: crop offsets, flips, factors.
    """
    lib = _load()
    if lib is None:
        return None  # before consuming any rng draws
    n, h, w, c = images.shape
    ys = rng.randint(0, 2 * pad + 1, n).astype(np.int32)
    xs = rng.randint(0, 2 * pad + 1, n).astype(np.int32)
    flips = (rng.rand(n) < flip_p).astype(np.uint8)
    factors = rng.uniform(1 - brightness, 1 + brightness, n).astype(np.float32)
    images = np.ascontiguousarray(images)
    out = np.empty_like(images)
    lib.fused_augment(
        images.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
        n, h, w, c, pad,
        ys.ctypes.data_as(ctypes.c_void_p),
        xs.ctypes.data_as(ctypes.c_void_p),
        flips.ctypes.data_as(ctypes.c_void_p),
        factors.ctypes.data_as(ctypes.c_void_p),
    )
    return out
