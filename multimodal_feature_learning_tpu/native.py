"""ctypes bindings for the native C++ collate library (native/collate.cpp).

Builds lazily with g++ on first import if the .so is missing; every entry
point has a numpy fallback, so the framework runs identically without a
toolchain. Used by data.anet.nearest_resize for large batches.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libmflcollate.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("MFL_DISABLE_NATIVE"):
        return None
    try:
        if not os.path.exists(_SO_PATH):
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"], check=True,
                capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(_SO_PATH)
        i64 = ctypes.c_int64
        fp = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.resize_nearest_f32.argtypes = [fp, fp, i64, i64, i64, i64]
        lib.resize_nearest_u8.argtypes = [u8p, u8p, i64, i64, i64]
        lib.pad_resize_batch_f32.argtypes = [fp, i64p, fp, u8p, i64, i64, i64, i64]
        _lib = lib
    except (OSError, subprocess.SubprocessError):
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def resize_nearest(x: np.ndarray, t_out: int) -> np.ndarray:
    """Batched nearest temporal resize along axis 1 (float32 3-D or bool 2-D)."""
    lib = _load()
    if lib is None:
        idx = (np.arange(t_out) * x.shape[1]) // t_out
        return np.take(x, idx, axis=1)
    if x.ndim == 3 and x.dtype == np.float32:
        x = np.ascontiguousarray(x)
        out = np.empty((x.shape[0], t_out, x.shape[2]), dtype=np.float32)
        lib.resize_nearest_f32(x, out, x.shape[0], x.shape[1], t_out, x.shape[2])
        return out
    if x.ndim == 2 and x.dtype == np.bool_:
        xin = np.ascontiguousarray(x.view(np.uint8))
        out = np.empty((x.shape[0], t_out), dtype=np.uint8)
        lib.resize_nearest_u8(xin, out, x.shape[0], x.shape[1], t_out)
        return out.view(np.bool_)
    idx = (np.arange(t_out) * x.shape[1]) // t_out
    return np.take(x, idx, axis=1)


def pad_resize_batch(features: list, t_out: int):
    """Ragged feature list -> (resized (B, t_out, D) f32, pad mask (B, t_out) bool).
    Fuses the collate's pad-to-max + nearest-resize (anet_video.py:291-345)."""
    B = len(features)
    D = features[0].shape[1]
    lengths = np.array([f.shape[0] for f in features], dtype=np.int64)
    max_len = int(lengths.max())
    lib = _load()
    if lib is None:
        padded = np.zeros((B, max_len, D), dtype=np.float32)
        mask = np.ones((B, max_len), dtype=bool)
        for i, f in enumerate(features):
            padded[i, : f.shape[0]] = f
            mask[i, : f.shape[0]] = False
        return resize_nearest(padded, t_out), resize_nearest(mask, t_out)
    concat = np.ascontiguousarray(
        np.concatenate([f.astype(np.float32) for f in features], axis=0)
    )
    offsets = np.zeros(B + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    out = np.empty((B, t_out, D), dtype=np.float32)
    out_mask = np.empty((B, t_out), dtype=np.uint8)
    lib.pad_resize_batch_f32(concat, offsets, out, out_mask, B, max_len, t_out, D)
    return out, out_mask.view(np.bool_)
