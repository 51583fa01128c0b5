"""ctypes bindings for the native host data-path library (native/).

Provides C++ implementations of PFM decode, half-pixel bilinear resize, u8
normalization and point-cloud voxel downsampling. Falls back transparently to
the numpy/cv2 paths when the library isn't built; `make -C native` (attempted
automatically once) produces libstereo_native.so.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native"
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libstereo_native.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO_PATH) and os.path.exists(os.path.join(_NATIVE_DIR, "Makefile")):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], capture_output=True, timeout=120)
        except Exception:
            pass
    if not os.path.exists(_SO_PATH):
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None

    i64 = ctypes.c_int64
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.pfm_read.argtypes = [ctypes.c_char_p, f32p, ctypes.POINTER(i64),
                             ctypes.POINTER(i64), ctypes.POINTER(i64)]
    lib.pfm_read.restype = ctypes.c_int
    lib.resize_bilinear_f32.argtypes = [f32p, i64, i64, i64, f32p, i64, i64]
    lib.resize_bilinear_f32.restype = None
    lib.u8_to_f32_scaled.argtypes = [ctypes.POINTER(ctypes.c_uint8), f32p, i64]
    lib.u8_to_f32_scaled.restype = None
    lib.voxel_downsample_f32.argtypes = [f32p, f32p, i64, ctypes.c_float,
                                         f32p, f32p, i64]
    lib.voxel_downsample_f32.restype = i64
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def pfm_read_native(path: str) -> Tuple[np.ndarray, float]:
    """Native PFM read; raises on failure (caller falls back)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    h = ctypes.c_int64()
    w = ctypes.c_int64()
    c = ctypes.c_int64()
    rc = lib.pfm_read(path.encode(), None, ctypes.byref(h), ctypes.byref(w),
                      ctypes.byref(c))
    if rc != 0:
        raise IOError(f"pfm_read header failed ({rc}) for {path}")
    shape = (h.value, w.value) if c.value == 1 else (h.value, w.value, 3)
    out = np.empty(shape, np.float32)
    rc = lib.pfm_read(path.encode(), _fptr(out), ctypes.byref(h),
                      ctypes.byref(w), ctypes.byref(c))
    if rc != 0:
        raise IOError(f"pfm_read failed ({rc}) for {path}")
    return out, 1.0


def resize_bilinear_native(img: np.ndarray, oh: int, ow: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    img = np.ascontiguousarray(img, np.float32)
    if img.ndim == 2:
        img = img[..., None]
    h, w, c = img.shape
    out = np.empty((oh, ow, c), np.float32)
    lib.resize_bilinear_f32(_fptr(img), h, w, c, _fptr(out), oh, ow)
    return out


def voxel_downsample_native(points: np.ndarray, voxel: float,
                            colors: Optional[np.ndarray] = None):
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    pts = np.ascontiguousarray(points, np.float32)
    n = len(pts)
    out_pts = np.empty((n, 3), np.float32)
    if colors is not None:
        cols = np.ascontiguousarray(colors, np.float32)
        out_cols = np.empty((n, 3), np.float32)
        m = lib.voxel_downsample_f32(_fptr(pts), _fptr(cols), n, voxel,
                                     _fptr(out_pts), _fptr(out_cols), n)
        return out_pts[:m].copy(), out_cols[:m].copy()
    m = lib.voxel_downsample_f32(_fptr(pts), None, n, voxel, _fptr(out_pts), None, n)
    return out_pts[:m].copy(), None
