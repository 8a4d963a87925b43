"""Native (C++) host-side runtime pieces, loaded via ctypes.

The compute path is JAX/XLA/Pallas on the TPU; host-side image prep is
the one hot loop that lives outside the device, and the reference
delegates it to OpenCV's C++ (SURVEY §2.9).  This package owns that
capability natively: ``letterbox.cpp`` implements the fixed-point
bicubic (cv2 INTER_CUBIC-compatible) letterbox with per-image
threading, built on demand with g++ into a shared library cached next
to the source.

``load()`` returns the ctypes library or None (missing compiler /
failed build) — callers fall back to cv2, so the package never hard-
depends on the native build.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

__all__ = ["load", "available", "letterbox_batch_native",
           "resize_cubic_native"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "letterbox.cpp")
_LIB = os.path.join(_DIR, "_letterbox.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
           _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load():
    """ctypes handle to the native library, building it on first use."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (os.path.exists(_SRC) and
                                        os.path.getmtime(_SRC)
                                        > os.path.getmtime(_LIB)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.letterbox_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int]
        lib.letterbox_u8_batch.argtypes = [
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.resize_cubic_u8_c.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def resize_cubic_native(img: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """INTER_CUBIC-compatible u8 resize (HWC or HW)."""
    lib = load()
    assert lib is not None, "native library unavailable"
    img = np.ascontiguousarray(img, np.uint8)
    c = 1 if img.ndim == 2 else img.shape[2]
    out = np.empty((dh, dw, c) if img.ndim == 3 else (dh, dw), np.uint8)
    lib.resize_cubic_u8_c(_u8p(img), img.shape[0], img.shape[1], c,
                          _u8p(out), dh, dw)
    return out


def letterbox_batch_native(imgs, size: int, pad_value: int = 128,
                           swap_rb: bool = True,
                           round_extents: bool = False,
                           nthreads: Optional[int] = None) -> np.ndarray:
    """Letterbox a list of u8 BGR HWC images -> [N, size, size, 3] RGB
    (when ``swap_rb``) uint8, threaded across images."""
    lib = load()
    assert lib is not None, "native library unavailable"
    imgs = [np.ascontiguousarray(im, np.uint8) for im in imgs]
    for im in imgs:
        # letterbox_u8 hard-assumes 3 interleaved channels; a grayscale
        # or RGBA array would read out of bounds in native code
        if im.ndim != 3 or im.shape[2] != 3:
            raise ValueError(
                f"letterbox_batch_native needs HWC 3-channel u8 images, "
                f"got shape {im.shape}")
    n = len(imgs)
    out = np.empty((n, size, size, 3), np.uint8)
    ptrs = (ctypes.POINTER(ctypes.c_uint8) * n)(*[_u8p(im) for im in imgs])
    shs = (ctypes.c_int * n)(*[im.shape[0] for im in imgs])
    sws = (ctypes.c_int * n)(*[im.shape[1] for im in imgs])
    if nthreads is None:
        nthreads = min(n, os.cpu_count() or 1)
    lib.letterbox_u8_batch(ptrs, shs, sws, n, _u8p(out), size,
                           pad_value, 1 if swap_rb else 0,
                           1 if round_extents else 0, nthreads)
    return out
