"""ctypes binding for the C++ bilinear resize kernel (resize.cpp).

Compiled on first use with g++ -O3 -ffp-contract=off (FMA contraction off:
the kernel must round every float32 step exactly like the numpy twin in
ops/resize.py so outputs stay BIT-IDENTICAL — goldens depend on it). Falls
back silently to the numpy path when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def _build_dir() -> Path:
    d = os.environ.get("SD_TPU_NATIVE_DIR")
    return Path(d) if d else Path(__file__).parent


def _load() -> ctypes.CDLL | None:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        src = Path(__file__).parent / "resize.cpp"
        so = _build_dir() / "_sd_resize.so"
        try:
            if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-ffp-contract=off",
                     "-shared", "-fPIC", "-o", str(so), str(src)],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(str(so))
            lib.sd_resize_u8.restype = ctypes.c_int32
            lib.sd_resize_u8.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32,
                ctypes.c_int32,
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def resize_u8(img: np.ndarray, dst_h: int, dst_w: int) -> np.ndarray:
    """(H, W[, C]) uint8 -> (dst_h, dst_w[, C]) uint8, cv2 bilinear
    semantics, bit-identical to ops/resize.resize_bilinear_np. Raises if
    the native library is unavailable."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native resize unavailable")
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]
    h, w, c = img.shape
    img = np.ascontiguousarray(img, dtype=np.uint8)
    out = np.empty((dst_h, dst_w, c), dtype=np.uint8)
    rc = lib.sd_resize_u8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), dst_h, dst_w)
    if rc != 0:
        raise RuntimeError(f"native resize failed ({rc})")
    return out[:, :, 0] if squeeze else out
