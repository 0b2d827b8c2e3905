"""ctypes binding for the C++ connected-components kernel (cc.cpp).

Compiled on first use with g++ -O3 into a cached shared library next to the
source (or $SD_TPU_NATIVE_DIR). If no compiler is available the caller falls
back to scipy (see ops/connected.py) — the framework never hard-requires the
native path.
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
        src = Path(__file__).parent / "cc.cpp"
        so = _build_dir() / "_sd_cc.so"
        try:
            if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-o", str(so), str(src)],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(str(so))
            lib.sd_cc_label.restype = ctypes.c_int32
            lib.sd_cc_label.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int32,
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def label(img_u8: np.ndarray) -> tuple[np.ndarray, int]:
    """(H, W) uint8 0/1 -> (labels int32, num). Raises if unavailable."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native cc unavailable")
    h, w = img_u8.shape
    img_u8 = np.ascontiguousarray(img_u8, dtype=np.uint8)
    labels = np.empty((h, w), dtype=np.int32)
    max_comp = max(256, h * w // 4 + 1)
    stats = np.empty((max_comp, 5), dtype=np.int32)
    num = lib.sd_cc_label(
        img_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w,
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        stats.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        max_comp)
    if num < 0:
        raise RuntimeError("component count exceeded buffer")
    return labels, int(num)


def label_with_stats(img_u8: np.ndarray):
    """Returns (labels, num, stats[num, 5]) with cv2-style stats rows
    [left, top, width, height, area]."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native cc unavailable")
    h, w = img_u8.shape
    img_u8 = np.ascontiguousarray(img_u8, dtype=np.uint8)
    labels = np.empty((h, w), dtype=np.int32)
    max_comp = max(256, h * w // 4 + 1)
    stats = np.empty((max_comp, 5), dtype=np.int32)
    num = lib.sd_cc_label(
        img_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w,
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        stats.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        max_comp)
    if num < 0:
        raise RuntimeError("component count exceeded buffer")
    return labels, int(num), stats[:num].copy()
