"""Host-side image IO (PNG in/out), RGB channel order.

Mirrors the reference's load/save contract (common.py:13-34: cv2 BGR->RGB on
load, grayscale loads gain a trailing channel axis) without depending on
OpenCV — PIL/imageio are the IO layer; decoding PNGs is not a kernel.
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def load_image(img_filepath: str, grayscale: bool = False) -> np.ndarray:
    img = Image.open(img_filepath).convert("RGB")
    arr = np.asarray(img, dtype=np.uint8)
    if grayscale:
        # Match cv2.cvtColor(BGR2GRAY) rounding: y = 0.299 R + 0.587 G + 0.114 B.
        y = (arr.astype(np.float32) @ np.array([0.299, 0.587, 0.114], np.float32))
        return np.clip(np.rint(y), 0, 255).astype(np.uint8)[:, :, None]
    return arr


def save_image(img: np.ndarray, save_filepath: str, grayscale: bool = False) -> None:
    arr = np.asarray(img)
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    mode = "L" if (grayscale or arr.ndim == 2) else "RGB"
    Image.fromarray(arr.astype(np.uint8), mode=mode).save(save_filepath)
