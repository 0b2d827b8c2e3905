"""Intensity normalization ops (jnp + numpy twins).

Covers the reference's ``cv2.normalize(..., NORM_MINMAX)`` rescale
(common.py:96-102) and the ImageNet mean/std 3-channel normalization used as
stroke-model input (evaluate_strokes.py:58-69).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def minmax_normalize(img: jax.Array, lo: float = 0.0, hi: float = 255.0) -> jax.Array:
    """Rescale to [lo, hi]; constant images map to lo (cv2 guards the zero
    range the same way). uint8 in -> uint8 out (rounded)."""
    x = img.astype(jnp.float32)
    mn, mx = jnp.min(x), jnp.max(x)
    scale = jnp.where(mx > mn, (hi - lo) / jnp.maximum(mx - mn, 1e-12), 0.0)
    out = (x - mn) * scale + lo
    if img.dtype == jnp.uint8:
        out = jnp.clip(jnp.rint(out), 0, 255).astype(jnp.uint8)
    return out


def minmax_normalize_np(img: np.ndarray, lo: float = 0.0, hi: float = 255.0) -> np.ndarray:
    x = img.astype(np.float32)
    mn, mx = x.min(), x.max()
    scale = ((hi - lo) / max(mx - mn, 1e-12)) if mx > mn else 0.0
    out = (x - mn) * scale + lo
    if img.dtype == np.uint8:
        out = np.clip(np.rint(out), 0, 255).astype(np.uint8)
    return out


def imagenet_normalize(img_u8: jax.Array, mean, std) -> jax.Array:
    """Single-channel (H, W) uint8 -> (H, W, 3) float32 model input:
    per-channel ``(x/255 - mean) / std`` (evaluate_strokes.py:58-69). NHWC
    (the reference emits CHW for its torch-exported ONNX; our models are
    NHWC, the natural TPU layout)."""
    x = img_u8.astype(jnp.float32) / 255.0
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (x[..., None] - mean) / std


def imagenet_normalize_np(img_u8: np.ndarray, mean, std) -> np.ndarray:
    x = img_u8.astype(np.float32) / 255.0
    return ((x[..., None] - np.asarray(mean, np.float32))
            / np.asarray(std, np.float32)).astype(np.float32)
