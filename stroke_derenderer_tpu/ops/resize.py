"""Bilinear resize with OpenCV semantics, in jnp (device) and numpy (host).

The reference resizes with ``cv2.resize`` (INTER_LINEAR, half-pixel centers)
everywhere: height-normalization (common.py:85-93, split.py:127-135) and
glyph-crop fitting (partition.py:101-140). OpenCV's uint8 path runs 11-bit
fixed-point arithmetic, so a float reimplementation lands within +/-1 LSB of
cv2 (verified in tests/test_resize.py); that tolerance is immaterial to the
downstream neural nets.

Design notes (TPU): the resize is expressed as two dense matmuls
(out = Ry @ img @ Rx^T with sparse-ish row-interpolation matrices) rather
than gathers — for the small geometry here (<=384 px) the MXU eats the
matmuls and XLA fuses the surrounding arithmetic, whereas gather lowers to
slow dynamic-slice loops on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _interp_matrix(src: int, dst: int) -> np.ndarray:
    """(dst, src) row-interpolation matrix for half-pixel-center bilinear."""
    scale = src / dst
    x = (np.arange(dst, dtype=np.float64) + 0.5) * scale - 0.5
    x0 = np.floor(x).astype(np.int64)
    f = x - x0
    # OpenCV clamps: coordinates below 0 snap to texel 0 with weight 1.
    f = np.where(x0 < 0, 0.0, f)
    x0 = np.clip(x0, 0, src - 1)
    f = np.where(x0 >= src - 1, 0.0, f)
    x1 = np.clip(x0 + 1, 0, src - 1)
    m = np.zeros((dst, src), dtype=np.float32)
    rows = np.arange(dst)
    m[rows, x0] += (1.0 - f).astype(np.float32)
    m[rows, x1] += f.astype(np.float32)
    return m


@functools.lru_cache(maxsize=256)
def _interp_matrices(src_h: int, src_w: int, dst_h: int, dst_w: int):
    return _interp_matrix(src_h, dst_h), _interp_matrix(src_w, dst_w)


@functools.partial(jax.jit, static_argnames=("dst_h", "dst_w"))
def _resize_f32(img: jax.Array, dst_h: int, dst_w: int) -> jax.Array:
    h, w = img.shape[0], img.shape[1]
    ry, rx = _interp_matrices(h, w, dst_h, dst_w)
    ry = jnp.asarray(ry)
    rx = jnp.asarray(rx)
    x = img.astype(jnp.float32)
    squeeze = x.ndim == 2
    if squeeze:
        x = x[:, :, None]
    # (dst_h, src_h) @ (src_h, src_w, C) over the H axis, then W axis.
    x = jnp.einsum("ih,hwc->iwc", ry, x, preferred_element_type=jnp.float32)
    x = jnp.einsum("jw,iwc->ijc", rx, x, preferred_element_type=jnp.float32)
    if squeeze:
        x = x[:, :, 0]
    return x


def resize_bilinear(img: jax.Array, dst_h: int, dst_w: int) -> jax.Array:
    """cv2.resize(img, (dst_w, dst_h)) equivalent. Preserves uint8 dtype
    (round-to-nearest, clipped) and passes floats through in float32."""
    out = _resize_f32(img, dst_h, dst_w)
    if img.dtype == jnp.uint8:
        out = jnp.clip(jnp.rint(out), 0, 255).astype(jnp.uint8)
    return out


def resize_to_height(img: jax.Array, height: int) -> jax.Array:
    """Aspect-preserving resize to a target height; the width is truncated to
    int exactly like the reference (``int(w * ratio)``, common.py:85-93)."""
    h, w = img.shape[0], img.shape[1]
    width = int(w * (height / h))
    return resize_bilinear(img, height, width)


# ----------------------------- host (numpy) -----------------------------

@functools.lru_cache(maxsize=256)
def _interp_coords(src: int, dst: int):
    """Banded form of :func:`_interp_matrix`: per-output (i0, i1, frac) with
    the same OpenCV edge-clamp semantics. Each output texel reads exactly two
    inputs, so the host resize is a gather + lerp in O(dst) — the dense-matmul
    form is O(dst*src) and dominated the binarize stage's host time (23 ms per
    line image) before this."""
    scale = src / dst
    x = (np.arange(dst, dtype=np.float64) + 0.5) * scale - 0.5
    x0 = np.floor(x).astype(np.int64)
    f = x - x0
    f = np.where(x0 < 0, 0.0, f)
    x0 = np.clip(x0, 0, src - 1)
    f = np.where(x0 >= src - 1, 0.0, f)
    x1 = np.clip(x0 + 1, 0, src - 1)
    return x0, x1, f.astype(np.float32)


def resize_bilinear_np(img: np.ndarray, dst_h: int, dst_w: int) -> np.ndarray:
    """Host-side twin of :func:`resize_bilinear`. uint8 inputs take the
    native C++ kernel when available (native/resize.cpp — bit-identical
    float32 op order, ~10x the numpy gather+lerp and it releases the GIL so
    the two-stage pipeline's threads truly overlap); other dtypes and
    no-compiler hosts run the numpy separable gather + lerp with the
    identical interpolation weights as the device matmul form (same
    _interp coordinate math)."""
    if img.dtype == np.uint8:
        from stroke_derenderer_tpu.native import resize_native
        if resize_native.available():
            return resize_native.resize_u8(img, dst_h, dst_w)
    h, w = img.shape[0], img.shape[1]
    y0, y1, fy = _interp_coords(h, dst_h)
    x0, x1, fx = _interp_coords(w, dst_w)
    x = img.astype(np.float32)
    squeeze = x.ndim == 2
    if squeeze:
        x = x[:, :, None]
    # lerp as a + f*(b-a): one fewer multiply and temporary than
    # (1-f)*a + f*b; identical where f==0 (the clamped edges).
    top = x[y0]                                      # (dh, w, c)
    d = x[y1]
    np.subtract(d, top, out=d)
    np.multiply(d, fy[:, None, None], out=d)
    np.add(top, d, out=top)
    left = top[:, x0]                                # (dh, dw, c)
    d = top[:, x1]
    np.subtract(d, left, out=d)
    np.multiply(d, fx[None, :, None], out=d)
    np.add(left, d, out=left)
    x = left
    if squeeze:
        x = x[:, :, 0]
    if img.dtype == np.uint8:
        x = np.clip(np.rint(x), 0, 255).astype(np.uint8)
    return x


def resize_to_height_np(img: np.ndarray, height: int) -> np.ndarray:
    h, w = img.shape[0], img.shape[1]
    width = int(w * (height / h))
    return resize_bilinear_np(img, height, width)
