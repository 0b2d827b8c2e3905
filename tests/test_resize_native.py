"""Native C++ resize kernel (native/resize.cpp) parity.

The kernel must be BIT-IDENTICAL to the numpy host path — goldens and the
binarize contract depend on the exact uint8 rounding. The numpy reference
here is computed inline (not via resize_bilinear_np, which dispatches to
the native kernel itself when available)."""

import numpy as np
import pytest

from stroke_derenderer_tpu.native import resize_native
from stroke_derenderer_tpu.ops import resize as R


def _numpy_resize_u8(img: np.ndarray, dh: int, dw: int) -> np.ndarray:
    h, w = img.shape[0], img.shape[1]
    y0, y1, fy = R._interp_coords(h, dh)
    x0, x1, fx = R._interp_coords(w, dw)
    x = img.astype(np.float32)
    squeeze = x.ndim == 2
    if squeeze:
        x = x[:, :, None]
    top = x[y0]
    d = x[y1]
    np.subtract(d, top, out=d)
    np.multiply(d, fy[:, None, None], out=d)
    np.add(top, d, out=top)
    left = top[:, x0]
    d = top[:, x1]
    np.subtract(d, left, out=d)
    np.multiply(d, fx[None, :, None], out=d)
    np.add(left, d, out=left)
    out = left[:, :, 0] if squeeze else left
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


needs_native = pytest.mark.skipif(not resize_native.available(),
                                  reason="no C++ toolchain")


@needs_native
@pytest.mark.parametrize("seed", range(40))
def test_native_matches_numpy_bitwise(seed):
    rng = np.random.default_rng(seed)
    h = int(rng.integers(2, 300))
    w = int(rng.integers(2, 2000))
    dh = int(rng.integers(1, 260))
    dw = int(rng.integers(1, 1400))
    c = int(rng.choice([1, 3]))
    img = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    if seed % 2:
        img = img[:, :, 0]
    np.testing.assert_array_equal(resize_native.resize_u8(img, dh, dw),
                                  _numpy_resize_u8(img, dh, dw))


@needs_native
def test_dispatch_uses_native_and_matches():
    """resize_bilinear_np on uint8 routes through the kernel and equals the
    pure-numpy computation; upscale + downscale + identity cases."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(57, 311, 3), dtype=np.uint8)
    for dh, dw in [(128, 700), (20, 100), (57, 311), (1, 1), (400, 2000)]:
        np.testing.assert_array_equal(R.resize_bilinear_np(img, dh, dw),
                                      _numpy_resize_u8(img, dh, dw))


@needs_native
def test_float_input_still_numpy():
    """Non-uint8 inputs keep the float numpy path (no rounding)."""
    rng = np.random.default_rng(3)
    img = rng.random((40, 80)).astype(np.float32)
    out = R.resize_bilinear_np(img, 20, 40)
    assert out.dtype == np.float32
