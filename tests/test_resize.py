"""Resize parity vs OpenCV (the reference's resize backend, common.py:85-93).

cv2's uint8 INTER_LINEAR path runs 11-bit fixed-point arithmetic; our float
implementation must land within 1 LSB everywhere (SURVEY.md §7 hard parts).
"""

import numpy as np
import pytest

from stroke_derenderer_tpu.ops.resize import (
    resize_bilinear, resize_bilinear_np, resize_to_height_np,
)

cv2 = pytest.importorskip("cv2")


@pytest.mark.parametrize("shape", [(37, 91, 3), (128, 384, 3), (60, 17, 1), (45, 200)])
@pytest.mark.parametrize("dst", [(128, 384), (13, 224), (64, 64), (224, 224)])
def test_uint8_parity_vs_cv2(rng, shape, dst):
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    dh, dw = dst
    ours = resize_bilinear_np(img, dh, dw)
    ref = cv2.resize(img, (dw, dh))
    if ref.ndim == 2 and ours.ndim == 3:
        ours = ours[:, :, 0]
    if ours.ndim == 2 and ref.ndim == 3:
        ref = ref[:, :, 0]
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.8


def test_jnp_matches_np(rng):
    img = rng.integers(0, 256, (50, 77, 3), dtype=np.uint8)
    a = resize_bilinear_np(img, 128, 300)
    b = np.asarray(resize_bilinear(img, 128, 300))
    # Backends may differ by 1 LSB at exact .5 rounding ties (bilinear
    # midpoints hit k+0.5 whenever the two texels differ by an odd amount).
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1
    assert (a == b).mean() > 0.7


def test_float_passthrough(rng):
    img = rng.normal(size=(32, 48)).astype(np.float32)
    out = resize_bilinear_np(img, 64, 96)
    assert out.dtype == np.float32
    # Interpolation stays within the input range.
    assert out.min() >= img.min() - 1e-5 and out.max() <= img.max() + 1e-5


def test_resize_to_height_truncates_width(rng):
    # width = int(w * height/h) with truncation (reference common.py:91).
    img = rng.integers(0, 256, (37, 91, 3), dtype=np.uint8)
    out = resize_to_height_np(img, 128)
    assert out.shape == (128, int(91 * 128 / 37), 3)
    ref = cv2.resize(img, (int(91 * 128 / 37), 128))
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1
