"""Connected-components backends agree with each other and scipy."""

import numpy as np
import pytest
from scipy import ndimage

from stroke_derenderer_tpu.native import cc_native
from stroke_derenderer_tpu.ops.connected import (
    bounding_boxes, connected_components, connected_components_jnp,
)


def _blobs(rng, h=64, w=200, n=10):
    img = np.zeros((h, w), dtype=np.uint8)
    for _ in range(n):
        y, x = rng.integers(0, h - 8), rng.integers(0, w - 8)
        img[y:y + rng.integers(2, 8), x:x + rng.integers(2, 8)] = 1
    return img


@pytest.mark.parametrize("seed", range(5))
def test_native_matches_scipy(seed):
    if not cc_native.available():
        pytest.skip("no native backend")
    rng = np.random.default_rng(seed)
    img = _blobs(rng)
    labels, num = cc_native.label(img)
    ref_labels, ref_num = ndimage.label(img, structure=np.ones((3, 3)))
    assert num == ref_num
    # scipy also labels in raster first-encounter order -> identical labels.
    assert np.array_equal(labels, ref_labels)


def test_native_stats(rng):
    if not cc_native.available():
        pytest.skip("no native backend")
    img = _blobs(rng)
    labels, num, stats = cc_native.label_with_stats(img)
    assert stats.shape == (num, 5)
    boxes = bounding_boxes(labels, num)
    np.testing.assert_array_equal(np.asarray(stats)[:, :4], boxes)
    for n in range(num):
        assert stats[n, 4] == (labels == n + 1).sum()


@pytest.mark.parametrize("seed", range(3))
def test_jnp_cc_matches_host(seed):
    rng = np.random.default_rng(seed)
    img = _blobs(rng, h=32, w=64, n=6)
    labels, num = connected_components(img)
    dev_labels, dev_num = connected_components_jnp(img)
    dev_labels, dev_num = np.asarray(dev_labels), int(dev_num)
    assert dev_num == num
    assert np.array_equal(dev_labels, labels)


def test_jnp_cc_spiral():
    """A spiral is the worst case for naive propagation; the serpentine
    sweep must still converge and agree with the host backend."""
    n = 31
    img = np.zeros((n, n), np.uint8)
    x0, x1, y0, y1 = 0, n - 1, 0, n - 1
    while x0 <= x1 and y0 <= y1:
        img[y0, x0:x1 + 1] = 1
        img[y0:y1 + 1, x1] = 1
        x0 += 2
        y0 += 2
        x1 -= 2
        y1 -= 2
    labels, num = connected_components(img)
    dev_labels, dev_num = connected_components_jnp(img)
    assert int(dev_num) == num
    assert np.array_equal(np.asarray(dev_labels), labels)


def test_diagonal_connectivity():
    img = np.zeros((4, 4), np.uint8)
    img[0, 0] = img[1, 1] = img[2, 2] = 1  # 8-connected diagonal
    labels, num = connected_components(img)
    assert num == 1
    dev_labels, dev_num = connected_components_jnp(img)
    assert int(dev_num) == 1
