"""Island extraction / interval grouping parity vs the reference partition.py."""

import numpy as np
import pytest

from stroke_derenderer_tpu.ops import grouping
from stroke_derenderer_tpu.ops.connected import (
    connected_components, connected_components_with_boxes,
)

from tests.conftest import requires_reference

cv2 = pytest.importorskip("cv2")


def _random_blobs(rng, h=128, w=900, n=14):
    img = np.zeros((h, w), dtype=np.uint8)
    for _ in range(n):
        y, x = rng.integers(0, h - 20), rng.integers(0, w - 40)
        bh, bw = rng.integers(3, 20), rng.integers(3, 40)
        img[y:y + bh, x:x + bw] = 1
    return img


def test_cc_matches_cv2_components(rng):
    img = _random_blobs(rng)
    labels, num = connected_components(img)
    ref_num, ref_labels = cv2.connectedComponents(img, connectivity=8)
    assert num == ref_num - 1
    # Same partition of pixels (label ids may differ).
    for n in range(1, num + 1):
        mask = labels == n
        ref_ids = np.unique(ref_labels[mask])
        assert ref_ids.size == 1
    assert ((labels > 0) == (ref_labels > 0)).all()


def test_boxes_match_cv2_stats(rng):
    img = _random_blobs(rng)
    labels, boxes = connected_components_with_boxes(img)
    for n, (x, y, w, h) in enumerate(boxes, start=1):
        mask = (labels == n).astype(np.uint8)
        assert (x, y, w, h) == cv2.boundingRect(mask)


@requires_reference
@pytest.mark.parametrize("seed", range(6))
def test_islands_match_reference(seed):
    from derenderer.helper.partition import get_binarized_islands
    rng = np.random.default_rng(seed)
    img = _random_blobs(rng)
    ours = grouping.get_binarized_islands(img, margin=2)
    ref, _, _ = get_binarized_islands(img, margin=2)
    # Compare as position-keyed sets (label order may differ between
    # backends; the pipeline sorts by left position anyway).
    ours_d = {pos: crop for crop, pos in ours}
    ref_d = {pos: crop for crop, pos in ref}
    assert set(ours_d) == set(ref_d)
    for pos in ours_d:
        assert np.array_equal(ours_d[pos], ref_d[pos])


@requires_reference
@pytest.mark.parametrize("seed", range(8))
def test_group_intervals_matches_reference(seed):
    from derenderer.helper.partition import group_intervals as ref_group
    rng = np.random.default_rng(seed)
    starts = np.sort(rng.integers(0, 800, 20))
    widths = rng.integers(1, 250, 20)
    intervals = [(int(a), int(a + w)) for a, w in zip(starts, widths)]
    ours = grouping.group_intervals(intervals, 128)
    ref = ref_group(intervals, 128)
    assert ours == ref


@requires_reference
@pytest.mark.parametrize("seed", range(6))
def test_group_islands_matches_reference(seed):
    from derenderer.helper import partition as ref
    rng = np.random.default_rng(seed)
    img = _random_blobs(rng)
    ours = grouping.group_islands(grouping.get_binarized_islands(img, 2), (128, 128))
    theirs = ref.group_islands(ref.get_binarized_islands(img, 2)[0], (128, 128))
    assert len(ours) == len(theirs)
    ours_d = {pos: c for c, pos in ours}
    ref_d = {pos: c for c, pos in theirs}
    assert set(ours_d) == set(ref_d)
    for pos in ours_d:
        assert np.array_equal(ours_d[pos], ref_d[pos])


@requires_reference
@pytest.mark.parametrize("seed", range(6))
def test_resize_and_pad_matches_reference(seed):
    from derenderer.helper.partition import resize_and_pad_image
    rng = np.random.default_rng(seed)
    h, w = rng.integers(5, 200), rng.integers(5, 200)
    img = rng.integers(0, 256, (int(h), int(w)), dtype=np.uint8)
    ours, ratio, (x_off, y_off) = grouping.resize_and_pad_np(img, (224, 224), margin=1)
    ref_img, ref_ratio, (ref_x2, ref_y2) = resize_and_pad_image(img, (224, 224), margin=1)
    assert ours.shape == ref_img.shape
    assert np.abs(ours.astype(int) - ref_img.astype(int)).max() <= 1
    assert ratio == pytest.approx(ref_ratio)
    # Reference returns (y_delta, x_delta) consumed as (x2, y2).
    assert (x_off, y_off) == (ref_x2, ref_y2)
