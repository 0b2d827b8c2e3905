"""Explicit tests for the reference quirks PARITY.md promises to preserve.

Each test documents one quirk by constructing the minimal input that
exposes it (the randomized parity tests in test_grouping.py cover these
against the reference oracles; these pin the exact behaviors so a future
"fix" can't silently change outputs).
"""

import numpy as np
import pytest

from stroke_derenderer_tpu.ops import grouping
from stroke_derenderer_tpu.ops.strokes import clip_strokes, sort_strokes, tokens_to_strokes


def test_greedy_packing_measures_first_group_from_column_zero():
    """partition.py:289-313: ``left`` starts at 0, so an interval starting
    at column 200 with width 50 already "uses" 250 of the budget."""
    intervals = [(200, 250), (260, 300)]
    groups = grouping.group_intervals(intervals, 128)
    # Despite both intervals fitting in 128 together (span 100), the first
    # group is measured from column 0 (250 > 128) -> the initial empty
    # group is flushed and each interval lands via the restart logic.
    assert groups == [[0, 1]] or groups == [[0], [1]]
    # Pin the exact reference behavior: new_w = max(250-0, 0) > 128 flushes
    # the empty group, restarts at left=200; then max(300-200, 50) <= 128
    # packs both together.
    assert groups == [[0, 1]]


def test_containment_requires_wider_than_target():
    """Only intervals strictly wider than the target absorb others
    (partition.py:259-282)."""
    # 0: width 130 > 128 absorbs 1; 2 is outside.
    intervals = [(0, 130), (10, 50), (200, 240)]
    groups = grouping.group_intervals(intervals, 128)
    assert sorted(sorted(g) for g in groups) == [[0, 1], [2]]
    # Width exactly 128 does NOT absorb.
    intervals = [(0, 128), (10, 50)]
    groups = grouping.group_intervals(intervals, 128)
    assert all(len(g) <= 2 for g in groups)
    flat = sorted(x for g in groups for x in g)
    assert flat == [0, 1]
    # both fit in one greedy group here; the point is no containment pass
    assert [0, 1] in [sorted(g) for g in groups]


def test_containment_scan_breaks_at_first_noncontained_start():
    """The absorber's scan early-exits once an interval starts past its
    right edge (partition.py:272-274) — later contained intervals are
    unreachable by construction of the sort."""
    intervals = [(0, 200), (30, 60), (250, 260)]
    groups = grouping.group_intervals(intervals, 128)
    assert sorted(sorted(g) for g in groups) == [[0, 1], [2]]


def test_island_margin_asymmetry():
    """Bounding boxes expand by +margin on top/left but +margin+1 on
    bottom/right (partition.py:20-24)."""
    img = np.zeros((20, 20), np.uint8)
    img[8:11, 9:12] = 1  # y 8..10, x 9..11
    (crop, (top, left)), = grouping.get_binarized_islands(img, margin=2)
    assert (top, left) == (6, 7)
    # bottom/right: min(10+2+1+1, 20)=14 exclusive -> height 8, width 8
    assert crop.shape == (8, 8)


def test_clip_strokes_inclusive_bounds_and_axis_pairing():
    """clip keeps 0 <= X <= shape[0] and 0 <= Y <= shape[1] — inclusive,
    X paired with shape[0] (partition.py:230-233)."""
    strokes = [(np.array([0.0, 224.0, 224.5, -0.1]),
                np.array([224.0, 0.0, 10.0, 5.0]))]
    (x, y), = clip_strokes(strokes, (224, 224))
    assert x.tolist() == [0.0, 224.0]
    assert y.tolist() == [224.0, 0.0]


def test_sort_keys_truncate_toward_zero():
    """Endpoint sort keys cast float coords to int32 (truncation), so
    9.9 sorts before 9.0 never — they tie at 9 (partition.py:165-182)."""
    a = (np.array([9.9, 50.0]), np.array([0.0, 0.0]))
    b = (np.array([9.0, 60.0]), np.array([0.5, 0.0]))
    out = sort_strokes([a, b])
    # keys: a head (9, 0), b head (9, 0) -> exact tie, stable order: a first
    np.testing.assert_array_equal(out[0][0], a[0])


def test_odd_vertex_run_drops_last():
    """Odd-length vertex runs lose their final element
    (evaluate_strokes.py:129-131)."""
    toks = np.array([3 + 10, 3 + 224 + 20, 3 + 30, 2])  # x,y,x then EOS
    (x, y), = tokens_to_strokes(toks, 224)
    assert x.tolist() == [10] and y.tolist() == [20]


def test_bos_eos_both_flush():
    toks = np.array([3 + 1, 3 + 224 + 2, 1, 3 + 5, 3 + 224 + 6, 2, 3 + 9])
    strokes = tokens_to_strokes(toks, 224)
    assert len(strokes) == 2  # the post-EOS token is dead
    assert strokes[0][0].tolist() == [1]
    assert strokes[1][0].tolist() == [5]
