"""DTW attribution metrics (VERDICT r4 item 3): optimal-assignment and
fragmentation-forgiving variants of stroke_dtw, used to split the headline
DTW deficit into matching / splitting / geometry shares."""

import numpy as np

from stroke_derenderer_tpu.eval.metrics import (
    stroke_dtw, stroke_dtw_assigned, stroke_dtw_split,
)


def _line(x0, y0, x1, y1, n=12):
    t = np.linspace(0.0, 1.0, n)
    return (x0 + (x1 - x0) * t, y0 + (y1 - y0) * t)


def test_perfect_prediction_all_variants_zero():
    tgt = [_line(0, 0, 50, 0), _line(0, 30, 50, 60)]
    for fn in (stroke_dtw, stroke_dtw_assigned, stroke_dtw_split):
        assert fn(tgt, tgt) < 1e-9


def test_empty_cases():
    for fn in (stroke_dtw, stroke_dtw_assigned, stroke_dtw_split):
        assert fn([], []) == 0.0
        assert fn([], [_line(0, 0, 10, 0)]) == float("inf")
        assert fn([_line(0, 0, 10, 0)], []) == float("inf")


def test_assigned_beats_greedy_on_mismatched_order():
    # Greedy (first-seen argmin) can pair pred0 with tgt1, stranding pred1;
    # the optimal assignment pairs (pred0, tgt0), (pred1, tgt1) exactly.
    tgt = [_line(0, 0, 100, 0), _line(0, 10, 100, 10)]
    pred = [_line(0, 5.5, 100, 5.5),  # between the two, nearer tgt1
            _line(0, 10, 100, 10)]    # exact copy of tgt1
    g = stroke_dtw(pred, tgt)
    a = stroke_dtw_assigned(pred, tgt)
    assert a <= g + 1e-12
    # Optimal: pred1<->tgt1 is exact; pred0<->tgt0 costs 5.5 px per step.
    assert a < g  # greedy pairs pred0->tgt1 (5.5-ish) AND pred1->tgt0


def test_split_forgives_fragmentation():
    # One target drawn as two half-strokes: one-to-one metrics charge the
    # second fragment as unmatched; the split-aware metric concatenates
    # them back and scores ~0.
    tgt = [_line(0, 0, 100, 0, n=21)]
    pred = [_line(0, 0, 50, 0, n=11), _line(50, 0, 100, 0, n=11)]
    one_to_one = stroke_dtw_assigned(pred, tgt)
    split = stroke_dtw_split(pred, tgt)
    assert split < 1.0
    assert split < one_to_one  # the fragmentation penalty is forgiven


def test_split_orders_and_orients_fragments():
    # Fragments arrive out of order and reversed; the split metric must
    # re-order along the target and flip the reversed one.
    tgt = [_line(0, 0, 90, 0, n=31)]
    a = _line(60, 0, 90, 0, n=11)            # last third, listed first
    b = tuple(np.asarray(v)[::-1] for v in _line(0, 0, 30, 0, n=11))
    c = _line(30, 0, 60, 0, n=11)
    assert stroke_dtw_split([a, b, c], tgt) < 1.0


def test_split_charges_missed_targets():
    tgt = [_line(0, 0, 50, 0), _line(0, 100, 50, 100)]
    pred = [_line(0, 0, 50, 0)]
    s = stroke_dtw_split(pred, tgt)
    assert s > 10.0  # the missed far target costs its best-DTW penalty


def test_f1_tol_forgives_one_pixel_halo():
    from stroke_derenderer_tpu.eval.metrics import (
        binarization_f1, binarization_f1_tol,
    )
    t = np.zeros((40, 40), bool)
    t[10:12, 5:35] = True          # 2px-thick target stroke
    p = np.zeros((40, 40), bool)
    p[9:13, 5:35] = True           # same stroke, 1px wider each side
    exact = binarization_f1(p, t)
    tol = binarization_f1_tol(p, t, tol_px=1)
    assert exact < 0.8             # convention gap hurts exact F1
    assert tol > 0.999             # entirely within the 1px tolerance

    p2 = np.zeros((40, 40), bool)  # real error: stroke missing entirely,
    p2[30:32, 5:35] = True         # spurious one elsewhere
    assert binarization_f1_tol(p2, t, tol_px=1) < 0.05
