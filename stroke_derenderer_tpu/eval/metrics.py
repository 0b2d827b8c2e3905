"""Quality metrics: binarization F1 and stroke DTW.

BASELINE.md defines the parity bar as binarization F1 and stroke DTW versus
reference outputs (the reference itself ships no metric code — SURVEY.md §6).
These run vectorized on host numpy: they compare final artifacts (masks and
polylines), not device tensors.
"""

from __future__ import annotations

import numpy as np


def binarization_f1(pred: np.ndarray, target: np.ndarray) -> float:
    """Foreground F1 between two binary masks of the same shape."""
    p = np.asarray(pred).astype(bool).ravel()
    t = np.asarray(target).astype(bool).ravel()
    tp = np.sum(p & t)
    fp = np.sum(p & ~t)
    fn = np.sum(~p & t)
    denom = 2 * tp + fp + fn
    return float(2 * tp / denom) if denom else 1.0


def _dtw(a: np.ndarray, b: np.ndarray) -> float:
    """Dynamic-time-warping distance between two polylines (N,2)/(M,2),
    euclidean local cost, O(N*M) vectorized over the anti-diagonal-free
    row recurrence."""
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return float("inf")
    cost = np.linalg.norm(a[:, None, :] - b[None, :, :], axis=-1)
    acc = np.full((m,), np.inf)
    acc[0] = cost[0, 0]
    for j in range(1, m):
        acc[j] = acc[j - 1] + cost[0, j]
    for i in range(1, n):
        prev = acc.copy()
        acc[0] = prev[0] + cost[i, 0]
        for j in range(1, m):
            acc[j] = cost[i, j] + min(prev[j], prev[j - 1], acc[j - 1])
    return float(acc[-1] / (n + m))  # path-length-normalized


def stroke_dtw(pred_strokes, target_strokes) -> float:
    """Mean DTW between greedily matched stroke pairs plus an unmatched
    penalty. Strokes are (X, Y) tuples; orientation-insensitive (takes the
    better of forward/reversed)."""
    pred = [np.stack([np.asarray(x), np.asarray(y)], -1)
            for x, y in pred_strokes if np.asarray(x).size]
    tgt = [np.stack([np.asarray(x), np.asarray(y)], -1)
           for x, y in target_strokes if np.asarray(x).size]
    if not pred and not tgt:
        return 0.0
    if not pred or not tgt:
        return float("inf")
    def best_dtw(p, candidates):
        return min(min(_dtw(p, t), _dtw(p[::-1], t)) for t in candidates)

    used = np.zeros(len(tgt), bool)
    dists = []
    leftovers = []
    for p in pred:
        best, best_j = float("inf"), -1
        for j, t in enumerate(tgt):
            if used[j]:
                continue
            d = min(_dtw(p, t), _dtw(p[::-1], t))
            if d < best:
                best, best_j = d, j
        if best_j >= 0:
            used[best_j] = True
            dists.append(best)
        else:
            leftovers.append(p)
    # Unmatched strokes (spurious predictions or missed targets) are charged
    # their best-possible DTW against the *whole* other set — how far the
    # extra/missing stroke sits from anything real.
    penalties = [best_dtw(p, tgt) for p in leftovers]
    penalties += [best_dtw(t, pred) for j, t in enumerate(tgt) if not used[j]]
    total = dists + penalties
    return float(np.mean(total)) if total else float("inf")


def strokes_chamfer(pred_strokes, target_strokes) -> float:
    """Symmetric chamfer distance over all stroke points (order-free
    sanity metric; DTW is the headline one)."""
    p = np.concatenate([np.stack([np.asarray(x), np.asarray(y)], -1)
                        for x, y in pred_strokes]) if pred_strokes else None
    t = np.concatenate([np.stack([np.asarray(x), np.asarray(y)], -1)
                        for x, y in target_strokes]) if target_strokes else None
    if p is None and t is None:
        return 0.0
    if p is None or t is None or not len(p) or not len(t):
        return float("inf")
    d = np.linalg.norm(p[:, None, :] - t[None, :, :], axis=-1)
    return float(d.min(axis=1).mean() + d.min(axis=0).mean()) / 2


def _densify(strokes, spacing: float = 1.0) -> np.ndarray | None:
    """All stroke polylines resampled at ~``spacing``-px arclength steps,
    concatenated to (N,2) — segments between sparse vertices count."""
    pts = []
    for x, y in strokes:
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        if x.size == 0:
            continue
        if x.size == 1:
            pts.append(np.stack([x, y], -1))
            continue
        seg = np.hypot(np.diff(x), np.diff(y))
        ts = np.concatenate([[0.0], np.cumsum(seg)])
        total = max(ts[-1], 1e-9)
        t = np.linspace(0.0, total, int(np.ceil(total / spacing)) + 1)
        pts.append(np.stack([np.interp(t, ts, x), np.interp(t, ts, y)], -1))
    return np.concatenate(pts) if pts else None


def stroke_coverage(pred_strokes, target_strokes, tol: float = 3.0) -> float:
    """Fraction of ground-truth ink (densely resampled polyline points)
    within ``tol`` px of the predicted strokes. 1.0 = full coverage; the
    round-1 OOD failure mode (early EOS on dense curls) shows up here as
    coverage well below 1 even when matched-stroke DTW looks fine."""
    t = _densify(target_strokes)
    if t is None:
        return 1.0
    p = _densify(pred_strokes)
    if p is None:
        return 0.0
    # Chunked min-distance: keeps the (N,M) matrix bounded.
    covered = 0
    for i in range(0, len(t), 4096):
        chunk = t[i:i + 4096]
        d = np.linalg.norm(chunk[:, None, :] - p[None, :, :], axis=-1)
        covered += int((d.min(axis=1) <= tol).sum())
    return covered / len(t)


def evaluate_pair(pred_mask, target_mask, pred_strokes, target_strokes) -> dict:
    return {
        "binarization_f1": binarization_f1(pred_mask, target_mask),
        "stroke_dtw": stroke_dtw(pred_strokes, target_strokes),
        "stroke_chamfer": strokes_chamfer(pred_strokes, target_strokes),
    }
