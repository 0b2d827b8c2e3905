"""Stroke token grammar and polyline post-processing.

The stroke model emits token sequences over a 451-symbol vocabulary:
PAD/BOS/EOS = 0/1/2, then interleaved vertex tokens where value v = token-3
encodes an x coordinate if v < image_size and a y coordinate (y = v -
image_size) otherwise (reference evaluate_strokes.py:94-135). This module
decodes those sequences into polylines and applies the geometric
post-processing chain: clip -> inverse transform -> global endpoint sort
(reference partition.py:143-237 and evaluate_strokes.py:227-247).

Quirks preserved on purpose:
  * odd-length vertex runs drop their last element (evaluate_strokes.py:129-131);
  * clipping tests X against img_shape[0] and Y against img_shape[1] with
    *inclusive* upper bounds (partition.py:230-233);
  * the endpoint sort keys on coordinates cast to int32 (truncation toward
    zero — the reference builds a structured int32 array from floats,
    partition.py:165-182); ties are resolved stably here (the reference's
    introsort is unstable on exact ties — the only deviation).

These run on host: they produce the ragged Python/JSON stroke structures of
the output contract, after all device compute is done.
"""

from __future__ import annotations

import numpy as np

from stroke_derenderer_tpu.config import BOS, EOS, PAD

Stroke = tuple[np.ndarray, np.ndarray]


def tokens_to_strokes(token_seq: np.ndarray, image_size: int) -> list[Stroke]:
    """Decode one token sequence into (X, Y) polylines
    (evaluate_strokes.py:94-135)."""
    toks = np.asarray(token_seq)
    # Sequence splits at BOS boundaries; EOS terminates everything after it.
    eos_pos = np.flatnonzero(toks == EOS)
    if eos_pos.size:
        toks = toks[:eos_pos[0]]  # the EOS itself just flushes, like BOS
    # Vectorized run split (the per-token Python loop dominated host-side
    # token post-processing at production batch sizes): a vertex's run id is
    # the number of BOS tokens before it; empty runs vanish in the split,
    # exactly like the reference's skip of empty strokes.
    keep = (toks != BOS) & (toks != PAD)
    vals = (toks[keep] - (EOS + 1)).astype(np.int64)
    if vals.size == 0:
        return []
    rid = np.cumsum(toks == BOS)[keep]
    strokes: list[Stroke] = []
    for seq in np.split(vals, np.flatnonzero(np.diff(rid)) + 1):
        # NB a single-vertex run truncates to an EMPTY stroke which is
        # still appended — the reference filters empties BEFORE the odd
        # truncation (evaluate_strokes.py:123-133); sort_strokes drops
        # them later.
        if seq.size % 2 != 0:
            seq = seq[:-1]
        x = seq[0::2]
        y = seq[1::2] - image_size
        strokes.append((x, y))
    return strokes


def decode_tokens_batch(tokens: np.ndarray, image_size: int,
                        img_shape: tuple[int, int],
                        trans1, ratio, trans2) -> list[list[Stroke]]:
    """Fused tokens_to_strokes + clip_strokes + inverse_transform over a
    WHOLE (N, L) token matrix in one numpy pass.

    Per-glyph semantics are identical to the three-call chain (pinned by
    tests/test_strokes_ops.py::test_decode_tokens_batch_parity) except that
    empty strokes are dropped here instead of by the later sort_strokes —
    the final pipeline output is unchanged. Exists because the per-glyph
    Python loop was a measurable slice of the host budget that gates the
    two-stage pipeline on a 1-core host (~0.8 ms/image at production batch
    sizes).

    ``trans1/ratio/trans2``: per-glyph transform rows — trans1/trans2 as
    (N, 2) (x, y) arrays, ratio as (N,). Returns one stroke list per glyph.
    """
    toks = np.ascontiguousarray(tokens)
    n_rows, length = toks.shape
    alive = np.cumsum(toks == EOS, axis=1) == 0   # strictly before first EOS
    keep = alive & (toks != BOS) & (toks != PAD)
    # Run id = (row, #BOS-before) — empty runs vanish in the flatten, like
    # the reference's skip of empty strokes (evaluate_strokes.py:123-127).
    rid = np.cumsum(toks == BOS, axis=1)
    rowk = np.arange(n_rows, dtype=np.int64)[:, None] * (length + 1)
    runkey = (rowk + rid)[keep]
    vals = (toks[keep] - (EOS + 1)).astype(np.int64)
    if vals.size == 0:
        return [[] for _ in range(n_rows)]

    # Segment bookkeeping: start offsets, lengths, position-in-run.
    bounds = np.flatnonzero(np.diff(runkey)) + 1
    starts = np.concatenate(([0], bounds))
    lens = np.diff(np.concatenate((starts, [vals.size])))
    seg_of = np.repeat(np.arange(starts.size), lens)
    pos = np.arange(vals.size) - starts[seg_of]
    # Odd-length runs drop their trailing element (evaluate_strokes.py:129-131).
    even_len = lens - (lens & 1)
    tok_keep = pos < even_len[seg_of]
    vals, pos, seg_of = vals[tok_keep], pos[tok_keep], seg_of[tok_keep]
    runkey_seg = runkey[starts]                 # (S,) run -> row*(L+1)+rid
    row_seg = (runkey_seg // (length + 1)).astype(np.int64)

    xs = vals[pos % 2 == 0].astype(np.float64)
    ys = (vals[pos % 2 == 1] - image_size).astype(np.float64)
    vseg = seg_of[pos % 2 == 0]                 # segment id per VERTEX
    # Clip (inclusive bounds, X vs shape[0] / Y vs shape[1] —
    # partition.py:230-233), then the inverse transform with the owning
    # glyph's rows (partition.py:143-156).
    vkeep = ((xs >= 0) & (xs <= img_shape[0])
             & (ys >= 0) & (ys <= img_shape[1]))
    xs, ys, vseg = xs[vkeep], ys[vkeep], vseg[vkeep]
    t1 = np.asarray(trans1, np.float64)
    t2 = np.asarray(trans2, np.float64)
    rr = np.asarray(ratio, np.float64)
    vrow = row_seg[vseg]
    xs = (xs - t2[vrow, 0]) / rr[vrow] + t1[vrow, 0]
    ys = (ys - t2[vrow, 1]) / rr[vrow] + t1[vrow, 1]

    # Split into per-stroke views (empty strokes disappear here; the loop
    # path appends them and sort_strokes drops them — same final output).
    vbounds = np.flatnonzero(np.diff(vseg)) + 1
    x_parts = np.split(xs, vbounds)
    y_parts = np.split(ys, vbounds)
    seg_rows = row_seg[vseg[np.concatenate(([0], vbounds))]] \
        if vseg.size else np.empty(0, np.int64)
    out: list[list[Stroke]] = [[] for _ in range(n_rows)]
    for r, x, y in zip(seg_rows, x_parts, y_parts):
        if x.size:
            out[int(r)].append((x, y))
    return out


def clip_strokes(strokes: list[Stroke], img_shape: tuple[int, int]) -> list[Stroke]:
    """Drop vertices outside [0, img_shape] per coordinate
    (partition.py:219-237)."""
    out = []
    for x, y in strokes:
        n = min(x.size, y.size)
        x, y = x[:n], y[:n]
        keep = ((x >= 0) & (x <= img_shape[0]) & (y >= 0) & (y <= img_shape[1]))
        out.append((x[keep], y[keep]))
    return out


def inverse_transform(strokes: list[Stroke], trans1, ratio, trans2) -> list[Stroke]:
    """Undo pad -> resize -> crop: Pinv = (P - t2) / ratio + t1
    (partition.py:143-156)."""
    (x1, y1), (x2, y2) = trans1, trans2
    return [((x - x2) / ratio + x1, (y - y2) / ratio + y1) for x, y in strokes]


def sort_strokes(strokes: list[Stroke]) -> list[Stroke]:
    """Order strokes left-to-right / top-to-bottom by their first-seen
    endpoint in an (x, y) lexicographic sort over all endpoints, reversing a
    stroke when its tail endpoint was seen first (partition.py:159-216)."""
    # QoL deviation: drop empty strokes (clipping can fully empty one; the
    # reference would raise IndexError on its endpoints, partition.py:171).
    strokes = [(x, y) for x, y in strokes if np.asarray(x).size and np.asarray(y).size]
    if not strokes:
        return []
    heads = np.array([(x[0], y[0]) for x, y in strokes], dtype=np.float64)
    tails = np.array([(x[-1], y[-1]) for x, y in strokes], dtype=np.float64)
    # Endpoint 2n is the head of stroke n, endpoint 2n+1 its tail.
    pts = np.empty((2 * len(strokes), 2), dtype=np.float64)
    pts[0::2] = heads
    pts[1::2] = tails
    keys = pts.astype(np.int32)  # reference casts to int32 (truncation)
    order = np.lexsort((keys[:, 1], keys[:, 0]))

    seen = np.zeros(len(strokes), dtype=bool)
    out: list[Stroke] = []
    for e in order:
        s, rem = divmod(int(e), 2)
        if seen[s]:
            continue
        seen[s] = True
        x, y = strokes[s]
        if rem == 1:
            x, y = x[::-1], y[::-1]
        out.append((x, y))
    return out


def merge_stroke_fragments(strokes: list[Stroke], tol: float = 4.0) -> list[Stroke]:
    """Join polylines whose endpoints nearly touch (within ``tol`` px) into
    single strokes, closest pair first.

    Post-processing for the residual re-decode path (pipeline/strokes.py):
    the second decode pass emits the *uncovered remainder* of partially
    traced strokes, so one ground-truth stroke ends up split across two
    predictions — which is exactly what degrades per-stroke DTW matching
    even as ink coverage improves. Merging nearly-touching endpoints
    reassembles those fragments. Not applied to the base (reference-parity)
    path, whose output contract this would alter.

    Round-4 calibration (scripts/study_directed_merge.py; mixed n=24
    seed 0, v9, redecode 0.9): per-stroke DTW falls monotonically with
    tol up to ~20 px (33.1 at tol 8 → 26.8 at tol 20, turning by 24+) at
    flat coverage/chamfer — under the matched-pairs + unmatched-penalty
    metric, leaving fragments UNmerged costs more than an occasional bad
    junction. A direction-continuity gate on the junction tangents was
    measured and REJECTED for the same reason: every gated variant left
    more fragments unmerged and scored worse DTW (+1 to +2) than
    distance-only at equal tol."""
    strokes = [(np.asarray(x, np.float64), np.asarray(y, np.float64))
               for x, y in strokes if np.asarray(x).size]
    while len(strokes) > 1:
        best_d, best = tol, None
        for i in range(len(strokes)):
            xi, yi = strokes[i]
            for j in range(i + 1, len(strokes)):
                xj, yj = strokes[j]
                for ei in (0, -1):
                    for ej in (0, -1):
                        d = float(np.hypot(xi[ei] - xj[ej], yi[ei] - yj[ej]))
                        if d <= best_d:
                            best_d, best = d, (i, j, ei, ej)
        if best is None:
            break
        i, j, ei, ej = best
        xi, yi = strokes[i]
        xj, yj = strokes[j]
        if ei == 0:  # joined endpoint must be stroke i's tail
            xi, yi = xi[::-1], yi[::-1]
        if ej == -1:  # ... and stroke j's head
            xj, yj = xj[::-1], yj[::-1]
        strokes[i] = (np.concatenate([xi, xj]), np.concatenate([yi, yj]))
        del strokes[j]
    return strokes


def refine_strokes(strokes: list[Stroke], mask: np.ndarray,
                   max_shift: float = 3.0,
                   densify: float = 2.0) -> list[Stroke]:
    """Snap predicted polylines onto the binarized ink.

    The decoder's vocabulary quantizes to the 224-crop grid and the model
    itself drifts a few pixels on long traces; the binarized mask holds the
    exact ink geometry. Each point within ``max_shift`` px of ink (but not
    on it) moves to its nearest ink pixel — the polyline keeps its
    topology/order (the model's strength) while the mask supplies the
    metric accuracy (its strength). Points farther than ``max_shift``
    from any ink are left untouched: a badly lost vertex snapping to an
    unrelated stroke would corrupt the polyline.

    Round-5 upgrade (``densify`` > 0, the default): each polyline is (1)
    resampled at ~``densify``-px arclength so the straight segments
    between decoded vertices stop cutting corners off curved ink, (2)
    snapped to the LOCAL INK CENTROID (5x5) rather than the nearest ink
    pixel — pixel-snapping lands on stroke edges, ±half the ink thickness
    of jitter — and (3) uniformly resampled back to the decode's own
    vertex count, because DTW compares vertex sequences and dense-vs-
    sparse pays the inter-vertex spacing at every extra point (a metric
    artifact measured at ≈ +1 DTW px). Measured on v10 / mixed n=24 at
    max_shift 12: coverage 0.674 → 0.772, chamfer 6.24 → 5.61, DTW
    13.82 → 13.57, assigned-DTW 12.43 → 12.22 — better on every metric
    than both no-refine and the round-4 vertex-only snap at DTW parity.
    ``densify=0`` restores the round-4 vertex-only behavior.

    Classic stroke-refinement post-processing; OFF by default
    (config.refine_snap = 0) since the reference has no analog and the
    parity contract pins raw decodes."""
    from scipy import ndimage

    mask = np.asarray(mask)
    if mask.ndim == 3:
        mask = mask[:, :, 0]
    mask = mask.astype(bool)
    if not mask.any() or not strokes:
        return strokes
    # EDT of the background gives, per pixel, the nearest ink pixel.
    dist, (iy, ix) = ndimage.distance_transform_edt(~mask,
                                                    return_indices=True)
    h, w = mask.shape
    if densify > 0:
        # Local ink centroid per pixel (5x5): snapping to the nearest ink
        # PIXEL lands on stroke edges (±half the ink thickness of jitter,
        # which shows up directly as DTW); the centroid of the surrounding
        # ink approximates the centerline at subpixel resolution. Legacy
        # mode (densify=0) keeps the round-4 nearest-pixel contract.
        m = mask.astype(np.float64)
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
        ksum = ndimage.uniform_filter(m, size=5, mode="constant")
        cx = np.divide(
            ndimage.uniform_filter(m * xx, size=5, mode="constant"),
            ksum, out=xx.copy(), where=ksum > 0)
        cy = np.divide(
            ndimage.uniform_filter(m * yy, size=5, mode="constant"),
            ksum, out=yy.copy(), where=ksum > 0)
    else:
        cy, cx = (iy.astype(np.float64), ix.astype(np.float64))
    out: list[Stroke] = []
    for x, y in strokes:
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        n0 = x.size
        if densify > 0 and x.size > 1:
            seg = np.hypot(np.diff(x), np.diff(y))
            ts = np.concatenate([[0.0], np.cumsum(seg)])
            total = ts[-1]
            if total > densify:
                t = np.linspace(0.0, total,
                                int(np.ceil(total / densify)) + 1)
                x = np.interp(t, ts, x)
                y = np.interp(t, ts, y)
        xi = np.clip(np.rint(x), 0, w - 1).astype(np.int64)
        yi = np.clip(np.rint(y), 0, h - 1).astype(np.int64)
        d = dist[yi, xi]
        snap = (d > 0) & (d <= max_shift)
        ny, nx = iy[yi, xi], ix[yi, xi]
        sx = np.where(snap, cx[ny, nx], x)
        sy = np.where(snap, cy[ny, nx], y)
        if sx.size > 1:
            keep = np.concatenate(
                [[True], (np.diff(sx) != 0) | (np.diff(sy) != 0)])
            sx, sy = sx[keep], sy[keep]
        if densify > 0 and sx.size > 2 and n0 > 1:
            # Resample back to the ORIGINAL vertex count, uniformly in
            # arclength: the densified points were for snapping fidelity,
            # but DTW compares vertex SEQUENCES and a dense pred against
            # sparse ground truth pays the inter-vertex distance at every
            # extra point (a metric artifact, measured ≈ +1 DTW px).
            # Uniform resampling restores the decode's vertex economy
            # while keeping the snapped curve.
            seg = np.hypot(np.diff(sx), np.diff(sy))
            ts = np.concatenate([[0.0], np.cumsum(seg)])
            if ts[-1] > 0:
                t = np.linspace(0.0, ts[-1], n0)
                sx = np.interp(t, ts, sx)
                sy = np.interp(t, ts, sy)
        out.append((sx, sy))
    return out


def strokes_to_json(strokes: list[Stroke], scale: float = 1.0) -> list:
    """Scale and convert to the output JSON structure [[X_list, Y_list], ...]
    (reference main.py:81-88, 122-131)."""
    out = []
    for x, y in strokes:
        n = min(np.asarray(x).size, np.asarray(y).size)
        out.append(([float(v) for v in np.asarray(x)[:n] * scale],
                    [float(v) for v in np.asarray(y)[:n] * scale]))
    return out
