"""Glyph-island extraction and grouping (host-side geometry).

Re-implements, behavior-for-behavior, the reference's partitioning of a
binarized line image into model-sized glyph groups
(partition.py:9-98, 248-358). Downstream stroke coordinates depend on this
geometry, so known quirks of the reference are preserved deliberately:

  * the bounding-box margin is asymmetric: +margin on the top/left but
    +margin+1 on the bottom/right (partition.py:20-24);
  * only intervals strictly wider than the target absorb contained
    intervals, and the containment scan early-exits on the first interval
    starting past the absorber (partition.py:261-282);
  * greedy packing of the remaining intervals measures the first group's
    width from column 0 (``left`` initialized to 0, partition.py:289-313),
    and its first emitted group may be empty (filtered afterwards);
  * group composition adds overlapping crops then re-binarizes (>0)
    (partition.py:74-85).

Connected components come from :mod:`stroke_derenderer_tpu.ops.connected`
(native C++ or scipy), with labels in raster first-encounter order; the
reference's cv2 label order only matters through the subsequent
left-position sort, which we make stable (the reference's np.argsort is
introsort — unstable on exact ties; stability is the only deviation).
"""

from __future__ import annotations

import numpy as np

from stroke_derenderer_tpu.ops.connected import connected_components_with_boxes

# (crop, (top, left)) — the reference's island tuple layout (partition.py:26).
Island = tuple[np.ndarray, tuple[int, int]]


def get_binarized_islands(img_bin: np.ndarray, margin: int = 2) -> list[Island]:
    """Crop each connected component with an expanded bounding box
    (partition.py:9-28). ``img_bin`` is (H, W) with nonzero foreground."""
    h, w = img_bin.shape[:2]
    labels, boxes = connected_components_with_boxes(img_bin)
    islands: list[Island] = []
    for n, (x, y, bw, bh) in enumerate(boxes, start=1):
        xs = max(x - margin, 0)
        ys = max(y - margin, 0)
        xf = min(x + bw + margin + 1, w)
        yf = min(y + bh + margin + 1, h)
        crop = (labels[ys:yf, xs:xf] == n).astype(np.uint8)
        islands.append((crop, (ys, xs)))
    return islands


def sort_islands(islands: list[Island]) -> list[Island]:
    """Sort left-to-right by the crop's left column (partition.py:90-98)."""
    lefts = np.asarray([isl[1][1] for isl in islands])
    return [islands[i] for i in np.argsort(lefts, kind="stable")]


def group_intervals(intervals: list[tuple[int, int]], width: int) -> list[list[int]]:
    """Group sorted intervals to fit a target width (partition.py:248-318).

    Phase 1: each interval wider than ``width`` absorbs intervals it fully
    contains (bidirectional containment edges, transitively closed).
    Phase 2: the rest pack greedily left-to-right while the running width
    ``max(b - left, w)`` stays within ``width``.
    """
    n = len(intervals)
    edges: dict[int, list[int]] = {i: [] for i in range(n)}
    contained = [False] * n

    for i in range(n):
        a_o, b_o = intervals[i]
        if (b_o - a_o) <= width:
            continue
        for k in range(n):
            if k == i:
                continue
            a_i, b_i = intervals[k]
            if a_i > b_o:
                break  # sorted by left endpoint: nothing further can fit
            if a_o <= a_i and b_o >= b_i:
                edges[i].append(k)
                edges[k].append(i)
                contained[i] = True
                contained[k] = True

    linked = {i: v for i, v in edges.items() if v}
    groups_long = _transitive_groups(linked)

    groups_short: list[list[int]] = []
    group: list[int] = []
    w_run, left = 0, 0
    for i, (a, b) in enumerate(intervals):
        if contained[i]:
            continue
        new_w = max(b - left, w_run)
        if new_w > width:
            groups_short.append(group)
            group, w_run, left = [i], b - a, a
        else:
            group.append(i)
            w_run = new_w
    groups_short.append(group)

    return [g for g in groups_long + groups_short if g]


def _transitive_groups(edges: dict[int, list[int]]) -> list[list[int]]:
    """Transitive closure of the containment edges, preserving the
    reference's depth-first member ordering (partition.py:321-358)."""
    groups: list[list[int]] = []
    done = {f: False for f in edges}
    for f in edges:
        if done[f]:
            continue
        group: list[int] = []
        stack = [(f, 0)]
        # Depth-first in edge order, appending on first visit — identical
        # member order to the reference's recursive add_to_group.
        while stack:
            node, i = stack.pop()
            conns = edges[node]
            while i < len(conns):
                nxt = conns[i]
                i += 1
                if nxt not in group:
                    group.append(nxt)
                    stack.append((node, i))
                    stack.append((nxt, 0))
                    break
        for m in group:
            done[m] = True
        done[f] = True
        groups.append(group)
    return groups


def group_islands(islands: list[Island], target_shape: tuple[int, int]) -> list[Island]:
    """Composite grouped islands onto shared canvases (partition.py:31-87)."""
    tgt_w = target_shape[1]
    islands = sort_islands(islands)
    intervals = []
    for crop, (_, left) in islands:
        intervals.append((left, left + crop.shape[1]))
    inds_groups = group_intervals(intervals, tgt_w)

    out: list[Island] = []
    for inds in inds_groups:
        subs = [islands[k] for k in inds]
        tops = [t for _, (t, _) in subs]
        lefts = [l for _, (_, l) in subs]
        bottoms = [t + c.shape[0] for c, (t, _) in subs]
        rights = [l + c.shape[1] for c, (_, l) in subs]
        top, left = int(np.min(tops)), int(np.min(lefts))
        bottom, right = int(np.max(bottoms)), int(np.max(rights))
        canvas = np.zeros((bottom - top, right - left), dtype=np.uint8)
        for crop, (t, l) in subs:
            ch, cw = crop.shape[:2]
            canvas[t - top:t - top + ch, l - left:l - left + cw] += crop.astype(np.uint8)
        out.append(((canvas > 0).astype(np.uint8), (top, left)))
    return out


def get_pad_edges(n: int) -> tuple[int, int]:
    """Split padding across two edges, extra pixel on the far side
    (partition.py:241-245)."""
    return (n // 2, n // 2) if n % 2 == 0 else (n // 2, n // 2 + 1)


def resize_and_pad_np(image: np.ndarray, new_dims: tuple[int, int],
                      margin: int = 0, pad_value: int = 0):
    """Proportional resize into ``new_dims`` minus margins, then even-border
    pad (partition.py:101-140). Returns (padded, ratio, (x_off, y_off)) where
    the offset tuple is (horizontal, vertical) — the reference returns
    (y_delta, x_delta) "in reverse" and consumes it as (x2, y2) at
    evaluate_strokes.py:211; we return it already in (x, y) order.

    The recorded ratio is the mean of the achieved h/w ratios
    (partition.py:123) — a reference quirk the inverse transform relies on.
    """
    from stroke_derenderer_tpu.ops.resize import resize_bilinear_np

    height, width = image.shape[:2]
    new_h = new_dims[0] - 2 * margin
    new_w = new_dims[1] - 2 * margin
    scale = min(new_h / height, new_w / width)
    rs_w = int(min(np.rint(scale * width), new_w))
    rs_h = int(min(np.rint(scale * height), new_h))
    image_rs = resize_bilinear_np(image, rs_h, rs_w)
    ratio = (rs_w / width + rs_h / height) / 2

    pad_h = get_pad_edges(max(new_dims[0] - rs_h, 0))
    pad_w = get_pad_edges(max(new_dims[1] - rs_w, 0))
    pad_spec = [(pad_h[0], pad_h[1]), (pad_w[0], pad_w[1])]
    if image_rs.ndim == 3:
        pad_spec.append((0, 0))
    image_pad = np.pad(image_rs, pad_spec, constant_values=pad_value)

    x_off = (image_pad.shape[1] - rs_w) / 2
    y_off = (image_pad.shape[0] - rs_h) / 2
    return image_pad, ratio, (x_off, y_off)
