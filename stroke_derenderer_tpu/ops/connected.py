"""Connected components (8-connectivity) with bounding boxes.

Replaces the reference's ``cv2.connectedComponentsWithStats`` +
``cv2.boundingRect`` (partition.py:14-19). Three backends:

  * **native** — first-party C++ union-find (native/cc.cpp) via ctypes; the
    default host path, fastest for the 128xW line masks.
  * **scipy** — ``scipy.ndimage.label`` fallback (identical label semantics:
    raster first-encounter order, 8-connectivity structure).
  * **device** — an experimental pure-jnp label-propagation version
    (:func:`connected_components_jnp`) for fully on-device pipelines.

Labels are int32, background 0, components numbered 1..num in raster
first-encounter order. Box tuples are cv2-style (x, y, w, h) = (left, top,
width, height).
"""

from __future__ import annotations

import numpy as np

_EIGHT = np.ones((3, 3), dtype=np.int32)


def _scipy_label(img: np.ndarray):
    from scipy import ndimage
    labels, num = ndimage.label(img != 0, structure=_EIGHT)
    return labels.astype(np.int32), int(num)


def connected_components(img: np.ndarray) -> tuple[np.ndarray, int]:
    """(H, W) array, nonzero = foreground -> (labels int32, num_components)."""
    from stroke_derenderer_tpu.native import cc_native
    if cc_native.available():
        return cc_native.label(np.ascontiguousarray(img != 0, dtype=np.uint8))
    return _scipy_label(img)


def bounding_boxes(labels: np.ndarray, num: int) -> np.ndarray:
    """cv2-style (x, y, w, h) per component 1..num, vectorized -> (N, 4)."""
    if num == 0:
        return np.zeros((0, 4), np.int64)
    ys, xs = np.nonzero(labels)
    lab = labels[ys, xs]
    order = np.argsort(lab, kind="stable")
    lab, ys, xs = lab[order], ys[order], xs[order]
    # Segment boundaries per label (labels are 1..num, all present).
    counts = np.bincount(lab, minlength=num + 1)[1:]
    ends = np.cumsum(counts)
    starts = ends - counts
    x0 = np.minimum.reduceat(xs, starts)
    y0 = np.minimum.reduceat(ys, starts)
    x1 = np.maximum.reduceat(xs, starts)
    y1 = np.maximum.reduceat(ys, starts)
    return np.stack([x0, y0, x1 - x0 + 1, y1 - y0 + 1], axis=1)


def connected_components_with_boxes(img: np.ndarray, with_area: bool = False):
    """-> (labels (H, W) int32, boxes (N, 4) int array of cv2-style
    (x, y, w, h) rows for components 1..N[, areas (N,) pixel counts])."""
    from stroke_derenderer_tpu.native import cc_native
    if cc_native.available():
        labels, num, stats = cc_native.label_with_stats(
            np.ascontiguousarray(img != 0, dtype=np.uint8))
        boxes = np.asarray(stats)[:, :4].astype(np.int64)
        if with_area:
            return labels, boxes, np.asarray(stats)[:, 4].astype(np.int64)
        return labels, boxes
    labels, num = _scipy_label(img)
    boxes = bounding_boxes(labels, num)
    if with_area:
        return labels, boxes, np.bincount(labels.ravel(),
                                          minlength=num + 1)[1:]
    return labels, boxes


# --------------------------- device (jnp) path ---------------------------

def connected_components_jnp(img, max_iters: int | None = None):
    """On-device CC by serpentine min-label sweeps with segmented row scans.

    Each foreground pixel starts with its linear index + 1. One sweep runs a
    top->bottom row scan (pulling 8-neighborhood minima from the previous
    row, then min-propagating *within* each row's foreground runs via a
    segmented associative scan) followed by the mirrored bottom->up scan.
    A sweep resolves every label path that doesn't reverse vertical
    direction, so the number of sweeps to fixpoint is the component's
    spiral-nesting depth (a handful for handwriting), not its geodesic
    diameter. Returns (labels, num) with the same raster first-encounter
    numbering as the host backends.
    """
    import jax
    import jax.numpy as jnp

    h, w = img.shape
    fg = (img != 0)
    idx = jnp.arange(1, h * w + 1, dtype=jnp.int32).reshape(h, w)
    big = jnp.int32(h * w + 2)
    lab0 = jnp.where(fg, idx, big)

    def row_run_min(row_lab, row_fg):
        """Min within each contiguous foreground run of one row (W,)."""
        start = row_fg & ~jnp.concatenate([jnp.zeros((1,), bool), row_fg[:-1]])

        def op(a, b):
            av, af = a
            bv, bf = b
            return jnp.where(bf, bv, jnp.minimum(av, bv)), af | bf

        fwd, _ = jax.lax.associative_scan(op, (row_lab, start))
        end = row_fg & ~jnp.concatenate([row_fg[1:], jnp.zeros((1,), bool)])
        bwd, _ = jax.lax.associative_scan(op, (row_lab, end), reverse=True)
        return jnp.where(row_fg, jnp.minimum(fwd, bwd), big)

    def shift_min(row):
        left = jnp.concatenate([row[1:], jnp.full((1,), big, jnp.int32)])
        right = jnp.concatenate([jnp.full((1,), big, jnp.int32), row[:-1]])
        return jnp.minimum(row, jnp.minimum(left, right))

    def directional_scan(lab, reverse):
        rows_lab = lab[::-1] if reverse else lab
        rows_fg = fg[::-1] if reverse else fg

        def body(prev, xs):
            row_lab, row_fg = xs
            pulled = jnp.minimum(row_lab, shift_min(prev))
            pulled = jnp.where(row_fg, pulled, big)
            out = row_run_min(pulled, row_fg)
            return out, out

        init = jnp.full((w,), big, jnp.int32)
        _, out = jax.lax.scan(body, init, (rows_lab, rows_fg))
        return out[::-1] if reverse else out

    def sweep(lab):
        lab = directional_scan(lab, reverse=False)
        lab = directional_scan(lab, reverse=True)
        return lab

    def cond(state):
        lab, prev, it = state
        limit = max_iters if max_iters is not None else h + 2
        return jnp.logical_and(jnp.any(lab != prev), it < limit)

    def body(state):
        lab, _, it = state
        return sweep(lab), lab, it + 1

    lab, _, _ = jax.lax.while_loop(
        cond, body, (sweep(lab0), lab0, jnp.int32(1)))
    lab = jnp.where(fg, lab, 0)

    # Compact to 1..num in raster order of the root pixel: a root is a pixel
    # whose label equals its own linear index + 1.
    flat = lab.reshape(-1)
    is_root = flat == jnp.arange(1, h * w + 1, dtype=jnp.int32)
    rank = jnp.cumsum(is_root.astype(jnp.int32))
    # Map each pixel's root label -> that root's rank.
    new_flat = jnp.where(flat > 0, rank[jnp.maximum(flat - 1, 0)], 0)
    num = rank[-1]
    return new_flat.reshape(h, w), num
