"""Device-side glyph partitioning: crops materialized on the TPU.

The host pipeline (pipeline/strokes.py compute_partitions, mirroring
reference partition.py:31-140) composites each glyph group onto a canvas,
bilinearly resizes it to fit 222x222, and pads to 224x224 — per group, in
host numpy — then uploads N 224x224 crops. Host work scales with group
count and the upload is N*224*224 bytes.

This module keeps only the irreducibly ragged geometry on the host
(connected components, interval grouping, scalar resize bookkeeping) and
moves ALL pixel work to the device:

  * host produces a (H, W) int16 ``group-id image`` (label -> owning group,
    -1 for background) plus per-group interpolation coordinates
    (4 int32 + 4 float32 vectors of length 224 per axis, computed in f64
    with exactly ops/resize.py's half-pixel-center + clamp rules);
  * the device program reconstructs each group's composited canvas as a
    mask compare (gid == g) and performs resize+pad as TWO batched MXU
    matmuls built from one-hot interpolation rows — no gathers, no
    per-group host resize, and the upload shrinks from N*224^2 bytes to
    H*W*2 + N*224*16 bytes (~7x smaller for a 1800-px line with 10 groups).

Known (deliberate) deviation: a group whose union bbox is ENTIRELY
foreground — an island touching all four image edges — min-max-normalizes
to all-zero on the host (pipeline minmax of a constant canvas) but stays
foreground here; the host behavior is the degenerate one, and both collapse
to near-identical model inputs after the per-crop normalization.

Why the reconstruction is exact: a group canvas pixel is foreground iff
some member island's label owns that pixel (crops are per-label masks,
partition.py:74-85 adds them then re-binarizes), and islands partition into
exactly one group each — so the canvas equals (group_id_image == g)
restricted to the group's union bounding box, which the interpolation rows
encode. Numerics: the host path rounds the resized uint8 crop; the device
rounds after the matmuls — both land within 1 LSB of cv2 (ops/resize.py),
and tests pin >=99.9% exact-pixel agreement.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from stroke_derenderer_tpu.ops.connected import connected_components_with_boxes
from stroke_derenderer_tpu.ops.grouping import get_pad_edges, group_intervals


@dataclasses.dataclass
class PartitionPlan:
    """Host-side bookkeeping for one image's device-partitioned glyphs."""
    gid_img: np.ndarray          # (H, W) int16: pixel -> group id, -1 = bg
    yi0: np.ndarray              # (N, S) int32 absolute source rows
    yi1: np.ndarray              # (N, S) int32
    wy0: np.ndarray              # (N, S) float32
    wy1: np.ndarray              # (N, S) float32
    xi0: np.ndarray              # (N, S) int32 absolute source cols
    xi1: np.ndarray              # (N, S) int32
    wx0: np.ndarray              # (N, S) float32
    wx1: np.ndarray              # (N, S) float32
    partitions: list[dict]       # translate1/ratio/translate2 per group


def _axis_coords(src0: int, src_len: int, rs_len: int, pad0: int, out: int):
    """Absolute bilinear source indices/weights for one output axis,
    identical math to ops/resize.py _interp_matrix (f64, half-pixel centers,
    cv2 clamping) shifted by the crop origin and the pad offset."""
    i = np.arange(out, dtype=np.float64)
    c = (i - pad0 + 0.5) * (src_len / rs_len) - 0.5
    x0 = np.floor(c)
    f = c - x0
    f = np.where(x0 < 0, 0.0, f)
    x0 = np.clip(x0, 0, src_len - 1)
    f = np.where(x0 >= src_len - 1, 0.0, f)
    x1 = np.clip(x0 + 1, 0, src_len - 1)
    valid = (i >= pad0) & (i < pad0 + rs_len)
    w0 = np.where(valid, 1.0 - f, 0.0)
    w1 = np.where(valid, f, 0.0)
    return ((src0 + x0).astype(np.int32), (src0 + x1).astype(np.int32),
            w0.astype(np.float32), w1.astype(np.float32))


def plan_partitions(img_bin: np.ndarray, margin: int, out_size: int
                    ) -> PartitionPlan | None:
    """Islands -> groups -> per-group device-interpolation plan.

    Mirrors pipeline/strokes.py compute_partitions' geometry exactly
    (sorted-by-left islands, group_intervals with target width = image
    height, union bounding boxes, resize_and_pad margin=1 scalar math,
    reference quirks included) but composites nothing on the host.
    """
    img_bin = np.asarray(img_bin)
    if img_bin.ndim == 3:
        img_bin = img_bin[:, :, 0]
    h, w = img_bin.shape
    labels, boxes = connected_components_with_boxes(img_bin.astype(np.uint8))
    if len(boxes) == 0:
        return None

    # Margin-expanded island boxes with their label ids (ops/grouping.py
    # get_binarized_islands geometry, reference partition.py:9-28).
    isl = []
    for n, (x, y, bw, bh) in enumerate(boxes, start=1):
        xs, ys = max(x - margin, 0), max(y - margin, 0)
        xf, yf = min(x + bw + margin + 1, w), min(y + bh + margin + 1, h)
        isl.append((n, ys, xs, yf, xf))
    order = np.argsort([e[2] for e in isl], kind="stable")
    isl = [isl[k] for k in order]

    # compute_partitions targets (img_h, img_h): group width budget = height.
    groups = group_intervals([(e[2], e[4]) for e in isl], h)

    group_of_label = np.full(len(boxes) + 1, -1, np.int16)
    rows = {k: [] for k in
            ("yi0", "yi1", "wy0", "wy1", "xi0", "xi1", "wx0", "wx1")}
    partitions = []
    for g, inds in enumerate(groups):
        members = [isl[k] for k in inds]
        for n, *_ in members:
            group_of_label[n] = g
        top = min(m[1] for m in members)
        left = min(m[2] for m in members)
        bottom = max(m[3] for m in members)
        right = max(m[4] for m in members)
        gh, gw = bottom - top, right - left

        # resize_and_pad_np scalar math (margin=1 -> 222x222 inner box).
        new_h = out_size - 2
        new_w = out_size - 2
        scale = min(new_h / gh, new_w / gw)
        rs_w = int(min(np.rint(scale * gw), new_w))
        rs_h = int(min(np.rint(scale * gh), new_h))
        ratio = (rs_w / gw + rs_h / gh) / 2
        pad_t = get_pad_edges(out_size - rs_h)[0]
        pad_l = get_pad_edges(out_size - rs_w)[0]

        yi0, yi1, wy0, wy1 = _axis_coords(top, gh, rs_h, pad_t, out_size)
        xi0, xi1, wx0, wx1 = _axis_coords(left, gw, rs_w, pad_l, out_size)
        for k, v in zip(rows, (yi0, yi1, wy0, wy1, xi0, xi1, wx0, wx1)):
            rows[k].append(v)
        partitions.append({
            "translate1": (left, top),
            "ratio": ratio,
            "translate2": ((out_size - rs_w) / 2, (out_size - rs_h) / 2),
        })

    gid_img = group_of_label[labels]
    return PartitionPlan(
        gid_img=gid_img.astype(np.int16),
        partitions=partitions,
        **{k: np.stack(v) for k, v in rows.items()})


def gather_crops_batched(gid_stack, img_idx, local_id,
                         yi0, yi1, wy0, wy1, xi0, xi1, wx0, wx1):
    """Cross-image variant: ``gid_stack`` (I, H, W) holds every image's
    group-id image (width-padded with -1), ``img_idx``/``local_id`` (N,)
    map each glyph row to its source image and its image-local group id.
    Returns (N, S, S) float32 crops — ONE device program for a whole batch
    of images (the host-crop path's cross-image batching, without crops)."""
    src_imgs = jnp.take(gid_stack, img_idx, axis=0)          # (N, H, W)
    src = (src_imgs.astype(jnp.int32) == local_id[:, None, None]
           .astype(jnp.int32))
    return _interp_crops(src.astype(jnp.float32) * 255.0,
                         yi0, yi1, wy0, wy1, xi0, xi1, wx0, wx1)


def gather_crops(gid_img, yi0, yi1, wy0, wy1, xi0, xi1, wx0, wx1):
    """(H, W) group-id image + per-group interpolation rows ->
    (N, S, S) float32 crops in {0..255} (composite + resize + pad fused;
    jittable, pure jnp). Padded plan rows (all-zero weights) yield all-zero
    crops."""
    n, _ = yi0.shape
    g = jnp.arange(n, dtype=jnp.int32)
    src = (gid_img[None].astype(jnp.int32) == g[:, None, None])
    return _interp_crops(src.astype(jnp.float32) * 255.0,
                         yi0, yi1, wy0, wy1, xi0, xi1, wx0, wx1)


def _interp_crops(src, yi0, yi1, wy0, wy1, xi0, xi1, wx0, wx1):
    """(N, H, W) float32 source canvases + interpolation rows -> (N, S, S)
    crops via two batched MXU matmuls (resize + pad fused)."""
    _, hh, ww = src.shape
    sy = jax.lax.broadcasted_iota(jnp.int32, (1, 1, hh), 2)
    ry = (wy0[:, :, None] * (sy == yi0[:, :, None])
          + wy1[:, :, None] * (sy == yi1[:, :, None]))       # (N, S, H)
    sx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, ww), 2)
    rx = (wx0[:, :, None] * (sx == xi0[:, :, None])
          + wx1[:, :, None] * (sx == xi1[:, :, None]))       # (N, S, W)

    t = jnp.einsum("nsh,nhw->nsw", ry, src,
                   preferred_element_type=jnp.float32)
    crops = jnp.einsum("nsw,ntw->nst", t, rx,
                       preferred_element_type=jnp.float32)
    return jnp.clip(jnp.rint(crops), 0.0, 255.0)
