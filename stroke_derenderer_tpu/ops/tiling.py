"""Tile/stitch geometry for the binarizer.

The reference cuts a height-normalized line image into overlapping
fixed-width tiles with a host loop (split.py:10-86) and stitches model
outputs back with a second loop using ``np.maximum`` on the overlaps
(split.py:89-124). Here the geometry is planned once on the host as static
arithmetic (:class:`TilePlan`) and the cut/stitch themselves are single
vectorized gathers / scatter-max ops that live inside the jitted binarize
program — tile count becomes the batch axis that feeds the MXU.

Semantics match the reference exactly:
  * ``num_tiles = w // (target_width - overlap) + 1`` for w >= target_width,
    else a single right-padded tile (split.py:21-31).
  * tile i covers columns [i*w_unpad, min((i+1)*w_unpad + overlap, w)),
    right-padded with pad_value to target_width (split.py:32-39).
  * stitch pastes tile i's unpadded columns at offset sum_{k<i}(width_k -
    overlap) with elementwise max on overlaps (split.py:110-119).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class TilePlan:
    """Static cut/stitch geometry for one image width."""

    img_width: int          # width of the (height-normalized) image
    target_width: int       # tile width fed to the model
    overlap: int
    num_tiles: int
    widths: tuple[int, ...]  # unpadded width of each tile
    starts: tuple[int, ...]  # source column offset of each tile

    @property
    def stitch_starts(self) -> tuple[int, ...]:
        """Destination column offsets used by the stitcher: the running
        ``ind_s += width - overlap`` of the reference (split.py:117-119)."""
        out, pos = [], 0
        for wd in self.widths:
            out.append(pos)
            pos += wd - self.overlap
        return tuple(out)


def plan_tiles(img_width: int, target_width: int, overlap: int) -> TilePlan:
    """Host-side mirror of the reference tile arithmetic (split.py:10-39)."""
    if img_width < target_width:
        return TilePlan(img_width, target_width, overlap, 1, (img_width,), (0,))
    num = img_width // (target_width - overlap) + 1
    w_unpad = img_width // num
    starts, widths = [], []
    for i in range(num):
        s = i * w_unpad
        f = min((i + 1) * w_unpad + overlap, img_width)
        starts.append(s)
        widths.append(f - s)
    return TilePlan(img_width, target_width, overlap, num, tuple(widths), tuple(starts))


def cut_tiles(img: jax.Array, plan: TilePlan, pad_value: int = 0) -> jax.Array:
    """(H, W, C) -> (num_tiles, H, target_width, C), one vectorized gather.

    Columns past a tile's unpadded width read pad_value (reference
    split.py:42-54 pads on the right with a constant border).
    """
    h, _, c = img.shape
    col = (np.asarray(plan.starts)[:, None]
           + np.arange(plan.target_width)[None, :])  # (T, target_width)
    valid = np.arange(plan.target_width)[None, :] < np.asarray(plan.widths)[:, None]
    col = np.where(valid, np.minimum(col, plan.img_width - 1), 0)
    tiles = jnp.take(img, jnp.asarray(col.reshape(-1)), axis=1)
    tiles = tiles.reshape(h, plan.num_tiles, plan.target_width, c)
    tiles = jnp.transpose(tiles, (1, 0, 2, 3))
    mask = jnp.asarray(valid)[:, None, :, None]
    return jnp.where(mask, tiles, jnp.asarray(pad_value, img.dtype))


def stitch_tiles(tiles: jax.Array, plan: TilePlan) -> jax.Array:
    """(num_tiles, H, target_width, C) -> (H, img_width, C) max-blend stitch.

    Implemented as a scatter-max with statically precomputed destination
    columns; out-of-tile columns are dropped. Matches the reference's
    ``np.maximum`` paste loop (split.py:110-119) for any dtype with a zero
    floor (the canvas starts at zeros, reference split.py:108).
    """
    t, h, tw, c = tiles.shape
    dst = (np.asarray(plan.stitch_starts)[:, None] + np.arange(tw)[None, :])
    valid = np.arange(tw)[None, :] < np.asarray(plan.widths)[:, None]
    dst = np.where(valid, dst, plan.img_width)  # out-of-range => dropped
    canvas = jnp.zeros((h, plan.img_width, c), dtype=tiles.dtype)
    # Scatter over the W axis: rearrange to (H, T*tw, C) once.
    flat = jnp.transpose(tiles, (1, 0, 2, 3)).reshape(h, t * tw, c)
    idx = jnp.asarray(dst.reshape(-1))
    return canvas.at[:, idx, :].max(flat, mode="drop")


# ----------------------------- host (numpy) -----------------------------

def cut_tiles_np(img: np.ndarray, plan: TilePlan, pad_value: int = 0) -> np.ndarray:
    h, _, c = img.shape
    out = np.full((plan.num_tiles, h, plan.target_width, c), pad_value, dtype=img.dtype)
    for i, (s, wd) in enumerate(zip(plan.starts, plan.widths)):
        out[i, :, :wd] = img[:, s:s + wd]
    return out


def stitch_tiles_np(tiles: np.ndarray, plan: TilePlan) -> np.ndarray:
    t, h, tw, c = tiles.shape
    canvas = np.zeros((h, plan.img_width, c), dtype=tiles.dtype)
    for i, (s, wd) in enumerate(zip(plan.stitch_starts, plan.widths)):
        canvas[:, s:s + wd] = np.maximum(canvas[:, s:s + wd], tiles[i, :, :wd])
    return canvas
