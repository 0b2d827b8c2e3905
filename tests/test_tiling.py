"""Tile/stitch parity against the reference's split.py helpers."""

import numpy as np
import pytest

from stroke_derenderer_tpu.ops.tiling import (
    TilePlan, cut_tiles, cut_tiles_np, plan_tiles, stitch_tiles, stitch_tiles_np,
)

from tests.conftest import requires_reference

WIDTHS = [50, 200, 383, 384, 385, 700, 900, 1531, 3000]


@requires_reference
@pytest.mark.parametrize("w", WIDTHS)
def test_plan_matches_reference_split(rng, w):
    from derenderer.helper.split import split_image
    img = rng.integers(0, 256, (128, w, 3), dtype=np.uint8)
    ref_tiles, ref_widths = split_image(img, 384, 64)
    plan = plan_tiles(w, 384, 64)
    assert list(plan.widths) == list(ref_widths)
    ours = cut_tiles_np(img, plan)
    assert ours.shape[0] == len(ref_tiles)
    for i, rt in enumerate(ref_tiles):
        assert np.array_equal(ours[i], rt)


@pytest.mark.parametrize("w", WIDTHS)
def test_device_cut_matches_host(rng, w):
    img = rng.integers(0, 256, (128, w, 3), dtype=np.uint8)
    plan = plan_tiles(w, 384, 64)
    assert np.array_equal(np.asarray(cut_tiles(img, plan)), cut_tiles_np(img, plan))


@requires_reference
@pytest.mark.parametrize("w", WIDTHS)
def test_stitch_matches_reference_reconstruct(rng, w):
    from derenderer.helper.split import reconstruct_images
    plan = plan_tiles(w, 384, 64)
    t = plan.num_tiles
    tiles = rng.integers(0, 256, (t, 128, 384, 1), dtype=np.uint8)
    # Reference takes (B, C, H, W) and per-image bookkeeping lists.
    ref = reconstruct_images(
        np.transpose(tiles, (0, 3, 1, 2)), [w], [list(range(t))],
        [list(plan.widths)], 64)[0]
    ours_np = stitch_tiles_np(tiles, plan)
    ours_dev = np.asarray(stitch_tiles(tiles, plan))
    assert np.array_equal(ours_np, ref)
    assert np.array_equal(ours_dev, ref)


def test_roundtrip_binary_mask(rng):
    # Cutting then stitching a 0/255 mask reproduces it exactly (max-blend
    # of identical overlaps is the identity).
    w = 777
    img = (rng.random((128, w, 1)) > 0.5).astype(np.uint8) * 255
    plan = plan_tiles(w, 384, 64)
    tiles = cut_tiles_np(img, plan)
    assert np.array_equal(stitch_tiles_np(tiles, plan), img)


def test_narrow_image_single_tile(rng):
    img = rng.integers(0, 256, (128, 100, 3), dtype=np.uint8)
    plan = plan_tiles(100, 384, 64)
    assert plan.num_tiles == 1 and plan.widths == (100,)
    tiles = cut_tiles_np(img, plan)
    assert tiles.shape == (1, 128, 384, 3)
    assert np.array_equal(tiles[0, :, :100], img)
    assert (tiles[0, :, 100:] == 0).all()
