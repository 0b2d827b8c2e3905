"""Multi-chip data-parallel inference: bit-identical to single device.

SURVEY.md §2.4 DP plan: shard the tile/glyph batch axis over a ('dp',)
mesh with replicated params. These tests run both pipelines on the
8-virtual-device CPU mesh (conftest.py) and on a single device, asserting
EXACT equality of the uint8 masks and the decoded stroke polylines —
batch-axis sharding must not change any per-example value.
"""

from __future__ import annotations

import numpy as np
import pytest

from stroke_derenderer_tpu.config import BinarizerConfig, StrokesConfig
from stroke_derenderer_tpu.parallel import make_mesh
from stroke_derenderer_tpu.pipeline import Binarizer, StrokeEstimator


def _line_images(n=5, widths=(500, 500, 500, 700, 260)):
    rng = np.random.default_rng(3)
    imgs = []
    for i in range(n):
        w = widths[i % len(widths)]
        img = np.full((150, w, 3), 250, np.uint8)
        for k in range(4):
            t = np.linspace(0, 2 * np.pi, 160)
            xs = np.clip((40 + k * w // 5 + 30 * np.cos(t * (1 + k % 2))
                          ).astype(int), 0, w - 1)
            ys = np.clip((75 + 50 * np.sin(t + k)).astype(int), 0, 149)
            img[ys, xs] = 10
            img[np.clip(ys + 1, 0, 149), xs] = 10
        imgs.append(img)
    return imgs


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)  # ('dp', 'tp') with tp=1


def test_binarizer_mesh_bit_identical(mesh):
    cfg = BinarizerConfig(features=(8, 16), bottleneck=32,
                          compute_dtype="float32")
    single = Binarizer(cfg, seed=7)
    sharded = Binarizer(cfg, seed=7, mesh=mesh)
    imgs = _line_images()
    ref = single.binarize_images(imgs)
    got = sharded.binarize_images(imgs)
    assert len(ref) == len(got)
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(r, g)
    # Single-image path too.
    np.testing.assert_array_equal(single.binarize_image(imgs[0]),
                                  sharded.binarize_image(imgs[0]))


def test_binarizer_mesh_sp_bit_identical():
    """(dp=4, tp=2) mesh: the tile WIDTH axis shards on tp (sequence
    parallelism; parallel.tile_sharding) — still bit-identical."""
    cfg = BinarizerConfig(features=(8, 16), bottleneck=32,
                          compute_dtype="float32")
    sp_mesh = make_mesh(8, tp=2)
    single = Binarizer(cfg, seed=7)
    sharded = Binarizer(cfg, seed=7, mesh=sp_mesh)
    imgs = _line_images()
    for r, g in zip(single.binarize_images(imgs),
                    sharded.binarize_images(imgs)):
        np.testing.assert_array_equal(r, g)


def _tiny_se_cfg(**kw):
    return StrokesConfig(encoder_arch="tiny", embed_dim=16, attention_dim=16,
                         decoder_dim=16, image_size=56, encode_image_size=4,
                         compute_dtype="float32", max_length=24,
                         glyph_bucket=4, **kw)


@pytest.mark.parametrize("device_partition", [False, True])
def test_strokes_mesh_identical(mesh, device_partition):
    cfg = _tiny_se_cfg(device_partition=device_partition)
    single = StrokeEstimator(cfg, seed=5)
    sharded = StrokeEstimator(cfg, seed=5, mesh=mesh)
    masks = [im[:, :, 0] < 128 for im in _line_images(3)]
    ref = single.process_images(masks)
    got = sharded.process_images(masks)
    assert len(ref) == len(got)
    for rs, gs in zip(ref, got):
        assert len(rs) == len(gs)
        for (rx, ry), (gx, gy) in zip(rs, gs):
            np.testing.assert_array_equal(rx, gx)
            np.testing.assert_array_equal(ry, gy)
    # Per-image path.
    r1 = single.process_image(masks[0])
    g1 = sharded.process_image(masks[0])
    assert len(r1) == len(g1)
    for (rx, ry), (gx, gy) in zip(r1, g1):
        np.testing.assert_array_equal(rx, gx)
        np.testing.assert_array_equal(ry, gy)
