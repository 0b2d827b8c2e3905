"""Real-dataset ingestion (data/real.py): train/eval on labeled pairs in
the pipeline's own output format (<stem>.png + <stem>_STROKES.json
[+ <stem>_BINARIZED.png], reference main.py:91-136 contract)."""

import json
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from stroke_derenderer_tpu.config import (
    EOS, PAD, BinarizerConfig, StrokesConfig,
)
from stroke_derenderer_tpu.data.real import (
    discover_pairs, glyph_samples_from_pair, load_pair, real_glyph_batches,
    real_tile_batches,
)
from stroke_derenderer_tpu.data.synthetic import (
    _photo_render, random_strokes, rasterize_strokes,
)

REPO = Path(__file__).resolve().parents[1]
H0, W0 = 160, 600  # original PNG resolution (not the 128 model height)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    """Two labeled lines on disk; the second also ships a _BINARIZED.png."""
    d = tmp_path_factory.mktemp("realdata")
    rng = np.random.default_rng(7)
    gt = {}
    for i, stem in enumerate(["lineA", "lineB"]):
        strokes = random_strokes(rng, 3 + i, (H0, W0),
                                 points_per_stroke=10)
        mask0 = rasterize_strokes(strokes, (H0, W0), thickness=3)
        Image.fromarray(_photo_render(mask0, rng)).save(d / f"{stem}.png")
        (d / f"{stem}_STROKES.json").write_text(json.dumps(
            [[list(map(float, x)), list(map(float, y))]
             for x, y in strokes]))
        gt[stem] = strokes
    # lineB gets an explicit mask at the height-normalized resolution.
    img_rs, mask, _ = load_pair(d / "lineB.png", d / "lineB_STROKES.json")
    Image.fromarray((mask * 255).astype(np.uint8)).save(
        d / "lineB_BINARIZED.png")
    return d, gt


def test_discover_and_load_pair(dataset):
    d, gt = dataset
    pairs = discover_pairs(d)
    assert [p.stem for p, _ in pairs] == ["lineA", "lineB"]
    img_rs, mask, strokes = load_pair(*pairs[0], height=128)
    w_rs = int(W0 * 128 / H0)
    assert img_rs.shape == (128, w_rs, 3)
    assert mask.shape == (128, w_rs)
    assert set(np.unique(mask)) <= {0, 1}
    # Strokes landed in the height-normalized frame, ink under them.
    for x, y in strokes:
        assert x.max() < w_rs + 1 and y.max() < 129
    ys = np.clip(np.round(strokes[0][1]).astype(int), 0, 127)
    xs = np.clip(np.round(strokes[0][0]).astype(int), 0, w_rs - 1)
    assert mask[ys, xs].mean() > 0.8  # polyline lies on the rasterized ink


def test_binarized_png_preferred(dataset):
    d, _ = dataset
    img_rs, mask, _ = load_pair(d / "lineB.png", d / "lineB_STROKES.json")
    m = np.asarray(Image.open(d / "lineB_BINARIZED.png"))
    assert np.array_equal(mask, m > 127)  # file mask used verbatim


def test_real_tile_batches_contract(dataset):
    d, _ = dataset
    rng = np.random.default_rng(0)
    tiles, masks = next(real_tile_batches(d, rng, batch_size=4))
    assert tiles.shape == (4, 128, 384, 3) and tiles.dtype == np.float32
    assert masks.shape == (4, 128, 384, 1) and masks.dtype == np.float32
    assert 0.0 <= tiles.min() and tiles.max() <= 1.0
    assert set(np.unique(masks)) <= {0.0, 1.0}
    # Across a few batches some tiles must contain ink.
    total = sum(next(real_tile_batches(d, rng, 4))[1].sum() for _ in range(3))
    assert total > 0


def test_glyph_samples_roundtrip(dataset):
    """Tokens built through the partition forward transform must decode and
    inverse-transform back onto the original strokes (quantization is the
    only loss: 1 px in the crop frame = 1/ratio px in the line frame)."""
    from stroke_derenderer_tpu.eval.metrics import stroke_coverage
    from stroke_derenderer_tpu.ops.strokes import tokens_to_strokes
    from stroke_derenderer_tpu.pipeline.strokes import compute_partitions

    d, _ = dataset
    cfg = StrokesConfig()
    png, sj = discover_pairs(d)[0]
    samples = glyph_samples_from_pair(png, sj, cfg, max_length=385)
    assert samples, "no glyph samples produced"
    _, mask, strokes = load_pair(png, sj)
    parts = compute_partitions(mask, cfg)
    assert len(samples) <= len(parts)
    recovered = []
    for pi, model_in, toks in samples:
        # Samples carry their partition index — the sample list legally
        # skips partitions (empty or over-budget), so positional zip
        # against ``parts`` would misalign the inverse transforms.
        part = parts[pi]
        assert model_in.shape == (224, 224, 3)
        assert toks.dtype == np.int32 and EOS in toks
        (x1, y1), r, (x2, y2) = (part["translate1"], part["ratio"],
                                 part["translate2"])
        for x, y in tokens_to_strokes(toks, cfg.image_size):
            recovered.append(((np.asarray(x) - x2) / r + x1,
                              (np.asarray(y) - y2) / r + y1))
    # Every GT polyline point is within ~3 px of a recovered stroke.
    cov = stroke_coverage(recovered, strokes, tol=3.0)
    assert cov > 0.95, f"roundtrip coverage {cov:.3f}"


def test_real_glyph_batches_contract(dataset):
    d, _ = dataset
    rng = np.random.default_rng(1)
    crops, tok_in, tok_out = next(real_glyph_batches(d, rng, batch_size=6,
                                                     seq_len=96))
    assert crops.shape == (6, 224, 224, 3)
    assert tok_in.shape == (6, 96) and tok_out.shape == (6, 96)
    # Teacher-forcing alignment: tok_in is tok_out shifted right behind BOS.
    from stroke_derenderer_tpu.config import BOS
    assert (tok_in[:, 0] == BOS).all()
    np.testing.assert_array_equal(tok_in[:, 1:], tok_out[:, :-1])
    assert (tok_out != PAD).any(axis=1).all()  # no empty targets
    # Every target must terminate: a glyph of exactly seq_len+1 tokens once
    # passed the skip guard and had its EOS sliced off (the early-EOS trap).
    from stroke_derenderer_tpu.config import EOS
    assert (tok_out == EOS).any(axis=1).all(), "EOS-less target row"


def test_real_glyph_batches_no_truncation(dataset):
    """A horizon too short for every glyph must raise, never truncate."""
    d, _ = dataset
    rng = np.random.default_rng(2)
    with pytest.raises(ValueError, match="horizon"):
        next(real_glyph_batches(d, rng, batch_size=2, seq_len=4))


def test_train_binarizer_on_real_data(dataset, tmp_path):
    """One real-data training step end-to-end (tiny UNet)."""
    from stroke_derenderer_tpu.train.loop import train_binarizer
    d, _ = dataset
    cfg = BinarizerConfig(features=(8,), bottleneck=16)
    train_binarizer(cfg, steps=2, batch_size=2, out_dir=tmp_path,
                    lr=1e-3, data_dir=d, ckpt_every=1000, log_every=1000)
    assert (tmp_path / "binarizer.msgpack").exists()


@pytest.mark.skipif(
    not (REPO / "models_demo" / "binarizer.msgpack").exists(),
    reason="models_demo weights not present")
def test_evaluate_real_smoke(dataset):
    from stroke_derenderer_tpu.eval.run import evaluate_real
    d, _ = dataset
    out = evaluate_real(REPO / "models_demo", d)
    assert out["n"] == 2
    assert 0.0 <= out["binarization_f1"] <= 1.0
    assert out["stroke_coverage"] is not None


def test_real_glyph_batches_raw_mode(dataset):
    """raw=True de-normalizes to uint8 such that re-normalizing recovers
    the float crops within 1 LSB (enables mixing with raw cached batches
    under one on-device-normalizing train step)."""
    d, _ = dataset
    from stroke_derenderer_tpu.config import StrokesConfig
    cfg = StrokesConfig()
    crops_f, ti_f, to_f = next(real_glyph_batches(
        d, np.random.default_rng(3), batch_size=4, seq_len=96, config=cfg))
    crops_u, ti_u, to_u = next(real_glyph_batches(
        d, np.random.default_rng(3), batch_size=4, seq_len=96, config=cfg,
        raw=True))
    assert crops_u.dtype == np.uint8
    assert crops_u.shape == crops_f.shape[:3]  # (B,S,S) gray, cache format
    np.testing.assert_array_equal(ti_f, ti_u)
    renorm = (crops_u.astype(np.float32) / 255.0 - cfg.mean[0]) / cfg.std[0]
    assert np.abs(renorm - crops_f[..., 0]).max() \
        < (1.0 / 255.0) / cfg.std[0] + 1e-5
