"""CLI end-to-end tests (tiny models, CPU backend)."""

import json

import numpy as np
import pytest
from PIL import Image

from stroke_derenderer_tpu.cli import entrypoint
from stroke_derenderer_tpu.config import BinarizerConfig, StrokesConfig
from stroke_derenderer_tpu.weights import materialize_model_dir

TINY_BIN = BinarizerConfig(features=(8, 16), bottleneck=32,
                           compute_dtype="float32")
TINY_SE = StrokesConfig(encoder_arch="tiny", embed_dim=16, attention_dim=16,
                        decoder_dim=16, max_length=16,
                        compute_dtype="float32")


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("models")
    materialize_model_dir(d, TINY_BIN, TINY_SE)
    return d


@pytest.fixture(scope="module")
def input_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("inputs")
    rng = np.random.default_rng(0)
    for name, w in [("a", 700), ("b", 300)]:
        img = np.full((150, w, 3), 255, np.uint8)
        t = np.linspace(0, 6, 200)
        xs = np.clip((w * (0.1 + 0.8 * t / 6))).astype(int) if False else \
            np.clip((w * 0.1 + w * 0.13 * t), 0, w - 1).astype(int)
        ys = np.clip(75 + 40 * np.sin(t * 2), 0, 149).astype(int)
        img[ys, xs] = 0
        img[np.clip(ys + 1, 0, 149), xs] = 0
        Image.fromarray(img).save(d / f"{name}.png")
    return d


def _check_outputs(out, names):
    for n in names:
        b = np.asarray(Image.open(out / f"{n}_BINARIZED.png"))
        assert b.shape[0] == 128
        assert set(np.unique(b)) <= {0, 255}
        sj = json.loads((out / f"{n}_STROKES.json").read_text())
        assert isinstance(sj, list)
        for stroke in sj:
            assert len(stroke) == 2 and len(stroke[0]) == len(stroke[1])


def test_cli_per_image(model_dir, input_dir, tmp_path, capsys):
    rc = entrypoint(["-models", str(model_dir), "-input", str(input_dir),
                     "--output", str(tmp_path)])
    assert rc == 0
    _check_outputs(tmp_path, ["a", "b"])
    outtext = capsys.readouterr().out
    assert "seconds to binarize" in outtext
    assert "seconds to estimate strokes" in outtext


def test_cli_batched_matches_per_image(model_dir, input_dir, tmp_path):
    out1 = tmp_path / "per"
    out2 = tmp_path / "bat"
    entrypoint(["-models", str(model_dir), "-input", str(input_dir),
                "--output", str(out1)])
    entrypoint(["-models", str(model_dir), "-input", str(input_dir),
                "--output", str(out2), "--batch"])
    for n in ["a", "b"]:
        b1 = np.asarray(Image.open(out1 / f"{n}_BINARIZED.png"))
        b2 = np.asarray(Image.open(out2 / f"{n}_BINARIZED.png"))
        assert np.array_equal(b1, b2)
        s1 = json.loads((out1 / f"{n}_STROKES.json").read_text())
        s2 = json.loads((out2 / f"{n}_STROKES.json").read_text())
        assert s1 == s2


def test_cli_no_strokes(model_dir, input_dir, tmp_path):
    rc = entrypoint(["-models", str(model_dir), "-input", str(input_dir),
                     "--output", str(tmp_path), "--no-strokes"])
    assert rc == 0
    assert (tmp_path / "a_BINARIZED.png").exists()
    assert not (tmp_path / "a_STROKES.json").exists()


@pytest.mark.slow  # full-size random-init of both models: ~50 s of compile
def test_cli_init_models(tmp_path):
    rc = entrypoint(["--init-models", str(tmp_path / "m")])
    assert rc == 0
    names = {p.name for p in (tmp_path / "m").iterdir()}
    assert {"binarizer.msgpack", "configs_binarizer.json",
            "strokes_encoder.msgpack", "strokes_decoder.msgpack",
            "configs_strokes.json"} <= names


def test_config_precedence(tmp_path):
    """JSON overrides kwargs overrides defaults (reference
    evaluate_binarize.py:30-45 precedence)."""
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"overlap": 32}))
    cfg = BinarizerConfig.from_json(p, overlap=48, bin_thr=0.7)
    assert cfg.overlap == 32        # json wins
    assert cfg.bin_thr == 0.7       # kwarg beats default
    assert cfg.height == 128        # default survives


def test_cli_two_stage(model_dir, input_dir, tmp_path, capsys):
    """--two-stage: pipeline-parallel overlap, same outputs as per-image."""
    seq = tmp_path / "seq"
    two = tmp_path / "two"
    assert entrypoint(["-models", str(model_dir), "-input", str(input_dir),
                       "--output", str(seq)]) == 0
    assert entrypoint(["-models", str(model_dir), "-input", str(input_dir),
                       "--output", str(two), "--two-stage", "1"]) == 0
    _check_outputs(two, ["a", "b"])
    for n in ("a", "b"):
        a = np.asarray(Image.open(seq / f"{n}_BINARIZED.png"))
        b = np.asarray(Image.open(two / f"{n}_BINARIZED.png"))
        assert np.array_equal(a, b)
        sa = json.loads((seq / f"{n}_STROKES.json").read_text())
        sb = json.loads((two / f"{n}_STROKES.json").read_text())
        assert sa == sb
    assert "two-stage amortized" in capsys.readouterr().out


def test_cli_preset_real(model_dir, input_dir, tmp_path, monkeypatch):
    """--preset real turns on the calibrated residual re-decode; explicit
    --redecode still wins over the preset."""
    import stroke_derenderer_tpu.cli as cli
    seen = {}
    orig = cli.initialize_sessions

    def spy(folderpath, **kw):
        seen.update(kw.get("se_overrides") or {})
        return orig(folderpath, **kw)

    monkeypatch.setattr(cli, "initialize_sessions", spy)
    rc = entrypoint(["-models", str(model_dir), "-input", str(input_dir),
                     "--output", str(tmp_path), "--preset", "real"])
    assert rc == 0
    assert seen["redecode_coverage"] == 0.9
    _check_outputs(tmp_path, ["a", "b"])

    seen.clear()
    rc = entrypoint(["-models", str(model_dir), "-input", str(input_dir),
                     "--output", str(tmp_path), "--preset", "real",
                     "--redecode", "0.5"])
    assert rc == 0
    assert seen["redecode_coverage"] == 0.5
