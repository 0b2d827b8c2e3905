"""Glyph-cache training data (data/cache.py): build/load round trip and
exact model-input reconstruction through the pipeline's normalize chain."""

import json

import numpy as np

from stroke_derenderer_tpu.config import BOS, StrokesConfig
from stroke_derenderer_tpu.data.cache import (
    build_glyph_cache, cached_glyph_batches, load_glyph_cache,
)
from stroke_derenderer_tpu.data.synthetic import make_partitioned_glyph_sample


def test_build_load_roundtrip(tmp_path):
    out = build_glyph_cache(tmp_path / "c", n=6, seq_len=32, style="mixed",
                            seed=3)
    crops, toks = load_glyph_cache(out)
    assert crops.shape == (6, 224, 224) and crops.dtype == np.uint8
    assert toks.shape == (6, 33) and toks.dtype == np.int16
    meta = json.loads((out / "meta.json").read_text())
    assert meta["n"] == 6 and meta["seq_len"] == 32


def test_cached_batch_matches_live_sample(tmp_path):
    """A cached sample's reconstructed model input must equal the live
    generator's image_input bit-for-bit (same normalize chain)."""
    rng = np.random.default_rng(7)
    model_in, crop_u8, toks = make_partitioned_glyph_sample(rng, 33,
                                                            style="mixed")
    d = tmp_path / "c"
    d.mkdir()
    np.savez_compressed(d / "glyphs_00000.npz",
                        crops=crop_u8[None],
                        tokens=toks[None].astype(np.int16))
    batch, tok_in, tok_out = next(cached_glyph_batches(
        d, np.random.default_rng(0), batch_size=2, seq_len=32))
    assert batch.shape == (2, 224, 224, 3)
    np.testing.assert_array_equal(batch[0], model_in)
    # Teacher-forcing contract: tok_in = [BOS, t[:T-1]], tok_out = t[:T].
    assert tok_in[0, 0] == BOS
    np.testing.assert_array_equal(tok_in[0, 1:], toks[:31])
    np.testing.assert_array_equal(tok_out[0], toks[:32])


def test_short_cache_rejected(tmp_path):
    out = build_glyph_cache(tmp_path / "c", n=2, seq_len=16)
    import pytest
    with pytest.raises(ValueError, match="rebuild with --seq-len"):
        next(cached_glyph_batches(out, np.random.default_rng(0), 1,
                                  seq_len=64))


def test_raw_batches_and_device_normalize_match_host_chain(tmp_path):
    """raw=True + the step's on-device normalize must reproduce the host
    normalize chain (imagenet(minmax(crop))) to f32 rounding."""
    import jax.numpy as jnp

    from stroke_derenderer_tpu.ops.normalize import (
        imagenet_normalize_np, minmax_normalize_np,
    )

    out = build_glyph_cache(tmp_path / "c", n=4, seq_len=32, style="mixed",
                            seed=5)
    rng = np.random.default_rng(1)
    raw_batch, ti_r, to_r = next(cached_glyph_batches(
        out, np.random.default_rng(1), batch_size=4, seq_len=32, raw=True))
    host_batch, ti_h, to_h = next(cached_glyph_batches(
        out, np.random.default_rng(1), batch_size=4, seq_len=32))
    assert raw_batch.dtype == np.uint8 and raw_batch.shape == (4, 224, 224)
    np.testing.assert_array_equal(ti_r, ti_h)
    np.testing.assert_array_equal(to_r, to_h)

    from stroke_derenderer_tpu.train.steps import device_normalize_u8

    cfg = StrokesConfig()
    dev = np.asarray(device_normalize_u8(jnp.asarray(raw_batch),
                                         cfg.mean, cfg.std))
    np.testing.assert_allclose(dev, host_batch, atol=2e-6)


def test_cache_regen_deterministic(tmp_path):
    """The training caches are regenerable, NOT committed (~415 MB of npz;
    VERDICT r3 item 6): scripts/make_glyph_caches.py rebuilds them from the
    pinned seeds. This pins the generator's determinism — a fixed-seed
    micro-cache must reproduce this exact digest, so the full 48k-sample
    rebuild reproduces the round-3 training data byte-for-byte."""
    import hashlib
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "make_glyph_caches",
        Path(__file__).parent.parent / "scripts" / "make_glyph_caches.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    out = build_glyph_cache(tmp_path / "cache_mixed", n=4, seq_len=384,
                            style=mod.CACHES[0][1], seed=mod.CACHES[0][2])
    crops, toks = load_glyph_cache(out)
    h = hashlib.sha256()
    h.update(crops.tobytes())
    h.update(np.ascontiguousarray(toks).tobytes())
    assert h.hexdigest() == ("f981f3698b4f8eedae2bf0995edd4b9e"
                             "080992916166a9b6b7dd5eec43ab2a2a")

    # The union dir: part k's shard i appears as glyphs_<k*100000+i>.npz.
    mod.link_union(tmp_path / "cache_all", [out])
    union_crops, union_toks = load_glyph_cache(tmp_path / "cache_all")
    np.testing.assert_array_equal(union_crops, crops)
    np.testing.assert_array_equal(union_toks, toks)
