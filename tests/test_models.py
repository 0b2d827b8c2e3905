"""Model-level tests (tiny configs; CPU backend from conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stroke_derenderer_tpu.config import BOS, EOS, PAD
from stroke_derenderer_tpu.models import (
    AttentionUNet, AttentiveDecoder, ResNetEncoder, encode_postprocess,
    greedy_decode,
)


@pytest.fixture(scope="module")
def key():
    return jax.random.PRNGKey(0)


def test_unet_shapes_and_range(key):
    model = AttentionUNet(features=(8, 16), bottleneck=32, dtype=jnp.float32)
    v = model.init(key, jnp.zeros((1, 32, 96, 3)))
    out = model.apply(v, jax.random.uniform(key, (3, 32, 96, 3)))
    assert out.shape == (3, 32, 96, 1)
    assert out.dtype == jnp.float32
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_unet_jit_and_batch_invariance(key):
    model = AttentionUNet(features=(8, 16), bottleneck=32, dtype=jnp.float32)
    v = model.init(key, jnp.zeros((1, 32, 96, 3)))
    x = jax.random.uniform(key, (4, 32, 96, 3))
    f = jax.jit(model.apply)
    full = f(v, x)
    half = f(v, x[:2])
    np.testing.assert_allclose(np.asarray(full[:2]), np.asarray(half),
                               rtol=1e-5, atol=1e-5)


def test_encoder_out_features(key):
    for arch, c in [("tiny", 64), ("resnet18", 512), ("resnet50", 2048)]:
        assert ResNetEncoder(arch=arch).out_features == c
    enc = ResNetEncoder(arch="tiny", dtype=jnp.float32)
    v = enc.init(key, jnp.zeros((1, 224, 224, 3)))
    fm = enc.apply(v, jnp.zeros((2, 224, 224, 3)))
    assert fm.shape == (2, 7, 7, 64)


def test_encode_postprocess_duplicates_2x2():
    """Each 7x7 cell must appear at all four parities of its 2x2 patch
    (reference evaluate_strokes.py:77-91)."""
    fm = jnp.arange(2 * 7 * 7 * 3, dtype=jnp.float32).reshape(2, 7, 7, 3)
    seq = encode_postprocess(fm, 14)
    assert seq.shape == (2, 196, 3)
    grid = np.asarray(seq).reshape(2, 14, 14, 3)
    src = np.asarray(fm)
    for dy in (0, 1):
        for dx in (0, 1):
            assert np.array_equal(grid[:, dy::2, dx::2, :], src)


def _tiny_decoder(key, enc_dim=16, vocab=51):
    dec = AttentiveDecoder(vocab_size=vocab, embed_dim=8, attention_dim=8,
                           decoder_dim=8, encoder_dim=enc_dim,
                           dtype=jnp.float32)
    v = dec.init(key, jnp.zeros((1, 9, enc_dim)), jnp.zeros((1, 3), jnp.int32))
    return dec, v


def test_greedy_decode_matches_manual_loop(key):
    """The masked while_loop decode must equal a step-by-step host loop with
    the reference's shrinking-batch write semantics."""
    dec, v = _tiny_decoder(key)
    enc = jax.random.normal(key, (3, 9, 16))
    max_len = 12
    preds = np.asarray(greedy_decode(dec, v, enc, max_len))

    # Manual oracle: replicate the reference host loop semantics
    # (evaluate_strokes.py:274-302) with full-batch masking.
    apply = lambda m, *a: dec.apply(v, *a, method=m)
    enc_proj = apply(AttentiveDecoder.project_encoding, enc)
    h, c = apply(AttentiveDecoder.init_state, enc)
    emb = apply(AttentiveDecoder.embed, jnp.full((3,), BOS, jnp.int32))
    active = np.ones(3, bool)
    expect = np.full((3, max_len), PAD, np.int32)
    for t in range(max_len):
        if not active.any():
            break
        logits, h2, c2, _ = apply(AttentiveDecoder.step, enc, enc_proj, emb, h, c)
        toks = np.asarray(jnp.argmax(logits, axis=-1)).astype(np.int32)
        for i in range(3):
            if active[i]:
                expect[i, t] = toks[i]
        new_active = active & (toks != EOS)
        emb2 = apply(AttentiveDecoder.embed, jnp.asarray(toks))
        keep = jnp.asarray(active)[:, None]
        h = jnp.where(keep, h2, h)
        c = jnp.where(keep, c2, c)
        emb = jnp.where(keep, emb2, emb)
        active = new_active
    assert np.array_equal(preds, expect)


def test_greedy_decode_retired_rows_stay_pad(key):
    dec, v = _tiny_decoder(key)
    enc = jax.random.normal(key, (2, 9, 16))
    preds = np.asarray(greedy_decode(dec, v, enc, 30))
    for row in preds:
        eos_pos = np.flatnonzero(row == EOS)
        if eos_pos.size:
            assert (row[eos_pos[0] + 1:] == PAD).all()


def test_teacher_forced_matches_stepwise(key):
    """__call__ (nn.scan) must equal repeated step() with the same params."""
    dec, v = _tiny_decoder(key)
    enc = jax.random.normal(key, (2, 9, 16))
    toks = jnp.array([[1, 5, 9, 2], [1, 7, 3, 2]], jnp.int32)
    logits = dec.apply(v, enc, toks)

    apply = lambda m, *a: dec.apply(v, *a, method=m)
    enc_proj = apply(AttentiveDecoder.project_encoding, enc)
    h, c = apply(AttentiveDecoder.init_state, enc)
    outs = []
    embs = apply(AttentiveDecoder.embed, toks)
    for t in range(4):
        lt, h, c, _ = apply(AttentiveDecoder.step, enc, enc_proj, embs[:, t], h, c)
        outs.append(np.asarray(lt))
    np.testing.assert_allclose(np.asarray(logits),
                               np.stack(outs, axis=1), rtol=1e-5, atol=1e-5)
