"""Beam-search decoder tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stroke_derenderer_tpu.config import EOS, PAD
from stroke_derenderer_tpu.models import AttentiveDecoder, beam_decode, greedy_decode


@pytest.fixture(scope="module")
def dec_and_vars():
    dec = AttentiveDecoder(vocab_size=31, embed_dim=8, attention_dim=8,
                           decoder_dim=8, encoder_dim=12, dtype=jnp.float32)
    v = dec.init(jax.random.PRNGKey(0), jnp.zeros((1, 9, 12)),
                 jnp.zeros((1, 3), jnp.int32))
    return dec, v


def _score_sequence(dec, v, enc_row, tokens):
    """Sum of log-probs of ``tokens`` under teacher forcing from BOS."""
    from stroke_derenderer_tpu.config import BOS
    toks = [t for t in tokens if t != PAD]
    apply = lambda m, *a: dec.apply(v, *a, method=m)
    enc = enc_row[None]
    enc_proj = apply(AttentiveDecoder.project_encoding, enc)
    h, c = apply(AttentiveDecoder.init_state, enc)
    emb = apply(AttentiveDecoder.embed, jnp.array([BOS], jnp.int32))
    total = 0.0
    for t in toks:
        logits, h, c, _ = apply(AttentiveDecoder.step, enc, enc_proj, emb, h, c)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        total += float(lp[0, t])
        emb = apply(AttentiveDecoder.embed, jnp.array([t], jnp.int32))
    return total


def test_beam1_equals_greedy(dec_and_vars):
    dec, v = dec_and_vars
    enc = jax.random.normal(jax.random.PRNGKey(1), (3, 9, 12))
    g = np.asarray(greedy_decode(dec, v, enc, 14))
    b = np.asarray(beam_decode(dec, v, enc, 14, beam_size=1))
    assert np.array_equal(g, b)


def test_beam_score_at_least_greedy(dec_and_vars):
    """The winning beam's sequence log-prob must be >= the greedy one."""
    dec, v = dec_and_vars
    enc = jax.random.normal(jax.random.PRNGKey(2), (2, 9, 12))
    g = np.asarray(greedy_decode(dec, v, enc, 10))
    b = np.asarray(beam_decode(dec, v, enc, 10, beam_size=4))
    for i in range(enc.shape[0]):
        sg = _score_sequence(dec, v, enc[i], g[i].tolist())
        sb = _score_sequence(dec, v, enc[i], b[i].tolist())
        assert sb >= sg - 1e-4


def test_length_penalty_rerank(dec_and_vars):
    """GNMT length normalization must be able to re-rank the final beams,
    and when a large penalty flips the winner it must pick a sequence at
    least as long (score/((5+len)/6)**p pulls negative log-probs toward 0
    for longer beams)."""
    dec, v = dec_and_vars
    for seed in range(60):
        enc = jax.random.normal(jax.random.PRNGKey(100 + seed), (1, 9, 12))
        plain = np.asarray(beam_decode(dec, v, enc, 16, beam_size=5))
        pen = np.asarray(beam_decode(dec, v, enc, 16, beam_size=5,
                                     length_penalty=5.0))
        if not np.array_equal(plain, pen):
            assert (pen[0] != PAD).sum() >= (plain[0] != PAD).sum()
            return
    raise AssertionError("length_penalty never changed beam selection")


def test_beam_pad_after_eos(dec_and_vars):
    dec, v = dec_and_vars
    enc = jax.random.normal(jax.random.PRNGKey(3), (2, 9, 12))
    preds = np.asarray(beam_decode(dec, v, enc, 20, beam_size=3))
    for row in preds:
        eos_pos = np.flatnonzero(row == EOS)
        if eos_pos.size:
            assert (row[eos_pos[0] + 1:] == PAD).all()
