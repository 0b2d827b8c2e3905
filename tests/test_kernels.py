"""Pallas kernel tests (interpret mode on the CPU backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stroke_derenderer_tpu.kernels import (
    fused_attention_gate, fused_attention_gate_reference,
)
from stroke_derenderer_tpu.models import AttentiveDecoder, greedy_decode


def _args(rng, b=5, p=19, e=64, a=32, d=24):
    f = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.1)
    return (f(b, p, e), f(b, p, a), f(b, d), f(d, a), f(a), f(a),
            jnp.float32(0.2), f(d, e), f(e))


@pytest.mark.parametrize("seed", range(3))
def test_kernel_matches_reference_interpret(seed):
    rng = np.random.default_rng(seed)
    args = _args(rng)
    out_ref, al_ref = fused_attention_gate_reference(*args)
    out_k, al_k = fused_attention_gate(*args, interpret=True)
    # The kernel streams bf16 (f32 accumulation): ~3 decimal digits.
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_ref),
                               rtol=2e-2, atol=5e-4)
    np.testing.assert_allclose(np.asarray(al_k), np.asarray(al_ref),
                               rtol=2e-2, atol=1e-3)


def test_kernel_odd_batch_and_positions():
    rng = np.random.default_rng(7)
    args = _args(rng, b=3, p=7)  # forces both paddings
    out_ref, al_ref = fused_attention_gate_reference(*args)
    out_k, al_k = fused_attention_gate(*args, interpret=True)
    assert out_k.shape == out_ref.shape and al_k.shape == al_ref.shape
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_ref),
                               rtol=2e-2, atol=5e-4)


def test_alpha_is_distribution():
    rng = np.random.default_rng(1)
    _, al = fused_attention_gate(*_args(rng), interpret=True)
    s = np.asarray(al).sum(axis=1)
    np.testing.assert_allclose(s, np.ones_like(s), rtol=1e-5)


def test_fused_greedy_decode_matches_unfused():
    """On an f32 model, the fused (reference-math fallback on CPU) and
    unfused decode paths must emit identical tokens."""
    dec = AttentiveDecoder(vocab_size=51, embed_dim=8, attention_dim=8,
                           decoder_dim=8, encoder_dim=16, dtype=jnp.float32)
    v = dec.init(jax.random.PRNGKey(0), jnp.zeros((1, 9, 16)),
                 jnp.zeros((1, 3), jnp.int32))
    enc = jax.random.normal(jax.random.PRNGKey(2), (4, 9, 16))
    a = np.asarray(greedy_decode(dec, v, enc, 16, fused=False))
    b = np.asarray(greedy_decode(dec, v, enc, 16, fused=True))
    assert np.array_equal(a, b)


# ---------------------------------------------------------------------------
# Fully-fused decode kernel (kernels/fused_decode.py, interpret mode)

def _tiny_decoder(vocab=31, e=12, h=8, seed=0):
    dec = AttentiveDecoder(vocab_size=vocab, embed_dim=8, attention_dim=8,
                           decoder_dim=h, encoder_dim=e, dtype=jnp.float32)
    v = dec.init(jax.random.PRNGKey(seed), jnp.zeros((1, 9, e)),
                 jnp.zeros((1, 3), jnp.int32))
    return dec, v


def test_fused_decode_kernel_matches_greedy():
    from stroke_derenderer_tpu.kernels import fused_greedy_decode
    dec, v = _tiny_decoder()
    enc = jax.random.normal(jax.random.PRNGKey(1), (5, 9, 12))
    g = np.asarray(greedy_decode(dec, v, enc, 14))
    f = np.asarray(fused_greedy_decode(dec, v, enc, 14, block_b=4,
                                       interpret=True))
    assert np.array_equal(g, f)


def test_fused_decode_kernel_block_padding():
    """B not a multiple of block_b: padded rows must not perturb real ones."""
    from stroke_derenderer_tpu.kernels import fused_greedy_decode
    dec, v = _tiny_decoder(seed=3)
    enc = jax.random.normal(jax.random.PRNGKey(4), (3, 9, 12))
    g = np.asarray(greedy_decode(dec, v, enc, 10))
    f = np.asarray(fused_greedy_decode(dec, v, enc, 10, block_b=8,
                                       interpret=True))
    assert np.array_equal(g, f)


def test_fused_decode_kernel_eos_retirement():
    """Rows that emit EOS must freeze to PAD afterwards (reference write
    semantics, evaluate_strokes.py:274-302)."""
    from stroke_derenderer_tpu.config import EOS, PAD
    from stroke_derenderer_tpu.kernels import fused_greedy_decode
    # Search seeds for a case where some row emits EOS mid-sequence.
    for seed in range(12):
        dec, v = _tiny_decoder(vocab=7, seed=seed)
        enc = jax.random.normal(jax.random.PRNGKey(seed + 100), (6, 9, 12))
        f = np.asarray(fused_greedy_decode(dec, v, enc, 12, block_b=4,
                                           interpret=True))
        g = np.asarray(greedy_decode(dec, v, enc, 12))
        assert np.array_equal(g, f)
        for row in f:
            hits = np.nonzero(row == EOS)[0]
            if hits.size:
                assert np.all(row[hits[0] + 1:] == PAD)
                return  # found and verified an EOS case
    raise AssertionError("no EOS case found across seeds")


def test_fused_decode_sharded_matches_greedy():
    """VERDICT r2 item 5: the fused kernel shard_mapped over a dp mesh must
    emit identical tokens to the single-device XLA greedy loop (each dp
    group decodes its local rows; weights replicated)."""
    from stroke_derenderer_tpu.kernels import fused_greedy_decode_sharded
    from stroke_derenderer_tpu.parallel import batch_sharding, make_mesh

    dec, v = _tiny_decoder()
    enc = jax.random.normal(jax.random.PRNGKey(6), (8, 9, 12))
    g = np.asarray(greedy_decode(dec, v, enc, 14))
    for n_dev, tp in [(8, 1), (8, 2), (4, 1)]:
        mesh = make_mesh(n_dev, dp=n_dev // tp, tp=tp)
        enc_sh = jax.device_put(enc, batch_sharding(mesh, 3))
        f = np.asarray(fused_greedy_decode_sharded(
            dec, v, enc_sh, 14, mesh, block_b=4, interpret=True))
        assert np.array_equal(g, f), (n_dev, tp)


def test_fused_decode_sharded_rejects_indivisible_batch():
    from stroke_derenderer_tpu.kernels import fused_greedy_decode_sharded
    from stroke_derenderer_tpu.parallel import make_mesh

    dec, v = _tiny_decoder()
    enc = jax.random.normal(jax.random.PRNGKey(7), (5, 9, 12))
    with pytest.raises(ValueError, match="not divisible"):
        fused_greedy_decode_sharded(dec, v, enc, 10, make_mesh(8),
                                    interpret=True)


def test_fused_beam_sharded_matches_xla():
    from stroke_derenderer_tpu.kernels import fused_beam_decode_sharded
    from stroke_derenderer_tpu.models import beam_decode
    from stroke_derenderer_tpu.parallel import make_mesh

    dec, v = _tiny_decoder()
    enc = jax.random.normal(jax.random.PRNGKey(8), (8, 9, 12))
    mesh = make_mesh(8)
    a = np.asarray(beam_decode(dec, v, enc, 12, beam_size=3,
                               length_penalty=0.7))
    b = np.asarray(fused_beam_decode_sharded(
        dec, v, enc, 12, mesh, beam_size=3, length_penalty=0.7,
        interpret=True))
    assert np.array_equal(a, b)


def test_fused_beam_kernel_matches_xla():
    """The fully-fused beam kernel must emit byte-identical best beams to
    models.beam_decode across beam sizes and length penalties."""
    from stroke_derenderer_tpu.kernels import fused_beam_decode
    from stroke_derenderer_tpu.models import beam_decode
    dec, v = _tiny_decoder()
    enc = jax.random.normal(jax.random.PRNGKey(5), (4, 9, 12))
    for bs, lp in [(1, 0.0), (3, 0.0), (5, 0.7)]:
        a = np.asarray(beam_decode(dec, v, enc, 12, beam_size=bs,
                                   length_penalty=lp))
        b = np.asarray(fused_beam_decode(dec, v, enc, 12, beam_size=bs,
                                         length_penalty=lp, interpret=True))
        assert np.array_equal(a, b), (bs, lp)



