"""Attentive autoregressive LSTM stroke decoder.

The reference splits a show-attend-tell-style decoder across four ONNX
graphs driven by a host loop — ``decoder_init_hc`` (mean-pooled encoding ->
initial LSTM state), ``decoder_embedding`` (token -> embedding),
``decoder_iter`` (one additive-attention + LSTM + vocab-projection step),
re-invoked per token with host-side shrinking-batch index bookkeeping
(evaluate_strokes.py:250-302; up to 768 ONNX calls per image).

Here the decoder is one flax module and greedy decoding is ONE device-side
``lax.while_loop``:

  * the encoder-side attention projection is computed once before the loop
    (the reference recomputes it inside every decoder_iter call);
  * finished rows are masked rather than compacted — identical outputs,
    since retired rows keep emitting PAD which the grammar skips
    (evaluate_strokes.py:117-118, SURVEY.md §7 hard parts);
  * the loop exits early once every row has emitted EOS, like the
    reference's ``inds_inc.size == 0`` break (evaluate_strokes.py:296-297).

Step math (show-attend-tell): additive attention
``softmax(full_att(relu(enc_proj + dec_proj(h))))`` over the 196 encoder
positions, a sigmoid gate ``f_beta(h)`` on the attended vector, an LSTM cell
over [embedding; attended], and a linear vocab head on h.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from stroke_derenderer_tpu.config import BOS, EOS, PAD


class AttentiveDecoder(nn.Module):
    vocab_size: int = 451
    embed_dim: int = 512
    attention_dim: int = 512
    decoder_dim: int = 512
    encoder_dim: int = 2048  # feature dim of the encoder sequence fed in
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.embedding = nn.Embed(self.vocab_size, self.embed_dim,
                                  dtype=self.dtype, name="embedding")
        self.enc_att = nn.Dense(self.attention_dim, dtype=self.dtype, name="enc_att")
        self.dec_att = nn.Dense(self.attention_dim, dtype=self.dtype, name="dec_att")
        self.full_att = nn.Dense(1, dtype=self.dtype, name="full_att")
        self.init_h = nn.Dense(self.decoder_dim, dtype=self.dtype, name="init_h")
        self.init_c = nn.Dense(self.decoder_dim, dtype=self.dtype, name="init_c")
        self.f_beta = nn.Dense(self.encoder_dim, dtype=self.dtype, name="f_beta")
        self.lstm = nn.LSTMCell(self.decoder_dim, dtype=self.dtype, name="lstm")
        self.fc = nn.Dense(self.vocab_size, dtype=jnp.float32, name="fc")

    def project_encoding(self, enc_seq):
        """(B, P, E) -> (B, P, A): hoisted out of the decode loop."""
        return self.enc_att(enc_seq)

    def init_state(self, enc_seq):
        """Initial (h, c) from the mean-pooled encoding
        (reference decoder_init_hc, evaluate_strokes.py:265-266)."""
        mean_enc = jnp.mean(enc_seq, axis=1)
        return self.init_h(mean_enc), self.init_c(mean_enc)

    def embed(self, tokens):
        return self.embedding(tokens)

    def step(self, enc_seq, enc_proj, emb, h, c):
        """One decode step -> (logits_f32, h, c, alpha)."""
        att = self.full_att(nn.relu(enc_proj + self.dec_att(h)[:, None, :]))
        alpha = jax.nn.softmax(att.astype(jnp.float32), axis=1)
        awe = jnp.sum(alpha * enc_seq.astype(jnp.float32), axis=1)
        gate = nn.sigmoid(self.f_beta(h))
        awe = (gate.astype(jnp.float32) * awe).astype(self.dtype)
        return self.step_with_awe(emb, awe, h, c) + (alpha[..., 0],)

    def step_with_awe(self, emb, awe, h, c):
        """LSTM + vocab head once the attended vector is known (the
        attention half can come from the fused Pallas kernel)."""
        awe = awe.astype(self.dtype)
        (c, h), _ = self.lstm((c, h), jnp.concatenate([emb, awe], axis=-1))
        logits = self.fc(h.astype(jnp.float32))
        return logits, h, c

    def __call__(self, enc_seq, tokens):
        """Teacher-forced training forward: (B, P, E), (B, T) int tokens ->
        (B, T, vocab) logits. Uses lax.scan over time with the same cell as
        greedy decode."""
        enc_proj = self.project_encoding(enc_seq)
        h, c = self.init_state(enc_seq)
        embs = self.embedding(tokens)  # (B, T, D)

        def body(mdl, carry, emb_t):
            h, c = carry
            logits, h, c, _ = mdl.step(enc_seq, enc_proj, emb_t, h, c)
            return (h, c), logits

        scan = nn.scan(body, variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=0, out_axes=0)
        (_, _), logits = scan(self, (h, c), jnp.swapaxes(embs, 0, 1))
        return jnp.swapaxes(logits, 0, 1)


def greedy_decode(decoder: AttentiveDecoder, variables, enc_seq,
                  max_length: int, fused: bool = False) -> jnp.ndarray:
    """Batched greedy decode as one on-device while_loop.

    enc_seq: (B, P, E) float. Returns (B, max_length) int32 predictions with
    the reference's exact write semantics: at step t every still-active row
    records its argmax token (including the terminating EOS); retired rows
    stay PAD (evaluate_strokes.py:274-302).

    ``fused=True`` routes the attention+gate half of each step through the
    Pallas kernel (kernels/decode_attention.py) — one VMEM pass over the
    encoder sequence per step instead of XLA's two.
    """
    b = enc_seq.shape[0]
    apply = lambda method, *a: decoder.apply(variables, *a, method=method)

    enc_proj = apply(AttentiveDecoder.project_encoding, enc_seq)
    h, c = apply(AttentiveDecoder.init_state, enc_seq)
    emb = apply(AttentiveDecoder.embed, jnp.full((b,), BOS, jnp.int32))
    preds0 = jnp.full((b, max_length), PAD, jnp.int32)
    active0 = jnp.ones((b,), bool)

    if fused:
        from stroke_derenderer_tpu.kernels import fused_attention_gate
        p = variables["params"]

        def fused_step(emb, h, c):
            awe, _ = fused_attention_gate(
                enc_seq, enc_proj, h,
                p["dec_att"]["kernel"], p["dec_att"]["bias"],
                p["full_att"]["kernel"][:, 0], p["full_att"]["bias"][0],
                p["f_beta"]["kernel"], p["f_beta"]["bias"])
            logits, h, c = apply(AttentiveDecoder.step_with_awe, emb, awe, h, c)
            return logits, h, c

    def cond(state):
        t, _, _, _, _, active = state
        return jnp.logical_and(t < max_length, jnp.any(active))

    def body(state):
        t, preds, emb, h, c, active = state
        if fused:
            logits, h2, c2 = fused_step(emb, h, c)
        else:
            logits, h2, c2, _ = apply(AttentiveDecoder.step, enc_seq, enc_proj, emb, h, c)
        tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        preds = preds.at[:, t].set(jnp.where(active, tokens, PAD))
        next_active = jnp.logical_and(active, tokens != EOS)
        emb2 = apply(AttentiveDecoder.embed, tokens)
        # Frozen rows keep their old state; their outputs are masked anyway,
        # but keeping state bit-stable makes the loop insensitive to retired
        # rows' trajectories.
        keep = active[:, None]
        h = jnp.where(keep, h2, h)
        c = jnp.where(keep, c2, c)
        emb = jnp.where(keep, emb2, emb)
        return t + 1, preds, emb, h, c, next_active

    _, preds, *_ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), preds0, emb, h, c, active0))
    return preds


def beam_decode(decoder: AttentiveDecoder, variables, enc_seq,
                max_length: int, beam_size: int = 5,
                length_penalty: float = 0.0) -> jnp.ndarray:
    """Batched beam-search decode (a capability the reference lacks — it is
    greedy-only, evaluate_strokes.py:289).

    enc_seq: (B, P, E). Returns (B, max_length) int32: the highest-scoring
    beam per image, with the same PAD-after-EOS write convention as
    :func:`greedy_decode`. ``length_penalty`` > 0 applies GNMT-style
    normalization score / ((5+len)/6)**penalty when ranking final beams.
    """
    b, p_len, e = enc_seq.shape
    k = beam_size
    apply = lambda method, *a: decoder.apply(variables, *a, method=method)
    vocab = decoder.vocab_size
    neg_inf = jnp.float32(-1e30)

    # Expand every per-image tensor to (B*K, ...).
    def tile_rows(x):
        return jnp.repeat(x, k, axis=0)

    enc = tile_rows(enc_seq)                      # (B*K, P, E)
    enc_proj = apply(AttentiveDecoder.project_encoding, enc)
    h, c = apply(AttentiveDecoder.init_state, enc)
    emb = apply(AttentiveDecoder.embed, jnp.full((b * k,), BOS, jnp.int32))

    preds0 = jnp.full((b, k, max_length), PAD, jnp.int32)
    # Only beam 0 is live initially so the first step picks K distinct tokens.
    logp0 = jnp.tile(jnp.where(jnp.arange(k) == 0, 0.0, neg_inf)[None, :],
                     (b, 1))
    fin0 = jnp.zeros((b, k), bool)
    lens0 = jnp.zeros((b, k), jnp.int32)

    def cond(state):
        t, _, _, _, _, _, fin, _ = state
        return jnp.logical_and(t < max_length, ~jnp.all(fin))

    def body(state):
        t, preds, emb, h, c, logp, fin, lens = state
        logits, h2, c2, _ = apply(AttentiveDecoder.step, enc, enc_proj,
                                  emb, h, c)
        logprob = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        logprob = logprob.reshape(b, k, vocab)
        # Finished beams may only extend with PAD at no cost; everything
        # else is forbidden (keeps their score frozen and their row inert).
        pad_only = jnp.where(jnp.arange(vocab)[None, None, :] == PAD,
                             0.0, neg_inf)
        logprob = jnp.where(fin[:, :, None], pad_only, logprob)

        total = logp[:, :, None] + logprob                 # (B, K, V)
        top_val, top_idx = jax.lax.top_k(total.reshape(b, k * vocab), k)
        parent = top_idx // vocab                          # (B, K)
        token = (top_idx % vocab).astype(jnp.int32)        # (B, K)

        def gather_rows(x):
            x = x.reshape(b, k, *x.shape[1:])
            return jnp.take_along_axis(
                x, parent.reshape(b, k, *([1] * (x.ndim - 2))), axis=1
            ).reshape(b * k, *x.shape[2:])

        h = gather_rows(h2)
        c = gather_rows(c2)
        preds = jnp.take_along_axis(preds, parent[:, :, None], axis=1)
        fin_parent = jnp.take_along_axis(fin, parent, axis=1)
        lens = jnp.take_along_axis(lens, parent, axis=1)
        # Reference write semantics: active beams record the token
        # (including a terminating EOS); finished beams stay PAD.
        write = jnp.where(fin_parent, PAD, token)
        preds = preds.at[:, :, t].set(write)
        lens = jnp.where(fin_parent, lens, lens + 1)
        fin = fin_parent | (token == EOS)
        emb = apply(AttentiveDecoder.embed, token.reshape(b * k))
        return t + 1, preds, emb, h, c, top_val, fin, lens

    _, preds, _, _, _, logp, _, lens = jax.lax.while_loop(
        cond, body, (jnp.int32(0), preds0, emb, h, c, logp0, fin0, lens0))

    if length_penalty > 0:
        norm = ((5.0 + lens.astype(jnp.float32)) / 6.0) ** length_penalty
        score = logp / norm
    else:
        score = logp
    best = jnp.argmax(score, axis=1)
    return jnp.take_along_axis(preds, best[:, None, None], axis=1)[:, 0]
