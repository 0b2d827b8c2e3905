"""Pallas TPU kernel: the ENTIRE beam-search decode fused into one kernel.

Companion to kernels/fused_decode.py (greedy). The XLA beam path
(models/decoder.py beam_decode) tiles the encoder sequence to (B*K, P, E)
and pays the same per-step while_loop dispatch overhead as greedy, times K
rows. Here the grid is one cell per IMAGE:

  * the encoder sequence lives in VMEM ONCE per image — beams share it,
    so attention's attended-sum is a single (K, Pp) @ (Pp, E) MXU matmul
    (no batched-dot workaround, no K-fold tiling);
  * top-k over (K, Vp) is K unrolled flat-argmax+mask rounds — identical
    tie-breaking (lowest flat index first) to jax.lax.top_k;
  * beam reordering gathers h/c/emb/preds rows with one-hot parent
    matmuls (prediction ints round-trip exactly through f32: values < 2^24);
  * finished beams extend only with PAD at frozen score, writes stay PAD —
    exactly beam_decode's semantics, pinned by interpret-mode tests.

Outputs all K beams' predictions, scores, and lengths; GNMT length
normalization and best-beam selection run in XLA outside the kernel
(same math as beam_decode's tail).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stroke_derenderer_tpu.config import BOS, EOS, PAD
from stroke_derenderer_tpu.kernels.fused_decode import (
    F32_PACKED, _round_up, pack_decoder_weights,
)

NEG_INF = -1e30


def _kernel(enc_ref, proj_ref, h0_ref, c0_ref, pmask_ref,
            watt_ref, batt_ref, v_ref, bv_ref, wf_ref, bf_ref,
            wx_ref, wh_ref, blstm_ref, emb_ref, wfc_ref, bfc_ref,
            preds_ref, score_ref, lens_ref, *, max_length: int, buf_len: int,
            hdim: int, beam_k: int):
    _, pp, e = enc_ref.shape
    vp = emb_ref.shape[0]
    k = beam_k
    cdt = enc_ref.dtype
    enc = enc_ref[0]          # (Pp, E) — shared by all beams
    proj = proj_ref[0]        # (Pp, A)

    # Same numerics contract as kernels/fused_decode.py: round to ``cdt``
    # exactly where the flax modules do, vocab head f32, transcendentals
    # f32-in/round-out (Mosaic can't lower their f32 constants into bf16
    # vectors either).
    def sig(x):
        return jax.nn.sigmoid(x.astype(jnp.float32)).astype(cdt)

    def tanh(x):
        return jnp.tanh(x.astype(jnp.float32)).astype(cdt)

    def embed(tok):
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (k, vp), 1)
                  == tok).astype(cdt)
        return jnp.dot(onehot, emb_ref[:],
                       preferred_element_type=jnp.float32).astype(cdt)

    def gather_rows(x, parent, exact_int=False):
        """Reorder (K, ...) rows by parent indices with a one-hot matmul."""
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
                  == parent).astype(jnp.float32)
        y = jnp.dot(onehot, x.astype(jnp.float32),
                    preferred_element_type=jnp.float32)
        return jnp.rint(y).astype(jnp.int32) if exact_int else y

    preds_ref[0] = jnp.full((k, buf_len), PAD, jnp.int32)

    def step(state):
        t, h, c, emb, score, fin, lens = state
        # score/fin/lens ride the carry as lane-aligned (K, 128) vectors:
        # Mosaic can't legalize scf.yield of i1 vectors or replicated-lane
        # (K, 1) layouts (see kernels/fused_decode.py). Body-local views:
        sc = score[:, :1]                 # (K, 1) float32
        fb = fin[:, :1] > 0.0             # (K, 1) bool

        # --- attention: beams share the per-image encoder sequence.
        dec_proj = (jnp.dot(h, watt_ref[:],
                            preferred_element_type=jnp.float32).astype(cdt)
                    + batt_ref[:])
        att = jnp.maximum(proj[None] + dec_proj[:, None, :],
                          jnp.zeros((), cdt))
        scores_a = (jnp.dot(att.reshape(k * pp, -1), v_ref[:],
                            preferred_element_type=jnp.float32).astype(cdt)
                    + bv_ref[:]).reshape(k, pp).astype(jnp.float32)
        scores_a = jnp.where(pmask_ref[:] > 0, scores_a, NEG_INF)
        scores_a = scores_a - jnp.max(scores_a, axis=1, keepdims=True)
        ex = jnp.exp(scores_a)
        alpha = ex / jnp.sum(ex, axis=1, keepdims=True)          # (K, Pp)
        awe = jnp.dot(alpha, enc.astype(jnp.float32),
                      preferred_element_type=jnp.float32)        # (K, E) f32
        gate = sig(jnp.dot(h, wf_ref[:],
                           preferred_element_type=jnp.float32).astype(cdt)
                   + bf_ref[:])
        awe = gate.astype(jnp.float32) * awe

        # --- fused LSTM (flax per-gate rounding, see fused_decode.py).
        x = jnp.concatenate([emb, awe.astype(cdt)], axis=-1)
        gates = (jnp.dot(x, wx_ref[:],
                         preferred_element_type=jnp.float32).astype(cdt)
                 + (jnp.dot(h, wh_ref[:],
                            preferred_element_type=jnp.float32).astype(cdt)
                    + blstm_ref[:]))
        i = sig(gates[:, :hdim])
        f = sig(gates[:, hdim:2 * hdim])
        g = tanh(gates[:, 2 * hdim:3 * hdim])
        o = sig(gates[:, 3 * hdim:])
        c2 = f * c + i * g
        h2 = o * tanh(c2)

        # --- per-beam log-softmax; finished beams may only extend with PAD
        # at no cost (models/decoder.py beam_decode). Vocab head f32.
        logits = (jnp.dot(h2.astype(jnp.float32), wfc_ref[:],
                          preferred_element_type=jnp.float32) + bfc_ref[:])
        logp = logits - jnp.max(logits, axis=-1, keepdims=True)
        logp = logp - jnp.log(jnp.sum(jnp.exp(logp), axis=-1, keepdims=True))
        is_pad_col = (jax.lax.broadcasted_iota(jnp.int32, (k, vp), 1) == PAD)
        pad_only = jnp.where(is_pad_col, 0.0, NEG_INF)
        logp = jnp.where(fb, pad_only, logp)
        total = sc + logp                                        # (K, Vp)

        # --- top-k: K rounds of flat argmax + mask (same lowest-index
        # tie-break as lax.top_k).
        flat = total.reshape(1, k * vp)
        parents, tokens, vals = [], [], []
        for _ in range(k):
            idx = jnp.argmax(flat, axis=-1)                      # (1,)
            val = jnp.max(flat, axis=-1)
            parents.append(idx // vp)
            tokens.append(idx % vp)
            vals.append(val)
            flat = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, flat.shape, 1)
                == idx[:, None], NEG_INF, flat)
        parent = jnp.stack(parents, 1).reshape(k, 1)             # (K, 1)
        token = jnp.stack(tokens, 1).reshape(k, 1).astype(jnp.int32)
        sc2 = jnp.stack(vals, 1).reshape(k, 1)

        # --- reorder beam state by parent; write this step's tokens.
        # fin/lens are gathered at their full (K, 128) carry width so every
        # one-hot matmul keeps a 128-lane RHS (lane-1 matmuls don't lower).
        h = gather_rows(h2, parent).astype(cdt)
        c = gather_rows(c2, parent).astype(cdt)
        fin_g = gather_rows(fin, parent)                          # (K, 128)
        lens_g = gather_rows(lens, parent, exact_int=True)        # (K, 128)
        fb2 = fin_g[:, :1] > 0.0
        pr = gather_rows(preds_ref[0], parent, exact_int=True)
        write = jnp.where(fb2, PAD, token)
        pr = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (k, buf_len), 1) == t,
            write, pr)
        preds_ref[0] = pr
        lens = jnp.where(fb2, lens_g, lens_g + 1)
        fb2 = fb2 | (token == EOS)
        emb = embed(token)
        score = jnp.broadcast_to(sc2, (k, 128))
        fin = jnp.broadcast_to(fb2.astype(jnp.float32), (k, 128))
        return t + 1, h, c, emb, score, fin, lens

    def cond(state):
        t = state[0]
        fin = state[5]
        return jnp.logical_and(t < max_length, jnp.min(fin) < 0.5)

    h0 = jnp.broadcast_to(h0_ref[0].astype(cdt), (k, hdim))
    c0 = jnp.broadcast_to(c0_ref[0].astype(cdt), (k, hdim))
    emb0 = embed(jnp.full((k, 1), BOS, jnp.int32))
    # Only beam 0 live initially so the first step picks K distinct tokens.
    score0 = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (k, 128), 0) == 0, 0.0, NEG_INF)
    _, _, _, _, score, fin, lens = jax.lax.while_loop(
        cond, step,
        (jnp.int32(0), h0, c0, emb0, score0,
         jnp.zeros((k, 128), jnp.float32), jnp.zeros((k, 128), jnp.int32)))
    score_ref[0] = score
    lens_ref[0] = lens


@functools.partial(jax.jit, static_argnames=("max_length", "beam_size",
                                              "interpret", "stream_dtype"))
def _fused_beam_decode_tpu(enc, enc_proj, h0, c0, packed, max_length: int,
                           beam_size: int, interpret: bool = False,
                           stream_dtype: str = "bfloat16"):
    b, p, e = enc.shape
    a = enc_proj.shape[-1]
    hdim = h0.shape[-1]
    pp = _round_up(p, 128)
    mlp = _round_up(max_length, 128)
    k = beam_size

    cdt = jnp.dtype(stream_dtype)
    enc = enc.astype(cdt)
    enc_proj = enc_proj.astype(cdt)
    # (B, 1, H) so the per-image block (1, 1, H) is a legal TPU tile
    # (sublane dim 1 == full array dim; lane dim H is 128-aligned).
    h0 = h0.astype(cdt)[:, None, :]
    c0 = c0.astype(cdt)[:, None, :]
    packed = {kk: w.astype(jnp.float32 if kk in F32_PACKED else cdt)
              for kk, w in packed.items()}
    if pp != p:
        enc = jnp.pad(enc, ((0, 0), (0, pp - p), (0, 0)))
        enc_proj = jnp.pad(enc_proj, ((0, 0), (0, pp - p), (0, 0)))
    pmask = (jnp.arange(pp) < p).astype(jnp.float32)[None, :]

    const = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel, max_length=max_length, buf_len=mlp,
                             hdim=hdim, beam_k=k)
    preds, score, lens = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, pp, e), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pp, a), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hdim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hdim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const((1, pp)),
            const(packed["watt"].shape), const(packed["batt"].shape),
            const(packed["v"].shape), const(packed["bv"].shape),
            const(packed["wf"].shape),
            const(packed["bf"].shape), const(packed["wx"].shape),
            const(packed["wh"].shape), const(packed["blstm"].shape),
            const(packed["emb"].shape), const(packed["wfc"].shape),
            const(packed["bfc"].shape),
        ],
        out_specs=(
            pl.BlockSpec((1, k, mlp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, k, mlp), jnp.int32),
            jax.ShapeDtypeStruct((b, k, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, k, 128), jnp.int32),
        ),
        interpret=interpret,
    )(enc, enc_proj, h0, c0, pmask,
      packed["watt"], packed["batt"], packed["v"], packed["bv"],
      packed["wf"], packed["bf"], packed["wx"], packed["wh"],
      packed["blstm"], packed["emb"], packed["wfc"], packed["bfc"])
    return preds[:, :, :max_length], score[:, :, 0], lens[:, :, 0]


def fused_beam_decode(decoder, variables, enc_seq, max_length: int,
                      beam_size: int = 5, length_penalty: float = 0.0,
                      interpret: bool | None = None):
    """Drop-in replacement for models.beam_decode: same (B, max_length)
    int32 best-beam output. Falls back to the XLA path off-TPU unless
    ``interpret=True``."""
    from stroke_derenderer_tpu.models.decoder import (
        AttentiveDecoder, beam_decode,
    )
    if not (interpret or jax.default_backend() == "tpu"):
        return beam_decode(decoder, variables, enc_seq, max_length,
                           beam_size=beam_size, length_penalty=length_penalty)
    apply = lambda method, *a: decoder.apply(variables, *a, method=method)
    enc_proj = apply(AttentiveDecoder.project_encoding, enc_seq)
    h0, c0 = apply(AttentiveDecoder.init_state, enc_seq)
    packed = pack_decoder_weights(variables["params"])
    preds, score, lens = _fused_beam_decode_tpu(
        enc_seq, enc_proj, h0, c0, packed, max_length, beam_size,
        interpret=bool(interpret),
        stream_dtype=jnp.dtype(decoder.dtype).name)
    if length_penalty > 0:
        norm = ((5.0 + lens.astype(jnp.float32)) / 6.0) ** length_penalty
        score = score / norm
    best = jnp.argmax(score, axis=1)
    return jnp.take_along_axis(preds, best[:, None, None], axis=1)[:, 0]


def fused_beam_decode_sharded(decoder, variables, enc_seq, max_length: int,
                              mesh, beam_size: int = 5,
                              length_penalty: float = 0.0,
                              interpret: bool | None = None):
    """:func:`fused_beam_decode` with the glyph batch dp-sharded over
    ``mesh`` via shard_map -- same rationale/contract as
    fused_decode.fused_greedy_decode_sharded (rows are independent, so
    the mapped body needs no collectives; batch must divide dp)."""
    from jax.sharding import PartitionSpec as P

    dp = int(mesh.shape["dp"])
    if enc_seq.shape[0] % dp:
        raise ValueError(
            f"batch {enc_seq.shape[0]} not divisible by dp={dp}")

    def local(vars_, seq):
        return fused_beam_decode(decoder, vars_, seq, max_length,
                                 beam_size=beam_size,
                                 length_penalty=length_penalty,
                                 interpret=interpret)

    return jax.shard_map(local, mesh=mesh, in_specs=(P(), P("dp")),
                         out_specs=P("dp"),
                         check_vma=False)(variables, enc_seq)
