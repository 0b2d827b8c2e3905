"""Pallas TPU kernel: the ENTIRE greedy decode loop fused into one kernel.

The reference drives its decoder with up to 768 host->ONNX calls per image
(two graphs x <=384 steps, evaluate_strokes.py:279-302). Our XLA baseline
already fuses that into one on-device ``lax.while_loop``
(models/decoder.py greedy_decode), but at production shapes (B<=80 rows,
P=196 positions, E=A=H=512) each while-loop iteration is ~10 small HLOs
whose dispatch/latency — not FLOPs — dominates: ~0.29 ms/step measured on
v5e, ~111 ms for a full 384-step decode.

This kernel runs ALL decode steps for a block of rows in one Pallas program:

  * the encoder sequence, its attention projection, and EVERY decoder
    weight matrix (attention, gate, LSTM, vocab head, embedding table) stay
    VMEM-resident for the whole loop — zero HBM traffic per step;
  * each step is: additive attention (masked softmax over padded P),
    sigmoid-gated attended vector, one fused LSTM matmul pair
    (x @ Wx + h @ Wh -> 4 gates), vocab head, argmax, embedding gather as a
    one-hot MXU matmul;
  * retired rows (those that emitted EOS) freeze their h/c/emb and write
    PAD, exactly like greedy_decode's masked retirement — write semantics
    identical to the reference's shrinking-batch loop;
  * the loop is a ``lax.while_loop`` with the same global early-exit.

Weight-layout contract (see ``pack_decoder_weights``): flax LSTMCell stores
four input kernels ``ii,if,ig,io`` (no bias) and four hidden kernels
``hi,hf,hg,ho`` (with bias); gate math is i,f,g,o with
c' = sig(f)*c + sig(i)*tanh(g), h' = sig(o)*tanh(c'). We concatenate them
into Wx (D+E, 4H), Wh (H, 4H), b (4H,) and slice gates at lane-aligned
multiples of H inside the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stroke_derenderer_tpu.config import BOS, EOS, PAD

NEG_INF = -1e30


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def pack_decoder_weights(params: dict) -> dict:
    """Decoder param tree -> the dense, lane-aligned tensors the kernel
    consumes. Padding: vocab -> multiple of 128 with NEG_INF logit bias so
    argmax can never select a pad token; embedding table rows likewise."""
    lstm = params["lstm"]
    wx = jnp.concatenate([lstm[g]["kernel"] for g in ("ii", "if", "ig", "io")],
                         axis=1)                        # (D+E, 4H)
    wh = jnp.concatenate([lstm[g]["kernel"] for g in ("hi", "hf", "hg", "ho")],
                         axis=1)                        # (H, 4H)
    bh = jnp.concatenate([lstm[g]["bias"] for g in ("hi", "hf", "hg", "ho")])

    emb = params["embedding"]["embedding"]              # (V, D)
    fc_w, fc_b = params["fc"]["kernel"], params["fc"]["bias"]  # (H, V), (V,)
    v, d = emb.shape
    vp = _round_up(v, 128)
    if vp != v:
        emb = jnp.pad(emb, ((0, vp - v), (0, 0)))
        fc_w = jnp.pad(fc_w, ((0, 0), (0, vp - v)))
        fc_b = jnp.pad(fc_b, ((0, vp - v),), constant_values=NEG_INF)

    return {
        "watt": params["dec_att"]["kernel"],            # (H, A)
        "batt": params["dec_att"]["bias"][None, :],     # (1, A)
        "v": params["full_att"]["kernel"],              # (A, 1)
        "bv": params["full_att"]["bias"][None, :],      # (1, 1)
        "wf": params["f_beta"]["kernel"],               # (H, E)
        "bf": params["f_beta"]["bias"][None, :],        # (1, E)
        "wx": wx, "wh": wh, "blstm": bh[None, :],       # (1, 4H)
        "emb": emb,                                     # (Vp, D)
        "wfc": fc_w, "bfc": fc_b[None, :],              # (H, Vp), (1, Vp)
    }


# Tensors that stay float32 regardless of the stream dtype: the vocab head
# is float32 in the model itself (AttentiveDecoder.fc, dtype=jnp.float32) —
# rounding it to bf16 measurably degrades decode quality (argmax flips
# compound autoregressively: stroke DTW 8.21 vs 7.57 on the eval set).
F32_PACKED = ("wfc", "bfc")


def _kernel(enc_ref, proj_ref, h0_ref, c0_ref, pmask_ref,
            watt_ref, batt_ref, v_ref, bv_ref, wf_ref, bf_ref,
            wx_ref, wh_ref, blstm_ref, emb_ref, wfc_ref, bfc_ref,
            preds_ref, alpha_ref, *, max_length: int, buf_len: int,
            hdim: int):
    bt, pp, e = enc_ref.shape
    vp = emb_ref.shape[0]
    cdt = enc_ref.dtype  # compute/stream dtype (bf16 in production)

    # Numerics contract: every intermediate rounds to ``cdt`` at exactly the
    # points the flax modules do (Dense: f32-accumulated dot rounded to cdt,
    # bias added in cdt; LSTM gate math and h/c carries in cdt; vocab head
    # fully f32) — so hardware runs of this kernel emit the same token
    # streams as models/decoder.py greedy_decode, whose numerics the
    # weights were trained under. Transcendentals on cdt vectors are
    # computed f32-in/round-out (what XLA does for bf16 sigmoid/tanh;
    # Mosaic additionally cannot lower their f32 constants into bf16
    # vectors directly).

    def sig(x):
        return jax.nn.sigmoid(x.astype(jnp.float32)).astype(cdt)

    def tanh(x):
        return jnp.tanh(x.astype(jnp.float32)).astype(cdt)

    def embed(tok):
        # Embedding gather as a one-hot matmul: (Bt, Vp) @ (Vp, D) on MXU.
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (bt, vp), 1)
                  == tok).astype(cdt)
        return jnp.dot(onehot, emb_ref[:],
                       preferred_element_type=jnp.float32).astype(cdt)

    preds_ref[:] = jnp.full((bt, buf_len), PAD, jnp.int32)

    def step(state):
        t, h, c, emb, active = state
        # ``active`` rides the carry as a lane-aligned (bt, 128) float32:
        # Mosaic can't legalize scf.yield of i1 vectors or replicated-lane
        # (bt, 1) layouts, so the bool view is a body-local intermediate.
        act = active[:, :1] > 0.0

        # --- additive attention over the VMEM-resident encoder sequence.
        dec_proj = (jnp.dot(h, watt_ref[:],
                            preferred_element_type=jnp.float32).astype(cdt)
                    + batt_ref[:])
        att = jnp.maximum(proj_ref[:] + dec_proj[:, None, :],
                          jnp.zeros((), cdt))
        scores = (jnp.dot(att.reshape(bt * pp, -1), v_ref[:],
                          preferred_element_type=jnp.float32).astype(cdt)
                  + bv_ref[:]).reshape(bt, pp).astype(jnp.float32)
        scores = jnp.where(pmask_ref[:] > 0, scores, NEG_INF)
        scores = scores - jnp.max(scores, axis=1, keepdims=True)
        ex = jnp.exp(scores)
        alpha_ref[:] = ex / jnp.sum(ex, axis=1, keepdims=True)

        # --- attended vector, accumulated on the VPU in 128-lane chunks
        # (values can't be dynamically sliced in Mosaic; re-read alpha from
        # its ref — same trick as kernels/decode_attention.py).
        def acc_body(k, awe):
            p0 = pl.multiple_of(k * 128, 128)
            blk = enc_ref[:, pl.ds(p0, 128), :].astype(jnp.float32)
            al = alpha_ref[:, pl.ds(p0, 128)]
            return awe + jnp.sum(al.reshape(bt, 128, 1) * blk, axis=1)

        awe = jax.lax.fori_loop(0, pp // 128, acc_body,
                                jnp.zeros((bt, e), jnp.float32))
        gate = sig(jnp.dot(h, wf_ref[:],
                           preferred_element_type=jnp.float32).astype(cdt)
                   + bf_ref[:])
        awe = gate.astype(jnp.float32) * awe

        # --- fused LSTM: [emb; awe] @ Wx + h @ Wh + b -> i,f,g,o.
        # flax LSTMCell rounds each dense projection to cdt before the gate
        # sums; the hidden projection carries the bias (decoder.py setup).
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

        # --- vocab head + greedy argmax (pad logits carry NEG_INF bias).
        # Entirely f32, like AttentiveDecoder.fc (dtype=jnp.float32).
        logits = (jnp.dot(h2.astype(jnp.float32), wfc_ref[:],
                          preferred_element_type=jnp.float32) + bfc_ref[:])
        tok = jnp.argmax(logits, axis=-1, keepdims=True).astype(jnp.int32)

        # --- reference write semantics: active rows record their token
        # (including the terminating EOS); retired rows stay PAD and
        # freeze their h/c/emb (models/decoder.py greedy_decode). Full-row
        # masked write: Mosaic only slices the lane dim at 128 multiples.
        write = jnp.where(act, tok, PAD)
        preds_ref[:] = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (bt, buf_len), 1) == t,
            write, preds_ref[:])
        emb2 = embed(tok)
        h = jnp.where(act, h2, h)
        c = jnp.where(act, c2, c)
        emb = jnp.where(act, emb2, emb)
        still = jnp.logical_and(act, tok != EOS)
        active = jnp.broadcast_to(still.astype(jnp.float32), (bt, 128))
        return t + 1, h, c, emb, active

    def cond(state):
        t, _, _, _, active = state
        return jnp.logical_and(t < max_length, jnp.max(active) > 0.0)

    emb0 = embed(jnp.full((bt, 1), BOS, jnp.int32))
    jax.lax.while_loop(
        cond, step,
        (jnp.int32(0), h0_ref[:], c0_ref[:], emb0,
         jnp.ones((bt, 128), jnp.float32)))


@functools.partial(jax.jit, static_argnames=("max_length", "block_b",
                                              "interpret", "stream_dtype"))
def _fused_greedy_decode_tpu(enc, enc_proj, h0, c0, packed,
                             max_length: int,
                             block_b: int = 8, interpret: bool = False,
                             stream_dtype: str = "bfloat16"):
    b, p, e = enc.shape
    a = enc_proj.shape[-1]
    hdim = h0.shape[-1]
    pp = _round_up(p, 128)
    # Large grids push the kernel over the 16 MB scoped-vmem limit by
    # ~68 KB (Mosaic double-buffers the small blocked operands once the
    # grid is deep enough); halving the block halves the two 4 MB encoder
    # operands and restores headroom. Small batches keep the configured
    # block (measured fastest at the bench shapes).
    if b > 128 and block_b > 8:
        block_b = 8
    bp = _round_up(b, block_b)
    mlp = _round_up(max_length, 128)  # int32 lane alignment for preds

    cdt = jnp.dtype(stream_dtype)
    enc = enc.astype(cdt)
    enc_proj = enc_proj.astype(cdt)
    h0, c0 = h0.astype(cdt), c0.astype(cdt)
    packed = {k: w.astype(jnp.float32 if k in F32_PACKED else cdt)
              for k, w in packed.items()}
    if (pp, bp) != (p, b):
        enc = jnp.pad(enc, ((0, bp - b), (0, pp - p), (0, 0)))
        enc_proj = jnp.pad(enc_proj, ((0, bp - b), (0, pp - p), (0, 0)))
        h0 = jnp.pad(h0, ((0, bp - b), (0, 0)))
        c0 = jnp.pad(c0, ((0, bp - b), (0, 0)))
    pmask = (jnp.arange(pp) < p).astype(jnp.float32)[None, :]

    const = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel, max_length=max_length, buf_len=mlp,
                             hdim=hdim)

    def run_rows(enc_c, proj_c, h0_c, c0_c):
        cb = enc_c.shape[0]
        preds_c, _ = pl.pallas_call(
            kern,
            grid=(cb // block_b,),
            in_specs=[
                pl.BlockSpec((block_b, pp, e), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_b, pp, a), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_b, hdim), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_b, hdim), lambda i: (i, 0),
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
                pl.BlockSpec((block_b, mlp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_b, pp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((cb, mlp), jnp.int32),
                jax.ShapeDtypeStruct((cb, pp), jnp.float32),  # alpha scratch
            ),
            interpret=interpret,
        )(enc_c, proj_c, h0_c, c0_c, pmask,
          packed["watt"], packed["batt"], packed["v"], packed["bv"],
          packed["wf"], packed["bf"], packed["wx"], packed["wh"],
          packed["blstm"], packed["emb"], packed["wfc"], packed["bfc"])
        return preds_c

    # Row-chunked dispatch: XLA keeps each custom call's whole result
    # tuple VMEM-resident (scoped stack), so a single call over many rows
    # adds bp*(mlp+pp)*4 bytes on top of the kernel's ~15 MB working set —
    # at bp=640 that blew the 16 MB scoped-vmem limit by 68 KB (n=64
    # bench OOM). Capping rows per call bounds the result footprint while
    # keeping one jitted program; rows are independent, so chunking is
    # output-invariant.
    cap = max(block_b, (256 // block_b) * block_b)
    preds = jnp.concatenate(
        [run_rows(enc[s0:s0 + cap], enc_proj[s0:s0 + cap],
                  h0[s0:s0 + cap], c0[s0:s0 + cap])
         for s0 in range(0, bp, cap)]) if bp > cap else run_rows(
        enc, enc_proj, h0, c0)
    return preds[:b, :max_length]


def fused_greedy_decode(decoder, variables, enc_seq, max_length: int,
                        block_b: int = 8, interpret: bool | None = None):
    """Drop-in replacement for models.greedy_decode: same (B, max_length)
    int32 output contract, whole decode in one Pallas program. Falls back to
    the XLA while_loop off-TPU unless ``interpret=True``."""
    from stroke_derenderer_tpu.models.decoder import (
        AttentiveDecoder, greedy_decode,
    )
    if not (interpret or jax.default_backend() == "tpu"):
        return greedy_decode(decoder, variables, enc_seq, max_length)
    apply = lambda method, *a: decoder.apply(variables, *a, method=method)
    enc_proj = apply(AttentiveDecoder.project_encoding, enc_seq)
    h0, c0 = apply(AttentiveDecoder.init_state, enc_seq)
    packed = pack_decoder_weights(variables["params"])
    return _fused_greedy_decode_tpu(enc_seq, enc_proj, h0, c0, packed,
                                    max_length, block_b=block_b,
                                    interpret=bool(interpret),
                                    stream_dtype=jnp.dtype(decoder.dtype).name)


def fused_greedy_decode_sharded(decoder, variables, enc_seq,
                                max_length: int, mesh, block_b: int = 8,
                                interpret: bool | None = None):
    """:func:`fused_greedy_decode` with the glyph batch dp-sharded.

    The Pallas kernel is a single-chip program, so under a mesh we
    ``shard_map`` it over the 'dp' axis: every dp group runs the whole
    decode loop on its local rows with the decoder weights replicated.
    Greedy decode is embarrassingly data-parallel -- rows never interact
    (reference evaluate_strokes.py:279-302 retires rows independently) --
    so the mapped body needs zero collectives and multi-chip inference
    keeps the fused kernel instead of falling back to the XLA while_loop.

    ``enc_seq.shape[0]`` must be divisible by the mesh's dp extent; the
    pipeline pads glyph batches to ``lcm(glyph_bucket, dp)`` upstream
    (pipeline/strokes.py estimate_strokes). Axes other than 'dp' (tp)
    compute replicas of the same rows, matching the replicated out-spec.
    """
    from jax.sharding import PartitionSpec as P

    dp = int(mesh.shape["dp"])
    if enc_seq.shape[0] % dp:
        raise ValueError(
            f"batch {enc_seq.shape[0]} not divisible by dp={dp}")

    def local(vars_, seq):
        return fused_greedy_decode(decoder, vars_, seq, max_length,
                                   block_b=block_b, interpret=interpret)

    # check_vma=False: the body is shard-local (no collectives) and its
    # output over unmentioned axes (tp) is replicated by construction,
    # but the checker cannot see through pallas_call.
    return jax.shard_map(local, mesh=mesh, in_specs=(P(), P("dp")),
                         out_specs=P("dp"),
                         check_vma=False)(variables, enc_seq)
