"""Pallas TPU kernel: fused additive-attention + gate for the decode step.

The per-token hot path of the stroke decoder reads the full encoder
sequence twice per step under XLA — once for the attention scores, once for
the attended sum — plus intermediate (B, P, A) tensors bouncing through HBM
(models/decoder.py step(); reference semantics evaluate_strokes.py:280-288).
This kernel performs, in one VMEM-resident pass per batch tile:

    scores_p = v . relu(enc_proj[b, p, :] + h[b] @ W_att)      (B, P)
    alpha    = softmax_p(scores)                                (B, P)
    awe      = sum_p alpha_p * enc[b, p, :]                     (B, E)
    out      = sigmoid(h[b] @ W_f + b_f) * awe                  (B, E)

i.e. the whole of show-attend-tell's Attention + f_beta gate fused, with
the (B, P, A) scores tensor never leaving VMEM. Grid is over batch tiles;
P is padded to the sublane multiple with masked softmax.

Use :func:`fused_attention_gate` (dispatches to the kernel on TPU, to the
pure-jnp reference elsewhere); :func:`fused_attention_gate_reference` is the
numerics oracle used by tests and non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def fused_attention_gate_reference(enc, enc_proj, h, w_att, b_att, v, b_v,
                                   w_f, b_f):
    """Pure-jnp oracle with the exact math of models/decoder.py step()."""
    att = enc_proj + (h @ w_att + b_att)[:, None, :]
    scores = jnp.squeeze(jax.nn.relu(att) @ v[:, None], -1) + b_v
    alpha = jax.nn.softmax(scores.astype(jnp.float32), axis=1)
    awe = jnp.einsum("bp,bpe->be", alpha, enc.astype(jnp.float32))
    gate = jax.nn.sigmoid((h @ w_f + b_f).astype(jnp.float32))
    return (gate * awe), alpha


def _kernel(enc_ref, proj_ref, h_ref, watt_ref, batt_ref, v_ref, wf_ref,
            bf_ref, pmask_ref, out_ref, alpha_ref):
    # Shapes per tile: enc (Bt, Pp, E), proj (Bt, Pp, A), h (Bt, D),
    # watt (D, A), v (A, 1), wf (D, E), pmask (1, Pp).
    h = h_ref[:]
    dec_proj = jnp.dot(h, watt_ref[:], preferred_element_type=jnp.float32)
    dec_proj = dec_proj + batt_ref[:]                      # (Bt, A)
    att = proj_ref[:].astype(jnp.float32) + dec_proj[:, None, :]
    att = jnp.maximum(att, 0.0)                            # relu
    bt, pp, a = att.shape
    scores = jnp.dot(att.reshape(bt * pp, a), v_ref[:],
                     preferred_element_type=jnp.float32).reshape(bt, pp)
    scores = jnp.where(pmask_ref[:] > 0, scores, NEG_INF)
    scores = scores - jnp.max(scores, axis=1, keepdims=True)
    ex = jnp.exp(scores)
    alpha = ex / jnp.sum(ex, axis=1, keepdims=True)        # (Bt, Pp)
    alpha_ref[:] = alpha
    gate = jax.nn.sigmoid(
        jnp.dot(h, wf_ref[:], preferred_element_type=jnp.float32) + bf_ref[:])
    # awe: Mosaic has no batched dot_general and per-row (1, Pp) matmuls
    # waste the MXU, so accumulate on the VPU in 128-position chunks (the
    # lane dimension only slices at multiples of 128).
    chunk = 128
    e = enc_ref.shape[-1]

    def acc_body(k, awe):
        p0 = pl.multiple_of(k * chunk, chunk)
        blk = enc_ref[:, pl.ds(p0, chunk), :].astype(jnp.float32)
        # Values can't be dynamically sliced in Mosaic; read alpha back
        # from its (already written) output ref instead.
        al_c = alpha_ref[:, pl.ds(p0, chunk)]
        return awe + jnp.sum(al_c.reshape(bt, chunk, 1) * blk, axis=1)

    awe = jax.lax.fori_loop(0, pp // chunk, acc_body,
                            jnp.zeros((bt, e), jnp.float32))
    out_ref[:] = gate * awe


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def _fused_attention_gate_tpu(enc, enc_proj, h, w_att, b_att, v, b_v, w_f,
                              b_f, block_b: int = 4, interpret: bool = False):
    b, p, e = enc.shape
    a = enc_proj.shape[-1]
    pp = _round_up(p, 128)  # lane-aligned position chunks (see _kernel)
    bp = _round_up(b, block_b)
    # bf16 streams halve VMEM block footprints; the kernel upcasts to f32
    # at every MXU op (preferred_element_type) and for the softmax.
    enc = enc.astype(jnp.bfloat16)
    enc_proj = enc_proj.astype(jnp.bfloat16)
    h = h.astype(jnp.bfloat16)
    w_att, b_att, v, w_f, b_f = (x.astype(jnp.bfloat16)
                                 for x in (w_att, b_att, v, w_f, b_f))
    if (pp, bp) != (p, b):
        enc = jnp.pad(enc, ((0, bp - b), (0, pp - p), (0, 0)))
        enc_proj = jnp.pad(enc_proj, ((0, bp - b), (0, pp - p), (0, 0)))
        h = jnp.pad(h, ((0, bp - b), (0, 0)))
    pmask = (jnp.arange(pp) < p).astype(jnp.float32)[None, :]

    grid = (bp // block_b,)
    out, alpha = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, pp, e), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, pp, a), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, h.shape[-1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h.shape[-1], a), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, a), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((a, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h.shape[-1], e), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, e), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_b, e), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, pp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bp, e), jnp.float32),
            jax.ShapeDtypeStruct((bp, pp), jnp.float32),
        ),
        interpret=interpret,
    )(enc, enc_proj, h, w_att, b_att[None, :], v[:, None], w_f, b_f[None, :],
      pmask)
    # b_v shifts every score equally -> cancels in softmax; alpha/awe exact.
    return out[:b], alpha[:b, :p]


def fused_attention_gate(enc, enc_proj, h, w_att, b_att, v, b_v, w_f, b_f,
                         block_b: int = 8, interpret: bool | None = None):
    """Fused attention+gate; Pallas on TPU (or interpreted anywhere when
    ``interpret=True``), jnp oracle elsewhere."""
    if interpret or jax.default_backend() == "tpu":
        return _fused_attention_gate_tpu(enc, enc_proj, h, w_att, b_att, v,
                                         b_v, w_f, b_f, block_b=block_b,
                                         interpret=bool(interpret))
    return fused_attention_gate_reference(enc, enc_proj, h, w_att, b_att, v,
                                          b_v, w_f, b_f)
