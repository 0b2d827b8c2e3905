"""Dynamic int8 quantization for the convolutional forward paths.

The reference runs every model in float32 on ONNX Runtime CPU (its only
execution mode — SURVEY.md §2.3, reference common.py:105-111). On TPU v5e
the MXU's int8 rate is 2x its bf16 rate (394 vs 197 TOPS), so this module
provides drop-in int8 variants of the two ops that carry all conv FLOPs:

  * :func:`int8_conv_general_dilated` — injected into ``flax.linen.Conv``
    via its ``conv_general_dilated`` field (this is the path the UNet and
    encoder use under ``quant="int8"``),
  * :func:`int8_dot_general` — the matching ``flax.linen.Dense``
    ``dot_general`` injection, available via :func:`dot_injection` but
    NOT wired into any shipped model: the only Dense layers (decoder
    gates/attention/projection) carry negligible FLOPs and are the
    accuracy-sensitive part of the pipeline, so they deliberately stay
    bf16/f32.

Scheme: **dynamic symmetric quantization**. Weights are quantized
per-output-channel and activations per-tensor, with scales computed inside
the jitted program from the live values (no calibration pass, no checkpoint
changes — the param tree stays float and is bit-identical to the unquantized
models', so every existing checkpoint and the ONNX importer/exporter work
unchanged). The int8 x int8 -> int32 contraction runs on the MXU; the
dequant multiply fuses into the epilogue.

Accuracy: the conv stacks here are ReLU CNNs interleaved with GroupNorm,
which re-centers activations every two convs and stops error accumulation;
tests/test_quant.py pins mask agreement and encoder cosine similarity on
the committed demo weights. Enable with ``quant="int8"`` on
BinarizerConfig / StrokesConfig (execution policy — never frozen into
exported model dirs).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

# Symmetric int8: +-127 (not -128) so negation is exact and scale math is
# symmetric around zero.
_QMAX = 127.0
_EPS = 1e-12


def _quantize(x: jnp.ndarray, axes, keepdims: bool = True):
    """Symmetric int8 quantization of ``x`` reduced over ``axes``.

    Returns (q_int8, scale_f32) with x ~= q * scale.
    """
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=axes, keepdims=keepdims) / _QMAX
    scale = jnp.maximum(scale, _EPS)
    q = jnp.clip(jnp.round(xf / scale), -_QMAX, _QMAX).astype(jnp.int8)
    return q, scale


def int8_conv_general_dilated(lhs, rhs, window_strides, padding,
                              lhs_dilation=None, rhs_dilation=None,
                              dimension_numbers=None, feature_group_count=1,
                              batch_group_count=1, precision=None,
                              preferred_element_type=None):
    """``lax.conv_general_dilated`` with an int8 MXU contraction.

    Activations are quantized per-tensor, the kernel per-output-channel
    (the output-feature axis comes from ``dimension_numbers.rhs_spec[0]``);
    the int32 accumulator is dequantized by the product of the two scales.
    Output dtype matches the float path (the promoted input dtype) so the
    surrounding module code is oblivious.
    """
    if dimension_numbers is None:
        raise ValueError("int8 conv requires explicit dimension_numbers "
                         "(flax.linen.Conv always provides them)")
    out_dtype = lhs.dtype

    # Per-output-channel kernel scales: reduce every axis except rhs out.
    rhs_out_axis = dimension_numbers.rhs_spec[0]
    w_axes = tuple(a for a in range(rhs.ndim) if a != rhs_out_axis)
    wq, w_scale = _quantize(rhs, w_axes)  # scale keeps dims, 1s except out

    xq, x_scale = _quantize(lhs, axes=None)  # per-tensor scalar

    acc = lax.conv_general_dilated(
        xq, wq, window_strides, padding,
        lhs_dilation=lhs_dilation, rhs_dilation=rhs_dilation,
        dimension_numbers=dimension_numbers,
        feature_group_count=feature_group_count,
        batch_group_count=batch_group_count,
        preferred_element_type=jnp.int32)

    # Broadcast the per-channel scale along the OUTPUT feature axis.
    out_ch_axis = dimension_numbers.out_spec[1]
    shape = [1] * acc.ndim
    shape[out_ch_axis] = acc.shape[out_ch_axis]
    w_scale = w_scale.reshape(shape)
    return (acc.astype(jnp.float32) * (x_scale * w_scale)).astype(out_dtype)


def int8_dot_general(lhs, rhs, dimension_numbers, precision=None,
                     preferred_element_type=None):
    """``lax.dot_general`` with an int8 MXU contraction, for
    ``flax.linen.Dense`` (rhs is the 2-D (in, out) kernel: contracting dim
    0, per-column weight scales). Other shapes fall back to the float op —
    correctness first; Dense is the only injection site.
    """
    (lhs_contract, rhs_contract), (lhs_batch, rhs_batch) = dimension_numbers
    if (rhs.ndim != 2 or tuple(rhs_contract) != (0,) or lhs_batch
            or rhs_batch):
        return lax.dot_general(lhs, rhs, dimension_numbers,
                               precision=precision,
                               preferred_element_type=preferred_element_type)
    out_dtype = lhs.dtype
    wq, w_scale = _quantize(rhs, axes=(0,))        # (1, out)
    xq, x_scale = _quantize(lhs, axes=None)        # scalar
    acc = lax.dot_general(xq, wq, dimension_numbers,
                          preferred_element_type=jnp.int32)
    # Result layout: (*lhs_free, out) — the per-column scale is the last axis.
    return (acc.astype(jnp.float32)
            * (x_scale * w_scale.reshape((1,) * (acc.ndim - 1) + (-1,)))
            ).astype(out_dtype)


def conv_injection(quant: str):
    """The ``conv_general_dilated`` override for a quant mode ('none'/'int8')."""
    if quant in (None, "", "none"):
        return None
    if quant == "int8":
        return int8_conv_general_dilated
    raise ValueError(f"unknown quant mode: {quant!r}")


def dot_injection(quant: str):
    """The ``dot_general`` override for a quant mode ('none'/'int8')."""
    if quant in (None, "", "none"):
        return None
    if quant == "int8":
        return int8_dot_general
    raise ValueError(f"unknown quant mode: {quant!r}")
