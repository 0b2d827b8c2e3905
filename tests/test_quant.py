"""Dynamic int8 quantization (ops/quant.py).

The quantized paths must (a) leave the param tree bit-identical to the float
models' (any checkpoint runs in either mode), and (b) stay numerically close
enough that masks/features from the COMMITTED demo weights are unchanged for
practical purposes. The reference has no quantized mode at all (float32 ONNX
on CPU, reference common.py:105-111) — this is a TPU-native extra
(v5e int8 MXU rate is 2x bf16).
"""

import dataclasses
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stroke_derenderer_tpu.config import BinarizerConfig, StrokesConfig
from stroke_derenderer_tpu.models import AttentionUNet, ResNetEncoder
from stroke_derenderer_tpu.ops.quant import (
    int8_conv_general_dilated, int8_dot_general,
)

REPO = Path(__file__).resolve().parents[1]
DEMO = REPO / "models_demo"


# ---------------------------------------------------------------- unit level

def test_int8_conv_close_to_float():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 24, 8)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 8, 16)) * 0.1, jnp.float32)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    ref = jax.lax.conv_general_dilated(x, w, (1, 1), [(1, 1), (1, 1)],
                                       dimension_numbers=dn)
    got = int8_conv_general_dilated(x, w, (1, 1), [(1, 1), (1, 1)],
                                    dimension_numbers=dn)
    assert got.dtype == ref.dtype
    r, g = np.asarray(ref).ravel(), np.asarray(got).ravel()
    cos = float(r @ g / (np.linalg.norm(r) * np.linalg.norm(g)))
    assert cos > 0.999
    # int8 grid error bound: ~(|x|max/127)*sum|w| per output; just pin a
    # practical relative bound on this data.
    assert float(np.abs(r - g).max()) < 0.05 * float(np.abs(r).max())


def test_int8_conv_strided_and_grouped_shapes():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 8)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 8, 12)), jnp.float32)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = int8_conv_general_dilated(x, w, (2, 2), [(1, 1), (1, 1)],
                                  dimension_numbers=dn)
    assert y.shape == (1, 8, 8, 12)


def test_int8_dot_general_dense_pattern():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(5, 32)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(32, 16)) * 0.2, jnp.float32)
    dn = (((1,), (0,)), ((), ()))
    ref = jax.lax.dot_general(x, w, dn)
    got = int8_dot_general(x, w, dn)
    r, g = np.asarray(ref).ravel(), np.asarray(got).ravel()
    cos = float(r @ g / (np.linalg.norm(r) * np.linalg.norm(g)))
    assert cos > 0.999


def test_int8_dot_general_fallback_other_patterns():
    """Non-Dense contraction shapes fall back to the exact float op."""
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.normal(size=(2, 4, 8)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(2, 8, 3)), jnp.float32)
    dn = (((2,), (1,)), ((0,), (0,)))  # batched matmul
    np.testing.assert_array_equal(np.asarray(int8_dot_general(a, b, dn)),
                                  np.asarray(jax.lax.dot_general(a, b, dn)))


# ------------------------------------------------------- param-tree identity

def test_quant_param_trees_identical():
    key = jax.random.PRNGKey(0)
    for mk in [lambda q: AttentionUNet(features=(8, 16), bottleneck=32,
                                       quant=q),
               lambda q: ResNetEncoder(arch="tiny", quant=q)]:
        shape = ((1, 32, 96, 3) if isinstance(mk("none"), AttentionUNet)
                 else (1, 224, 224, 3))
        t0 = jax.eval_shape(mk("none").init, key, jnp.zeros(shape))
        t1 = jax.eval_shape(mk("int8").init, key, jnp.zeros(shape))
        f0 = jax.tree_util.tree_flatten_with_path(t0)
        f1 = jax.tree_util.tree_flatten_with_path(t1)
        assert [p for p, _ in f0[0]] == [p for p, _ in f1[0]]
        assert [(v.shape, v.dtype) for _, v in f0[0]] == \
               [(v.shape, v.dtype) for _, v in f1[0]]


# -------------------------------------------- demo-weight accuracy (e2e-ish)

def _line_tile(h=128, w=384):
    """A handwriting-like tile: dark curls on white, like the bench class."""
    img = np.full((h, w, 3), 255, np.uint8)
    t = np.linspace(0, 4 * np.pi, 900)
    for k in range(3):
        xs = (60 + 120 * k + 45 * np.cos(t * (1 + k))).astype(int)
        ys = (h // 2 + 40 * np.sin(t + k)).astype(int)
        img[np.clip(ys, 0, h - 1), np.clip(xs, 0, w - 1)] = 0
        img[np.clip(ys + 1, 0, h - 1), np.clip(xs, 0, w - 1)] = 0
    return img


@pytest.mark.slow  # ~2.5 min CPU: real demo weights; int8 numerics are
# covered by the fast unit tests above (VERDICT r4 item 7)
@pytest.mark.skipif(not (DEMO / "binarizer.msgpack").exists(),
                    reason="models_demo weights not present")
def test_unet_int8_mask_agreement_demo_weights():
    from stroke_derenderer_tpu.weights.store import (
        binarizer_template, build_binarizer_model, load_variables,
    )
    cfg = BinarizerConfig.from_json(DEMO / "configs_binarizer.json")
    model, template = binarizer_template(cfg)
    variables = load_variables(template, DEMO / "binarizer.msgpack")
    x = jnp.asarray(_line_tile()[None].astype(np.float32) / 255.0)
    probs_f = np.asarray(model.apply(variables, x))[..., 0]
    qmodel = build_binarizer_model(dataclasses.replace(cfg, quant="int8"))
    probs_q = np.asarray(qmodel.apply(variables, x))[..., 0]
    m_f, m_q = probs_f > cfg.bin_thr, probs_q > cfg.bin_thr
    agree = float((m_f == m_q).mean())
    assert agree >= 0.98, f"mask agreement {agree:.4f}"
    # The ink itself must survive quantization (not just the background).
    inter = float((m_f & m_q).sum())
    union = float((m_f | m_q).sum())
    assert union == 0 or inter / union >= 0.85


@pytest.mark.slow  # ~2 min CPU: real demo weights (see above)
@pytest.mark.skipif(not (DEMO / "strokes_encoder.msgpack").exists(),
                    reason="models_demo weights not present")
def test_encoder_int8_feature_cosine_demo_weights():
    from stroke_derenderer_tpu.pipeline import StrokeEstimator
    cfg = StrokesConfig.from_json(DEMO / "configs_strokes.json")
    est = StrokeEstimator(cfg, weights_paths={
        "encoder": DEMO / "strokes_encoder.msgpack",
        "decoder": DEMO / "strokes_decoder.msgpack"})
    glyph = _line_tile(224, 224).astype(np.float32) / 255.0
    mean = np.asarray(cfg.mean, np.float32)
    std = np.asarray(cfg.std, np.float32)
    x = jnp.asarray(((glyph - mean) / std)[None])
    feats_f = np.asarray(est.encoder.apply(est.enc_vars, x)).ravel()
    qenc = ResNetEncoder(arch=cfg.encoder_arch, dtype=est.encoder.dtype,
                         norm=cfg.encoder_norm, quant="int8")
    feats_q = np.asarray(qenc.apply(est.enc_vars, x)).ravel()
    cos = float(feats_f @ feats_q
                / (np.linalg.norm(feats_f) * np.linalg.norm(feats_q)))
    assert cos > 0.98, f"encoder feature cosine {cos:.4f}"
