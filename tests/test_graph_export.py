"""Flax -> ONNX export validation (weights/graph_export.py).

Two independent checks on every exported graph:

  1. EXECUTION: a torch-backed interpreter runs the emitted ONNX nodes
     (this file's ``run_onnx``) and the outputs must match the flax
     forward — this validates the graphs are semantically correct programs
     a real ONNX runtime would execute, not just containers of tensors.
  2. ROUND-TRIP: graph_import re-imports the exported files and the
     recovered flax variables must be bit-identical to the originals
     (layout converters invert exactly).
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stroke_derenderer_tpu.config import BinarizerConfig, StrokesConfig
from stroke_derenderer_tpu.weights.graph_export import (
    export_binarizer_graph, export_decoder_graphs, export_encoder_graph,
    export_reference_models,
)
from stroke_derenderer_tpu.weights.onnx_graph import read_onnx_graph
from stroke_derenderer_tpu.weights.store import (
    init_binarizer_variables, init_strokes_variables,
)

# Torch-backed ONNX interpreter: promoted to the package so the
# reference-baseline script can reuse it (weights/onnx_run.py).
from stroke_derenderer_tpu.weights.onnx_run import run_onnx  # noqa: E402


def _tree_equal(a, b, path=""):
    assert set(a) == set(b), f"{path}: {set(a)} != {set(b)}"
    for k in a:
        if isinstance(a[k], dict):
            _tree_equal(a[k], b[k], f"{path}/{k}")
        else:
            np.testing.assert_array_almost_equal(
                np.asarray(a[k], np.float32), np.asarray(b[k], np.float32),
                decimal=6, err_msg=f"{path}/{k}")


def _randomized(variables, seed=0):
    """Random params/stats: catches layout transposes that identity-ish
    init values would mask."""
    rng = np.random.default_rng(seed)
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(rng.normal(0.1, 0.5, x.shape), x.dtype)
        if np.issubdtype(x.dtype, np.floating) else x, variables)


TINY_BIN = dict(features=(8, 16), bottleneck=32, compute_dtype="float32")
TINY_SE = dict(encoder_arch="tiny", embed_dim=16, attention_dim=16,
               decoder_dim=16, image_size=56, encode_image_size=4,
               compute_dtype="float32")


# ------------------------------ binarizer ------------------------------


@pytest.mark.parametrize("norm", ["group", "batch"])
def test_export_binarizer_executes_and_roundtrips(tmp_path, norm):
    from stroke_derenderer_tpu.weights.graph_import import map_binarizer_graph

    cfg = BinarizerConfig(norm=norm, **TINY_BIN)
    model, variables = init_binarizer_variables(cfg, seed=0)
    variables = _randomized(variables)
    if norm == "batch":  # keep running variance positive
        variables = {
            "params": variables["params"],
            "batch_stats": jax.tree_util.tree_map(
                lambda x: jnp.abs(x) + 0.5, variables["batch_stats"]),
        }
    path = tmp_path / "binarizer.onnx"
    export_binarizer_graph(cfg, variables, path)

    x = np.random.default_rng(1).uniform(0, 1, (2, 3, 32, 96)).astype(np.float32)
    got = run_onnx(path, {"input": x})["output"]
    want = np.asarray(model.apply(variables, jnp.asarray(
        x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want.transpose(0, 3, 1, 2),
                               atol=2e-5, rtol=1e-4)

    cfg2, vars2 = map_binarizer_graph(path)
    assert cfg2.norm == norm
    assert tuple(cfg2.features) == cfg.features
    assert cfg2.bottleneck == cfg.bottleneck
    _tree_equal(jax.tree_util.tree_map(np.asarray, variables), vars2)


def test_torch_onnx_session_matches_run_onnx(tmp_path):
    """The InferenceSession drop-in (scripts/reference_baseline.py's ORT
    shim) returns the same arrays as run_onnx, honors output selection,
    and is reusable across calls (parsed-once state must not leak)."""
    from stroke_derenderer_tpu.weights.onnx_run import TorchOnnxSession

    cfg = BinarizerConfig(norm="group", **TINY_BIN)
    _, variables = init_binarizer_variables(cfg, seed=0)
    variables = _randomized(variables)
    path = tmp_path / "binarizer.onnx"
    export_binarizer_graph(cfg, variables, path)

    x = np.random.default_rng(2).uniform(0, 1, (2, 3, 32, 96)).astype(np.float32)
    want = run_onnx(path, {"input": x})["output"]
    sess = TorchOnnxSession(str(path))
    got = sess.run(["output"], {"input": x})
    np.testing.assert_array_equal(got[0], want)
    # default output list + second call on different data
    x2 = np.random.default_rng(3).uniform(0, 1, (1, 3, 32, 96)).astype(np.float32)
    got2 = sess.run(None, {"input": x2})
    np.testing.assert_array_equal(got2[0], run_onnx(path, {"input": x2})["output"])


# ------------------------------ encoder ------------------------------


@pytest.mark.parametrize("norm", ["group", "batch"])
def test_export_encoder_executes_and_roundtrips(tmp_path, norm):
    from stroke_derenderer_tpu.models.encoder import ResNetEncoder
    from stroke_derenderer_tpu.weights.graph_import import map_encoder_graph

    cfg = StrokesConfig(encoder_norm=norm, **TINY_SE)
    encoder, _, enc_vars, _, _ = init_strokes_variables(cfg, seed=0)
    enc_vars = _randomized(enc_vars)
    if norm == "batch":
        enc_vars = {
            "params": enc_vars["params"],
            "batch_stats": jax.tree_util.tree_map(
                lambda x: jnp.abs(x) + 0.5, enc_vars["batch_stats"]),
        }
    path = tmp_path / "encoder.onnx"
    export_encoder_graph(cfg, enc_vars, path)

    x = np.random.default_rng(2).normal(0, 1, (2, 3, 56, 56)).astype(np.float32)
    got = run_onnx(path, {"input": x})["output"]
    want = np.asarray(encoder.apply(enc_vars, jnp.asarray(
        x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want.transpose(0, 3, 1, 2),
                               atol=3e-5, rtol=1e-4)

    arch2, norm2, vars2 = map_encoder_graph(path)
    assert arch2 == "tiny" and norm2 == norm
    _tree_equal(jax.tree_util.tree_map(np.asarray, enc_vars), vars2)


# ------------------------------ decoder ------------------------------


@pytest.mark.parametrize("with_projection", [False, True])
def test_export_decoder_executes_and_roundtrips(tmp_path, with_projection):
    from stroke_derenderer_tpu.models.decoder import AttentiveDecoder
    from stroke_derenderer_tpu.weights.graph_import import map_decoder_graphs

    cfg = StrokesConfig(projection_dim=12 if with_projection else 0,
                        **TINY_SE)
    _, decoder, _, dec_vars, proj_vars = init_strokes_variables(cfg, seed=0)
    dec_vars = _randomized(dec_vars)
    proj_vars = _randomized(proj_vars, seed=3) if with_projection else None
    export_decoder_graphs(cfg, dec_vars, tmp_path, proj_variables=proj_vars)

    rng = np.random.default_rng(3)
    b, n_pos = 2, cfg.encode_image_size ** 2
    enc_dim = cfg.projection_dim or 64  # tiny arch out_features = 64
    enc_seq = rng.normal(0, 1, (b, n_pos, enc_dim)).astype(np.float32)
    tokens = np.asarray([5, 9], np.int64)

    apply = lambda method, *a: decoder.apply(dec_vars, *a, method=method)

    # embedding
    got_emb = run_onnx(tmp_path / "decoder_embedding.onnx",
                       {"input": tokens})["output"]
    want_emb = np.asarray(apply(AttentiveDecoder.embed,
                                jnp.asarray(tokens.astype(np.int32))))
    np.testing.assert_allclose(got_emb, want_emb, atol=1e-6)

    # init_hc (the reference feeds the mean-pooled encoding,
    # evaluate_strokes.py:265)
    init = run_onnx(tmp_path / "decoder_init_hc.onnx",
                    {"input": enc_seq.mean(axis=1)})
    want_h, want_c = apply(AttentiveDecoder.init_state, jnp.asarray(enc_seq))
    np.testing.assert_allclose(init["output_h"], np.asarray(want_h), atol=1e-5)
    np.testing.assert_allclose(init["output_c"], np.asarray(want_c), atol=1e-5)

    # one iter step
    it = run_onnx(tmp_path / "decoder_iter.onnx",
                  {"input_enc": enc_seq, "input_emb": want_emb,
                   "input_h": init["output_h"], "input_c": init["output_c"]})
    enc_proj = apply(AttentiveDecoder.project_encoding, jnp.asarray(enc_seq))
    logits, h2, c2, _ = apply(AttentiveDecoder.step, jnp.asarray(enc_seq),
                              enc_proj, jnp.asarray(want_emb),
                              jnp.asarray(init["output_h"]),
                              jnp.asarray(init["output_c"]))
    np.testing.assert_allclose(it["output_pred"], np.asarray(logits),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(it["output_h"], np.asarray(h2), atol=1e-5)
    np.testing.assert_allclose(it["output_c"], np.asarray(c2), atol=1e-5)

    # projection + round-trip of every tensor
    proj_path = tmp_path / "projection.onnx" if with_projection else None
    if with_projection:
        import flax.linen as nn
        raw = rng.normal(0, 1, (b, n_pos, 64)).astype(np.float32)
        got_p = run_onnx(proj_path, {"input": raw})["output"]
        proj = nn.Dense(cfg.projection_dim, dtype=jnp.float32)
        want_p = np.asarray(proj.apply(proj_vars, jnp.asarray(raw)))
        np.testing.assert_allclose(got_p, want_p, atol=1e-5)

    dims, vars2, proj2 = map_decoder_graphs(
        tmp_path / "decoder_init_hc.onnx",
        tmp_path / "decoder_embedding.onnx",
        tmp_path / "decoder_iter.onnx", proj_path)
    assert dims["decoder_dim"] == cfg.decoder_dim
    assert dims["embed_dim"] == cfg.embed_dim
    _tree_equal(jax.tree_util.tree_map(np.asarray, dec_vars), vars2)
    if with_projection:
        _tree_equal(jax.tree_util.tree_map(np.asarray, proj_vars), proj2)


# --------------------------- turnkey both ways ---------------------------


def test_export_then_import_turnkey(tmp_path):
    """Native model dir -> ONNX dir -> native sessions: the CLI must load
    the exported directory exactly like a reference download, and both
    pipelines must produce identical outputs to the originals."""
    from stroke_derenderer_tpu.cli import initialize_sessions
    from stroke_derenderer_tpu.weights import materialize_model_dir

    native = tmp_path / "native"
    bin_cfg = BinarizerConfig(height=32, width=96, overlap=16, **TINY_BIN)
    se_cfg = StrokesConfig(max_length=12, **TINY_SE)
    materialize_model_dir(native, bin_cfg, se_cfg)

    onnx_dir = export_reference_models(native, tmp_path / "onnx")
    assert json.loads((onnx_dir / "configs_strokes.json").read_text())[
        "image_size"] == 56

    bin_a, est_a = initialize_sessions(native)
    bin_b, est_b = initialize_sessions(onnx_dir)

    img = np.full((40, 150, 3), 255, np.uint8)
    img[18:22, 10:120] = 0
    out_a = bin_a.binarize_image(img)
    out_b = bin_b.binarize_image(img)
    np.testing.assert_array_equal(out_a, out_b)

    mask = out_a[:, :, 0] > 127
    strokes_a = est_a.process_image(mask, max_length=12)
    strokes_b = est_b.process_image(mask, max_length=12)
    assert len(strokes_a) == len(strokes_b)
    for (ax, ay), (bx, by) in zip(strokes_a, strokes_b):
        np.testing.assert_allclose(ax, bx)
        np.testing.assert_allclose(ay, by)
