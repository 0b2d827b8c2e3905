"""Eval runner smoke test (tiny random models — checks plumbing, not quality)."""

import json

from stroke_derenderer_tpu.config import BinarizerConfig, StrokesConfig
from stroke_derenderer_tpu.eval.run import evaluate_full
from stroke_derenderer_tpu.weights import materialize_model_dir


def test_evaluate_full_structure(tmp_path):
    materialize_model_dir(
        tmp_path,
        BinarizerConfig(features=(8, 16), bottleneck=32,
                        compute_dtype="float32"),
        StrokesConfig(encoder_arch="tiny", embed_dim=16, attention_dim=16,
                      decoder_dim=16, max_length=16,
                      compute_dtype="float32"))
    res = evaluate_full(tmp_path, n=2, width=500)
    json.dumps(res)  # serializable
    assert res["n"] == 2
    assert 0.0 <= res["binarization_f1"] <= 1.0
    assert res["stroke_dtw"] is None or res["stroke_dtw"] >= 0.0
    assert "stroke_chamfer" in res and "stroke_dtw_failures" in res
