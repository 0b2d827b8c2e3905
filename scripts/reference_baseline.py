"""Measure the REFERENCE pipeline itself as the CPU baseline denominator.

BASELINE.md's north-star is ">=20x the ONNX-CPU reference images/sec", but
round 1 could only pin a self-baseline (this repo's own pipeline on the
JAX CPU backend) because the reference's pretrained weights don't exist in
this environment and onnxruntime isn't installed (VERDICT r1 weak #2: the
speedup ratio was "vs self on CPU").

This script closes that gap without copying any reference code: it IMPORTS
the reference's own session classes (/root/reference, the same oracle-import
pattern the parity tests use), hands them the five ONNX graphs EXPORTED from
the shipped models_demo weights (weights/graph_export.py), and satisfies the
``onnxruntime`` dependency with the in-repo torch-backed executor
(weights/onnx_run.TorchOnnxSession — graph parsed once per session, torch
CPU/MKL kernels). The workload is bench.py's exact 8-image set, driven the
way the reference main.py:91-136 drives it: per-image, minibatched tiles
through ORT (evaluate_binarize.py:85-115), and the shrinking-batch
per-token host loop — up to 768 session calls per image
(evaluate_strokes.py:279-302).

Caveat (documented wherever the number is cited): TorchOnnxSession is an
op-by-op interpreter, not ONNX Runtime's fused C++ graph engine, so the
measured number has Python dispatch overhead ORT would not have. Both
baselines are therefore kept: bench.py pins the self-baseline (same JAX
code on CPU — architecture-for-architecture conservative) AND this
reference-pipeline number (execution-pattern-faithful).

Run from the repo root: `python scripts/reference_baseline.py [--n 8]`.
"""

from __future__ import annotations

import sys
import types
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os  # noqa: E402
# This is a CPU-baseline measurement by definition: the ONNX export and
# the torch executor both run on the host. Force the CPU backend even when
# the environment pins an accelerator platform (the axon plugin otherwise
# spins in connect-retry loops when the tunnel is wedged).
os.environ["JAX_PLATFORMS"] = "cpu"

from stroke_derenderer_tpu.utils import honor_platform_env  # noqa: E402
honor_platform_env()

import argparse  # noqa: E402
import json  # noqa: E402
import tempfile  # noqa: E402
import time  # noqa: E402

import numpy as np  # noqa: E402


def _install_ort_shim() -> None:
    """Satisfy ``import onnxruntime`` with the torch-backed executor."""
    from stroke_derenderer_tpu.weights.onnx_run import TorchOnnxSession
    shim = types.ModuleType("onnxruntime")
    shim.InferenceSession = TorchOnnxSession
    sys.modules["onnxruntime"] = shim


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8,
                    help="bench images (bench.py workload, default 8)")
    ap.add_argument("--models", default=str(REPO / "models_demo"))
    ap.add_argument("--onnx-dir", default=None,
                    help="reuse an exported ONNX dir instead of exporting")
    args = ap.parse_args(argv)

    from bench import DECODE_STEPS, make_images
    imgs = make_images(args.n)

    if args.onnx_dir:
        onnx_dir = Path(args.onnx_dir)
    else:
        onnx_dir = Path(tempfile.mkdtemp(prefix="ref_onnx_"))
        from stroke_derenderer_tpu.weights.graph_export import (
            export_reference_models,
        )
        print(f"exporting {args.models} -> {onnx_dir}", file=sys.stderr)
        export_reference_models(args.models, onnx_dir)

    _install_ort_shim()
    ref = Path("/root/reference")
    if not ref.exists():
        print("reference repo not present", file=sys.stderr)
        return 2
    sys.path.insert(0, str(ref))
    from derenderer.evaluate_binarize import BinarizationSession
    from derenderer.evaluate_strokes import StrokeEstimationSession

    bs = BinarizationSession(
        configs_path=str(onnx_dir / "configs_binarizer.json"))
    ort_bs = bs.init_onnx_inference(str(onnx_dir / "binarizer.onnx"))
    se = StrokeEstimationSession(
        configs_path=str(onnx_dir / "configs_strokes.json"))
    graphs = {"encoder": "encoder.onnx", "decoder_init": "decoder_init_hc.onnx",
              "decoder_iter": "decoder_iter.onnx",
              "decoder_embedding": "decoder_embedding.onnx"}
    if (onnx_dir / "projection.onnx").exists():
        graphs["projection"] = "projection.onnx"
    orts_se = se.load_orts({k: str(onnx_dir / v) for k, v in graphs.items()})

    # The reference main loop's per-image work (main.py:101-126), minus
    # file IO: binarize -> threshold -> stroke-estimate.
    t_bin = t_se = 0.0
    n_strokes = 0
    t0 = time.time()
    for img in imgs:
        t1 = time.time()
        img_bin = bs.binarize_image(img, ort_bs)
        img_bin = img_bin[:, :, 0] > (255 * bs.bin_thr)
        t2 = time.time()
        strokes = se.process_image(img_bin, orts_se, max_length=DECODE_STEPS)
        t3 = time.time()
        t_bin += t2 - t1
        t_se += t3 - t2
        n_strokes += len(strokes)
    total = time.time() - t0

    out = {
        "reference_pipeline_ips": round(args.n / total, 4),
        "binarize_ips": round(args.n / t_bin, 4),
        "strokes_ips": round(args.n / t_se, 4),
        "n_images": args.n,
        "n_strokes_decoded": n_strokes,
        "executor": "weights/onnx_run.TorchOnnxSession (torch CPU ops; "
                    "op-interpreter overhead vs real ORT — see docstring)",
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
