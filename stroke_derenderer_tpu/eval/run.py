"""Evaluation runner: score a model directory on synthetic ground truth.

    python -m stroke_derenderer_tpu.eval.run --models ./models_demo --n 8

Generates synthetic line images with known masks and strokes
(data/synthetic.py), runs the full two-stage pipeline, and reports
binarization F1 + stroke DTW/chamfer (the BASELINE.md parity metrics; the
reference ships no evaluation tooling at all).
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from stroke_derenderer_tpu.cli import initialize_sessions
from stroke_derenderer_tpu.eval import binarization_f1, stroke_dtw, strokes_chamfer


def evaluate_full(models_dir, n: int = 8, seed: int = 0,
                  width: int = 1152, se_overrides: dict | None = None,
                  dense: bool = False) -> dict:
    """Full metrics: binarization F1 on rendered lines, stroke DTW/chamfer on
    glyph-sized samples with known ground-truth polylines.

    ``dense=True`` scores a harder stroke distribution (40-point strokes ≈
    160+ tokens per glyph) that stresses decode-length generalization —
    models trained with a short teacher-forcing horizon truncate coverage
    here (early EOS) long before they fail on the default set."""
    from stroke_derenderer_tpu.data.synthetic import (
        _photo_render, random_strokes, rasterize_strokes,
    )

    rng = np.random.default_rng(seed)
    binarizer, estimator = initialize_sessions(models_dir,
                                               se_overrides=se_overrides)
    h = binarizer.config.height

    f1s = []
    for _ in range(n):
        strokes = random_strokes(rng, int(rng.integers(3, 8)), (h, width))
        mask = rasterize_strokes(strokes, (h, width),
                                 thickness=int(rng.integers(1, 4)))
        img = _photo_render(mask, rng)
        out = binarizer.binarize_image(img)
        pred = out[:, :, 0] > (255 * binarizer.config.bin_thr)
        f1s.append(binarization_f1(pred, mask > 0))

    # Stroke metrics across the glyph-group width spectrum: narrow isolated
    # glyphs through whole-line-wide groups (small resize ratios).
    dtws, chamfers = [], []
    widths_cycle = [h, 2 * h, 4 * h]
    pts = 40 if dense else 24
    for i in range(n):
        cw = widths_cycle[i % len(widths_cycle)]
        strokes = random_strokes(rng, int(rng.integers(1, 4)), (h, cw),
                                 points_per_stroke=pts)
        mask = rasterize_strokes(strokes, (h, cw), thickness=2)
        pred_strokes = estimator.process_image(mask > 0)
        d = stroke_dtw(pred_strokes, strokes)
        c = strokes_chamfer(pred_strokes, strokes)
        dtws.append(d if np.isfinite(d) else None)
        chamfers.append(c if np.isfinite(c) else None)

    def _mean(xs):
        xs = [x for x in xs if x is not None]
        return float(np.mean(xs)) if xs else None

    return {
        "n": n,
        "binarization_f1": float(np.mean(f1s)),
        "stroke_dtw": _mean(dtws),
        "stroke_dtw_failures": sum(x is None for x in dtws),
        "stroke_chamfer": _mean(chamfers),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", required=True)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--decode", choices=["greedy", "beam"], default=None)
    ap.add_argument("--beam-size", type=int, default=None)
    ap.add_argument("--dense", action="store_true",
                    help="harder 40-point-stroke distribution (decode-length "
                         "generalization)")
    args = ap.parse_args(argv)
    ov = {}
    if args.decode:
        ov["decode"] = args.decode
    if args.beam_size:
        ov["beam_size"] = args.beam_size
    print(json.dumps(evaluate_full(args.models, args.n, args.seed,
                                   se_overrides=ov or None,
                                   dense=args.dense)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
