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
from stroke_derenderer_tpu.eval import (
    binarization_f1, binarization_f1_tol, stroke_coverage, stroke_dtw,
    stroke_dtw_assigned, stroke_dtw_split, strokes_chamfer,
)


def evaluate_full(models_dir, n: int = 50, seed: int = 0,
                  width: int = 1152, se_overrides: dict | None = None,
                  dense: bool = False, style: str = "smooth",
                  bin_overrides: dict | None = None,
                  ruled: float = 0.0, binarizer_only: bool = False) -> dict:
    """Full metrics: binarization F1 on rendered lines, stroke DTW/chamfer on
    glyph-sized samples with known ground-truth polylines.

    ``dense=True`` scores a harder stroke distribution (40-point strokes ≈
    160+ tokens per glyph) that stresses decode-length generalization —
    models trained with a short teacher-forcing horizon truncate coverage
    here (early EOS) long before they fail on the default set.

    ``style="mixed"`` scores the full mixed-family distribution (Lissajous
    curls, traveling loops, zigzags — data/synthetic.mixed_strokes): the
    bench workload's stroke class and round-1's known OOD failure."""
    from stroke_derenderer_tpu.data.synthetic import (
        _photo_render, mixed_strokes, random_strokes, rasterize_strokes,
    )

    rng = np.random.default_rng(seed)
    binarizer, estimator = initialize_sessions(models_dir,
                                               se_overrides=se_overrides,
                                               bin_overrides=bin_overrides)
    h = binarizer.config.height

    f1s = []
    for _ in range(n):
        strokes = random_strokes(rng, int(rng.integers(3, 8)), (h, width))
        mask = rasterize_strokes(strokes, (h, width),
                                 thickness=int(rng.integers(1, 4)))
        # Short-circuit keeps the rng sequence unchanged at ruled=0.0 so
        # pinned eval numbers stay comparable across rounds.
        use_ruled = ruled > 0.0 and bool(rng.random() < ruled)
        img = _photo_render(mask, rng, ruled=use_ruled)
        out = binarizer.binarize_image(img)
        pred = out[:, :, 0] > (255 * binarizer.config.bin_thr)
        f1s.append(binarization_f1(pred, mask > 0))

    if binarizer_only:
        # Fast path for scoring binarizer-only changes (e.g. a ruled-paper
        # finetune): the stroke stage dominates eval wall-time and its
        # numbers wouldn't move.
        return {"n": n, "binarization_f1": float(np.mean(f1s))}

    # Stroke metrics across the glyph-group width spectrum: narrow isolated
    # glyphs through whole-line-wide groups (small resize ratios).
    dtws, chamfers, coverages = [], [], []
    dtws_asg, dtws_split = [], []
    widths_cycle = [h, 2 * h, 4 * h]
    pts = 40 if dense else 24
    for i in range(n):
        cw = widths_cycle[i % len(widths_cycle)]
        if style in ("mixed", "hand"):
            from stroke_derenderer_tpu.data.synthetic import HAND_PROBS
            strokes = mixed_strokes(
                rng, (h, cw), token_budget=380, max_strokes=3,
                style_probs=HAND_PROBS if style == "hand" else None)
        elif style == "letters":
            from stroke_derenderer_tpu.data.letters import (
                sample_word, word_strokes,
            )
            strokes = (word_strokes(rng, sample_word(rng), (h, cw),
                                    token_budget=380)
                       or mixed_strokes(rng, (h, cw), token_budget=380,
                                        max_strokes=3))
        else:
            strokes = random_strokes(rng, int(rng.integers(1, 4)), (h, cw),
                                     points_per_stroke=pts)
        mask = rasterize_strokes(strokes, (h, cw), thickness=2)
        pred_strokes = estimator.process_image(mask > 0)
        d = stroke_dtw(pred_strokes, strokes)
        c = strokes_chamfer(pred_strokes, strokes)
        dtws.append(d if np.isfinite(d) else None)
        chamfers.append(c if np.isfinite(c) else None)
        coverages.append(stroke_coverage(pred_strokes, strokes))
        a = stroke_dtw_assigned(pred_strokes, strokes)
        s = stroke_dtw_split(pred_strokes, strokes)
        dtws_asg.append(a if np.isfinite(a) else None)
        dtws_split.append(s if np.isfinite(s) else None)

    def _mean(xs):
        xs = [x for x in xs if x is not None]
        return float(np.mean(xs)) if xs else None

    dtw_ok = [x for x in dtws if x is not None]
    return {
        "n": n,
        "binarization_f1": float(np.mean(f1s)),
        "stroke_dtw": _mean(dtws),
        # 95% CI half-width of the DTW mean (VERDICT r1: eval was too small
        # and interval-free to rank builder changes reliably).
        "stroke_dtw_ci95": (float(1.96 * np.std(dtw_ok)
                                  / max(len(dtw_ok), 1) ** 0.5)
                            if len(dtw_ok) > 1 else None),
        "stroke_dtw_failures": sum(x is None for x in dtws),
        # Attribution pair (VERDICT r4 item 3): optimal one-to-one pairing
        # (greedy-vs-assigned gap = matching suboptimality) and
        # fragmentation-forgiving many-to-one (assigned-vs-split gap =
        # split cost; split-vs-chamfer residue = geometry).
        "stroke_dtw_assigned": _mean(dtws_asg),
        "stroke_dtw_split": _mean(dtws_split),
        "stroke_chamfer": _mean(chamfers),
        "stroke_coverage": _mean(coverages),
    }


def evaluate_real(models_dir, data_dir, se_overrides: dict | None = None,
                  bin_overrides: dict | None = None) -> dict:
    """Score the full pipeline on REAL labeled pairs (data/real.py format:
    <stem>.png + <stem>_STROKES.json [+ <stem>_BINARIZED.png]) — the photo
    runs through binarize AND stroke estimation end-to-end, metrics compare
    against the file ground truth in the height-normalized frame."""
    from stroke_derenderer_tpu.data.real import discover_pairs, load_pair

    pairs = discover_pairs(data_dir)
    if not pairs:
        raise FileNotFoundError(f"no (png, _STROKES.json) pairs in {data_dir}")
    binarizer, estimator = initialize_sessions(models_dir,
                                               se_overrides=se_overrides,
                                               bin_overrides=bin_overrides)
    h = binarizer.config.height

    f1s, dtws, chamfers, coverages = [], [], [], []
    f1s_tol, dtws_asg, dtws_split = [], [], []
    for png, sj in pairs:
        img_rs, mask, strokes = load_pair(png, sj, h)
        out = binarizer.binarize_image(img_rs)
        pred_mask = out[:, :, 0] > (255 * binarizer.config.bin_thr)
        f1s.append(binarization_f1(pred_mask, mask > 0))
        f1s_tol.append(binarization_f1_tol(pred_mask, mask > 0))
        pred_strokes = estimator.process_image(pred_mask)
        d = stroke_dtw(pred_strokes, strokes)
        c = strokes_chamfer(pred_strokes, strokes)
        dtws.append(d if np.isfinite(d) else None)
        chamfers.append(c if np.isfinite(c) else None)
        coverages.append(stroke_coverage(pred_strokes, strokes))
        a = stroke_dtw_assigned(pred_strokes, strokes)
        s = stroke_dtw_split(pred_strokes, strokes)
        dtws_asg.append(a if np.isfinite(a) else None)
        dtws_split.append(s if np.isfinite(s) else None)

    def _mean(xs):
        xs = [x for x in xs if x is not None]
        return float(np.mean(xs)) if xs else None

    dtw_ok = [x for x in dtws if x is not None]
    return {
        "n": len(pairs),
        "binarization_f1": _mean(f1s),
        # ±1px boundary-tolerant F1: exact-vs-tol gap = mask-convention
        # share of the real-photo F1 deficit (VERDICT r4 item 6).
        "binarization_f1_tol1": _mean(f1s_tol),
        "stroke_dtw": _mean(dtws),
        "stroke_dtw_ci95": (float(1.96 * np.std(dtw_ok)
                                  / max(len(dtw_ok), 1) ** 0.5)
                            if len(dtw_ok) > 1 else None),
        "stroke_dtw_failures": sum(x is None for x in dtws),
        "stroke_dtw_assigned": _mean(dtws_asg),
        "stroke_dtw_split": _mean(dtws_split),
        "stroke_chamfer": _mean(chamfers),
        "stroke_coverage": _mean(coverages),
    }


def main(argv=None):
    from stroke_derenderer_tpu.utils import (
        enable_compile_cache, honor_platform_env,
    )
    honor_platform_env()
    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", required=True)
    ap.add_argument("--n", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--decode", choices=["greedy", "beam"], default=None)
    ap.add_argument("--beam-size", type=int, default=None)
    ap.add_argument("--length-penalty", type=float, default=None,
                    help="GNMT length normalization for beam ranking "
                         "(beam decode only; config.length_penalty)")
    ap.add_argument("--redecode", type=float, default=None,
                    help="coverage-driven residual re-decode floor "
                         "(config.redecode_coverage), e.g. 0.9")
    ap.add_argument("--redecode-passes", type=int, default=None,
                    help="max residual passes (config.redecode_passes)")
    ap.add_argument("--refine", type=float, default=None, metavar="PX",
                    help="ink-snap refinement radius "
                         "(config.refine_snap), e.g. 3")
    ap.add_argument("--dense", action="store_true",
                    help="harder 40-point-stroke distribution (decode-length "
                         "generalization)")
    ap.add_argument("--style", choices=["smooth", "mixed", "hand", "letters"],
                    default="smooth",
                    help="stroke eval distribution: 'mixed' includes "
                         "Lissajous curls/loops/zigzags (the bench class); "
                         "'letters' is letterform words (data/letters.py); "
                         "'hand' mixes both")
    ap.add_argument("--ruled", type=float, default=0.0, metavar="P",
                    help="probability a binarization-F1 line renders on "
                         "ruled colored paper (distractor guide lines)")
    ap.add_argument("--binarizer-only", action="store_true",
                    help="report binarization F1 only (skips the stroke "
                         "stage — fast scoring of binarizer-only changes)")
    ap.add_argument("--quant", choices=["none", "int8"], default=None,
                    help="dynamic int8 conv stacks (ops/quant.py) for both "
                         "models — quantized-quality measurement")
    ap.add_argument("--data", default=None, metavar="DIR",
                    help="score on REAL labeled pairs from DIR "
                         "(data/real.py format) instead of synthetic "
                         "samples; --n/--seed/--style/--dense are ignored")
    args = ap.parse_args(argv)
    ov = {}
    if args.decode:
        ov["decode"] = args.decode
    if args.beam_size:
        ov["beam_size"] = args.beam_size
    if args.length_penalty is not None:
        ov["length_penalty"] = args.length_penalty
    if args.redecode is not None:
        ov["redecode_coverage"] = args.redecode
    if args.redecode_passes is not None:
        ov["redecode_passes"] = args.redecode_passes
    if args.refine is not None:
        ov["refine_snap"] = args.refine
    bov = {}
    if args.quant:
        ov["quant"] = args.quant
        bov["quant"] = args.quant
    if args.data:
        print(json.dumps(evaluate_real(args.models, args.data,
                                       se_overrides=ov or None,
                                       bin_overrides=bov or None)))
        return 0
    print(json.dumps(evaluate_full(args.models, args.n, args.seed,
                                   se_overrides=ov or None,
                                   dense=args.dense, style=args.style,
                                   bin_overrides=bov or None,
                                   ruled=args.ruled,
                                   binarizer_only=args.binarizer_only)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
