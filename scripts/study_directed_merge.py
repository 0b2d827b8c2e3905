"""Redecode fragment-join study: tol sweep + (rejected) direction gate.

The residual re-decode path joins fragments whose endpoints sit within a
radius (ops/strokes.merge_stroke_fragments). This study calibrated that
radius and gave a direction-continuity junction gate the repo's standing
measured keep-or-delete verdict (mixed n=24 seed 0, v9, redecode 0.9):

    tol  8 (old default)   DTW 33.11  cov 0.932
    tol 12                 DTW 31.24  cov 0.942
    tol 16                 DTW 28.87  cov 0.941
    tol 20 (new default)   DTW 26.84  cov 0.940   <- monotone minimum
    tol 24                 DTW 27.49  cov 0.937
    tol 32                 DTW 27.67  cov 0.943
    angle-gate 35/50 deg   DTW +1..+2 vs distance-only at equal tol:
                           REJECTED (unmerged fragments cost more under
                           the matched-pairs metric than bad junctions;
                           the gate implementation was deleted with it)

Chamfer was flat (4.12-4.21) across every variant. Rerun:

    JAX_PLATFORMS=cpu python scripts/study_directed_merge.py [--n 24]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=24)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--models", default="models_demo")
    args = ap.parse_args()

    from stroke_derenderer_tpu.eval.run import evaluate_full
    from stroke_derenderer_tpu.ops import strokes as sops
    from stroke_derenderer_tpu.pipeline import strokes as pstrokes
    from stroke_derenderer_tpu.utils import enable_compile_cache

    enable_compile_cache()
    base_merge = sops.merge_stroke_fragments

    VARIANTS = [
        ("tol 8 (old default)", 8.0),
        ("tol 12", 12.0),
        ("tol 16", 16.0),
        ("tol 20 (default)", 20.0),
        ("tol 24", 24.0),
        ("tol 32", 32.0),
    ]
    try:  # restore even if evaluate_full raises mid-sweep — the patch
        # must not leak into whatever the process runs next
        for name, tol_override in VARIANTS:
            def patched(strokes, tol=4.0, *, _t=tol_override):
                return base_merge(strokes, tol=_t)
            pstrokes.merge_stroke_fragments = patched
            r = evaluate_full(args.models, n=args.n, seed=args.seed,
                              style="mixed",
                              se_overrides={"redecode_coverage": 0.9})
            r["variant"] = name
            print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                              for k, v in r.items()}), flush=True)
    finally:
        pstrokes.merge_stroke_fragments = base_merge


if __name__ == "__main__":
    main()
