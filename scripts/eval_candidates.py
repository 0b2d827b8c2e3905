"""Score candidate model dirs across the three synthetic eval sets.

    python scripts/eval_candidates.py models_r12 [models_r11 ...] \
        [--n 50] [--styles mixed,smooth,hand]

One line of JSON per (model, style) with the standard eval.run metrics —
the promotion protocol for models_demo (VERDICT r3 item 2): n=50 seed 0
greedy; a candidate must beat the incumbent on the mixed set (the bench
class) without losing smooth.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from stroke_derenderer_tpu.eval.run import evaluate_full
    from stroke_derenderer_tpu.utils import (
        enable_compile_cache, honor_platform_env,
    )

    honor_platform_env()
    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("models", nargs="+")
    ap.add_argument("--n", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--styles", default="mixed,smooth,hand")
    args = ap.parse_args()

    for mdir in args.models:
        for style in args.styles.split(","):
            r = evaluate_full(mdir, n=args.n, seed=args.seed, style=style)
            r.update({"models": mdir, "style": style})
            print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
