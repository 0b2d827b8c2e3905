"""Pseudo-label real photos with the calibrated residual re-decode.

Round-5 real-ink self-training (VERDICT r4 item 2): the repo's best
tracer of real ink is the redecode policy (coverage 0.95+ on the real
set, models_demo/README.md), while single-pass greedy is what ships hot.
This script distills the former into training data for the latter: it
runs the full pipeline with ``--preset real`` semantics over a directory
of photos and emits (photo, _STROKES.json, _BINARIZED.png) triples in
data/real.py's training format, so

    python -m stroke_derenderer_tpu.train.loop --model captioner \
        --data <out> --cache cache_hand_all --real-frac 0.4 ...

finetunes the captioner to trace that ink in ONE pass.

CONTAMINATION RECORD: in this zero-egress environment the only real ink
available is the eval set's own photographs (examples/real_data). Self-
training on them and then scoring on them measures "can the single-pass
model learn to trace this ink as well as the multi-pass redecode" — the
distillation goal — NOT generalization to unseen writers. The synthetic
sets (which share no ink with training beyond their generator family)
remain the generalization check, enforced by scripts/eval_candidates.py.

    python scripts/make_pseudo_labels.py --models models_demo \
        --input examples/real_data --out data_pseudo_real
"""

from __future__ import annotations

import argparse
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from stroke_derenderer_tpu.cli import entrypoint

    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--models", default="models_demo")
    ap.add_argument("--input", default="examples/real_data",
                    help="directory of photos (<stem>.png; *_BINARIZED.png "
                         "are skipped)")
    ap.add_argument("--out", default="data_pseudo_real")
    ap.add_argument("--redecode", type=float, default=0.9)
    ap.add_argument("--simplify-eps", type=float, default=1.5,
                    help="RDP-simplify the emitted polylines, eps in "
                         "128-height line space (scaled by each photo's "
                         "height). Redecode emits vertex-dense polylines "
                         "whose token strings overflow the trainer's "
                         "384-token horizon (measured: median 317 tokens "
                         "per glyph raw, 68%% fit@385; eps 1.5 -> median "
                         "141, 97%% fit) and would teach the decoder an "
                         "unnaturally dense vertex economy. 0 disables.")
    args = ap.parse_args()

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    # Photos only — the input dir may be the eval set, whose *_BINARIZED
    # masks and *_STROKES ground truth must NOT leak into the pseudo dir
    # (the pipeline rewrites both from its own predictions).
    stage = out / "_inputs"
    stage.mkdir(exist_ok=True)
    n = 0
    for png in sorted(Path(args.input).glob("*.png")):
        if png.stem.endswith("_BINARIZED"):
            continue
        shutil.copyfile(png, stage / png.name)
        n += 1
    if not n:
        raise SystemExit(f"no photos in {args.input}")

    rc = entrypoint(["-models", args.models, "-input", str(stage),
                     "--output", str(out), "--batch",
                     "--redecode", str(args.redecode)])
    if rc != 0:
        raise SystemExit(rc)
    # Final layout: photo + predicted strokes + predicted mask per stem.
    for png in stage.glob("*.png"):
        shutil.move(str(png), out / png.name)
    stage.rmdir()
    if args.simplify_eps > 0:
        simplify_dir(out, args.simplify_eps)
    print(f"pseudo-labeled {n} photos into {out}")


def simplify_dir(out: Path, eps_base: float) -> None:
    """RDP-simplify every ``*_STROKES.json`` in ``out`` in place, eps
    scaled to each photo's height (eps is specified in the 128-px line
    space the pipeline works in)."""
    import json

    import numpy as np
    from PIL import Image

    from make_real_eval_set import rdp

    for sj in sorted(out.glob("*_STROKES.json")):
        png = out / (sj.name[: -len("_STROKES.json")] + ".png")
        if not png.exists():
            continue
        h = Image.open(png).size[1]
        eps = eps_base * h / 128.0
        strokes = json.load(open(sj))
        simp = []
        for xs, ys in strokes:
            p = np.asarray(list(zip(xs, ys)), float)
            q = rdp(p, eps)
            simp.append([[float(v) for v in q[:, 0]],
                         [float(v) for v in q[:, 1]]])
        json.dump(simp, open(sj, "w"))


if __name__ == "__main__":
    raise SystemExit(main())
