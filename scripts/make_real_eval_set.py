"""Build the real-ink eval set from the reference's demo photographs.

The synthetic eval families can't detect synthetic-distribution
overfitting (VERDICT r3 item 7); the only REAL handwriting available
with zero egress is the raw-ink bands inside the reference's demo
figures (`/root/reference/plot/*.png` — photos of ruled/grid-paper
handwriting, the pipeline's actual target class, cited by the reference
README.md:48-61). This script:

  1. crops the raw photograph bands (and word-level sub-crops) out of
     the composite figures into ``examples/real_data/<stem>.png``;
  2. extracts a ground-truth ink mask per crop (max-channel Otsu — ink
     is dark in every channel; ruled/grid lines are bright in at least
     one) → ``<stem>_BINARIZED.png`` at the height-normalized frame;
  3. ink-traces ground-truth strokes INDEPENDENTLY of the neural models:
     Zhang-Suen skeletonization of the mask, junction-aware path walking
     (continue through crossings along the straightest direction), RDP
     simplification, canonical ``sort_strokes`` order →
     ``<stem>_STROKES.json`` at the PNG's resolution (data/real.py
     contract).

The emitted labels were each reviewed against rendered overlays
(docs/real_data_overlay.png) and the crop/threshold parameters below are
the manually fixed result. Tracked quality numbers on this set live in
models_demo/README.md (``eval.run --data examples/real_data``).

    python scripts/make_real_eval_set.py [--out examples/real_data]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np
from PIL import Image

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REF_PLOT = Path("/root/reference/plot")

# (stem, source figure, (left, top, right, bottom)) — boxes select the raw
# photograph band inside each composite figure, trimmed clear of the
# figure's frame/arrow furniture.  Word sub-crops widen the set to 10.
CROPS = [
    ("real00_line_hearts", "binarization.png", (95, 21, 788, 99)),
    ("real01_line_grid", "plot1.png", (120, 6, 609, 54)),
    ("real02_line_gray", "plot2.png", (122, 7, 604, 55)),
    ("real03_write", "plot1.png", (120, 6, 215, 54)),
    ("real04_sample", "plot1.png", (228, 6, 362, 54)),
    ("real05_text", "plot1.png", (385, 6, 495, 54)),
    ("real06_here", "plot1.png", (508, 6, 609, 54)),
    ("real07_it_is", "binarization.png", (95, 21, 285, 99)),
    ("real08_their", "binarization.png", (290, 21, 492, 99)),
    ("real09_hearts", "binarization.png", (495, 21, 788, 99)),
    # ---- round-5 growth to 44 crops (VERDICT r4 item 2): word, bigram,
    # sub-word-fragment and margin/scale variants across all three
    # backgrounds. Word x-spans were column-profile-detected on the ink
    # mask (gap >= 10 px), then hand-adjusted against rendered overlays
    # (docs/real_data_overlay*.png). Fragment and loose/tight variants are
    # DELIBERATELY correlated with the word crops (same ink, different
    # crop framing → different resize ratio/partitioning); the eval README
    # records that correlation caveat for CI interpretation.
    ("real10_it", "binarization.png", (93, 21, 156, 99)),
    ("real11_is", "binarization.png", (188, 21, 265, 99)),
    ("real12_is_their", "binarization.png", (188, 21, 488, 99)),
    ("real13_their_hearts", "binarization.png", (294, 21, 788, 99)),
    ("real14_h", "binarization.png", (520, 21, 573, 99)),
    ("real15_earts", "binarization.png", (572, 21, 788, 99)),
    ("real16_it_wide", "binarization.png", (93, 21, 225, 99)),
    ("real17_hearts_tight", "binarization.png", (520, 21, 697, 99)),
    ("real18_write_sample", "plot1.png", (117, 6, 376, 54)),
    ("real19_sample_text", "plot1.png", (242, 6, 492, 54)),
    ("real20_text_here", "plot1.png", (406, 6, 609, 54)),
    ("real21_write_sample_text", "plot1.png", (117, 6, 492, 54)),
    ("real22_s_frag", "plot1.png", (242, 6, 283, 54)),
    ("real23_le_frag", "plot1.png", (335, 6, 376, 54)),
    ("real24_write_tight", "plot1.png", (119, 6, 209, 54)),
    ("real25_write_g", "plot2.png", (122, 7, 227, 53)),
    ("real26_sample_g", "plot2.png", (269, 7, 385, 53)),
    ("real27_text_g", "plot2.png", (408, 7, 485, 53)),
    ("real28_here_g", "plot2.png", (517, 7, 604, 53)),
    ("real29_write_sample_g", "plot2.png", (122, 7, 385, 53)),
    ("real30_sample_text_g", "plot2.png", (269, 7, 485, 53)),
    ("real31_text_here_g", "plot2.png", (408, 7, 604, 53)),
    ("real32_sam_g", "plot2.png", (269, 7, 349, 53)),
    ("real33_ple_g", "plot2.png", (349, 7, 385, 53)),
    ("real34_line_hearts_inner", "binarization.png", (95, 25, 788, 95)),
    ("real35_line_grid_inner", "plot1.png", (120, 10, 609, 50)),
    ("real36_line_gray_inner", "plot2.png", (122, 11, 604, 51)),
    ("real37_their_loose", "binarization.png", (270, 21, 510, 99)),
    ("real38_sample_loose", "plot1.png", (230, 6, 380, 54)),
    ("real39_text_loose", "plot1.png", (395, 6, 500, 54)),
    ("real40_here_g_loose", "plot2.png", (500, 7, 604, 53)),
    ("real41_write_sample_text_g", "plot2.png", (122, 7, 485, 53)),
    ("real42_it_is_their", "binarization.png", (93, 21, 488, 99)),
    ("real43_line_pink_tight", "binarization.png", (97, 21, 693, 99)),
]

# 8-neighbour offsets in clockwise order (Zhang-Suen's P2..P9).
_N8 = [(-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1)]


def ink_mask(rgb: np.ndarray, k: float = 0.72, win: int = 31) -> np.ndarray:
    """Boolean ink mask: ink is dark in EVERY channel, so work on the
    per-pixel max channel (ruled pink paper is bright in R, grid/rule
    lines bright in B).  A flat-field local threshold (pixel < k x local
    background mean) handles the gradient-lit photo where a global Otsu
    split swallows half the background."""
    from scipy.ndimage import binary_dilation, binary_opening, uniform_filter

    mx = rgb.max(axis=2).astype(np.float32)
    bg = uniform_filter(mx, size=win, mode="nearest")
    mask = (mx < k * bg) & (mx < 170)
    # Suppress the paper's ruled writing line (a dark, page-wide horizontal
    # streak): long-horizontal opening finds it; pixels that also belong to
    # vertical ink structure (descenders crossing the rule) are kept.
    hline = binary_opening(mask, np.ones((1, 25), bool))
    vkeep = binary_dilation(binary_opening(mask, np.ones((4, 1), bool)),
                            np.ones((2, 3), bool))
    return mask & ~(hline & ~vkeep)


def zhang_suen(mask: np.ndarray) -> np.ndarray:
    """Classic two-subiteration thinning to a 1-px skeleton."""
    img = np.pad(mask.astype(np.uint8), 1)

    def neighbours(a):
        return [np.roll(np.roll(a, -dy, 0), -dx, 1) for dy, dx in _N8]

    changed = True
    while changed:
        changed = False
        for phase in (0, 1):
            nb = neighbours(img)
            b = sum(nb)  # number of set neighbours
            ring = nb + [nb[0]]
            a = sum(((ring[k] == 0) & (ring[k + 1] == 1)).astype(np.uint8)
                    for k in range(8))  # 0->1 transitions around the ring
            p2, p4, p6, p8 = nb[0], nb[2], nb[4], nb[6]
            if phase == 0:
                cond = (p2 * p4 * p6 == 0) & (p4 * p6 * p8 == 0)
            else:
                cond = (p2 * p4 * p8 == 0) & (p2 * p6 * p8 == 0)
            kill = (img == 1) & (b >= 2) & (b <= 6) & (a == 1) & cond
            if kill.any():
                img[kill] = 0
                changed = True
    return img[1:-1, 1:-1].astype(bool)


def trace_paths(skel: np.ndarray) -> list[np.ndarray]:
    """Walk the skeleton into polylines, continuing straight through
    junction pixels so letter crossings don't fragment the stroke."""
    h, w = skel.shape
    pts = {(y, x) for y, x in zip(*np.nonzero(skel))}

    def nbrs(p):
        y, x = p
        return [(y + dy, x + dx) for dy, dx in _N8 if (y + dy, x + dx) in pts]

    degree = {p: len(nbrs(p)) for p in pts}
    visited_edges = set()

    def walk(start, first):
        path = [start, first]
        visited_edges.add((start, first))
        visited_edges.add((first, start))
        while True:
            cur, prev = path[-1], path[-2]
            cand = [q for q in nbrs(cur)
                    if q != prev and (cur, q) not in visited_edges]
            if not cand:
                return path
            d = (cur[0] - prev[0], cur[1] - prev[1])
            # straightest continuation: max cosine with incoming direction
            def cos(q):
                v = (q[0] - cur[0], q[1] - cur[1])
                n = (d[0] ** 2 + d[1] ** 2) ** 0.5 * (v[0] ** 2 + v[1] ** 2) ** 0.5
                return (d[0] * v[0] + d[1] * v[1]) / n
            nxt = max(cand, key=cos)
            visited_edges.add((cur, nxt))
            visited_edges.add((nxt, cur))
            path.append(nxt)

    paths = []
    # endpoints first (open strokes), then leftovers (loops)
    for seed_set in ([p for p in pts if degree[p] == 1],
                     sorted(pts)):
        for p in seed_set:
            for q in nbrs(p):
                if (p, q) not in visited_edges:
                    paths.append(walk(p, q))
    return [np.array([(x, y) for y, x in path], np.float64)
            for path in paths if len(path) >= 3]


def rdp(points: np.ndarray, eps: float) -> np.ndarray:
    """Ramer-Douglas-Peucker polyline simplification (iterative)."""
    keep = np.zeros(len(points), bool)
    keep[[0, -1]] = True
    stack = [(0, len(points) - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = points[j] - points[i]
        L = np.hypot(*seg)
        if L == 0:
            d = np.hypot(*(points[i + 1:j] - points[i]).T)
        else:
            rel = points[i + 1:j] - points[i]
            d = np.abs(seg[0] * rel[:, 1] - seg[1] * rel[:, 0]) / L
        k = int(np.argmax(d))
        if d[k] > eps:
            m = i + 1 + k
            keep[m] = True
            stack += [(i, m), (m, j)]
    return points[keep]


def main() -> None:
    from stroke_derenderer_tpu.ops.resize import resize_to_height_np
    from stroke_derenderer_tpu.ops.strokes import sort_strokes

    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--out", default="examples/real_data")
    ap.add_argument("--height", type=int, default=128,
                    help="height-normalized frame for the _BINARIZED mask")
    ap.add_argument("--rdp-eps", type=float, default=0.9)
    args = ap.parse_args()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    for stem, fig, box in CROPS:
        rgb = np.asarray(Image.open(REF_PLOT / fig).convert("RGB").crop(box))
        Image.fromarray(rgb).save(out / f"{stem}.png")

        mask = ink_mask(rgb)
        # Crop borders are figure furniture (frame lines, gradient edges),
        # never ink: the round-5 overlay review caught border columns being
        # traced as spurious vertical/horizontal strokes on three crops.
        mask[:2], mask[-2:], mask[:, :2], mask[:, -2:] = 0, 0, 0, 0
        # mask at the height-normalized frame (data/real.py contract)
        mask_rs = resize_to_height_np((mask * 255).astype(np.uint8)[..., None],
                                      args.height)[..., 0] > 127
        Image.fromarray((mask_rs * np.uint8(255))).save(
            out / f"{stem}_BINARIZED.png")

        # strokes traced at the (higher-resolution) normalized frame, then
        # scaled back to PNG resolution — the CLI's own output convention.
        skel = zhang_suen(mask_rs)
        strokes = [rdp(p, args.rdp_eps) for p in trace_paths(skel)]
        strokes = [s for s in strokes
                   if len(s) >= 2 and np.hypot(*(s.max(0) - s.min(0))) > 3]
        # Second annotation pass (round 5): thin/broken photo ink (the gray
        # gradient band especially) fragments the skeleton into dozens of
        # stublets; stitching endpoints within 4 px reassembles the
        # writing-stroke topology before the metrics see it. (GT under this
        # convention re-baselines the real-ink table — recorded in
        # models_demo/README.md.)
        from stroke_derenderer_tpu.ops.strokes import merge_stroke_fragments
        strokes = merge_stroke_fragments(
            [(s[:, 0], s[:, 1]) for s in strokes], tol=4.0)
        # ops/strokes.sort_strokes takes (X, Y) pairs (the pipeline's own
        # stroke representation)
        strokes = sort_strokes(strokes)
        scale = rgb.shape[0] / args.height
        payload = [[(np.asarray(x) * scale).round(2).tolist(),
                    (np.asarray(y) * scale).round(2).tolist()]
                   for x, y in strokes]
        (out / f"{stem}_STROKES.json").write_text(json.dumps(payload))
        print(f"{stem}: {mask.sum()} ink px -> {len(strokes)} strokes")


if __name__ == "__main__":
    main()
