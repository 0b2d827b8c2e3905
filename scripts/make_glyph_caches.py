"""Rebuild the training glyph caches from scratch (they are NOT in git).

The caches are deterministic products of data/synthetic.py + a seed
(data/cache.build_glyph_cache), so the repo ships this 1-command regen
script instead of ~415 MB of npz shards (VERDICT r3 item 6 / ADVICE r3):

    python scripts/make_glyph_caches.py            # full rebuild (~30-60 min
                                                   # of host CPU, 96k samples)
    python scripts/make_glyph_caches.py --n 2000   # small smoke rebuild

Produces exactly the layout the round-3 training runs consumed:

  cache_mixed/   48k mixed-style samples, seed 1
  cache_mixed2/  48k mixed-style samples, seed 2
  cache_all/     symlink union of both (glyphs_000000-0000NN -> cache_mixed,
                 glyphs_100000-1000NN -> cache_mixed2) so
                 ``train.loop --cache cache_all`` streams the union.

Determinism is pinned by tests/test_data.py::test_cache_regen_deterministic
(fixed-seed shard digest).
"""

from __future__ import annotations

import argparse
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# (dir name, style, seed) for each primary cache; cache_all is derived.
CACHES = (("cache_mixed", "mixed", 1), ("cache_mixed2", "mixed", 2))


def link_union(out_dir: Path, parts: list[Path]) -> None:
    """(Re)build the symlink union dir: part k's shards appear as
    glyphs_<k*100000 + i>.npz so shard names never collide."""
    out_dir.mkdir(exist_ok=True)
    for old in out_dir.glob("glyphs_*.npz"):
        old.unlink()
    for k, part in enumerate(parts):
        for shard in sorted(part.glob("glyphs_*.npz")):
            i = int(shard.stem.split("_")[1])
            dst = out_dir / f"glyphs_{k * 100000 + i:06d}.npz"
            dst.symlink_to(Path("..") / part.name / shard.name)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--n", type=int, default=48000,
                    help="samples per primary cache (default: the full "
                         "48000 used by the round-3 training runs)")
    ap.add_argument("--root", default=str(REPO),
                    help="directory to build the caches under")
    args = ap.parse_args()

    from stroke_derenderer_tpu.data.cache import build_glyph_cache

    root = Path(args.root)
    parts = []
    for name, style, seed in CACHES:
        out = root / name
        print(f"building {out} (style={style}, seed={seed}, n={args.n})")
        build_glyph_cache(out, n=args.n, seq_len=384, style=style, seed=seed)
        parts.append(out)
    link_union(root / "cache_all", parts)
    print(f"done: {[p.name for p in parts]} + cache_all union")


if __name__ == "__main__":
    main()
