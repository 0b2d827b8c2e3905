"""Disk cache of partition-pipeline glyph training samples.

Why this exists: synthetic glyph samples are generated THROUGH the
inference partition pipeline (data/synthetic.make_partitioned_glyph_sample
— rasterize, connected components, grouping, resize bookkeeping), which
costs ~10-20 ms of host CPU per sample. On a single-core host that
bottlenecks captioner training well below the chip's step rate (measured
~1.2 steps/s at batch 16 with live generation vs ~3.5 when the host is
otherwise idle). Pre-generating once and streaming from RAM removes the
generator from the training loop entirely.

Storage: shards of ``glyphs_XXXXX.npz`` with
  * ``crops``  (K, S, S)    uint8  — the partition crop BEFORE the second
                                     min-max pass ("image" in
                                     pipeline/strokes.compute_partitions);
  * ``tokens`` (K, L)       int16  — BOS/EOS/PAD + vertex tokens.

The model input is reconstructed exactly at load time with the pipeline's
own normalize chain (imagenet_normalize_np(minmax_normalize_np(crop))), so
cached batches are bit-identical to live partitioned_glyph_batches batches
for the same underlying sample.

Build:    python -m stroke_derenderer_tpu.data.cache --out DIR --n 50000 \
              --seq-len 384 --style mixed [--seed 0]
Consume:  train.loop --cache DIR  (or cached_glyph_batches directly).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from stroke_derenderer_tpu.config import BOS, StrokesConfig
from stroke_derenderer_tpu.ops.normalize import (
    imagenet_normalize_np, minmax_normalize_np,
)

SHARD = 2000


def build_glyph_cache(out_dir: str | Path, n: int, seq_len: int = 384,
                      style: str = "mixed", seed: int = 0,
                      log_every: int = 2000) -> Path:
    """Generate ``n`` partition-pipeline samples to ``out_dir`` shards."""
    from stroke_derenderer_tpu.data.synthetic import (
        make_partitioned_glyph_sample,
    )
    from stroke_derenderer_tpu.utils import get_logger

    log = get_logger("data.cache")
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    cfg = StrokesConfig()
    s = cfg.image_size
    crops = np.zeros((min(SHARD, n), s, s), np.uint8)
    toks = np.zeros((min(SHARD, n), seq_len + 1), np.int16)
    shard = k = 0
    for i in range(n):
        _, crop_u8, t = make_partitioned_glyph_sample(rng, seq_len + 1,
                                                      style=style)
        crops[k] = crop_u8
        toks[k] = t.astype(np.int16)
        k += 1
        if k == crops.shape[0] or i == n - 1:
            np.savez_compressed(out / f"glyphs_{shard:05d}.npz",
                                crops=crops[:k], tokens=toks[:k])
            shard += 1
            k = 0
            rem = n - i - 1
            crops = crops[:min(SHARD, max(rem, 1))]
            toks = toks[:min(SHARD, max(rem, 1))]
        if (i + 1) % log_every == 0:
            log.info("cache: %d/%d samples", i + 1, n)
    (out / "meta.json").write_text(json.dumps(
        {"n": n, "seq_len": seq_len, "style": style, "seed": seed,
         "image_size": s}))
    return out


def load_glyph_cache(cache_dir: str | Path):
    """All shards into RAM: (crops (N, S, S) uint8, tokens (N, L) int16)."""
    cache_dir = Path(cache_dir)
    shards = sorted(cache_dir.glob("glyphs_*.npz"))
    if not shards:
        raise FileNotFoundError(f"no glyphs_*.npz shards in {cache_dir}")
    cs, ts = [], []
    for p in shards:
        with np.load(p) as z:
            cs.append(z["crops"])
            ts.append(z["tokens"])
    return np.concatenate(cs), np.concatenate(ts)


def cached_glyph_batches(cache_dir: str | Path, rng: np.random.Generator,
                         batch_size: int, seq_len: int = 384,
                         n_batches: int | None = None,
                         config: StrokesConfig | None = None,
                         raw: bool = False):
    """Yield (crops (B,S,S,3) f32, tok_in (B,T), tok_out (B,T)) sampled with
    replacement from the cache — the same teacher-forcing contract as
    data/synthetic.partitioned_glyph_batches, reconstructed through the
    pipeline's exact normalize chain.

    ``raw=True`` yields the uint8 crops (B, S, S) untouched instead — for a
    train step built with ``normalize_on_device`` (train/steps.py), which
    runs the identical normalize chain inside the jitted program. 12x fewer
    bytes over the (tunneled) host->device link and no per-sample host
    float work."""
    cfg = config or StrokesConfig()
    crops, tokens = load_glyph_cache(cache_dir)
    if tokens.shape[1] < seq_len + 1:
        raise ValueError(
            f"cache at {cache_dir} holds {tokens.shape[1] - 1}-token "
            f"horizons; rebuild with --seq-len >= {seq_len}")
    mean = np.asarray(cfg.mean, np.float32)
    std = np.asarray(cfg.std, np.float32)
    i = 0
    while n_batches is None or i < n_batches:
        idx = rng.integers(0, crops.shape[0], batch_size)
        if raw:
            batch = crops[idx]
        else:
            batch = np.stack([
                imagenet_normalize_np(minmax_normalize_np(crops[j]), mean,
                                      std)
                for j in idx])
        seqs = tokens[idx, :seq_len + 1].astype(np.int32)
        tok_in = np.concatenate(
            [np.full((batch_size, 1), BOS, np.int32), seqs[:, :seq_len - 1]],
            axis=1)
        yield batch, tok_in, seqs[:, :seq_len]
        i += 1


def _main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=50000)
    ap.add_argument("--seq-len", type=int, default=384)
    ap.add_argument("--style", default="mixed",
                    choices=["smooth", "mixed", "hand", "letters"])
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    build_glyph_cache(args.out, args.n, args.seq_len, args.style, args.seed)


if __name__ == "__main__":
    _main()
