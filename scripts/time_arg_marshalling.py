"""Measure per-argument dispatch overhead on the tunneled accelerator.

Hypothesis (VERDICT r4 item 1): the strokes dispatch ships ~10 separate
small host buffers (RLE gid pair, 6 coord arrays, img_idx, local_id) per
batch, and the tunnel charges a round-trip-scale setup cost PER BUFFER —
which would explain the driver capturing strokes_only at 34.7 img/s while
binarize (2 buffers) hits 126.8 on the same wire.

Times the same total payload as (a) 10 small jit args vs (b) one packed
uint8 buffer sliced+bitcast on device. Run from /root/repo with the TPU
attached and otherwise idle.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, args, n=20):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        ts.append(time.time() - t0)
    return float(np.median(ts)) * 1e3, float(np.min(ts)) * 1e3


def main():
    nb, s = 88, 224
    rng = np.random.default_rng(0)
    parts = {
        "gid_starts": rng.integers(0, 1 << 20, 20480).astype(np.int32),
        "gid_vals": rng.integers(-1, 15, 20480).astype(np.int16),
        "yi0": rng.integers(0, 128, (nb, s)).astype(np.int16),
        "wy1": rng.random((nb, s)).astype(np.float32),
        "ylast": rng.integers(0, 128, nb).astype(np.int16),
        "xi0": rng.integers(0, 1280, (nb, s)).astype(np.int16),
        "wx1": rng.random((nb, s)).astype(np.float32),
        "xlast": rng.integers(0, 1280, nb).astype(np.int16),
        "img_idx": rng.integers(0, 8, nb).astype(np.int32),
        "local_id": rng.integers(0, 15, nb).astype(np.int32),
    }
    total = sum(a.nbytes for a in parts.values())
    print(f"{len(parts)} buffers, {total/1024:.1f} KiB total")

    @jax.jit
    def many(*args):
        return sum(jnp.sum(a.astype(jnp.float32)) for a in args)

    med, mn = bench(many, tuple(parts.values()))
    print(f"10-arg dispatch: med {med:.1f} ms  min {mn:.1f} ms")

    blob = np.concatenate([np.ascontiguousarray(a).view(np.uint8).ravel()
                           for a in parts.values()])

    @jax.jit
    def one(b):
        ofs, out = 0, jnp.float32(0)
        for a in parts.values():
            n = a.nbytes
            seg = jax.lax.dynamic_slice(b, (ofs,), (n,))
            out += jnp.sum(seg.astype(jnp.float32))
            ofs += n
        return out

    med, mn = bench(one, (blob,))
    print(f"1-arg packed dispatch: med {med:.1f} ms  min {mn:.1f} ms")

    # Per-buffer marginal cost: 1 vs 2 vs 4 equal-size args, same payload.
    for k in (1, 2, 4, 8):
        chunk = total // k
        bufs = [np.zeros(chunk, np.uint8) for _ in range(k)]

        @jax.jit
        def f(*args):
            return sum(jnp.sum(a.astype(jnp.float32)) for a in args)

        med, mn = bench(f, tuple(bufs))
        print(f"{k} x {chunk//1024} KiB: med {med:.1f} ms  min {mn:.1f} ms")


if __name__ == "__main__":
    main()
