"""Connected-components backend shootout (VERDICT r1 item 9).

Times the three CC backends in ops/connected.py on production-shape line
masks (128 x W, handwriting-like ink density):

  * native  — first-party C++ union-find (native/cc.cpp, ctypes)
  * scipy   — scipy.ndimage.label fallback
  * device  — connected_components_jnp label-propagation (jitted; on the
              TPU when attached, else the host XLA backend)

The pipeline calls CC once per line image between the two device stages
(pipeline/strokes.py), so per-call latency at W~1000-4000 is what matters.
Run from the repo root: `python scripts/time_cc.py [--widths 384,1024,...]`.
Decision rule (scripts/README.md): wire connected_components_jnp into the
pipeline only if it beats the native path on the real chip INCLUDING the
mask upload + label download it would add.
"""

from __future__ import annotations

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from stroke_derenderer_tpu.utils import honor_platform_env  # noqa: E402
honor_platform_env()

import argparse
import time

import numpy as np


def make_mask(width: int, seed: int = 0) -> np.ndarray:
    """Handwriting-like 128 x width binary mask: loops/curls every ~90 px."""
    rng = np.random.default_rng(seed)
    h = 128
    img = np.zeros((h, width), np.uint8)
    t = np.linspace(0, 2 * np.pi, 600)
    for cx in range(45, width - 45, 90):
        a, b = rng.uniform(20, 42, 2)
        f = rng.integers(1, 4)
        xs = np.clip(cx + a * np.cos(t * f + rng.uniform(0, 6)),
                     0, width - 1).astype(int)
        ys = np.clip(64 + b * np.sin(t + rng.uniform(0, 6)),
                     0, h - 1).astype(int)
        for dy in (0, 1):
            for dx in (0, 1):
                img[np.clip(ys + dy, 0, h - 1), np.clip(xs + dx, 0, width - 1)] = 1
    return img


def bench(fn, arg, repeats: int = 30) -> float:
    fn(arg)  # warmup / compile
    t0 = time.perf_counter()
    for _ in range(repeats):
        fn(arg)
    return (time.perf_counter() - t0) / repeats * 1e3  # ms


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--widths", default="384,1024,2048,4096")
    ap.add_argument("--repeats", type=int, default=30)
    args = ap.parse_args(argv)

    import jax

    from stroke_derenderer_tpu.native import cc_native
    from stroke_derenderer_tpu.ops.connected import (
        _scipy_label, connected_components_jnp,
    )

    dev_cc = jax.jit(connected_components_jnp)

    def run_device(mask):
        labels, num = dev_cc(mask)  # includes upload
        return np.asarray(labels), int(num)  # includes download

    print(f"backend device={jax.devices()[0].platform} "
          f"native_available={cc_native.available()}")
    header = f"{'width':>6} {'comps':>6} {'native_ms':>10} {'scipy_ms':>9} {'device_ms':>10}"
    print(header)
    rows = []
    for w in [int(x) for x in args.widths.split(",")]:
        mask = make_mask(w)
        _, n_ref = _scipy_label(mask)
        t_native = (bench(lambda m: cc_native.label_with_stats(m), mask,
                          args.repeats) if cc_native.available() else float("nan"))
        t_scipy = bench(_scipy_label, mask, args.repeats)
        t_dev = bench(run_device, mask, args.repeats)
        # Parity: device labels must induce the same partition.
        lab_s, _ = _scipy_label(mask)
        lab_d, n_d = run_device(mask)
        same = (n_d == n_ref) and np.array_equal(lab_s != 0, lab_d != 0)
        rows.append((w, n_ref, t_native, t_scipy, t_dev))
        print(f"{w:>6} {n_ref:>6} {t_native:>10.3f} {t_scipy:>9.3f} "
              f"{t_dev:>10.3f}  parity={'ok' if same else 'MISMATCH'}")
    best = min(rows, key=lambda r: r[2] if r[2] == r[2] else 1e9)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
