"""Int8-vs-float conv-stage shootout (ops/quant.py).

Times the two conv-heavy stages with and without dynamic int8 quantization
at the bench shapes, on whatever backend is attached (the TPU via the
tunnel, else host XLA — only the on-chip numbers decide anything: v5e's
MXU is 394 int8 TOPS vs 197 bf16 TFLOPS, while on CPU int8 is usually
SLOWER than float):

  * binarize — the full Binarizer.binarize_images path over the 8-image
    bench workload (models_demo weights/configs),
  * encoder  — ResNetEncoder forward on a (64, 224, 224, 3) glyph batch.

Run from the repo root: `python scripts/time_quant.py [--repeats 5]`.
Decision rule (scripts/README.md pattern): flip the bench/CLI default to
--quant int8 only if the on-chip e2e wins AND eval quality is unchanged
(eval.run --quant int8 vs none; tests/test_quant.py pins the agreement
floor, eval pins DTW/F1).
"""

from __future__ import annotations

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from stroke_derenderer_tpu.utils import honor_platform_env  # noqa: E402
honor_platform_env()

import argparse
import dataclasses
import json
import time

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def _time(fn, repeats: int) -> float:
    fn()  # warmup/compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--enc-batch", type=int, default=64)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, str(REPO))
    from bench import make_images

    from stroke_derenderer_tpu.config import BinarizerConfig, StrokesConfig
    from stroke_derenderer_tpu.models import ResNetEncoder
    from stroke_derenderer_tpu.pipeline import Binarizer
    from stroke_derenderer_tpu.weights.store import (
        binarizer_template, load_variables,
    )

    print(f"backend: {jax.default_backend()}")
    out: dict = {"backend": jax.default_backend()}
    imgs = make_images(8)

    demo = REPO / "models_demo"
    bin_cfg = BinarizerConfig.from_json(demo / "configs_binarizer.json") \
        if (demo / "configs_binarizer.json").exists() else BinarizerConfig()
    bin_vars = None
    if (demo / "binarizer.msgpack").exists():
        _, template = binarizer_template(bin_cfg)
        bin_vars = load_variables(template, demo / "binarizer.msgpack")

    for mode in ("none", "int8"):
        cfg = dataclasses.replace(bin_cfg, quant=mode)
        b = (Binarizer(cfg, variables=bin_vars) if bin_vars is not None
             else Binarizer(cfg))
        dt = _time(lambda: b.binarize_images(imgs), args.repeats)
        out[f"binarize_{mode}_ips"] = round(len(imgs) / dt, 4)
        print(f"binarize quant={mode}: {len(imgs) / dt:.2f} img/s")

    se_cfg = StrokesConfig.from_json(demo / "configs_strokes.json") \
        if (demo / "configs_strokes.json").exists() else StrokesConfig()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(args.enc_batch, 224, 224, 3))
                    .astype(np.float32))
    enc_f = ResNetEncoder(arch=se_cfg.encoder_arch, norm=se_cfg.encoder_norm)
    v = jax.jit(enc_f.init)(jax.random.PRNGKey(0), x[:1])
    for mode in ("none", "int8"):
        enc = ResNetEncoder(arch=se_cfg.encoder_arch,
                            norm=se_cfg.encoder_norm, quant=mode)
        f = jax.jit(enc.apply)
        dt = _time(lambda: jax.block_until_ready(f(v, x)), args.repeats)
        out[f"encoder_{mode}_ips"] = round(args.enc_batch / dt, 4)
        print(f"encoder ({se_cfg.encoder_arch}) quant={mode}: "
              f"{args.enc_batch / dt:.1f} glyphs/s")

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
