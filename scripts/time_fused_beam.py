"""Time XLA beam_decode vs the fused Pallas beam kernel on the real TPU at
production shapes, with the shipped models_demo decoder weights; prints the
best-beam token match per config. Run from /root/repo with the TPU free."""

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from stroke_derenderer_tpu.utils import honor_platform_env  # noqa: E402
honor_platform_env()
import time

import jax
import numpy as np
import jax.numpy as jnp

from stroke_derenderer_tpu.config import StrokesConfig
from stroke_derenderer_tpu.kernels import fused_beam_decode
from stroke_derenderer_tpu.models import beam_decode
from stroke_derenderer_tpu.weights.store import (
    init_strokes_variables, load_variables,
)

cfg = StrokesConfig(encoder_arch="resnet18")
_, dec_m, _, dec_vars, _ = init_strokes_variables(cfg, 0)
try:
    dec_vars = load_variables(dec_vars, "models_demo/strokes_decoder.msgpack")
    print("using models_demo decoder weights")
except Exception as e:
    print(f"random-init decoder weights ({type(e).__name__})")

B, P, E, T, K = 16, 196, 512, 384, 5
enc = jax.random.normal(jax.random.PRNGKey(0), (B, P, E), jnp.bfloat16)


def bench(fn, name, reps=3):
    out = fn()
    np.asarray(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        np.asarray(out)
        best = min(best, time.time() - t0)
    print(f"{name}: {best*1e3:.1f} ms")
    return out


x = bench(lambda: beam_decode(dec_m, dec_vars, enc, T, beam_size=K),
          f"xla beam B={B} K={K}")
try:
    f = bench(lambda: fused_beam_decode(dec_m, dec_vars, enc, T, beam_size=K),
              "fused beam")
    print(f"  token match vs xla: "
          f"{float((np.asarray(f) == np.asarray(x)).mean()):.4f}")
except Exception as e:
    print(f"fused beam: FAILED {type(e).__name__}: {str(e)[:300]}")
