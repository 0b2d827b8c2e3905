"""Time XLA greedy_decode vs the fused Pallas decode kernel on the real TPU
at production shapes. Run from /root/repo with the TPU free."""

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from stroke_derenderer_tpu.utils import honor_platform_env  # noqa: E402
honor_platform_env()
import time
import numpy as np
import jax
import jax.numpy as jnp

from stroke_derenderer_tpu.config import StrokesConfig
from stroke_derenderer_tpu.weights.store import init_strokes_variables
from stroke_derenderer_tpu.models import greedy_decode
from stroke_derenderer_tpu.kernels import fused_greedy_decode

cfg = StrokesConfig(encoder_arch="resnet18")  # E = 512 like models_demo
enc_m, dec_m, _, dec_vars, _ = init_strokes_variables(cfg, 0)

B, P, E, T = 80, 196, 512, 384
enc = jax.random.normal(jax.random.PRNGKey(0), (B, P, E), jnp.bfloat16)


def bench(fn, name, reps=3):
    out = fn()
    np.asarray(out)  # force readback (block_until_ready unreliable on tunnel)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        np.asarray(out)
        best = min(best, time.time() - t0)
    print(f"{name}: {best*1e3:.1f} ms  ({best*1e3/T:.3f} ms/step)")
    return out


g = bench(lambda: greedy_decode(dec_m, dec_vars, enc, T), "xla greedy 384")
for bb in (8, 16, 32):
    try:
        f = bench(lambda: fused_greedy_decode(dec_m, dec_vars, enc, T,
                                              block_b=bb),
                  f"fused block_b={bb}")
        print(f"  token match vs xla: "
              f"{float((np.asarray(f) == np.asarray(g)).mean()):.4f}")
    except Exception as e:
        print(f"fused block_b={bb}: FAILED {type(e).__name__}: "
              f"{str(e)[:300]}")
