"""Capture a TensorBoard-loadable XLA device trace of one warmed e2e batch
(VERDICT r1 item 7's profile artifact).

Runs the bench workload (8 line images) through both stages with the
models_demo weights, once to compile, then records the timed pass with
jax.profiler into artifacts/trace_e2e/. Load with TensorBoard's 'profile'
plugin. Run from /root/repo with the TPU free.
"""

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from stroke_derenderer_tpu.utils import honor_platform_env  # noqa: E402
honor_platform_env()

import os
import sys

import bench
from stroke_derenderer_tpu.ops.resize import resize_to_height_np
from stroke_derenderer_tpu.utils.profiling import device_trace

OUT = os.path.join(os.path.dirname(__file__), "..", "artifacts", "trace_e2e")


def main():
    out = os.path.abspath(sys.argv[1] if len(sys.argv) > 1 else OUT)
    imgs = bench.make_images(8)
    binarizer, estimator = bench.build()
    masks = [resize_to_height_np(im, 128)[:, :, 0] < 128 for im in imgs]

    # Warm both programs so the trace holds steady-state execution only.
    binarizer.binarize_images(imgs)
    estimator.process_images(masks, max_length=bench.DECODE_STEPS)

    with device_trace(out):
        binarizer.binarize_images(imgs)
        estimator.process_images(masks, max_length=bench.DECODE_STEPS)
    print(f"trace written to {out}")


if __name__ == "__main__":
    main()
