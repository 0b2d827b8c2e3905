"""Time host-crop vs device-partition stroke estimation on the real TPU.
Run from /root/repo with the TPU free."""

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from stroke_derenderer_tpu.utils import honor_platform_env  # noqa: E402
honor_platform_env()
import dataclasses
import time
import numpy as np

from stroke_derenderer_tpu.config import StrokesConfig
from stroke_derenderer_tpu.pipeline import StrokeEstimator
from stroke_derenderer_tpu.ops.resize import resize_to_height_np
import bench

imgs = bench.make_images(8)
masks = [resize_to_height_np(im, 128)[:, :, 0] < 128 for im in imgs]

cfg = StrokesConfig(encoder_arch="resnet18")
host_est = StrokeEstimator(cfg)
dev_est = StrokeEstimator(dataclasses.replace(cfg, device_partition=True),
                          variables=(host_est.enc_vars, host_est.dec_vars,
                                     host_est.proj_vars))

def timeit(fn, name, reps=4):
    fn()  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        r = fn()
        # force host sync: the stroke lists are already numpy
        best = min(best, time.time() - t0)
    print(f"{name}: {best*1e3:.0f} ms for 8 images ({8/best:.2f} img/s)")

timeit(lambda: host_est.process_images(masks, max_length=384), "host-crop  path")
timeit(lambda: dev_est.process_images(masks, max_length=384),  "device-part path")
