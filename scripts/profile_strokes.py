"""Split the strokes stage's per-image cost on the real TPU: host planning
(CC + grouping + interpolation rows), the device estimate program
(partition-materialize + encoder + fused decode), and host token
post-processing. Run from /root/repo with the TPU free."""

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from stroke_derenderer_tpu.utils import honor_platform_env  # noqa: E402
honor_platform_env()
import time

import numpy as np

import bench
from stroke_derenderer_tpu.cli import initialize_sessions
from stroke_derenderer_tpu.ops.device_partition import plan_partitions
from stroke_derenderer_tpu.ops.resize import resize_to_height_np

imgs = bench.make_images(8)
_, est = initialize_sessions("models_demo")
cfg = est.config
masks = [resize_to_height_np(im, 128)[:, :, 0] < 128 for im in imgs]


def timeit(fn, name, reps=6):
    fn()
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    print(f"{name}: {best*1e3:.1f} ms / 8 images")
    return best


timeit(lambda: [plan_partitions(np.asarray(m), cfg.margin, cfg.image_size)
                for m in masks], "host plan_partitions")
timeit(lambda: est.process_images(masks), "full strokes stage")

# Token post-processing alone: reuse one full run's predictions.
plans = [plan_partitions(np.asarray(m), cfg.margin, cfg.image_size)
         for m in masks]
strokes = est.process_images(masks)
n_groups = sum(len(p.partitions) for p in plans if p)
print(f"(workload: {n_groups} glyph groups, "
      f"{sum(len(s) for s in strokes)} strokes)")
