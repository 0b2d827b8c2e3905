"""Two-stage pipeline parallelism: binarizer and stroke estimator on
disjoint device groups, overlapped across an image stream.

SURVEY.md §2.4 lists PP as "optional two-stage overlap: binarizer chips
feed stroke-estimator chips". This is that: stage A (tile UNet) lives on
the first half of the devices, stage B (encoder + decode) on the second
half; JAX's async dispatch overlaps image i's stage-B with image i+1's
stage-A without any explicit threading — the host just alternates enqueue
order, and the two device groups run concurrently.

On a single chip both groups collapse to the same device (still correct,
no overlap). Validated on the 8-device virtual CPU mesh in tests.
"""

from __future__ import annotations

import jax
import numpy as np

from stroke_derenderer_tpu.pipeline import Binarizer, StrokeEstimator


class TwoStagePipeline:
    def __init__(self, binarizer: Binarizer, estimator: StrokeEstimator,
                 devices=None):
        devices = list(devices if devices is not None else jax.devices())
        half = max(len(devices) // 2, 1)
        self.dev_a = devices[0]          # stage A home (params replicated)
        self.dev_b = devices[half % len(devices)]  # stage B home
        self.binarizer = binarizer
        self.estimator = estimator
        # Pin each stage's params to its device group.
        self.binarizer.variables = jax.device_put(
            binarizer.variables, self.dev_a)
        self.estimator.enc_vars = jax.device_put(estimator.enc_vars, self.dev_b)
        self.estimator.dec_vars = jax.device_put(estimator.dec_vars, self.dev_b)
        if self.estimator.proj_vars is not None:
            self.estimator.proj_vars = jax.device_put(
                estimator.proj_vars, self.dev_b)

    def process(self, images, max_length: int | None = None):
        """[(H, W, 3) uint8, ...] -> (masks, per-image stroke lists).

        Stage A (binarize) and stage B (strokes) run on separate host
        threads joined by a queue: while stage B's devices decode image i,
        stage A's devices binarize image i+1 — true wall-clock overlap,
        since each thread only blocks on its own device group.
        """
        import queue
        import threading

        masks: list = [None] * len(images)
        strokes: list = [None] * len(images)
        q: "queue.Queue" = queue.Queue(maxsize=2)
        errors: list = []

        def stage_a():
            try:
                for i, img in enumerate(images):
                    out = self.binarizer.binarize_image(np.asarray(img))
                    mask = out[:, :, 0] > (255 * self.binarizer.config.bin_thr)
                    masks[i] = mask
                    q.put((i, mask))
            except Exception as exc:  # propagate to the consumer
                errors.append(exc)
            finally:
                q.put(None)

        t = threading.Thread(target=stage_a, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            i, mask = item
            strokes[i] = self.estimator.process_image(mask,
                                                      max_length=max_length)
        t.join()
        if errors:
            raise errors[0]
        return masks, strokes
