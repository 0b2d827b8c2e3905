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


def _split_mesh(mesh):
    """Split a ('dp', 'tp') mesh into two stage sub-meshes along dp.

    Stage A gets the first half of the dp rows, stage B the rest, each tp
    group kept intact (collectives stay within a stage's ICI neighborhood).
    A mesh that cannot split (dp == 1) is shared by both stages — correct,
    just without spatial stage separation."""
    from jax.sharding import Mesh

    dp = int(mesh.shape["dp"])
    if dp < 2:
        return mesh, mesh
    devs = np.asarray(mesh.devices)          # (dp, tp)
    half = dp // 2
    names = tuple(mesh.axis_names)
    return Mesh(devs[:half], names), Mesh(devs[half:], names)


def _rehome(pipeline, submesh) -> None:
    """Re-pin a pipeline (Binarizer or StrokeEstimator) onto a stage
    sub-mesh: params re-replicated over the sub-mesh, dp extent updated so
    batch padding/sharding (``_shard_batch``) targets the right devices."""
    from stroke_derenderer_tpu.parallel import replicate

    dst = replicate(submesh)
    pipeline.mesh = submesh
    pipeline._dp = int(submesh.shape["dp"])
    if hasattr(pipeline, "variables"):       # Binarizer
        pipeline.variables = jax.device_put(pipeline.variables, dst)
    else:                                    # StrokeEstimator
        pipeline.enc_vars = jax.device_put(pipeline.enc_vars, dst)
        pipeline.dec_vars = jax.device_put(pipeline.dec_vars, dst)
        if pipeline.proj_vars is not None:
            pipeline.proj_vars = jax.device_put(pipeline.proj_vars, dst)


class TwoStagePipeline:
    def __init__(self, binarizer: Binarizer, estimator: StrokeEstimator,
                 devices=None):
        self.binarizer = binarizer
        self.estimator = estimator
        mesh = binarizer.mesh if binarizer.mesh is not None else estimator.mesh
        if mesh is not None:
            # Compose PP with DP (VERDICT r2 item 4: --two-stage used to
            # silently re-pin params to single devices while the pipelines
            # kept sharding their inputs over the full mesh): each stage
            # gets HALF the mesh as its own ('dp','tp') sub-mesh, params
            # replicated and batches dp-sharded within it.
            mesh_a, mesh_b = _split_mesh(mesh)
            _rehome(binarizer, mesh_a)
            _rehome(estimator, mesh_b)
            self.dev_a = mesh_a.devices.flat[0]
            self.dev_b = mesh_b.devices.flat[-1]
            return
        devices = list(devices if devices is not None else jax.devices())
        half = max(len(devices) // 2, 1)
        self.dev_a = devices[0]          # stage A home (params replicated)
        self.dev_b = devices[half % len(devices)]  # stage B home
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
        stop = threading.Event()

        def _put(item) -> bool:
            # Blocking put that aborts if the consumer stopped (exception):
            # never leaves the producer wedged on a full queue, and never
            # drops the end-of-stream sentinel while the consumer lives.
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def stage_a():
            try:
                for i, img in enumerate(images):
                    if stop.is_set():
                        return
                    out = self.binarizer.binarize_image(np.asarray(img))
                    mask = out[:, :, 0] > (255 * self.binarizer.config.bin_thr)
                    masks[i] = mask
                    if not _put((i, mask)):
                        return
            except Exception as exc:  # propagate to the consumer
                errors.append(exc)
            finally:
                _put(None)

        t = threading.Thread(target=stage_a, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                i, mask = item
                strokes[i] = self.estimator.process_image(
                    mask, max_length=max_length)
        finally:
            stop.set()
            while True:  # unblock a producer mid-put
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            t.join()
        if errors:
            raise errors[0]
        return masks, strokes

    def process_batched(self, images, chunk_size: int = 8,
                        max_length: int | None = None):
        """Chunk-overlapped BATCHED two-stage run: stage A binarizes chunk
        k+1 (binarize_images: fused program + transfers) while stage B
        decodes chunk k (process_images). On a tunneled single chip both
        stages are round-trip-bound, so overlapping their transfers pushes
        e2e throughput toward max(stage) instead of sum(stage); on disjoint
        device groups the compute itself overlaps too.

        Outputs are identical to the sequential batched path: every row of
        both device programs is independent, so chunk membership cannot
        change any image's result (pinned in tests/test_two_stage.py).
        """
        import queue
        import threading

        images = list(images)
        chunks = [range(s, min(s + chunk_size, len(images)))
                  for s in range(0, len(images), chunk_size)]
        masks: list = [None] * len(images)
        strokes: list = [None] * len(images)
        q: "queue.Queue" = queue.Queue(maxsize=1)
        errors: list = []
        thr = 255 * self.binarizer.config.bin_thr

        stop = threading.Event()

        def _put(item) -> bool:
            """Bounded put that aborts when the consumer has stopped, so a
            consumer exception can never leave this thread blocked on a
            full queue."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def stage_a():
            try:
                for idx in chunks:
                    if stop.is_set():
                        return
                    bins = self.binarizer.binarize_images(
                        [np.asarray(images[i]) for i in idx])
                    chunk_masks = [b[:, :, 0] > thr for b in bins]
                    for i, m in zip(idx, chunk_masks):
                        masks[i] = m
                    if not _put((idx, chunk_masks)):
                        return
            except Exception as exc:
                errors.append(exc)
            finally:
                # The end-of-stream sentinel must be DELIVERED, not merely
                # attempted: put_nowait here deadlocks the consumer whenever
                # the queue still holds the final chunk (maxsize=1) — the
                # sentinel is dropped and the consumer's next get() blocks
                # forever. _put blocks until the consumer drains the queue
                # and still exits promptly if the consumer stopped (stop
                # event set + queue drained by the consumer's finally).
                _put(None)

        t = threading.Thread(target=stage_a, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                idx, chunk_masks = item
                for i, s in zip(idx, self.estimator.process_images(
                        chunk_masks, max_length=max_length)):
                    strokes[i] = s
        finally:
            stop.set()
            while True:  # unblock a producer mid-put
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            t.join()
        if errors:
            raise errors[0]
        return masks, strokes
