"""Two-stage pipeline-parallel overlap: results equal the sequential path."""

import numpy as np

from stroke_derenderer_tpu.config import BinarizerConfig, StrokesConfig
from stroke_derenderer_tpu.parallel.two_stage import TwoStagePipeline
from stroke_derenderer_tpu.pipeline import Binarizer, StrokeEstimator


def _imgs(n=3):
    out = []
    for k in range(n):
        img = np.full((150, 400 + 100 * k, 3), 255, np.uint8)
        img[60:64, 50:350] = 0
        img[100:103, 80:300] = 0
        out.append(img)
    return out


def test_two_stage_matches_sequential():
    bin_cfg = BinarizerConfig(features=(8, 16), bottleneck=32,
                              compute_dtype="float32")
    se_cfg = StrokesConfig(encoder_arch="tiny", embed_dim=16,
                           attention_dim=16, decoder_dim=16, max_length=12,
                           compute_dtype="float32")
    imgs = _imgs()

    binarizer = Binarizer(bin_cfg, seed=0)
    estimator = StrokeEstimator(se_cfg, seed=0)
    seq_masks, seq_strokes = [], []
    for img in imgs:
        out = binarizer.binarize_image(img)
        mask = out[:, :, 0] > 127
        seq_masks.append(mask)
        seq_strokes.append(estimator.process_image(mask, max_length=12))

    pipe = TwoStagePipeline(Binarizer(bin_cfg, seed=0),
                            StrokeEstimator(se_cfg, seed=0))
    pp_masks, pp_strokes = pipe.process(imgs, max_length=12)

    assert pipe.dev_a != pipe.dev_b  # 8 virtual devices in tests
    for a, b in zip(seq_masks, pp_masks):
        assert np.array_equal(a, b)
    for a, b in zip(seq_strokes, pp_strokes):
        assert len(a) == len(b)
        for (ax, ay), (bx, by) in zip(a, b):
            np.testing.assert_allclose(ax, bx)
            np.testing.assert_allclose(ay, by)

    # Chunk-overlapped batched mode: same outputs, any chunk size.
    for chunk in (2, 3):
        cb_masks, cb_strokes = pipe.process_batched(imgs, chunk_size=chunk,
                                                    max_length=12)
        for a, b in zip(pp_masks, cb_masks):
            assert np.array_equal(a, b)
        for a, b in zip(pp_strokes, cb_strokes):
            assert len(a) == len(b)
            for (ax, ay), (bx, by) in zip(a, b):
                np.testing.assert_allclose(ax, bx)
                np.testing.assert_allclose(ay, by)


def test_batched_consumer_exception_stops_producer():
    """A consumer (stage-B) exception must propagate AND let the stage-A
    producer thread exit instead of blocking forever on the full queue
    (ADVICE r1: thread/chunk leak in long-lived serving processes)."""
    import threading

    bin_cfg = BinarizerConfig(features=(8, 16), bottleneck=32,
                              compute_dtype="float32")
    se_cfg = StrokesConfig(encoder_arch="tiny", embed_dim=16,
                           attention_dim=16, decoder_dim=16, max_length=12,
                           compute_dtype="float32")
    pipe = TwoStagePipeline(Binarizer(bin_cfg, seed=0),
                            StrokeEstimator(se_cfg, seed=0))

    class Boom(RuntimeError):
        pass

    def explode(*a, **k):
        raise Boom("stage B down")

    pipe.estimator.process_images = explode
    before = threading.active_count()
    # Enough chunks that the producer would outlive a naive consumer abort.
    imgs = _imgs(2) * 4
    try:
        pipe.process_batched(imgs, chunk_size=1)
    except Boom:
        pass
    else:
        raise AssertionError("consumer exception was swallowed")
    # The producer was joined in the finally block: no leaked thread.
    assert threading.active_count() <= before


def test_batched_sentinel_survives_lagging_consumer():
    """End-of-stream sentinel delivery when the producer finishes while the
    queue still holds the final chunk (maxsize=1): a put_nowait sentinel is
    silently dropped there and the consumer deadlocks on its next get().
    Deterministic on any box: the consumer sleeps, so the producer always
    finishes first with the queue full."""
    import threading
    import time

    bin_cfg = BinarizerConfig(features=(8, 16), bottleneck=32,
                              compute_dtype="float32")
    se_cfg = StrokesConfig(encoder_arch="tiny", embed_dim=16,
                           attention_dim=16, decoder_dim=16, max_length=8,
                           compute_dtype="float32")
    pipe = TwoStagePipeline(Binarizer(bin_cfg, seed=0),
                            StrokeEstimator(se_cfg, seed=0))
    imgs = _imgs(3)
    orig = pipe.estimator.process_images

    def slow(masks, max_length=None):
        time.sleep(0.4)
        return orig(masks, max_length=max_length)

    pipe.estimator.process_images = slow
    # Warm both stages' compiles so the sleep dominates the timings.
    pipe.process_batched(imgs[:1], chunk_size=1, max_length=8)

    result = {}

    def run():
        result["r"] = pipe.process_batched(imgs, chunk_size=1, max_length=8)

    th = threading.Thread(target=run, daemon=True)
    th.start()
    th.join(timeout=300)
    assert not th.is_alive(), \
        "process_batched deadlocked: end-of-stream sentinel was dropped"
    masks, strokes = result["r"]
    assert all(m is not None for m in masks)
    assert all(s is not None for s in strokes)


def test_unbatched_consumer_exception_stops_producer():
    """Same contract for process(): consumer exception propagates, the
    producer thread is joined, no deadlock on the sentinel."""
    import threading

    bin_cfg = BinarizerConfig(features=(8, 16), bottleneck=32,
                              compute_dtype="float32")
    se_cfg = StrokesConfig(encoder_arch="tiny", embed_dim=16,
                           attention_dim=16, decoder_dim=16, max_length=8,
                           compute_dtype="float32")
    pipe = TwoStagePipeline(Binarizer(bin_cfg, seed=0),
                            StrokeEstimator(se_cfg, seed=0))

    class Boom(RuntimeError):
        pass

    def explode(*a, **k):
        raise Boom("stage B down")

    pipe.estimator.process_image = explode
    before = threading.active_count()
    try:
        pipe.process(_imgs(2) * 3)
    except Boom:
        pass
    else:
        raise AssertionError("consumer exception was swallowed")
    assert threading.active_count() <= before


def test_two_stage_composes_with_mesh():
    """VERDICT r2 item 4: --two-stage x --mesh. The pipeline must split the
    mesh into per-stage sub-meshes (params replicated WITHIN each half,
    batches dp-sharded within each half) and produce outputs identical to
    the sequential single-device run."""
    import jax
    from stroke_derenderer_tpu.parallel import make_mesh

    bin_cfg = BinarizerConfig(features=(8, 16), bottleneck=32,
                              compute_dtype="float32")
    se_cfg = StrokesConfig(encoder_arch="tiny", embed_dim=16,
                           attention_dim=16, decoder_dim=16, max_length=12,
                           compute_dtype="float32")
    imgs = _imgs()

    # Sequential single-device reference.
    binarizer = Binarizer(bin_cfg, seed=0)
    estimator = StrokeEstimator(se_cfg, seed=0)
    seq_masks, seq_strokes = [], []
    for img in imgs:
        out = binarizer.binarize_image(img)
        mask = out[:, :, 0] > 127
        seq_masks.append(mask)
        seq_strokes.append(estimator.process_image(mask, max_length=12))

    mesh = make_mesh(8)
    pipe = TwoStagePipeline(Binarizer(bin_cfg, seed=0, mesh=mesh),
                            StrokeEstimator(se_cfg, seed=0, mesh=mesh))
    # Each stage got half the mesh, disjoint device sets.
    devs_a = set(pipe.binarizer.mesh.devices.flat)
    devs_b = set(pipe.estimator.mesh.devices.flat)
    assert len(devs_a) == 4 and len(devs_b) == 4
    assert not devs_a & devs_b
    # Params actually live on (exactly) their stage's sub-mesh.
    leaf = jax.tree_util.tree_leaves(pipe.binarizer.variables)[0]
    assert set(leaf.sharding.device_set) == devs_a
    leaf = jax.tree_util.tree_leaves(pipe.estimator.enc_vars)[0]
    assert set(leaf.sharding.device_set) == devs_b

    for chunk in (2, 3):
        pp_masks, pp_strokes = pipe.process_batched(imgs, chunk_size=chunk,
                                                    max_length=12)
        for a, b in zip(seq_masks, pp_masks):
            assert np.array_equal(a, b)
        for a, b in zip(seq_strokes, pp_strokes):
            assert len(a) == len(b)
            for (ax, ay), (bx, by) in zip(a, b):
                np.testing.assert_allclose(ax, bx)
                np.testing.assert_allclose(ay, by)


def test_two_stage_unsplittable_mesh_shared():
    """A dp=1 mesh cannot split: both stages share it and results are
    still correct (no silent single-device re-pin)."""
    from stroke_derenderer_tpu.parallel import make_mesh

    bin_cfg = BinarizerConfig(features=(8, 16), bottleneck=32,
                              compute_dtype="float32")
    se_cfg = StrokesConfig(encoder_arch="tiny", embed_dim=16,
                           attention_dim=16, decoder_dim=16, max_length=12,
                           compute_dtype="float32")
    imgs = _imgs(2)
    binarizer = Binarizer(bin_cfg, seed=0)
    estimator = StrokeEstimator(se_cfg, seed=0)
    seq = [estimator.process_image(
        binarizer.binarize_image(img)[:, :, 0] > 127, max_length=12)
        for img in imgs]

    mesh = make_mesh(2, dp=1, tp=2)
    pipe = TwoStagePipeline(Binarizer(bin_cfg, seed=0, mesh=mesh),
                            StrokeEstimator(se_cfg, seed=0, mesh=mesh))
    assert pipe.binarizer.mesh is mesh and pipe.estimator.mesh is mesh
    _, pp_strokes = pipe.process_batched(imgs, chunk_size=2, max_length=12)
    for a, b in zip(seq, pp_strokes):
        assert len(a) == len(b)
        for (ax, ay), (bx, by) in zip(a, b):
            np.testing.assert_allclose(ax, bx)
            np.testing.assert_allclose(ay, by)
