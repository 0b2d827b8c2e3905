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
