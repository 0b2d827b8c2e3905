"""PrefetchLoader tests."""

import time

from stroke_derenderer_tpu.data.loader import PrefetchLoader


def test_loader_yields_all_finite_batches():
    def make(worker_id):
        for i in range(5):
            yield (worker_id, i)

    loader = PrefetchLoader(make, num_workers=2, prefetch=2)
    items = list(loader)
    assert len(items) == 10
    assert {w for w, _ in items} == {0, 1}


def test_loader_infinite_stream_and_close():
    def make(worker_id):
        i = 0
        while True:
            yield i
            i += 1

    loader = PrefetchLoader(make, num_workers=1, prefetch=2)
    it = iter(loader)
    got = [next(it) for _ in range(5)]
    assert len(got) == 5
    loader.close()


def test_loader_overlaps_slow_producer():
    def make(worker_id):
        for i in range(4):
            time.sleep(0.05)
            yield i

    loader = PrefetchLoader(make, num_workers=2, prefetch=4)
    time.sleep(0.3)  # let workers fill the queue
    t0 = time.time()
    items = list(loader)
    assert len(items) == 8
    # Everything was prefetched; draining is nearly instant.
    assert time.time() - t0 < 0.2


def test_prefetch_loader_propagates_worker_exceptions():
    """A dying worker must raise in the consumer, not silently end
    iteration (a dead data thread made training 'complete' with 0 steps)."""
    import pytest

    from stroke_derenderer_tpu.data.loader import PrefetchLoader

    def bad_iterator(worker_id):
        yield 1
        raise ValueError("synthetic data bug")

    loader = PrefetchLoader(bad_iterator, num_workers=1)
    with pytest.raises(RuntimeError, match="worker failed"):
        list(loader)
    loader.close()
