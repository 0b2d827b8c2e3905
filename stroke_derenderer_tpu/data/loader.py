"""Background-prefetch data loading.

Synthetic sample generation (data/synthetic.py) is host CPU work; on
multi-core hosts it should overlap with device steps. ``PrefetchLoader``
wraps any batch iterator with worker threads feeding a bounded queue —
the device never waits for the host as long as aggregate worker throughput
exceeds step rate. (The reference has no data tooling at all.)
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator


class _WorkerError:
    """Queue envelope carrying a worker thread's exception to the consumer."""

    def __init__(self, exc: BaseException):
        self.exc = exc


class PrefetchLoader:
    """Pulls batches from ``make_iterator()`` on ``num_workers`` threads.

    Each worker owns an independent iterator (so generators with internal
    RNG state must be constructed per worker — pass a factory). Iteration
    order is nondeterministic across workers by design.
    """

    def __init__(self, make_iterator: Callable[[int], Iterator],
                 num_workers: int = 2, prefetch: int = 4):
        self._queue: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._threads = []
        for w in range(max(num_workers, 1)):
            t = threading.Thread(target=self._worker,
                                 args=(make_iterator, w), daemon=True)
            t.start()
            self._threads.append(t)

    def _worker(self, make_iterator, worker_id: int):
        try:
            for batch in make_iterator(worker_id):
                if self._stop.is_set():
                    return
                self._queue.put(batch)
        except BaseException as e:  # propagate to the consumer, don't die
            self._queue.put(_WorkerError(e))
        finally:
            self._queue.put(None)

    def __iter__(self):
        finished = 0
        while finished < len(self._threads):
            item = self._queue.get()
            if item is None:
                finished += 1
                continue
            if isinstance(item, _WorkerError):
                # A silently-dead worker would otherwise end iteration
                # early — training would "finish" having run few or zero
                # steps. Surface the real failure instead.
                raise RuntimeError("PrefetchLoader worker failed") from item.exc
            yield item

    def close(self):
        self._stop.set()
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
