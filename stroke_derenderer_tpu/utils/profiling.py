"""Tracing / profiling utilities.

The reference's only observability is a wall-clock print per image
(main.py:106-117, 123-136; SURVEY.md §5). Kept here as the CLI prints, plus:

  * :class:`StageTimer` — named per-stage wall-clock accumulation with a
    summary table, for the pipeline stages (resize/tile/forward/stitch/
    segment/decode/post);
  * :func:`device_trace` — context manager around ``jax.profiler`` emitting
    a TensorBoard-loadable device trace (XLA op timeline) to a directory;
  * :data:`LEDGER` — process-global host<->device byte counter fed by the
    pipelines' transfer sites, so bench/serving can report wire bytes per
    stage (the tunneled chip runs at ~30-70 MB/s up, making transfer bytes
    first-order wall-clock — VERDICT r3 item 1).
"""

from __future__ import annotations

import collections
import contextlib
import time


class StageTimer:
    """Accumulates wall-clock per named stage.

    >>> timer = StageTimer()
    >>> with timer("forward"):
    ...     run()
    >>> timer.summary()
    """

    def __init__(self):
        self.totals: dict[str, float] = collections.defaultdict(float)
        self.counts: dict[str, int] = collections.defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        lines = [f"{'stage':<16}{'total_s':>10}{'calls':>8}{'mean_ms':>10}"]
        for name, tot in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:<16}{tot:>10.3f}{n:>8}{1000 * tot / n:>10.2f}")
        return "\n".join(lines)

    def as_dict(self) -> dict:
        return {k: {"total_s": self.totals[k], "calls": self.counts[k]}
                for k in self.totals}


class TransferLedger:
    """Cumulative host->device ("up") and device->host ("down") byte
    counts, reported by the pipeline code at each transfer site (explicit
    ``device_put`` or implicit jit-argument upload / ``np.asarray``
    download). Always on — two integer adds per pipeline dispatch."""

    def __init__(self):
        self.up = 0
        self.down = 0

    @staticmethod
    def _nbytes(arrays) -> int:
        n = 0
        for a in arrays:
            if a is None:
                continue
            if isinstance(a, (tuple, list)):  # e.g. RLE (starts, vals)
                n += TransferLedger._nbytes(a)
            else:
                n += int(a.nbytes)
        return n

    def add_up(self, *arrays) -> None:
        self.up += self._nbytes(arrays)

    def add_down(self, *arrays) -> None:
        self.down += self._nbytes(arrays)

    def snapshot(self) -> tuple[int, int]:
        return (self.up, self.down)

    def delta(self, since: tuple[int, int]) -> tuple[int, int]:
        return (self.up - since[0], self.down - since[1])


LEDGER = TransferLedger()


@contextlib.contextmanager
def device_trace(log_dir: str):
    """XLA device trace via jax.profiler (TensorBoard 'profile' plugin)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
