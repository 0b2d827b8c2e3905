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
        # Transfer-site EVENT counts (one per add_up/add_down call ≈ one
        # blocking host<->device sync): with the probed round-trip latency
        # these bound a stage's dispatch floor the same way byte counts
        # bound its transfer floor (docs/TRANSFER_BOUND.md).
        self.n_up = 0
        self.n_down = 0

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
        self.n_up += 1

    def add_down(self, *arrays) -> None:
        self.down += self._nbytes(arrays)
        self.n_down += 1

    def snapshot(self) -> tuple[int, int, int, int]:
        return (self.up, self.down, self.n_up, self.n_down)

    def delta(self, since) -> tuple[int, int, int, int]:
        # Tolerates old 2-tuple snapshots (event counters then read as
        # absolute), but every in-repo caller passes the 4-tuple.
        up0, down0 = since[0], since[1]
        nu0 = since[2] if len(since) > 2 else 0
        nd0 = since[3] if len(since) > 3 else 0
        return (self.up - up0, self.down - down0,
                self.n_up - nu0, self.n_down - nd0)


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


def chip_busy_ms(trace_dir: str) -> float | None:
    """Device-busy milliseconds from the newest ``jax.profiler`` trace under
    ``trace_dir``: the measure-union of op intervals on accelerator tracks
    in the Chrome trace (nested/overlapping events counted once, host /
    python tracks excluded). Returns None when no trace or no device track
    exists. This is the per-round chip-busy stamp VERDICT r4 item 5 asks
    for: the §7-item-6 deferral (fused UNet forward) rests on chip-busy
    being a small fraction of stage wall, and that must be re-measured
    every capture, not once."""
    import gzip
    import json
    from pathlib import Path

    traces = sorted(Path(trace_dir).rglob("*.trace.json.gz"),
                    key=lambda p: p.stat().st_mtime)
    if not traces:
        return None
    with gzip.open(traces[-1], "rt") as f:
        events = json.load(f).get("traceEvents", [])

    # pid -> process name from metadata events; device = TPU/accelerator.
    names: dict = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e.get("pid")] = str(e.get("args", {}).get("name", ""))

    def is_device(pid) -> bool:
        n = names.get(pid, "").lower()
        if not n:
            return False
        if "host" in n or "python" in n or "plugin" in n:
            return False
        return "tpu" in n or "/device:" in n or "accelerator" in n

    iv = sorted((float(e["ts"]), float(e["ts"]) + float(e.get("dur", 0)))
                for e in events
                if e.get("ph") == "X" and is_device(e.get("pid")))
    if not iv:
        return None
    busy, cur_s, cur_e = 0.0, iv[0][0], iv[0][1]
    for s, t in iv[1:]:
        if s > cur_e:
            busy += cur_e - cur_s
            cur_s, cur_e = s, t
        else:
            cur_e = max(cur_e, t)
    busy += cur_e - cur_s
    return busy / 1e3  # trace timestamps are microseconds
