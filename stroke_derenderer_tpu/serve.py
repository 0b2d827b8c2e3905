"""Batched HTTP inference server.

The reference is a batch-of-files script only; this adds a production
serving surface on the same pipelines:

    python -m stroke_derenderer_tpu.serve --models ./models_demo --port 8700

Endpoints (PNG body in, JSON out):
  POST /binarize  -> {"binarized_png_b64": ..., "height": H, "width": W}
  POST /derender  -> {"strokes": [[X, Y], ...], "binarize_s": ..., ...}
                     (?svg=1 adds "svg": an SVG document of the strokes
                      in original-image coordinates, io/svg.py)
  GET  /healthz   -> {"ok": true}
  GET  /metrics   -> serving counters (requests/errors by endpoint, batch
                     size histogram, per-stage latency quantiles, uptime)
                     as JSON, or Prometheus text with ?format=prom

Requests are funneled through a micro-batching queue: concurrent requests
arriving within ``--batch-window-ms`` are executed as ONE device batch
(cross-image tile/glyph batching, pipeline/*.py), so throughput under load
matches bench.py's batched numbers rather than per-request latency x N.
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from stroke_derenderer_tpu.cli import initialize_sessions
from stroke_derenderer_tpu.ops.strokes import strokes_to_json
from stroke_derenderer_tpu.utils import get_logger

log = get_logger("serve")


class Metrics:
    """Lock-guarded serving counters (SURVEY.md §5 observability row)."""

    def __init__(self):
        self._lock = threading.Lock()
        self.t_start = time.time()
        self.requests: dict[str, int] = {}
        self.errors: dict[str, int] = {}
        self.batches = 0
        self.batch_hist: dict[int, int] = {}   # batch size -> count
        self.lat: dict[str, list[float]] = {"binarize": [], "strokes": []}

    def count(self, endpoint: str, error: bool = False):
        with self._lock:
            self.requests[endpoint] = self.requests.get(endpoint, 0) + 1
            if error:
                self.errors[endpoint] = self.errors.get(endpoint, 0) + 1

    def batch(self, n: int, t_bin: float, t_se: float | None):
        with self._lock:
            self.batches += 1
            self.batch_hist[n] = self.batch_hist.get(n, 0) + 1
            self.lat["binarize"].append(t_bin)
            if t_se is not None:
                self.lat["strokes"].append(t_se)
            for k in self.lat:  # bounded memory: keep the last 1024
                if len(self.lat[k]) > 1024:
                    del self.lat[k][:-1024]

    def snapshot(self) -> dict:
        def q(xs, p):
            return round(float(np.quantile(xs, p)), 4) if xs else None

        with self._lock:
            return {
                "uptime_s": round(time.time() - self.t_start, 1),
                "requests": dict(self.requests),
                "errors": dict(self.errors),
                "batches": self.batches,
                "batch_size_hist": {str(k): v
                                    for k, v in sorted(self.batch_hist.items())},
                "latency_s": {
                    stage: {"p50": q(xs, 0.5), "p90": q(xs, 0.9),
                            "p99": q(xs, 0.99), "n": len(xs)}
                    for stage, xs in self.lat.items()
                },
            }

    def prometheus(self) -> str:
        s = self.snapshot()
        lines = [f"sd_uptime_seconds {s['uptime_s']}",
                 f"sd_batches_total {s['batches']}"]
        for ep, n in s["requests"].items():
            lines.append(f'sd_requests_total{{endpoint="{ep}"}} {n}')
        for ep, n in s["errors"].items():
            lines.append(f'sd_errors_total{{endpoint="{ep}"}} {n}')
        for size, n in s["batch_size_hist"].items():
            lines.append(f'sd_batch_size_total{{size="{size}"}} {n}')
        for stage, qs in s["latency_s"].items():
            for p in ("p50", "p90", "p99"):
                if qs[p] is not None:
                    lines.append(
                        f'sd_stage_latency_seconds{{stage="{stage}",'
                        f'quantile="{p}"}} {qs[p]}')
        return "\n".join(lines) + "\n"


class _Job:
    def __init__(self, img: np.ndarray, want_strokes: bool,
                 want_svg: bool = False):
        self.img = img
        self.want_strokes = want_strokes
        self.want_svg = want_svg
        self.done = threading.Event()
        self.result: dict | None = None
        self.error: str | None = None


class BatchWorker(threading.Thread):
    """Collects jobs for up to ``window_s`` then runs them as one batch."""

    def __init__(self, binarizer, estimator, window_s: float = 0.01,
                 max_batch: int = 64, metrics: "Metrics | None" = None):
        super().__init__(daemon=True)
        self.binarizer = binarizer
        self.estimator = estimator
        self.window_s = window_s
        self.max_batch = max_batch
        self.metrics = metrics or Metrics()
        self.q: "queue.Queue[_Job]" = queue.Queue()

    def submit(self, job: _Job):
        self.q.put(job)

    def run(self):
        while True:
            jobs = [self.q.get()]
            deadline = time.time() + self.window_s
            while len(jobs) < self.max_batch:
                remaining = deadline - time.time()
                if remaining <= 0:
                    break
                try:
                    jobs.append(self.q.get(timeout=remaining))
                except queue.Empty:
                    break
            self._process(jobs)

    def _process(self, jobs):
        try:
            t0 = time.time()
            bins = self.binarizer.binarize_images([j.img for j in jobs])
            t_bin = time.time() - t0
            masks = [b[:, :, 0] > (255 * self.binarizer.config.bin_thr)
                     for b in bins]
            stroke_jobs = [(i, m) for i, (j, m) in enumerate(zip(jobs, masks))
                           if j.want_strokes]
            stroke_results = {}
            t_se = 0.0
            if stroke_jobs:
                t0 = time.time()
                lists = self.estimator.process_images(
                    [m for _, m in stroke_jobs])
                t_se = time.time() - t0
                for (i, _), s in zip(stroke_jobs, lists):
                    stroke_results[i] = s
            self.metrics.batch(len(jobs), t_bin,
                               t_se if stroke_jobs else None)
            for i, (job, mask) in enumerate(zip(jobs, masks)):
                out = {
                    "height": int(job.img.shape[0]),
                    "width": int(job.img.shape[1]),
                    "binarize_s": round(t_bin / len(jobs), 4),
                    "batch_size": len(jobs),
                }
                out["binarized_png_b64"] = _png_b64(
                    (mask * 255).astype(np.uint8))
                if job.want_strokes:
                    ratio = job.img.shape[0] / mask.shape[0]
                    out["strokes"] = strokes_to_json(stroke_results[i],
                                                     scale=ratio)
                    out["strokes_s"] = round(t_se / max(len(stroke_jobs), 1), 4)
                    if job.want_svg:
                        from stroke_derenderer_tpu.io import strokes_to_svg
                        out["svg"] = strokes_to_svg(
                            stroke_results[i], scale=ratio,
                            size=(job.img.shape[1], job.img.shape[0]))
                job.result = out
                job.done.set()
        except Exception as exc:  # noqa: BLE001 — report to each waiter
            for job in jobs:
                job.error = f"{type(exc).__name__}: {exc}"
                job.done.set()


def _png_b64(gray: np.ndarray) -> str:
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(gray, mode="L").save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def _decode_png(body: bytes) -> np.ndarray:
    from PIL import Image
    return np.asarray(Image.open(io.BytesIO(body)).convert("RGB"))


def make_handler(worker: BatchWorker, timeout_s: float = 120.0):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route through our logger
            log.info("%s " + fmt, self.client_address[0], *args)

        def _reply(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            path, _, query = self.path.partition("?")
            if path == "/healthz":
                self._reply(200, {"ok": True})
            elif path == "/metrics":
                if "format=prom" in query.split("&"):
                    body = worker.metrics.prometheus().encode()
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     "text/plain; version=0.0.4")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                else:
                    self._reply(200, worker.metrics.snapshot())
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            path, _, query = self.path.partition("?")
            if path not in ("/binarize", "/derender"):
                worker.metrics.count(path, error=True)
                self._reply(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                img = _decode_png(self.rfile.read(n))
            except Exception as exc:  # bad input is a client error
                worker.metrics.count(path, error=True)
                self._reply(400, {"error": f"bad image: {exc}"})
                return
            job = _Job(img, want_strokes=path == "/derender",
                       want_svg="svg=1" in query.split("&"))
            worker.submit(job)
            if not job.done.wait(timeout_s):
                worker.metrics.count(path, error=True)
                self._reply(504, {"error": "timeout"})
                return
            if job.error:
                worker.metrics.count(path, error=True)
                self._reply(500, {"error": job.error})
            else:
                worker.metrics.count(path)
                self._reply(200, job.result)

    return Handler


def main(argv=None):
    from stroke_derenderer_tpu.utils import (
        enable_compile_cache, honor_platform_env,
    )
    honor_platform_env()
    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default=None)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8700)
    ap.add_argument("--batch-window-ms", type=float, default=10.0)
    ap.add_argument("--max-batch", type=int, default=64)
    ap.add_argument("--decode", choices=["greedy", "beam"], default=None)
    ap.add_argument("--beam-size", type=int, default=None)
    ap.add_argument("--device-partition", action="store_true")
    ap.add_argument("--quant", choices=["none", "int8"], default=None,
                    help="dynamic int8 conv stacks (ops/quant.py)")
    args = ap.parse_args(argv)

    ov, bov = {}, {}
    if args.decode:
        ov["decode"] = args.decode
    if args.beam_size:
        ov["beam_size"] = args.beam_size
    if args.device_partition:
        ov["device_partition"] = True
    if args.quant:
        ov["quant"] = args.quant
        bov["quant"] = args.quant
    binarizer, estimator = initialize_sessions(args.models,
                                               se_overrides=ov or None,
                                               bin_overrides=bov or None)
    worker = BatchWorker(binarizer, estimator,
                         window_s=args.batch_window_ms / 1000.0,
                         max_batch=args.max_batch)
    worker.start()
    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(worker))
    log.info("serving on http://%s:%d (models=%s)", args.host, args.port,
             args.models)
    server.serve_forever()


if __name__ == "__main__":
    main()
