"""End-to-end benchmark: line images/sec through the two-stage pipeline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: synthetic handwriting line images (~200x1800 px, the reference's
target shape class) through binarize (resize -> tile -> UNet -> threshold ->
stitch) and stroke estimation (CC -> group -> encode -> 384-step greedy
decode -> polyline post-processing) at the default full-size configs.

vs_baseline is the measured speedup over the same pipeline on the host CPU
backend (the reference runs ONNX on CPU, BASELINE.md: published numbers are
absent; the north-star target is >=20x ONNX-CPU images/sec on one v5e chip).
The CPU denominator was measured on this machine with --measure-cpu and is
pinned below; rerun with --measure-cpu to refresh it. It is the conservative
choice: the reference pipeline itself (its session code over our exported
ONNX graphs, scripts/reference_baseline.py) measures ~2x SLOWER (0.296
img/s) on the same workload — see BASELINE.md "Measured denominators".

Robustness: the tunneled accelerator can WEDGE (hang, not error) at any
point — probe, compile, or mid-run. The timed measurement therefore runs in
a subprocess with a hard timeout and is retried on a four-rung ladder with
growing pauses and fresh re-probe budgets (~45 min total patience — later
rungs run even when the first probe sees a dead tunnel, since observed
outages last 15-25 min and self-recover); the CPU-fallback line is emitted
only after all probes and attempts are exhausted.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

# Measured on this host via `python bench.py --measure-cpu` (same models,
# same workload, same n_images=8, jax CPU backend). Refresh after
# model-architecture changes.
CPU_BASELINE_IPS = 0.628  # images/sec (2026-08-18, jax 0.9.0 CPU,
# models_demo v8 weights/configs, auto-fused batched binarize, n_images=8,
# best of sequential/pipelined stage policy — the shipped artifact, code
# path, batch geometry, AND execution policy on both sides (ADVICE r1:
# same cross-image amortization in numerator and denominator; sequential
# alone measured 0.5772)

N_IMAGES = 8
DECODE_STEPS = 384
PEAK_FLOPS_BF16 = 197e12  # TPU v5e peak bf16 FLOP/s (for MFU reporting)


def make_images(n: int, h: int = 200, w: int = 1800):
    imgs = []
    for i in range(n):
        img = np.full((h, w, 3), 255, np.uint8)
        rng = np.random.default_rng(i)
        for k in range(10):
            t = np.linspace(0, 4 * np.pi, 500)
            xs = (60 + k * (w - 120) // 10 + 35 * np.cos(t * (1 + k % 3))).astype(int)
            ys = (h // 2 + (h // 3) * np.sin(t + rng.uniform(0, 3))).astype(int)
            img[np.clip(ys, 0, h - 1), np.clip(xs, 0, w - 1)] = 0
            img[np.clip(ys + 1, 0, h - 1), np.clip(xs, 0, w - 1)] = 0
        imgs.append(img)
    return imgs


def build():
    """The shipped flagship (models_demo: trained weights + configs), so the
    benchmark measures the artifact users actually run. Falls back to
    default-config random init if the demo dir is missing. With more than
    one attached device, inference runs data-parallel over a ('dp',) mesh
    (pipeline mesh mode)."""
    import jax
    mesh = None
    if len(jax.devices()) > 1:
        from stroke_derenderer_tpu.parallel import make_mesh
        mesh = make_mesh(len(jax.devices()))
    if os.path.isdir(os.path.join(os.path.dirname(__file__) or ".",
                                  "models_demo")):
        from stroke_derenderer_tpu.cli import initialize_sessions
        return initialize_sessions(
            os.path.join(os.path.dirname(__file__) or ".", "models_demo"),
            mesh=mesh)
    from stroke_derenderer_tpu.config import BinarizerConfig, StrokesConfig
    from stroke_derenderer_tpu.pipeline import Binarizer, StrokeEstimator
    return (Binarizer(BinarizerConfig(), mesh=mesh),
            StrokeEstimator(StrokesConfig(), mesh=mesh))


def _med(xs: list) -> float:
    return float(np.median(np.asarray(xs)))


def tunnel_probe(size_mb: int = 8, reps: int = 3) -> dict:
    """Raw tunnel health, measured OUTSIDE the pipelines: host->device
    bandwidth (device_put of a size_mb uint8 buffer), device->host
    bandwidth (np.asarray of a device-COMPUTED buffer — a device_put result
    retains its host copy, so reading one back measures nothing), and the
    tiny-dispatch round-trip latency. The driver's capture and the
    builder's runs have disagreed 2.4x on identical code (VERDICT r3 item
    1); this stamps every BENCH_STAGES.json with the wire conditions it was
    measured under so the two are comparable."""
    import jax
    import jax.numpy as jnp

    d = jax.devices()[0]
    n = size_mb << 20
    a = np.random.default_rng(0).integers(0, 255, n, dtype=np.uint8)
    dbl = jax.jit(lambda x: x ^ np.uint8(0xFF))
    # Warm: transfer path + program.
    y = dbl(jax.device_put(a[: 1 << 16], d))
    y.block_until_ready()
    np.asarray(y)

    ups, downs = [], []
    for _ in range(reps):
        t0 = time.time()
        dev = jax.device_put(a, d)
        dev.block_until_ready()
        ups.append(time.time() - t0)
        dev = dbl(dev)  # new buffer, no host copy
        dev.block_until_ready()
        t0 = time.time()
        np.asarray(dev)
        downs.append(time.time() - t0)
    tiny = jax.jit(lambda x: x + 1)
    z = tiny(jnp.zeros((8,), jnp.float32))
    np.asarray(z)
    rts = []
    for _ in range(7):
        t0 = time.time()
        np.asarray(tiny(jax.device_put(np.zeros(8, np.float32), d)))
        rts.append(time.time() - t0)
    return {
        "probe_mb": size_mb,
        "up_MBps": round(n / min(ups) / 1e6, 1),
        "down_MBps": round(n / min(downs) / 1e6, 1),
        "roundtrip_ms": round(float(np.median(rts)) * 1e3, 2),
    }


def measure(platform: str | None = None, n_images: int = N_IMAGES,
            repeats: int = 5, stages: bool = False,
            sessions=None) -> float | dict:
    """Measure throughput. Reports MEDIAN-of-``repeats`` seconds/image per
    policy (not best-single: VERDICT r2 item 3 — best-case singles drifted
    31% from the driver's capture of the same code) plus min/max spread
    and per-stage wire bytes (utils/profiling.LEDGER) when ``stages`` is
    set. ``sessions``: pre-built (binarizer, estimator) to reuse across
    workload sizes without re-uploading weights.
    """
    import jax
    if platform:
        jax.config.update("jax_platforms", platform)
    from stroke_derenderer_tpu.ops.resize import resize_to_height_np
    from stroke_derenderer_tpu.utils.profiling import LEDGER

    imgs = make_images(n_images)
    binarizer, estimator = sessions or build()

    # Stroke stage runs on the clean input-derived mask: a random-init UNet
    # emits noise, which would make segmentation cost nondeterministic. The
    # mask has the same island/group structure real weights would produce.
    clean_masks = [resize_to_height_np(im, 128)[:, :, 0] < 128 for im in imgs]

    # Warmup / compile (same batch shapes as the timed loop).
    binarizer.binarize_images(imgs)
    estimator.process_images(clean_masks, max_length=DECODE_STEPS)

    t_seq: list = []
    for _ in range(repeats):
        t0 = time.time()
        binarizer.binarize_images(imgs)
        estimator.process_images(clean_masks, max_length=DECODE_STEPS)
        t_seq.append((time.time() - t0) / len(imgs))

    # Pipelined steady-state throughput: the framework ships two-stage
    # overlap (parallel/two_stage.py, CLI --two-stage, serve.py under
    # load), where stage A's transfers/compute for batch k+1 overlap
    # stage B's for batch k and throughput approaches the slower stage
    # instead of the sum. Measure the same work with both stages in
    # flight concurrently; report whichever policy is faster (identical
    # outputs either way). The CPU denominator is measured with the SAME
    # policy so the ratio stays apples-to-apples.
    import threading

    t_pipe: list = []
    for _ in range(repeats):
        t0 = time.time()
        errs: list = []

        def _stage_a():
            try:
                binarizer.binarize_images(imgs)
            except Exception as exc:  # must fail the WHOLE measurement:
                errs.append(exc)      # a timed run missing one stage would
                                      # silently overstate throughput
        ta = threading.Thread(target=_stage_a)
        ta.start()
        estimator.process_images(clean_masks, max_length=DECODE_STEPS)
        ta.join()
        if errs:
            raise errs[0]
        t_pipe.append((time.time() - t0) / len(imgs))
    med_seq, med_pipe = _med(t_seq), _med(t_pipe)
    med = min(med_seq, med_pipe)  # faster POLICY by median, not best single
    if not stages:
        return 1.0 / med

    # Per-stage split (same warmed programs): binarize-only and strokes-only,
    # with host<->device wire bytes per stage from the pipelines' ledger.
    t_bin: list = []
    t_se: list = []
    led_bin = led_se = (0, 0, 0, 0)
    for _ in range(repeats):
        snap = LEDGER.snapshot()
        t0 = time.time()
        binarizer.binarize_images(imgs)
        t_bin.append((time.time() - t0) / len(imgs))
        led_bin = tuple(np.add(led_bin, LEDGER.delta(snap)))
        snap = LEDGER.snapshot()
        t0 = time.time()
        estimator.process_images(clean_masks, max_length=DECODE_STEPS)
        t_se.append((time.time() - t0) / len(imgs))
        led_se = tuple(np.add(led_se, LEDGER.delta(snap)))
    per = repeats * len(imgs)
    t_best = t_pipe if med_pipe <= med_seq else t_seq
    return {
        "e2e_ips": 1.0 / med,
        "binarize_only_ips": 1.0 / _med(t_bin),
        "strokes_only_ips": 1.0 / _med(t_se),
        "e2e_sequential_ips": 1.0 / med_seq,
        "e2e_pipelined_ips": 1.0 / med_pipe,
        # min/max spread of the winning policy + stage splits, as ips
        "e2e_ips_spread": [round(1.0 / max(t_best), 4),
                           round(1.0 / min(t_best), 4)],
        "binarize_only_ips_spread": [round(1.0 / max(t_bin), 4),
                                     round(1.0 / min(t_bin), 4)],
        "strokes_only_ips_spread": [round(1.0 / max(t_se), 4),
                                    round(1.0 / min(t_se), 4)],
        # Wire bytes per image per stage (host->device up, device->host
        # down). At the probed tunnel bandwidth these bound the stage's
        # transfer floor: floor_s = up/up_MBps + down/down_MBps.
        "wire_binarize_up_B_per_image": int(led_bin[0] // per),
        "wire_binarize_down_B_per_image": int(led_bin[1] // per),
        "wire_strokes_up_B_per_image": int(led_se[0] // per),
        "wire_strokes_down_B_per_image": int(led_se[1] // per),
        # Transfer-site sync events per image (ledger event counts): with
        # the probed round-trip they bound the stage's dispatch floor.
        "wire_binarize_syncs_per_image": round((led_bin[2] + led_bin[3])
                                               / per, 3),
        "wire_strokes_syncs_per_image": round((led_se[2] + led_se[3])
                                              / per, 3),
        "repeats": repeats,
        "protocol": "median",
    }


def apply_wire_floors(st: dict, probes: list) -> dict:
    """Apply docs/TRANSFER_BOUND.md's floor formula to a stage capture:

        transfer_floor_s = up_B/up_MBps + down_B/down_MBps
        dispatch_floor_s = n_syncs x (roundtrip/2)

    per stage, against the BEST wire conditions among the given probes
    (max bandwidth, min round-trip — a true lower bound; each ledger event
    is at least a one-way hop, hence roundtrip/2). Returns the fields to
    stamp: per-stage floor seconds, floor-implied ips, and the residual
    fraction of measured wall NOT explained by the floor. A residual
    under ~0.15 means the stage sits on its wire floor (wire-bound, not a
    code regression); larger residuals name recoverable host/dispatch
    time (VERDICT r4 item 4)."""
    ps = [p for p in probes if isinstance(p, dict) and "up_MBps" in p]
    if not ps:
        return {"wire_floor_error": "no successful tunnel probe"}
    up_bw = max(p["up_MBps"] for p in ps) * 1e6
    down_bw = max(p["down_MBps"] for p in ps) * 1e6
    rtt_s = min(p["roundtrip_ms"] for p in ps) / 1e3
    out = {}
    for stage, ips_key in (("binarize", "binarize_only_ips"),
                           ("strokes", "strokes_only_ips")):
        ips = st.get(ips_key)
        up = st.get(f"wire_{stage}_up_B_per_image")
        down = st.get(f"wire_{stage}_down_B_per_image")
        syncs = st.get(f"wire_{stage}_syncs_per_image")
        if not ips or up is None or down is None or syncs is None:
            continue
        tfloor = up / up_bw + down / down_bw
        dfloor = syncs * rtt_s / 2.0
        measured = 1.0 / ips
        out[f"floor_{stage}_transfer_s_per_image"] = round(tfloor, 5)
        out[f"floor_{stage}_dispatch_s_per_image"] = round(dfloor, 5)
        out[f"floor_{stage}_ips"] = round(1.0 / max(tfloor + dfloor, 1e-9),
                                          2)
        out[f"floor_{stage}_residual_frac"] = round(
            max(0.0, measured - tfloor - dfloor) / measured, 4)
    if out:
        out["floor_probe_used"] = {"up_MBps": round(up_bw / 1e6, 1),
                                   "down_MBps": round(down_bw / 1e6, 1),
                                   "roundtrip_ms": round(rtt_s * 1e3, 2)}
    return out


def _mfu_stats(ips: float, bin_ips: float, se_ips: float,
               n_images: int = N_IMAGES) -> dict:
    """Analytic per-image FLOPs (XLA compiled cost analysis of the real
    programs at the real bench shapes) and the implied MFU at the measured
    throughputs. VERDICT r1 item 7."""
    from stroke_derenderer_tpu.utils.flops import bench_flops_per_image

    fl = bench_flops_per_image(make_images(n_images), DECODE_STEPS)
    out = dict(fl)
    out["peak_flops_bf16"] = PEAK_FLOPS_BF16
    out["mfu_binarize"] = round(fl["binarize_flops_per_image"] * bin_ips
                                / PEAK_FLOPS_BF16, 6)
    out["mfu_strokes"] = round(fl["strokes_flops_per_image"] * se_ips
                               / PEAK_FLOPS_BF16, 6)
    out["mfu_e2e"] = round((fl["binarize_flops_per_image"]
                            + fl["strokes_flops_per_image"]) * ips
                           / PEAK_FLOPS_BF16, 6)
    return out


def run_worker() -> None:
    """Full accelerator measurement, in-process. Invoked as a subprocess so
    a wedged tunnel can be timed out and retried by the parent.

    Emits, beyond the n=8 continuity workload: raw tunnel probes
    (bandwidth/latency) before and after the measurement, per-stage wire
    bytes, and — time budget permitting — an n=64 scale datapoint (the n=8
    steady state is ~0.1-0.25 s of work, small enough that one tunnel sync
    is 13-30%% of a batch; VERDICT r3 items 1+3)."""
    t_start = time.time()
    try:
        # Persistent XLA compile cache: across bench invocations the
        # programs are identical, so re-runs (driver retries, round-over-
        # round captures) skip the ~5 min compile tax and the time budget
        # goes to measurement instead.
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(os.path.abspath(
                              __file__)), ".jax_bench_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    try:
        pre = tunnel_probe()
    except Exception as e:  # telemetry only; never fail the bench
        pre = {"error": repr(e)}
    sessions = build()
    st = measure(stages=True, sessions=sessions)
    ips, bin_ips, se_ips = (st["e2e_ips"], st["binarize_only_ips"],
                            st["strokes_only_ips"])
    stages = {k: (round(v, 4) if isinstance(v, float) else v)
              for k, v in st.items()}
    stages.update({"n_images": N_IMAGES, "decode_steps": DECODE_STEPS,
                   "date": time.strftime("%Y-%m-%d"),
                   "tunnel_pre": pre})
    try:
        stages.update(_mfu_stats(ips, bin_ips, se_ips))
    except Exception as e:  # MFU is reporting-only; never fail the bench
        stages["mfu_error"] = repr(e)

    # Scale datapoint: n=64 with the same warmed sessions (new batch shapes
    # still compile once). Skipped when the n=8 pass already ate the
    # subprocess budget (wedge-recovery attempts run with timeout_s=900).
    elapsed = time.time() - t_start
    if elapsed < 600.0:
        try:
            st64 = measure(stages=True, n_images=64, repeats=3,
                           sessions=sessions)
            n64 = {k: (round(v, 4) if isinstance(v, float) else v)
                   for k, v in st64.items()}
            # MFU from the n=8 per-image FLOPs: the n=64 workload is the
            # same 200x1800 shape class (4 tiles, ~10 glyphs per image), and
            # re-deriving FLOPs at 256-tile/640-crop shapes costs two large
            # XLA compiles that buy no new information.
            bf = stages.get("binarize_flops_per_image")
            sf = stages.get("strokes_flops_per_image")
            if bf and sf:
                n64["mfu_binarize"] = round(
                    bf * st64["binarize_only_ips"] / PEAK_FLOPS_BF16, 6)
                n64["mfu_strokes"] = round(
                    sf * st64["strokes_only_ips"] / PEAK_FLOPS_BF16, 6)
                n64["mfu_e2e"] = round(
                    (bf + sf) * st64["e2e_ips"] / PEAK_FLOPS_BF16, 6)
                n64["mfu_note"] = "per-image FLOPs reused from n=8 workload"
            stages["n64"] = n64
        except Exception as e:
            stages["n64"] = {"error": repr(e)}
    else:
        stages["n64"] = {"skipped": f"n=8 pass took {elapsed:.0f}s > 600s "
                                    "(cold compile cache)"}
    # Chip-busy stamp (VERDICT r4 item 5): one traced pass per stage with
    # the warmed programs; the parsed device-track busy time keeps the
    # fused-UNet-forward deferral falsifiable per round (revisit the kernel
    # when chip-busy exceeds ~30% of stage wall — docs/TRANSFER_BOUND.md).
    try:
        import shutil
        import tempfile

        from stroke_derenderer_tpu.ops.resize import resize_to_height_np
        from stroke_derenderer_tpu.utils.profiling import (
            chip_busy_ms, device_trace,
        )
        imgs = make_images(N_IMAGES)
        masks = [resize_to_height_np(im, 128)[:, :, 0] < 128 for im in imgs]
        binarizer, estimator = sessions
        for stage, fn in (("binarize",
                           lambda: binarizer.binarize_images(imgs)),
                          ("strokes",
                           lambda: estimator.process_images(
                               masks, max_length=DECODE_STEPS))):
            tdir = tempfile.mkdtemp(prefix=f"bench_trace_{stage}_")
            try:
                t0 = time.time()
                with device_trace(tdir):
                    fn()
                wall_ms = (time.time() - t0) * 1e3
                busy = chip_busy_ms(tdir)
                stages[f"chip_busy_ms_{stage}"] = (
                    round(busy, 2) if busy is not None else None)
                stages[f"chip_busy_wall_ms_{stage}"] = round(wall_ms, 1)
                if busy is not None and wall_ms > 0:
                    stages[f"chip_busy_frac_{stage}"] = round(
                        busy / wall_ms, 4)
            finally:
                shutil.rmtree(tdir, ignore_errors=True)
    except Exception as e:  # telemetry only; never fail the bench
        stages["chip_busy_error"] = repr(e)

    try:
        stages["tunnel_post"] = tunnel_probe()
    except Exception as e:
        stages["tunnel_post"] = {"error": repr(e)}
    # Wire floors (VERDICT r4 item 4): measured-vs-floor per stage under
    # the capture's own probed conditions, for the n=8 and n=64 workloads.
    probes = [pre, stages.get("tunnel_post")]
    stages.update(apply_wire_floors(stages, probes))
    if isinstance(stages.get("n64"), dict) and "e2e_ips" in stages["n64"]:
        stages["n64"].update(apply_wire_floors(stages["n64"], probes))
    try:  # per-stage numbers for regression tracking (never on stdout)
        with open(os.path.join(os.path.dirname(__file__) or ".",
                               "BENCH_STAGES.json"), "w") as f:
            json.dump(stages, f, indent=1)
    except OSError:
        pass
    print(json.dumps({
        "metric": "e2e line images/sec/chip (binarize + 384-step stroke decode)",
        "value": round(ips, 4),
        "unit": "images/sec",
        "vs_baseline": round(ips / CPU_BASELINE_IPS, 2),
    }))


def _tpu_alive(total_budget_s: float = 480.0, attempt_s: float = 90.0) -> bool:
    """Probe the accelerator in a subprocess: the axon tunnel, when wedged,
    hangs jax.devices() forever rather than erroring. Retry with backoff
    until the budget is spent — tunnel outages are often transient
    (VERDICT r1: two 150 s probes gave up too early and the official
    round-1 number became a CPU fallback)."""
    code = ("import jax\n"
            "assert jax.default_backend() != 'cpu'\n"
            "import jax.numpy as jnp, numpy as np\n"
            "np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))\n")
    deadline = time.time() + total_budget_s
    backoff = 10.0
    while True:
        budget = deadline - time.time()
        if budget <= 0:
            return False
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               timeout=min(attempt_s, max(budget, 15.0)),
                               capture_output=True,
                               cwd=os.path.dirname(os.path.abspath(__file__)))
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() + backoff >= deadline:
            return False
        time.sleep(backoff)
        backoff = min(backoff * 1.7, 60.0)


def _run_measurement_subprocess(timeout_s: float) -> str | None:
    """One full accelerator bench attempt; returns the JSON line or None.
    A failed attempt's output tail is persisted to BENCH_WORKER.log so a
    CPU-fallback line is diagnosable after the fact (round 3: a worker
    crash is otherwise swallowed by capture_output)."""
    log_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_WORKER.log")
    try:
        r = subprocess.run([sys.executable, os.path.abspath(__file__),
                            "--worker"],
                           timeout=timeout_s, capture_output=True, text=True,
                           cwd=os.path.dirname(os.path.abspath(__file__)))
    except subprocess.TimeoutExpired as e:
        # e.stderr is bytes even with text=True (the str decode happens
        # only after communicate() completes normally).
        tail = (e.stderr or b"").decode(errors="replace")[-4000:]
        try:
            with open(log_path, "a") as f:
                f.write(f"\n=== worker TIMEOUT after {timeout_s}s at "
                        f"{time.strftime('%F %T')} ===\n{tail}\n")
        except OSError:
            pass
        return None
    if r.returncode != 0:
        try:
            with open(log_path, "a") as f:
                f.write(f"\n=== worker rc={r.returncode} at "
                        f"{time.strftime('%F %T')} ===\n"
                        f"--- stdout tail ---\n{r.stdout[-2000:]}\n"
                        f"--- stderr tail ---\n{r.stderr[-6000:]}\n")
        except OSError:
            pass
        return None
    for line in reversed(r.stdout.strip().splitlines()):
        try:
            obj = json.loads(line)
            if "value" in obj and "vs_baseline" in obj:
                return line
        except json.JSONDecodeError:
            continue
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--measure-cpu", action="store_true",
                    help="Measure the CPU denominator and exit.")
    ap.add_argument("--worker", action="store_true",
                    help=argparse.SUPPRESS)  # internal: in-process measure
    args = ap.parse_args()

    if args.worker:
        run_worker()
        return

    # Truncate the failure log at each top-level run so it only ever holds
    # this run's diagnostics (it is gitignored; unbounded growth otherwise).
    try:
        log = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_WORKER.log")
        if os.path.exists(log):
            os.truncate(log, 0)
    except OSError:
        pass

    if args.measure_cpu:
        # Same n_images as the accelerator measure so the vs_baseline ratio
        # compares identical cross-image batching/amortization (ADVICE r1).
        ips = measure("cpu", n_images=N_IMAGES, repeats=2)
        print(json.dumps({"cpu_images_per_sec": round(ips, 4)}))
        return

    # Growing-pause retry ladder. The ladder must run even when the FIRST
    # probe fails (it used to gate on it): observed tunnel outages last
    # 15-25 min (round-3 ~20 min; two 2026-08-21 wedges ~14 and ~25 min,
    # both self-recovered), longer than any single probe budget, so the
    # later rungs exist precisely for the case where the initial probe
    # sees a dead tunnel. Total worst-case patience ~45 min, after which
    # the CPU fallback is printed honestly.
    # BENCH_NO_RETRY=1 opts out of the later rungs for environments KNOWN
    # to have no accelerator (ADVICE r4): a missing tunnel is then reported
    # as the CPU fallback after one probe instead of ~45 min of patience.
    line = _run_measurement_subprocess(timeout_s=1200.0) if _tpu_alive() \
        else None
    ladder = ((30.0, 180.0, 900.0),
              (240.0, 480.0, 900.0),
              (600.0, 600.0, 900.0))
    if os.environ.get("BENCH_NO_RETRY"):
        ladder = ()
    for pause, probe_s, run_s in ladder:
        if line is not None:
            break
        time.sleep(pause)
        if _tpu_alive(total_budget_s=probe_s):
            line = _run_measurement_subprocess(timeout_s=run_s)
    if line is not None:
        print(line)
        return

    # Accelerator unreachable after the full probe+retry budget (tunnel
    # outage): report the CPU pipeline honestly instead of never printing.
    # Same n_images as the pinned denominator — a smaller batch loses
    # cross-image amortization and would understate even the CPU number
    # (n=2 measures ~0.42x the n=8 ratio on this host).
    ips = measure("cpu", n_images=N_IMAGES, repeats=1)
    out = {
        "metric": "e2e line images/sec (CPU FALLBACK - accelerator "
                  "unreachable; see BENCH_STAGES.json absence)",
        "value": round(ips, 4),
        "unit": "images/sec",
        "vs_baseline": round(ips / CPU_BASELINE_IPS, 2),
    }
    try:  # surface the last committed on-chip result alongside the fallback
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_STAGES.json")) as f:
            prior = json.load(f)
        out["last_committed_onchip_ips"] = prior.get("e2e_ips")
        out["last_committed_onchip_vs_baseline"] = round(
            float(prior["e2e_ips"]) / CPU_BASELINE_IPS, 2)
    except Exception:
        pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
