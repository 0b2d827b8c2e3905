"""Multi-host runtime (parallel/multihost.py): REAL multi-process tests.

Spawns two worker processes that join a gloo process group with 2 local
CPU devices each (a 2-host x 2-device fleet in miniature), build the
global ('dp','tp') mesh, distribute per-host input shards, and verify a
forward and a training step against the single-process full-batch result
(tests/multihost_worker.py)."""

from __future__ import annotations

import socket
import subprocess
import sys
from pathlib import Path

import pytest

WORKER = Path(__file__).parent / "multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_group(tp: int, tmp_path) -> list[str]:
    coord = f"localhost:{_free_port()}"
    out_dir = str(tmp_path / "train_out")
    procs = [
        subprocess.Popen([sys.executable, str(WORKER), str(rank), coord,
                          str(tp), out_dir],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, cwd=str(WORKER.parent.parent))
        for rank in (0, 1)
    ]
    outs = []
    for rank, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, f"worker {rank} failed:\n{out}"
        assert f"WORKER-OK {rank}" in out, out
    return outs


@pytest.mark.slow
def test_two_process_dp4(tmp_path):
    outs = _run_group(tp=1, tmp_path=tmp_path)
    assert "dp=4 tp=1" in outs[0]


@pytest.mark.slow
def test_two_process_dp2_tp2(tmp_path):
    """tp stays intra-process (would ride ICI on hardware), dp crosses
    the process boundary (DCN); the train loop's checkpoint path must
    host-gather the tp-sharded state before the process-0 write."""
    outs = _run_group(tp=2, tmp_path=tmp_path)
    assert "dp=2 tp=2" in outs[0]


def test_tp_must_divide_local_devices():
    """global_mesh rejects tensor-parallel extents that would straddle a
    process boundary (single-process path, no subprocesses)."""
    import jax

    from stroke_derenderer_tpu.parallel.multihost import global_mesh

    n = len(jax.local_devices())
    with pytest.raises(ValueError, match="intra-process"):
        global_mesh(tp=n * 2)
    mesh = global_mesh(tp=1)
    assert mesh.shape["dp"] == len(jax.devices())
