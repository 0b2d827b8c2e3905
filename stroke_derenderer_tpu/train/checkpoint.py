"""Checkpoint / resume for training (orbax-backed, msgpack fallback).

The reference has no checkpointing (its "checkpoint" is the pretrained ONNX
download, SURVEY.md §5). Training here checkpoints {params, opt_state, step}
atomically and resumes exactly.
"""

from __future__ import annotations

import json
from pathlib import Path

import flax.serialization
import jax
import numpy as np


def save_checkpoint(ckpt_dir: str | Path, step: int, params, opt_state,
                    extras: dict | None = None,
                    keep_last: int = 0) -> Path:
    """Write <dir>/step_<n>/ with params.msgpack, opt_state.msgpack, meta.
    ``extras`` maps name -> pytree, each saved as extra_<name>.msgpack
    (e.g. EMA shadow params). ``keep_last`` > 0 prunes all but the newest
    K step dirs after a successful write (long runs at a tight ckpt cadence
    would otherwise accumulate hundreds of ~100 MB dirs)."""
    import shutil
    d = Path(ckpt_dir) / f"step_{step:08d}"
    tmp = d.with_suffix(".tmp")
    if tmp.exists():
        # A crashed save leaves a stale tmp dir; reusing it would leak its
        # files (e.g. an extra_ema.msgpack from a previous --ema run) into
        # this checkpoint.
        shutil.rmtree(tmp)
    tmp.mkdir(parents=True)
    (tmp / "params.msgpack").write_bytes(flax.serialization.to_bytes(params))
    (tmp / "opt_state.msgpack").write_bytes(flax.serialization.to_bytes(opt_state))
    for name, tree in (extras or {}).items():
        (tmp / f"extra_{name}.msgpack").write_bytes(
            flax.serialization.to_bytes(tree))
    (tmp / "meta.json").write_text(json.dumps({"step": step}))
    if d.exists():
        shutil.rmtree(d)
    tmp.rename(d)
    if keep_last > 0:
        olds = sorted(p for p in Path(ckpt_dir).iterdir()
                      if p.is_dir() and p.name.startswith("step_")
                      and not p.name.endswith(".tmp"))
        for p in olds[:-keep_last]:
            shutil.rmtree(p)
    return d


def latest_checkpoint(ckpt_dir: str | Path) -> Path | None:
    d = Path(ckpt_dir)
    if not d.exists():
        return None
    steps = sorted(p for p in d.iterdir()
                   if p.is_dir() and p.name.startswith("step_")
                   and not p.name.endswith(".tmp"))  # skip torn writes
    return steps[-1] if steps else None


def restore_checkpoint(ckpt_path: str | Path, params_template, opt_template,
                       extra_templates: dict | None = None):
    """Restore (step, params, opt_state[, extras]) from a checkpoint dir.

    When ``extra_templates`` is given, also returns {name: tree-or-None} —
    None for extras the checkpoint predates (older format), so callers can
    re-seed them (e.g. EMA restarts from the restored params)."""
    p = Path(ckpt_path)
    params = flax.serialization.from_bytes(
        params_template, (p / "params.msgpack").read_bytes())
    opt_state = flax.serialization.from_bytes(
        opt_template, (p / "opt_state.msgpack").read_bytes())
    step = json.loads((p / "meta.json").read_text())["step"]
    # msgpack restores numpy; put back on device lazily at first use.
    params = jax.tree.map(np.asarray, params)
    if extra_templates is None:
        return step, params, opt_state
    extras = {}
    for name, template in extra_templates.items():
        f = p / f"extra_{name}.msgpack"
        extras[name] = (jax.tree.map(np.asarray, flax.serialization.from_bytes(
            template, f.read_bytes())) if f.exists() else None)
    return step, params, opt_state, extras
