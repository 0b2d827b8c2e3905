"""Training loop driver: train the binarizer and/or captioner on synthetic
handwriting, with checkpoint/resume and model-dir export.

Usage (also exposed as ``python -m stroke_derenderer_tpu.train.loop``):

    python -m stroke_derenderer_tpu.train.loop --model binarizer \
        --steps 500 --batch 16 --out ./models

Exports weights into the inference model-dir layout (weights/store.py) so
the CLI picks them up directly. The reference offers no training path at
all ("All model training is done with Pytorch", its README:18).
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from stroke_derenderer_tpu.config import BinarizerConfig, StrokesConfig
from stroke_derenderer_tpu.data import glyph_batches, tile_batches
from stroke_derenderer_tpu.train.checkpoint import (
    latest_checkpoint, restore_checkpoint, save_checkpoint,
)
from stroke_derenderer_tpu.train.steps import (
    make_binarizer_train_step, make_captioner_train_step,
)
from stroke_derenderer_tpu.utils import get_logger
from stroke_derenderer_tpu.weights.store import (
    build_binarizer_model, init_binarizer_variables, init_strokes_variables,
    save_variables,
)

log = get_logger("train")


def _host_copy(tree):
    """Numpy copy of a (possibly multi-host sharded) train-state tree for
    serialization. Under a process group, tp-sharded params span other
    hosts' devices (not fully addressable), so np.asarray on them raises —
    gather the global content on EVERY process (collective!), then let
    only process 0 write. Single-process: identity."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils
    return multihost_utils.process_allgather(tree, tiled=True)


def _mesh_tools(mesh):
    """(shard_state, put_batch, jit_step) for multi-device training: params
    and optimizer state take the tensor-parallel layout
    (parallel.shard_params — opt-state moment trees share the param path
    suffixes so the same specs apply), batches shard on 'dp', and the step
    jits with donated state (train/steps.make_sharded_train_step).

    Under a multi-process group (--distributed), every process feeds only
    its LOCAL batch rows and the global batch is assembled device-side
    (parallel.multihost.shard_host_batch) — no host ever holds the global
    batch."""
    from stroke_derenderer_tpu.parallel import batch_sharding, shard_params
    from stroke_derenderer_tpu.train.steps import make_sharded_train_step

    if mesh is None:
        return (lambda t: t,
                lambda b: b,
                lambda f: jax.jit(f, donate_argnums=(0, 1)))
    if jax.process_count() > 1:
        from jax.sharding import PartitionSpec as P

        from stroke_derenderer_tpu.parallel.multihost import shard_host_batch

        def put_local(b):
            spec = P("dp", *([None] * (np.ndim(b) - 1)))
            return shard_host_batch(mesh, np.asarray(b), spec)

        return (lambda t: shard_params(t, mesh), put_local,
                lambda f: make_sharded_train_step(f, mesh))
    return (lambda t: shard_params(t, mesh),
            lambda b: jax.device_put(b, batch_sharding(mesh, np.ndim(b))),
            lambda f: make_sharded_train_step(f, mesh))


class _Ema:
    """EMA shadow of the train params. The shadow generalizes better than
    the last noisy SGD iterate, so when enabled it is what gets exported;
    raw params stay in the checkpoints (plus the shadow as an ``extras``
    entry) for exact resume."""

    def __init__(self, decay: float, params, shard_state, restored=None):
        # ``restored`` is the checkpointed shadow, or None to seed from the
        # live params (fresh run, warm start, or a pre-EMA checkpoint).
        self.decay = float(decay)
        self.params = shard_state(
            restored if restored is not None
            else jax.tree.map(lambda x: np.array(x, copy=True), params))
        d = self.decay

        def _apply(ema_tree, params_tree, step):
            # Decay warmup min(d, (1+t)/(10+t)): without it a fresh run's
            # export keeps d^steps weight of the random init (37% at
            # d=0.999 / 1k steps). ``step`` is the GLOBAL step so resumes
            # continue the schedule.
            dt = jnp.minimum(d, (1.0 + step) / (10.0 + step))
            return jax.tree.map(
                lambda a, b: a * dt + b.astype(a.dtype) * (1.0 - dt),
                ema_tree, params_tree)

        self._step = jax.jit(_apply, donate_argnums=(0,))

    def update(self, params, step: int):
        self.params = self._step(self.params, params, float(step))


def _partial_merge(dst, src, path=""):
    """Recursively copy every leaf of ``src`` into ``dst`` where the key
    path exists in ``dst`` with the same array shape; leaves of ``dst``
    with no (shape-compatible) source keep their fresh init. Returns
    (merged, copied_paths, skipped_paths). This is the capacity-growth
    warm start: e.g. resnet18 -> resnet34 shares the stem + the first
    blocks of stage 0 by name (flax auto-numbers BasicBlock_N
    sequentially), and a same-dims decoder transfers wholesale."""
    if isinstance(dst, dict):
        merged, copied, skipped = {}, [], []
        src = src if isinstance(src, dict) else {}
        for k, v in dst.items():
            if k in src:
                m, c, s = _partial_merge(v, src[k], f"{path}/{k}")
                merged[k] = m
                copied += c
                skipped += s
            else:
                merged[k] = v
                skipped.append(f"{path}/{k}")
        return merged, copied, skipped
    if src is not None and np.shape(dst) == np.shape(src):
        return np.asarray(src).astype(np.asarray(dst).dtype), [path], []
    return dst, [], [path]


def _deepen_remap(src_arch: str, dst_arch: str):
    """(rename, extra) for growing a basic-block ResNet DEEPER with
    function preservation (Net2DeeperNet): flax auto-numbers BasicBlock_N
    sequentially across stages, so going 18 -> 34 shifts every name after
    stage 0 and a naive name match copies almost nothing. Instead map
    blocks STAGE-ALIGNED — dst stage-s block-j takes src stage-s block-j —
    and list the dst blocks with no source ("extra"); zeroing an extra
    block's final GroupNorm makes it an exact identity (its input is
    post-relu, so relu(0 + x) = x), so the grown encoder initially
    computes exactly what the source did. Returns None when the archs
    aren't a compatible basic/basic deepening."""
    from stroke_derenderer_tpu.models.encoder import ARCHS
    if src_arch not in ARCHS or dst_arch not in ARCHS:
        return None
    skind, sstages, sstem, _ = ARCHS[src_arch]
    dkind, dstages, dstem, _ = ARCHS[dst_arch]
    if (skind, dkind) != ("basic", "basic") or sstem != dstem \
            or len(sstages) != len(dstages) \
            or any(d < s for s, d in zip(sstages, dstages)):
        return None
    rename, extra = {}, []
    si = di = 0
    for s, (sn, dn) in enumerate(zip(sstages, dstages)):
        for j in range(dn):
            if j < sn:
                rename[f"BasicBlock_{di}"] = f"BasicBlock_{si + j}"
            else:
                extra.append(f"BasicBlock_{di}")
            di += 1
        si += sn
    return rename, extra


def _partial_warm_start(params: dict, model_dir: Path,
                        dst_encoder_arch: str | None = None):
    """Shape-matched warm start from a possibly DIFFERENT architecture's
    model dir (msgpack_restore raw trees — no template, so no structure
    mismatch errors). Unlike --init-from, the target architecture comes
    from the CLI flags, not the source dir's config JSON. When the
    encoder growth is a compatible basic-ResNet deepening, blocks map
    stage-aligned and the extra blocks zero-init to identities
    (_deepen_remap), so training starts at the source model's quality."""
    import json

    import flax.serialization

    def raw(name):
        t = flax.serialization.msgpack_restore(
            (model_dir / name).read_bytes())
        return t.get("params", t)

    remap = None
    cfg_p = model_dir / "configs_strokes.json"
    if dst_encoder_arch and cfg_p.exists():
        src_arch = json.loads(cfg_p.read_text()).get("encoder_arch")
        if src_arch and src_arch != dst_encoder_arch:
            remap = _deepen_remap(src_arch, dst_encoder_arch)
            if remap:
                log.info("deepen warm start: %s -> %s, %d blocks "
                         "stage-mapped, %d extra blocks zero-init to "
                         "identity", src_arch, dst_encoder_arch,
                         len(remap[0]), len(remap[1]))

    out = {}
    for part, fname in (("encoder", "strokes_encoder.msgpack"),
                        ("decoder", "strokes_decoder.msgpack")):
        src = raw(fname)
        if part == "encoder" and remap:
            rename = remap[0]
            src = {**{k: v for k, v in src.items()
                      if not k.startswith("BasicBlock_")},
                   **{k: src[v] for k, v in rename.items()}}
        merged, copied, skipped = _partial_merge(params[part], src)
        if part == "encoder" and remap:
            for blk in remap[1]:  # identity-init the extra blocks
                gn = merged[blk]["GroupNorm_1"]
                gn["scale"] = np.zeros_like(gn["scale"])
                gn["bias"] = np.zeros_like(gn["bias"])
        n_total = len(jax.tree.leaves(params[part]))
        log.info("partial warm start %s from %s: %d/%d leaves copied "
                 "(%d fresh)", part, model_dir, len(copied), n_total,
                 len(skipped))
        if skipped:
            log.info("  fresh-init (first 8): %s", skipped[:8])
        out[part] = merged
    return out


def _restore_with_ema(last, params, opt_state, ema_decay):
    """restore_checkpoint wrapper returning (step, params, opt, ema-or-None);
    the ema slot is None when ema is off or the checkpoint predates it."""
    if ema_decay > 0.0:
        step, params, opt_state, extras = restore_checkpoint(
            last, params, opt_state, extra_templates={"ema": params})
        return step, params, opt_state, extras["ema"]
    step, params, opt_state = restore_checkpoint(last, params, opt_state)
    return step, params, opt_state, None


def train_binarizer(config: BinarizerConfig, steps: int, batch_size: int,
                    out_dir: str | Path, lr: float = 3e-4, seed: int = 0,
                    ckpt_every: int = 200, ckpt_keep: int = 0,
                    log_every: int = 25, mesh=None,
                    data_dir: str | Path | None = None,
                    line_style: str = "mixed", ruled: float = 0.0,
                    narrow: float = 0.0,
                    init_from: str | Path | None = None,
                    ema_decay: float = 0.0):
    model, variables = init_binarizer_variables(config, seed)
    params = variables["params"]
    if init_from is not None:
        from stroke_derenderer_tpu.weights.store import load_variables
        params = load_variables(
            {"params": params},
            Path(init_from) / "binarizer.msgpack")["params"]
        log.info("warm-started binarizer from %s", init_from)
    tx = optax.adamw(optax.warmup_cosine_decay_schedule(
        0.0, lr, min(100, steps // 10 + 1), steps))
    opt_state = tx.init(params)
    start_step = 0

    ckpt_dir = Path(out_dir) / "ckpt_binarizer"
    last = latest_checkpoint(ckpt_dir)
    ema_restored = None
    if last is not None:
        start_step, params, opt_state, ema_restored = _restore_with_ema(
            last, params, opt_state, ema_decay)
        log.info("resumed binarizer from %s (step %d)", last, start_step)

    shard_state, put_batch, jit_step = _mesh_tools(mesh)
    ema = (_Ema(ema_decay, params, shard_state, ema_restored)
           if ema_decay > 0.0 else None)
    params, opt_state = shard_state(params), shard_state(opt_state)
    step_fn = jit_step(make_binarizer_train_step(model, tx))
    from stroke_derenderer_tpu.data.loader import PrefetchLoader
    if data_dir is not None:
        # Real labeled pairs (data/real.py) instead of synthetic rendering.
        from stroke_derenderer_tpu.data.real import real_tile_batches
        make = lambda w: real_tile_batches(
            data_dir, np.random.default_rng(seed + w), batch_size,
            config.height, config.width, config=config)
    else:
        make = lambda w: tile_batches(np.random.default_rng(seed + w),
                                      batch_size, config.height, config.width,
                                      style=line_style, ruled=ruled,
                                      narrow=narrow)
    data = PrefetchLoader(make, num_workers=2)

    t0 = time.time()
    try:  # close() must also run when a worker or the step raises, or the
        # surviving worker thread (and its data pool) leaks
        for i, (tiles, masks) in enumerate(data, start=start_step):
            if i >= steps:
                break
            params, opt_state, loss = step_fn(
                params, opt_state, put_batch(tiles), put_batch(masks))
            if ema is not None:
                ema.update(params, i + 1)
            if (i + 1) % log_every == 0:
                log.info("binarizer step %d loss %.4f (%.2f steps/s)",
                         i + 1, float(loss),
                         log_every / max(time.time() - t0, 1e-9))
                t0 = time.time()
            if (i + 1) % ckpt_every == 0 or i + 1 == steps:
                hp, ho = _host_copy(params), _host_copy(opt_state)
                extras = ({"ema": _host_copy(ema.params)}
                          if ema is not None else None)
                if jax.process_index() == 0:
                    save_checkpoint(ckpt_dir, i + 1, hp, ho, extras=extras,
                                    keep_last=ckpt_keep)
    finally:
        data.close()

    if ema is not None:
        log.info("exporting EMA(decay=%g) shadow params", ema.decay)
    params_host = _host_copy(ema.params if ema is not None else params)
    if jax.process_count() > 1 and jax.process_index() != 0:
        return params  # one writer per fleet (shared-fs safe)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    save_variables({"params": params_host}, out / "binarizer.msgpack")
    import json
    (out / "configs_binarizer.json").write_text(
        json.dumps(config.export_dict(), indent=1))
    log.info("binarizer exported to %s", out)
    return params


def train_captioner(config: StrokesConfig, steps: int, batch_size: int,
                    out_dir: str | Path, lr: float = 3e-4, seed: int = 0,
                    seq_len: int = 96, ckpt_every: int = 200,
                    ckpt_keep: int = 0,
                    log_every: int = 25, glyph_mode: str = "partitioned",
                    init_from: str | Path | None = None,
                    init_partial: str | Path | None = None,
                    coord_sigma: float = 0.0,
                    sample_prob: float = 0.0,
                    glyph_style: str = "mixed", mesh=None,
                    data_dir: str | Path | None = None,
                    cache_dir: str | Path | None = None,
                    ema_decay: float = 0.0,
                    ss_ramp_frac: float = 1.0,
                    real_frac: float = 0.5):
    encoder, decoder, enc_vars, dec_vars, _ = init_strokes_variables(config, seed)
    params = {"encoder": enc_vars["params"], "decoder": dec_vars["params"]}
    if init_from is not None:
        from stroke_derenderer_tpu.weights.store import load_variables
        p = Path(init_from)
        params = {
            "encoder": load_variables(
                {"params": params["encoder"]},
                p / "strokes_encoder.msgpack")["params"],
            "decoder": load_variables(
                {"params": params["decoder"]},
                p / "strokes_decoder.msgpack")["params"],
        }
        log.info("warm-started captioner from %s", p)
    elif init_partial is not None:
        params = _partial_warm_start(params, Path(init_partial),
                                     dst_encoder_arch=config.encoder_arch)
    tx = optax.adamw(optax.warmup_cosine_decay_schedule(
        0.0, lr, min(100, steps // 10 + 1), steps))
    opt_state = tx.init(params)
    start_step = 0

    ckpt_dir = Path(out_dir) / "ckpt_captioner"
    last = latest_checkpoint(ckpt_dir)
    ema_restored = None
    if last is not None:
        start_step, params, opt_state, ema_restored = _restore_with_ema(
            last, params, opt_state, ema_decay)
        log.info("resumed captioner from %s (step %d)", last, start_step)

    shard_state, put_batch, jit_step = _mesh_tools(mesh)
    ema = (_Ema(ema_decay, params, shard_state, ema_restored)
           if ema_decay > 0.0 else None)
    params, opt_state = shard_state(params), shard_state(opt_state)
    step_fn = jit_step(make_captioner_train_step(
        encoder, decoder, tx, enc_image_size=config.encode_image_size,
        coord_sigma=coord_sigma, sample_prob=sample_prob,
        total_steps=steps, ss_ramp_frac=ss_ramp_frac,
        # Cached batches ship raw uint8 crops; the step normalizes on
        # device (12x fewer tunnel bytes/step — see train/steps.py).
        normalize_on_device=cache_dir is not None,
        mean=config.mean, std=config.std))
    from stroke_derenderer_tpu.data.loader import PrefetchLoader
    from stroke_derenderer_tpu.data.synthetic import partitioned_glyph_batches
    if data_dir is not None and cache_dir is not None:
        # Mixed finetune: real (or pseudo-labeled) pairs interleaved with
        # the synthetic glyph cache at real_frac — real-ink self-training
        # without catastrophic forgetting of the synthetic families. Both
        # sources ship raw uint8 (real.py raw=True inverts its normalize)
        # so one on-device-normalizing step serves both.
        from stroke_derenderer_tpu.data.cache import cached_glyph_batches
        from stroke_derenderer_tpu.data.real import real_glyph_batches

        def make(w):
            pick = np.random.default_rng(seed + w + 7)
            gr = real_glyph_batches(
                data_dir, np.random.default_rng(seed + w + 101),
                batch_size, seq_len, config=config, raw=True)
            gc = cached_glyph_batches(
                cache_dir, np.random.default_rng(seed + w), batch_size,
                seq_len, config=config, raw=True)
            while True:
                yield next(gr if pick.random() < real_frac else gc)
    elif data_dir is not None:
        # Real labeled pairs through the inference partition pipeline
        # (data/real.py) — glyph_mode/style are synthetic-only knobs.
        from stroke_derenderer_tpu.data.real import real_glyph_batches
        make = lambda w: real_glyph_batches(
            data_dir, np.random.default_rng(seed + w), batch_size, seq_len,
            config=config)
    elif cache_dir is not None:
        # Pre-generated partition-pipeline samples (data/cache.py): removes
        # the ~10-20 ms/sample host generator from the loop — on a 1-core
        # host live generation caps the step rate well below the chip's.
        from stroke_derenderer_tpu.data.cache import cached_glyph_batches
        make = lambda w: cached_glyph_batches(
            cache_dir, np.random.default_rng(seed + w), batch_size, seq_len,
            config=config, raw=True)
    elif glyph_mode == "partitioned":
        # Crops generated through the inference partition pipeline — no
        # train/test distribution gap (data/synthetic.py).
        make = lambda w: partitioned_glyph_batches(
            np.random.default_rng(seed + w), batch_size, seq_len,
            style=glyph_style)
    else:
        make = lambda w: glyph_batches(np.random.default_rng(seed + w),
                                       batch_size, config.image_size, seq_len)
    data = PrefetchLoader(make, num_workers=2)

    t0 = time.time()
    try:  # close() must also run when a worker or the step raises (see
        # train_binarizer)
        for i, (crops, tok_in, tok_out) in enumerate(data, start=start_step):
            if i >= steps:
                break
            crops, tok_in, tok_out = (put_batch(crops), put_batch(tok_in),
                                      put_batch(tok_out))
            if sample_prob > 0:
                params, opt_state, loss = step_fn(params, opt_state, crops,
                                                  tok_in, tok_out,
                                                  jnp.int32(i))
            else:
                params, opt_state, loss = step_fn(params, opt_state, crops,
                                                  tok_in, tok_out)
            if ema is not None:
                ema.update(params, i + 1)
            if (i + 1) % log_every == 0:
                log.info("captioner step %d loss %.4f (%.2f steps/s)",
                         i + 1, float(loss),
                         log_every / max(time.time() - t0, 1e-9))
                t0 = time.time()
            if (i + 1) % ckpt_every == 0 or i + 1 == steps:
                hp, ho = _host_copy(params), _host_copy(opt_state)
                extras = ({"ema": _host_copy(ema.params)}
                          if ema is not None else None)
                if jax.process_index() == 0:
                    save_checkpoint(ckpt_dir, i + 1, hp, ho, extras=extras,
                                    keep_last=ckpt_keep)
    finally:
        data.close()

    if ema is not None:
        log.info("exporting EMA(decay=%g) shadow params", ema.decay)
    params_host = _host_copy(ema.params if ema is not None else params)
    if jax.process_count() > 1 and jax.process_index() != 0:
        return params  # one writer per fleet (shared-fs safe)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    save_variables({"params": params_host["encoder"]},
                   out / "strokes_encoder.msgpack")
    save_variables({"params": params_host["decoder"]},
                   out / "strokes_decoder.msgpack")
    import json
    (out / "configs_strokes.json").write_text(
        json.dumps(config.export_dict(), indent=1))
    log.info("captioner exported to %s", out)
    return params


def main(argv=None):
    from stroke_derenderer_tpu.utils import (
        enable_compile_cache, honor_platform_env,
    )
    honor_platform_env()
    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["binarizer", "captioner", "both"],
                    default="both")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--out", default="./models")
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--bin-features", default=None,
                    help="comma list, e.g. 16,32,64")
    ap.add_argument("--encoder-arch", default=None)
    ap.add_argument("--se-dims", default=None, metavar="E,A,D",
                    help="captioner embed,attention,decoder dims (comma "
                         "list) — small values make smoke-training cheap")
    ap.add_argument("--seq-len", type=int, default=96,
                    help="teacher-forcing sequence length (captioner)")
    ap.add_argument("--init-partial", default=None, metavar="MODELDIR",
                    help="shape-matched warm start from a possibly "
                         "different-architecture model dir: leaves whose "
                         "path+shape match are copied, the rest keep their "
                         "fresh init. The NEW architecture comes from "
                         "--encoder-arch/--se-dims (the source dir's config "
                         "JSON is NOT adopted, unlike --init-from). "
                         "Captioner only.")
    ap.add_argument("--init-from", default=None, metavar="MODELDIR",
                    help="warm-start params from a model dir (binarizer "
                         "and/or captioner); the dir's config JSONs are "
                         "adopted so architectures match the weights")
    ap.add_argument("--coord-smoothing", type=float, default=0.0,
                    help="Gaussian sigma (px) for coordinate-aware label "
                         "smoothing of vertex tokens (captioner)")
    ap.add_argument("--ema", type=float, default=0.0, metavar="DECAY",
                    help="exponential moving average of the trained params "
                         "(e.g. 0.999); the EMA shadow is exported as the "
                         "model and checkpointed for exact resume")
    ap.add_argument("--ss-ramp-frac", type=float, default=1.0,
                    help="fraction of the run over which scheduled sampling "
                         "ramps to its nominal rate (1.0 = whole run)")
    ap.add_argument("--scheduled-sampling", type=float, default=0.0,
                    help="final probability of feeding the model's own "
                         "previous prediction instead of the gold token "
                         "(ramped linearly; captioner)")
    ap.add_argument("--real-frac", type=float, default=0.5,
                    help="when BOTH --data and --cache are given "
                         "(mixed real+synthetic finetune), the fraction "
                         "of batches drawn from --data (default 0.5)")
    ap.add_argument("--cache", default=None, metavar="DIR",
                    help="captioner: train from a pre-generated glyph cache "
                         "(data/cache.py) instead of live synthesis — "
                         "removes the host sample generator from the loop")
    ap.add_argument("--data", default=None, metavar="DIR",
                    help="train on REAL labeled pairs from DIR — "
                         "<stem>.png + <stem>_STROKES.json "
                         "[+ <stem>_BINARIZED.png] in the pipeline's own "
                         "output format (data/real.py) — instead of "
                         "synthetic rendering")
    ap.add_argument("--glyph-style",
                    choices=["mixed", "smooth", "hand", "letters"],
                    default="mixed",
                    help="stroke family mix for captioner data: 'mixed' "
                         "adds curls/loops/zigzags (data/synthetic.py); "
                         "'letters' is letterform words (data/letters.py); "
                         "'hand' mixes both")
    ap.add_argument("--line-style",
                    choices=["mixed", "smooth", "hand", "letters"],
                    default="mixed",
                    help="stroke family for binarizer line rendering")
    ap.add_argument("--narrow", type=float, default=0.0, metavar="P",
                    help="probability a binarizer training tile is a "
                         "right-zero-padded narrow line (the inference pad "
                         "contract; fixes ink suppression on narrow "
                         "images)")
    ap.add_argument("--ruled", type=float, default=0.0, metavar="P",
                    help="probability a binarizer training line renders on "
                         "ruled colored paper (distractor guide lines the "
                         "mask excludes — the reference demo input class)")
    ap.add_argument("--mesh", type=int, default=0, metavar="N",
                    help="train over an N-device ('dp','tp') mesh: params "
                         "and optimizer state in tensor-parallel layout, "
                         "batches sharded on dp, donated state "
                         "(parallel/mesh.py). 0/1 = single device.")
    ap.add_argument("--tp", type=int, default=1,
                    help="tensor-parallel extent within --mesh (default 1)")
    ap.add_argument("--ckpt-every", type=int, default=200,
                    help="checkpoint cadence in steps (default 200)")
    ap.add_argument("--ckpt-keep", type=int, default=0, metavar="K",
                    help="prune all but the newest K checkpoints "
                         "(0 = keep everything)")
    ap.add_argument("--distributed", action="store_true",
                    help="multi-host training: join the process group "
                         "(parallel.multihost.initialize — TPU-pod "
                         "auto-discovery or SD_COORDINATOR/"
                         "SD_NUM_PROCESSES/SD_PROCESS_ID env), build the "
                         "global ('dp','tp') mesh over every host's "
                         "devices, and feed per-host batch shards. "
                         "--batch is the PER-HOST batch size; each host "
                         "draws a distinct data stream.")
    args = ap.parse_args(argv)

    bin_kw = {}
    if args.bin_features:
        feats = tuple(int(x) for x in args.bin_features.split(","))
        bin_kw = {"features": feats, "bottleneck": feats[-1] * 2}
    se_kw = {"encoder_arch": args.encoder_arch} if args.encoder_arch else {}
    if args.se_dims:
        e, a, d = (int(x) for x in args.se_dims.split(","))
        se_kw.update(embed_dim=e, attention_dim=a, decoder_dim=d)
    # Warm starts must match the checkpoint's architecture: adopt the model
    # dir's config JSONs when present (JSON-over-kwargs precedence, same as
    # inference session init / the reference's params.update order).
    bin_cfg_json = se_cfg_json = None
    if args.init_from:
        p = Path(args.init_from) / "configs_binarizer.json"
        bin_cfg_json = p if p.exists() else None
        p = Path(args.init_from) / "configs_strokes.json"
        se_cfg_json = p if p.exists() else None

    mesh = None
    seed = args.seed
    if args.distributed:
        from stroke_derenderer_tpu.parallel.multihost import (
            fold_in_process, global_mesh, initialize,
        )
        initialize()
        mesh = global_mesh(tp=args.tp)
        seed = fold_in_process(args.seed)  # distinct data stream per host
        log.info("distributed: process %d/%d, global (%d, %d) dp/tp mesh",
                 jax.process_index(), jax.process_count(),
                 mesh.shape["dp"], mesh.shape["tp"])
    elif args.mesh and args.mesh > 1:
        from stroke_derenderer_tpu.parallel import make_mesh
        mesh = make_mesh(args.mesh, tp=args.tp)
        log.info("training on a (%d, %d) dp/tp mesh",
                 mesh.shape["dp"], mesh.shape["tp"])

    if args.model in ("binarizer", "both"):
        train_binarizer(BinarizerConfig.from_json(bin_cfg_json, **bin_kw),
                        args.steps, args.batch,
                        args.out, args.lr, seed, mesh=mesh,
                        data_dir=args.data, line_style=args.line_style,
                        ruled=args.ruled, narrow=args.narrow,
                        init_from=args.init_from,
                        ema_decay=args.ema, ckpt_every=args.ckpt_every,
                        ckpt_keep=args.ckpt_keep)
    if args.model in ("captioner", "both"):
        train_captioner(StrokesConfig.from_json(se_cfg_json, **se_kw),
                        args.steps, args.batch,
                        args.out, args.lr, seed, seq_len=args.seq_len,
                        init_from=args.init_from,
                        init_partial=args.init_partial,
                        coord_sigma=args.coord_smoothing,
                        sample_prob=args.scheduled_sampling,
                        glyph_style=args.glyph_style, mesh=mesh,
                        data_dir=args.data, cache_dir=args.cache,
                        ema_decay=args.ema, ss_ramp_frac=args.ss_ramp_frac,
                        real_frac=args.real_frac,
                        ckpt_every=args.ckpt_every,
                        ckpt_keep=args.ckpt_keep)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
