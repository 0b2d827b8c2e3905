"""Stroke-estimation pipeline: segment -> group -> encode -> decode -> strokes.

Replaces the reference StrokeEstimationSession (evaluate_strokes.py:33-304).
Host does the irreducibly ragged geometry (connected components via the
native C++ kernel, interval grouping, per-group crop/pad bookkeeping); the
device runs encoder + greedy decode as ONE program over the whole glyph
batch — versus the reference's per-token pair of ONNX calls on a host-
compacted batch (up to 768 ORT invocations per image,
evaluate_strokes.py:279-302, SURVEY.md §3.3).

The glyph batch is padded to ``config.glyph_bucket`` with blank crops so
the compiled program is reused across images; padded rows decode garbage
that is simply dropped (predictions are sliced back to the real count,
mirroring the reference's N = min(tokens, partitions) at
evaluate_strokes.py:236).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from stroke_derenderer_tpu.config import StrokesConfig
from stroke_derenderer_tpu.models import (
    beam_decode, encode_postprocess, greedy_decode,
)
from stroke_derenderer_tpu.ops import grouping
from stroke_derenderer_tpu.ops.normalize import imagenet_normalize_np, minmax_normalize_np
from stroke_derenderer_tpu.ops.strokes import (
    clip_strokes, inverse_transform, merge_stroke_fragments, sort_strokes,
    tokens_to_strokes,
)
from stroke_derenderer_tpu.utils.profiling import LEDGER
from stroke_derenderer_tpu.weights.store import (
    build_strokes_models, init_strokes_variables, load_variables,
)


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def residual_ink(mask: np.ndarray, strokes, tol: int = 2,
                 min_px: int = 16) -> np.ndarray | None:
    """Ink in ``mask`` (bool, (h, w)) not within ~``tol`` px of any
    predicted polyline; connected residual specks below ``min_px`` pixels
    are dropped (they decode to noise, not strokes). Returns None when
    nothing survives."""
    from scipy import ndimage

    from stroke_derenderer_tpu.data.synthetic import rasterize_strokes

    if strokes:
        cov = rasterize_strokes(strokes, mask.shape,
                                thickness=tol + 1).astype(bool)
        resid = mask & ~cov
    else:
        resid = mask
    if not resid.any():
        return None
    lab, n = ndimage.label(resid, structure=np.ones((3, 3), bool))
    if n == 0:
        return None
    sizes = np.bincount(lab.ravel())
    sizes[0] = 0
    resid = (sizes >= min_px)[lab]
    return resid if resid.any() else None


class StrokeEstimator:
    def __init__(self, config: StrokesConfig | None = None, variables=None,
                 weights_paths=None, seed: int = 0, mesh=None):
        """``variables``: optional (enc_vars, dec_vars, proj_vars) tuple;
        ``weights_paths``: optional dict with keys encoder/decoder[/projection];
        ``mesh``: optional jax.sharding.Mesh with a 'dp' axis — params
        replicated, the glyph batch axis sharded across chips (SURVEY.md
        §2.4 DP plan; bit-identical outputs, tests/test_mesh_inference.py).
        Mesh mode keeps the fused Pallas decode kernels: they are
        shard_mapped over 'dp' (kernels/fused_decode.py
        fused_greedy_decode_sharded), each dp group decoding its local
        rows with the weights replicated."""
        self.config = config or StrokesConfig()
        self.encoder, self.decoder = build_strokes_models(self.config)
        self.proj = None
        if self.config.projection_dim:
            import flax.linen as nn
            self.proj = nn.Dense(self.config.projection_dim,
                                 dtype=jnp.dtype(self.config.compute_dtype))

        if variables is not None:
            self.enc_vars, self.dec_vars, self.proj_vars = variables
        elif weights_paths is not None:
            _, _, enc_t, dec_t, proj_t = _templates(self.config)
            self.enc_vars = load_variables(enc_t, weights_paths["encoder"])
            self.dec_vars = load_variables(dec_t, weights_paths["decoder"])
            # Projection weights are only meaningful when the config enables
            # the projection stage (reference loads projection.onnx only if
            # present, main.py:60-61; here both file AND config must agree).
            self.proj_vars = (load_variables(proj_t, weights_paths["projection"])
                              if ("projection" in weights_paths
                                  and self.proj is not None) else None)
        else:
            (_, _, self.enc_vars, self.dec_vars,
             self.proj_vars) = init_strokes_variables(self.config, seed)
        self.mesh = mesh
        self._dp = int(mesh.shape["dp"]) if mesh is not None else 1
        if mesh is not None:
            from stroke_derenderer_tpu.parallel import replicate
            dst = replicate(mesh)
        else:
            # Pin params to the default accelerator once (see Binarizer).
            dst = jax.devices()[0]
        self.enc_vars = jax.device_put(self.enc_vars, dst)
        self.dec_vars = jax.device_put(self.dec_vars, dst)
        if self.proj_vars is not None:
            self.proj_vars = jax.device_put(self.proj_vars, dst)

    def _shard_batch(self, arr):
        """Shard a leading glyph-batch axis over 'dp' (no-op without mesh)."""
        if self.mesh is None:
            return arr
        from stroke_derenderer_tpu.parallel import batch_sharding
        return jax.device_put(arr, batch_sharding(self.mesh, np.ndim(arr)))

    def _replicated(self, arr):
        if self.mesh is None:
            return arr
        from stroke_derenderer_tpu.parallel import replicate
        return jax.device_put(arr, replicate(self.mesh))

    # ------------------------------------------------------------------
    def _normalize_raw(self, x):
        """(N, H, W) float32 crops in raw 0..255 scale -> normalized NHWC
        model input: per-crop min-max rescale + ImageNet mean/std +
        3-channel broadcast (fuses into the encoder's first conv)."""
        cfg = self.config
        mean = jnp.asarray(cfg.mean, jnp.float32)
        std = jnp.asarray(cfg.std, jnp.float32)
        mn = x.min(axis=(1, 2), keepdims=True)
        mx = x.max(axis=(1, 2), keepdims=True)
        x = jnp.where(mx > mn,
                      (x - mn) * (255.0 / jnp.maximum(mx - mn, 1e-12)), 0.0)
        return (x[..., None] / 255.0 - mean) / std

    def _encode_and_decode(self, enc_vars, dec_vars, proj_vars, images,
                           max_length):
        """Normalized NHWC crops -> token matrix (shared program tail)."""
        cfg = self.config
        fm = self.encoder.apply(enc_vars, images)            # (B, 7, 7, C)
        seq = encode_postprocess(fm, cfg.encode_image_size)  # (B, 196, C)
        if self.proj is not None:
            seq = self.proj.apply(proj_vars, seq)
        # The decode loop re-reads the (B, 196, E) sequence every step;
        # streaming it in the compute dtype (bf16) is ~2.6x faster at
        # B=80 with negligible effect on trained-model argmax.
        seq = seq.astype(jnp.dtype(cfg.compute_dtype))
        # The Pallas kernels are single-chip programs; under a mesh they
        # run per-dp-group via shard_map (rows are independent, so the
        # mapped decode needs no collectives) -- multi-chip inference
        # keeps the fused kernels instead of the XLA while_loop.
        fused = cfg.fused_decode and jax.default_backend() == "tpu"
        if cfg.decode == "beam":
            if fused:
                from stroke_derenderer_tpu.kernels import (
                    fused_beam_decode, fused_beam_decode_sharded,
                )
                if self.mesh is not None:
                    return fused_beam_decode_sharded(
                        self.decoder, dec_vars, seq, max_length, self.mesh,
                        beam_size=cfg.beam_size,
                        length_penalty=cfg.length_penalty)
                return fused_beam_decode(
                    self.decoder, dec_vars, seq, max_length,
                    beam_size=cfg.beam_size,
                    length_penalty=cfg.length_penalty)
            return beam_decode(self.decoder, dec_vars, seq, max_length,
                               beam_size=cfg.beam_size,
                               length_penalty=cfg.length_penalty)
        if fused:
            # The WHOLE decode loop as one Pallas program with the
            # encoder sequence and decoder weights VMEM-resident
            # (kernels/fused_decode.py).
            from stroke_derenderer_tpu.kernels import (
                fused_greedy_decode, fused_greedy_decode_sharded,
            )
            if self.mesh is not None:
                return fused_greedy_decode_sharded(
                    self.decoder, dec_vars, seq, max_length, self.mesh,
                    block_b=cfg.fused_block_b)
            return fused_greedy_decode(self.decoder, dec_vars, seq,
                                       max_length,
                                       block_b=cfg.fused_block_b)
        return greedy_decode(self.decoder, dec_vars, seq, max_length)

    @functools.cached_property
    def _estimate(self):
        @functools.partial(jax.jit, static_argnames=("max_length",))
        def run(enc_vars, dec_vars, proj_vars, images, max_length):
            if images.dtype == jnp.uint8:
                # Crops travel host->device as single-channel uint8 (12x
                # less tunnel traffic than f32 RGB); normalized on device.
                images = self._normalize_raw(images.astype(jnp.float32))
            return self._encode_and_decode(enc_vars, dec_vars, proj_vars,
                                           images, max_length)

        return run

    @functools.cached_property
    def _estimate_partitioned(self):
        """Device-partitioned program: group-id image + interpolation rows
        in, tokens out — crop compositing/resize/pad, normalization,
        encoding, and decoding in ONE device program
        (ops/device_partition.py)."""
        from stroke_derenderer_tpu.ops.device_partition import gather_crops

        @functools.partial(jax.jit,
                           static_argnames=("max_length", "gid_fmt"))
        def run(enc_vars, dec_vars, proj_vars, gid_img, coords, max_length,
                gid_fmt):
            crops = gather_crops(gid_img, coords, gid_fmt)  # (N,S,S) 0..255
            images = self._normalize_raw(crops)
            return self._encode_and_decode(enc_vars, dec_vars, proj_vars,
                                           images, max_length
                                           ).astype(jnp.int16)

        return run

    @functools.cached_property
    def _estimate_partitioned_batched(self):
        """Cross-image device-partitioned program: every image's group-id
        image stacked, one call for the whole directory batch."""
        from stroke_derenderer_tpu.ops.device_partition import (
            gather_crops_batched,
        )

        @functools.partial(jax.jit,
                           static_argnames=("max_length", "gid_fmt"))
        def run(enc_vars, dec_vars, proj_vars, gid_stack, img_idx, local_id,
                coords, max_length, gid_fmt):
            crops = gather_crops_batched(gid_stack, img_idx, local_id,
                                         coords, gid_fmt)
            images = self._normalize_raw(crops)
            # int16 on the wire: vocab 451 fits and the download halves.
            return self._encode_and_decode(enc_vars, dec_vars, proj_vars,
                                           images, max_length
                                           ).astype(jnp.int16)

        return run

    def estimate_strokes(self, images: np.ndarray, max_length: int | None = None
                         ) -> np.ndarray:
        """(N, 224, 224, 3) float32 normalized crops — or (N, 224, 224)
        uint8 raw crops (normalized on device) — -> (N, max_length) int32
        token matrix."""
        import math
        max_length = max_length or self.config.max_length
        n = images.shape[0]
        nb = _round_up(max(n, 1),
                       math.lcm(self.config.glyph_bucket, self._dp))
        if nb != n:
            pad = np.zeros((nb - n,) + images.shape[1:], images.dtype)
            images = np.concatenate([images, pad], axis=0)
        LEDGER.add_up(images)
        preds = self._estimate(self.enc_vars, self.dec_vars, self.proj_vars,
                               self._shard_batch(images), max_length)
        preds = np.asarray(preds[:n])
        LEDGER.add_down(preds)
        return preds

    # ------------------------------------------------------------------
    def get_partitions(self, img_bin: np.ndarray) -> list[dict]:
        """Binarized (H, W) image -> list of partition dicts with the model
        input crop and the transform bookkeeping
        (reference evaluate_strokes.py:186-224)."""
        return compute_partitions(img_bin, self.config)

    def process_tokens(self, tokens: np.ndarray, partitions: list[dict]):
        """Token matrix + partition transforms -> globally sorted strokes
        (reference evaluate_strokes.py:227-247). One fused numpy pass over
        the whole matrix (ops/strokes.decode_tokens_batch) instead of the
        reference's per-glyph decode/clip/transform chain."""
        from stroke_derenderer_tpu.ops.strokes import decode_tokens_batch
        cfg = self.config
        n = min(tokens.shape[0], len(partitions))
        if n == 0:
            return []
        per_glyph = decode_tokens_batch(
            np.asarray(tokens[:n]), cfg.image_size, cfg.tgt_shape,
            np.asarray([partitions[i]["translate1"] for i in range(n)]),
            np.asarray([partitions[i]["ratio"] for i in range(n)]),
            np.asarray([partitions[i]["translate2"] for i in range(n)]))
        return sort_strokes([s for glyph in per_glyph for s in glyph])

    def _process_image_device(self, img_bin, max_length: int | None):
        """Device-partitioned variant of process_image: host ships a group-id
        image + per-group interpolation rows; crops never exist on the host
        (ops/device_partition.py)."""
        from stroke_derenderer_tpu.ops.device_partition import (
            PartitionPlan, pack_gid, plan_partitions,
        )
        cfg = self.config
        img_bin = np.asarray(img_bin)
        if img_bin.ndim == 3:
            img_bin = img_bin[:, :, 0]
        plan = plan_partitions(img_bin, cfg.margin, cfg.image_size)
        if plan is None:
            return []
        import math
        n = len(plan.partitions)
        nb = _round_up(n, math.lcm(cfg.glyph_bucket, self._dp))
        wb = _round_up(img_bin.shape[1], 256)  # width bucket bounds recompiles
        gid = np.full((img_bin.shape[0], wb), -1, np.int16)
        gid[:, :img_bin.shape[1]] = plan.gid_img
        gid, gid_fmt = pack_gid(gid, n, allow_rle=cfg.gid_rle)

        def _pad_rows(a):
            out = np.zeros((nb,) + a.shape[1:], a.dtype)
            out[:n] = a
            return out

        padded = [_pad_rows(getattr(plan, k)) for k in PartitionPlan.COORD_KEYS]
        LEDGER.add_up(gid, *padded)
        coords = tuple(self._shard_batch(a) for a in padded)
        preds = self._estimate_partitioned(
            self.enc_vars, self.dec_vars, self.proj_vars,
            self._replicated(gid), coords, max_length or cfg.max_length,
            gid_fmt)
        preds = np.asarray(preds[:n])
        LEDGER.add_down(preds)
        return self.process_tokens(preds.astype(np.int32), plan.partitions)

    def _dispatch_images_device(self, imgs_bin, max_length: int | None):
        """Plan + dispatch ONE async device program over a set of images'
        glyphs (group-id images stacked, image-local ids). Returns
        (pred handle, plans, counts) without blocking."""
        from stroke_derenderer_tpu.ops.device_partition import (
            PartitionPlan, pack_gid, plan_partitions,
        )
        cfg = self.config
        s = cfg.image_size
        masks, plans = [], []
        for m in imgs_bin:
            m = np.asarray(m)
            if m.ndim == 3:
                m = m[:, :, 0]
            masks.append(m)
            plans.append(plan_partitions(m, cfg.margin, s))
        counts = [len(p.partitions) if p else 0 for p in plans]
        ntot = sum(counts)
        if ntot == 0:
            return None, None, plans, counts

        hmax = max(m.shape[0] for m in masks)
        wmax = _round_up(max(m.shape[1] for m in masks), 256)
        gid_stack = np.full((len(masks), hmax, wmax), -1, np.int16)
        for i, (m, p) in enumerate(zip(masks, plans)):
            if p is not None:
                gid_stack[i, :m.shape[0], :m.shape[1]] = p.gid_img
        # RLE/nibble-pack the gid stack: it is the strokes stage's dominant
        # host->device transfer and the tunnel runs at ~30-70 MB/s.
        gid_stack, gid_fmt = pack_gid(gid_stack, max(counts),
                                      allow_rle=cfg.gid_rle)

        import math
        nb = _round_up(ntot, math.lcm(cfg.glyph_bucket, self._dp))
        img_idx = np.zeros(nb, np.int32)
        local_id = np.full(nb, -2, np.int32)  # pad rows match no group
        ink = np.full(nb, -1, np.int64)
        keys = PartitionPlan.COORD_KEYS
        coords = {k: np.zeros((nb, s) if k[1] == "i" or k[0] == "w"
                              else (nb,),
                              np.int16 if k[1] == "i" or k.endswith("last")
                              else np.float32) for k in keys}
        ofs = 0
        for i, p in enumerate(plans):
            if p is None:
                continue
            n = len(p.partitions)
            img_idx[ofs:ofs + n] = i
            local_id[ofs:ofs + n] = np.arange(n)
            if p.ink is not None:
                ink[ofs:ofs + n] = p.ink
            for k in keys:
                coords[k][ofs:ofs + n] = getattr(p, k)
            ofs += n

        # Block-sorted dispatch: the fused decode kernel early-exits per
        # block_b-row block (kernels/fused_decode.py), so ordering rows by
        # ink (a decode-length proxy) lets blocks of short glyphs retire
        # early instead of idling behind one long row. Rows are independent
        # in every decode path (greedy/beam/fused), so a permutation is
        # output-invariant; ``inv`` restores original order below.
        perm = np.argsort(-ink, kind="stable")
        inv = np.argsort(perm)
        img_idx, local_id = img_idx[perm], local_id[perm]
        coords = {k: coords[k][perm] for k in keys}

        LEDGER.add_up(gid_stack, img_idx, local_id,
                      *(coords[k] for k in keys))
        preds = self._estimate_partitioned_batched(
            self.enc_vars, self.dec_vars, self.proj_vars,
            self._replicated(gid_stack), self._shard_batch(img_idx),
            self._shard_batch(local_id),
            tuple(self._shard_batch(coords[k]) for k in keys),
            max_length or cfg.max_length, gid_fmt)
        return preds, inv, plans, counts

    def _process_images_device(self, imgs_bin, max_length: int | None):
        """Cross-image batched device partitioning, split into
        ``config.io_chunks`` async sub-dispatches: chunk k+1's host geometry
        (connected components, grouping, interpolation planning) and upload
        overlap chunk k's device compute; chunk k's token download overlaps
        chunk k+1's compute. Identical outputs to one dispatch."""
        n_imgs = len(imgs_bin)
        nch = max(1, (n_imgs + self.config.io_chunks - 1)
                  // self.config.io_chunks)
        pending = []
        for c0 in range(0, n_imgs, nch):
            pending.append(
                self._dispatch_images_device(imgs_bin[c0:c0 + nch],
                                             max_length))
        out = []
        for preds, inv, plans, counts in pending:
            if preds is not None:
                preds = np.asarray(preds)
                LEDGER.add_down(preds)
                preds = preds[inv].astype(np.int32)
            ofs = 0
            for p, n in zip(plans, counts):
                out.append(self.process_tokens(preds[ofs:ofs + n],
                                               p.partitions) if n else [])
                ofs += n
        return out

    def _process_image_once(self, img_bin, max_length: int | None):
        if self.config.device_partition:
            return self._process_image_device(img_bin, max_length)
        partitions = self.get_partitions(img_bin)
        if not partitions:
            return []
        # uint8 crops; normalization runs on device (see _estimate).
        batch = np.stack([p["image"] for p in partitions]).astype(np.uint8)
        preds = self.estimate_strokes(batch, max_length=max_length)
        return self.process_tokens(preds, partitions)

    def _process_images_once(self, imgs_bin, max_length: int | None):
        if self.config.device_partition:
            return self._process_images_device(imgs_bin, max_length)
        all_parts = [self.get_partitions(m) for m in imgs_bin]
        counts = [len(p) for p in all_parts]
        if sum(counts) == 0:
            return [[] for _ in imgs_bin]
        batch = np.concatenate(
            [np.stack([p["image"] for p in parts])
             for parts in all_parts if parts]).astype(np.uint8)
        preds = self.estimate_strokes(batch, max_length=max_length)
        out, ofs = [], 0
        for parts, n in zip(all_parts, counts):
            out.append(self.process_tokens(preds[ofs:ofs + n], parts) if n else [])
            ofs += n
        return out

    def _residual_for(self, img_bin, strokes):
        """Residual ink mask when coverage is below the configured floor,
        else None."""
        cfg = self.config
        mask = np.asarray(img_bin)
        if mask.ndim == 3:
            mask = mask[:, :, 0]
        mask = mask.astype(bool)
        ink = int(mask.sum())
        if ink == 0:
            return None
        resid = residual_ink(mask, strokes, tol=cfg.redecode_tol)
        if resid is None or 1.0 - resid.sum() / ink >= cfg.redecode_coverage:
            return None
        return resid

    def process_image(self, img_bin: np.ndarray, max_length: int | None = None):
        """Binarized image -> ordered strokes in the binarized image's
        coordinate frame (reference evaluate_strokes.py:163-183). With
        ``config.redecode_coverage`` > 0, still-uncovered ink gets up to
        ``config.redecode_passes`` residual decode passes, each merged and
        re-sorted, until the coverage floor is met or a pass recovers
        nothing."""
        strokes = self._process_image_once(img_bin, max_length)
        if self.config.redecode_coverage > 0:
            for _ in range(max(self.config.redecode_passes, 1)):
                resid = self._residual_for(img_bin, strokes)
                if resid is None:
                    break
                extra = self._process_image_once(resid, max_length)
                if not extra:  # pass recovered nothing; residual won't shrink
                    break
                strokes = self._merge_redecoded(strokes, extra)
        return self._refine(strokes, img_bin)

    def _refine(self, strokes, img_bin):
        """Optional ink-snap refinement (config.refine_snap px; 0 = off).
        Re-sorted afterwards: snapping can move the endpoint coordinates
        the writing-order sort keys on."""
        if self.config.refine_snap <= 0 or not strokes:
            return strokes
        from stroke_derenderer_tpu.ops.strokes import refine_strokes
        return sort_strokes(refine_strokes(strokes, np.asarray(img_bin),
                                           self.config.refine_snap))

    def _merge_redecoded(self, strokes, extra):
        """Combine base + residual strokes: stitch fragments whose endpoints
        nearly touch (a re-decoded remainder continues a partially traced
        stroke), then re-sort into writing order.

        The join radius is config.redecode_join_tol (default: the round-4
        calibrated 20 px; see the field's comment for the sweep and the
        dense-layout overmerge caveat), floored by the old
        2*redecode_tol+2 coupling so raising redecode_tol still widens
        the join."""
        if not extra:
            return strokes
        merged = merge_stroke_fragments(
            strokes + extra,
            tol=max(self.config.redecode_join_tol,
                    2.0 * self.config.redecode_tol + 2))
        return sort_strokes(merged)

    def process_images(self, imgs_bin, max_length: int | None = None):
        """Cross-image batching: the glyph crops of EVERY image run through
        one encoder + decode program (the reference is strictly per-image).
        Returns one stroke list per input image. Residual re-decode (see
        process_image) batches the flagged images' residual masks through
        each extra pass together."""
        out = self._process_images_once(imgs_bin, max_length)
        if self.config.redecode_coverage > 0:
            live = list(range(len(out)))  # images still eligible for a pass
            for _ in range(max(self.config.redecode_passes, 1)):
                resids = {i: self._residual_for(imgs_bin[i], out[i])
                          for i in live}
                todo = [i for i in live if resids[i] is not None]
                if not todo:
                    break
                extras = self._process_images_once(
                    [resids[i] for i in todo], max_length)
                live = []
                for i, extra in zip(todo, extras):
                    if extra:  # empty pass: residual won't shrink, retire
                        out[i] = self._merge_redecoded(out[i], extra)
                        live.append(i)
        if self.config.refine_snap > 0:
            out = [self._refine(s, m) for s, m in zip(out, imgs_bin)]
        return out


def compute_partitions(img_bin: np.ndarray, cfg: StrokesConfig) -> list[dict]:
    """Standalone partitioning (used by the session AND by synthetic data
    generation so training crops match inference crops exactly)."""
    img_bin = np.asarray(img_bin)
    if img_bin.ndim == 3:
        img_bin = img_bin[:, :, 0]
    islands = grouping.get_binarized_islands(
        img_bin.astype(np.uint8), margin=cfg.margin)
    if not islands:
        return []
    img_h = img_bin.shape[0]
    groups = grouping.group_islands(islands, (img_h, img_h))

    partitions = []
    for canvas, (top, left) in groups:
        norm = minmax_normalize_np(canvas)
        padded, ratio, (x2, y2) = grouping.resize_and_pad_np(
            norm, cfg.tgt_shape, margin=1, pad_value=0)
        # Second minmax is a no-op on already-0/255 data but kept for
        # contract parity (evaluate_strokes.py:58-69 normalizes again).
        model_in = imagenet_normalize_np(
            minmax_normalize_np(padded), cfg.mean, cfg.std)
        partitions.append({
            "image": padded,                        # (224, 224) uint8
            "image_input": model_in,                # (224, 224, 3) f32 NHWC
            "translate1": (left, top),              # (x, y)
            "ratio": ratio,
            "translate2": (x2, y2),                 # (x, y)
        })
    return partitions


def _templates(config: StrokesConfig):
    """Abstract variable trees for deserialization."""
    encoder, decoder = build_strokes_models(config)
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((1, config.image_size, config.image_size, 3), jnp.float32)
    enc_t = jax.eval_shape(encoder.init, rng, img)
    n_pos = config.encode_image_size ** 2
    enc_dim = config.projection_dim or encoder.out_features
    dec_t = jax.eval_shape(decoder.init, rng,
                           jnp.zeros((1, n_pos, enc_dim)),
                           jnp.zeros((1, 4), jnp.int32))
    proj_t = None
    if config.projection_dim:
        import flax.linen as nn
        proj = nn.Dense(config.projection_dim)
        proj_t = jax.eval_shape(proj.init, rng,
                                jnp.zeros((1, n_pos, encoder.out_features)))
    return encoder, decoder, enc_t, dec_t, proj_t
