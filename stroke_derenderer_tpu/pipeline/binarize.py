"""Binarization pipeline: resize -> tile -> attention-UNet -> threshold -> stitch.

Replaces the reference BinarizationSession (evaluate_binarize.py:26-150).
Where the reference loops 8-tile minibatches through ONNX Runtime per image
(evaluate_binarize.py:85-115), here the whole tile batch runs as ONE XLA
program; the /255 scaling, the UNet forward, the 0.5 threshold and the
0/255 uint8 quantization all fuse on device.

Two execution modes:

  * **bucketed** (default): tiles are cut/stitched host-side (cheap memcpy
    geometry) and the device program sees a (T_bucket, H, W, 3) batch where
    T_bucket is the tile count rounded up to ``config.batch_bucket`` — one
    compile per bucket regardless of image width.
  * **fused**: cut + forward + threshold + stitch in a single jit,
    specialized per TilePlan — fastest for fixed-width production streams.

Output contract matches the reference: a (height, W_rs, 1) uint8 image in
{0, 255} at the height-normalized resolution (binarize_image,
evaluate_binarize.py:143-150).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from stroke_derenderer_tpu.config import BinarizerConfig
from stroke_derenderer_tpu.ops.resize import resize_to_height_np
from stroke_derenderer_tpu.ops.tiling import (
    TilePlan, cut_tiles, cut_tiles_np, plan_tiles, stitch_tiles, stitch_tiles_np,
)
from stroke_derenderer_tpu.utils.profiling import LEDGER
from stroke_derenderer_tpu.weights.store import (
    binarizer_template, build_binarizer_model, init_binarizer_variables,
    load_variables,
)


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _prep_line(image: np.ndarray, cfg: BinarizerConfig,
               keep_gray: bool = False) -> np.ndarray:
    """Height-normalize and coerce channels to the model's expectation.

    ``keep_gray``: callers whose device program broadcasts channels on-chip
    (the fused batch path) pass True — achromatic RGB drops to one channel
    BEFORE the resize (3x less host interpolation work, 3x less tunnel
    upload; per-channel bilinear is channel-independent so the result is
    bit-identical)."""
    img = np.asarray(image)
    if (keep_gray and img.ndim == 3 and img.shape[2] == 3
            and np.array_equal(img[..., 0], img[..., 1])
            and np.array_equal(img[..., 0], img[..., 2])):
        img = img[..., :1]
    img_rs = resize_to_height_np(img, cfg.height)
    if img_rs.ndim == 2:
        img_rs = img_rs[:, :, None]
    if not keep_gray and img_rs.shape[2] == 1 and cfg.channels == 3:
        img_rs = np.repeat(img_rs, 3, axis=2)
    return img_rs


class Binarizer:
    def __init__(self, config: BinarizerConfig | None = None, variables=None,
                 weights_path=None, seed: int = 0, fused: bool = False,
                 mesh=None):
        """``mesh``: optional jax.sharding.Mesh with a 'dp' axis — params
        are replicated and every tile/image batch axis is sharded across it
        (SURVEY.md §2.4 DP plan). Outputs are bit-identical to single
        device; tests/test_mesh_inference.py asserts it."""
        self.config = config or BinarizerConfig()
        if variables is not None:
            self.model = build_binarizer_model(self.config)
            self.variables = variables
        elif weights_path is not None:
            self.model, template = binarizer_template(self.config)
            self.variables = load_variables(template, weights_path)
        else:
            self.model, self.variables = init_binarizer_variables(self.config, seed)
        self.mesh = mesh
        self._dp = int(mesh.shape["dp"]) if mesh is not None else 1
        if mesh is not None:
            from stroke_derenderer_tpu.parallel import replicate
            self.variables = jax.device_put(self.variables, replicate(mesh))
        else:
            # Pin params to the default accelerator once (init/deserialization
            # leaves them on host; without this every call re-uploads them).
            self.variables = jax.device_put(self.variables, jax.devices()[0])
        self.fused = fused

        @jax.jit
        def _forward_mask(variables, tiles_u8):
            """(T, H, W, C) uint8 -> (T, H, W, 1) uint8 {0,255}."""
            x = tiles_u8.astype(jnp.float32) / 255.0
            probs = self.model.apply(variables, x)
            return jnp.where(probs > self.config.bin_thr,
                             jnp.uint8(255), jnp.uint8(0))

        self._forward_mask = _forward_mask

    def _shard_batch(self, arr):
        """Shard a leading batch axis over the mesh's 'dp' axis; NHWC tile
        batches additionally shard their WIDTH axis over 'tp' when the mesh
        has one (sequence parallelism — SURVEY.md §2.4 SP row). No-op
        without a mesh."""
        if self.mesh is None:
            return arr
        from stroke_derenderer_tpu.parallel import tile_sharding
        width = arr.shape[2] if arr.ndim == 4 else 0
        return jax.device_put(arr, tile_sharding(self.mesh, arr.ndim, width))

    # ------------------------------------------------------------------
    @functools.lru_cache(maxsize=64)
    def _fused_program(self, plan: TilePlan):
        cfg = self.config

        @jax.jit
        def run(variables, img_u8):
            tiles = cut_tiles(img_u8, plan)
            x = tiles.astype(jnp.float32) / 255.0
            probs = self.model.apply(variables, x)
            mask = jnp.where(probs > cfg.bin_thr, jnp.uint8(255), jnp.uint8(0))
            return stitch_tiles(mask, plan)

        return run

    # ------------------------------------------------------------------
    @functools.lru_cache(maxsize=64)
    def _fused_batch_program(self, plan: TilePlan):
        """Batched fused mode: (B, H, W, C) resized line images in, BIT-PACKED
        (B, H, ceil(W/8)) masks out. Versus the bucketed path this uploads
        the line images instead of overlapping tiles (~20% fewer bytes at
        the default 64/384 overlap) and downloads 1 bit per mask pixel
        instead of 8 — transfer-bound work on a tunneled chip."""
        cfg = self.config

        @jax.jit
        def run(variables, imgs_u8):
            tiles = jax.vmap(lambda im: cut_tiles(im, plan))(imgs_u8)
            b, t, hh, tw, c = tiles.shape
            x = tiles.reshape(b * t, hh, tw, c).astype(jnp.float32) / 255.0
            if c == 1 and cfg.channels != 1:
                # Achromatic input shipped as one channel (1/3 the upload
                # bytes — the tunnel is bandwidth-bound); replicate here.
                x = jnp.repeat(x, cfg.channels, axis=3)
            probs = self.model.apply(variables, x)
            mask = jnp.where(probs > cfg.bin_thr, jnp.uint8(255), jnp.uint8(0))
            mask = mask.reshape(b, t, hh, tw, 1)
            out = jax.vmap(lambda m: stitch_tiles(m, plan))(mask)
            wp = _round_up(plan.img_width, 8)
            bits = (out[..., 0] > 0).astype(jnp.int32)
            bits = jnp.pad(bits, ((0, 0), (0, 0), (0, wp - plan.img_width)))
            bits = bits.reshape(b, hh, wp // 8, 8)
            weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.int32)
            return jnp.sum(bits * weights, axis=-1).astype(jnp.uint8)

        return run

    def _binarize_images_fused(self, images, plans: list[TilePlan],
                               idxs_all: list[int], out: list) -> None:
        """Group same-width images and run each group through the batched
        fused program, split into ``config.io_chunks`` async sub-dispatches:
        chunk k+1's host prep (resize) + upload overlap chunk k's device
        compute, and chunk k's bit-packed download overlaps chunk k+1's
        compute. Results are written into ``out`` at their original indices.
        Bit-identical to a single dispatch (tests/test_pipeline.py)."""
        cfg = self.config
        by_plan: dict[TilePlan, list[int]] = {}
        for i in idxs_all:
            by_plan.setdefault(plans[i], []).append(i)

        pending = []  # (handle, idxs, plan) in dispatch order
        for plan, idxs in by_plan.items():
            nch = max(1, (len(idxs) + cfg.io_chunks - 1) // cfg.io_chunks)
            for c0 in range(0, len(idxs), nch):
                chunk = idxs[c0:c0 + nch]
                prepped = [_prep_line(images[i], cfg, keep_gray=True)
                           for i in chunk]
                cmax = max(p.shape[-1] for p in prepped)
                batch = np.stack([p if p.shape[-1] == cmax
                                  else np.repeat(p, cmax, axis=2)
                                  for p in prepped])
                nb = _round_up(len(chunk), self._dp)
                if nb != len(chunk):
                    batch = np.concatenate(
                        [batch, np.zeros((nb - len(chunk),) + batch.shape[1:],
                                         batch.dtype)])
                # Async: device_put + program dispatch return immediately;
                # the transfer and compute queue behind earlier chunks.
                LEDGER.add_up(batch)
                handle = self._fused_batch_program(plan)(
                    self.variables, self._shard_batch(batch))
                pending.append((handle, chunk, plan))

        for handle, chunk, plan in pending:
            packed = np.asarray(handle)[:len(chunk)]
            LEDGER.add_down(packed)
            masks = np.unpackbits(packed, axis=-1)[:, :, :plan.img_width]
            for j, i in enumerate(chunk):
                out[i] = (masks[j] * 255).astype(np.uint8)[:, :, None]

    # ------------------------------------------------------------------
    def binarize_tiles(self, tiles_u8: np.ndarray) -> np.ndarray:
        """Device forward on a pre-cut uint8 tile batch (bucket-padded;
        padded up to a dp multiple and batch-sharded when a mesh is set)."""
        import math
        t = tiles_u8.shape[0]
        tb = _round_up(t, math.lcm(self.config.batch_bucket, self._dp))
        if tb != t:
            pad = np.zeros((tb - t,) + tiles_u8.shape[1:], tiles_u8.dtype)
            tiles_u8 = np.concatenate([tiles_u8, pad], axis=0)
        LEDGER.add_up(tiles_u8)
        out = self._forward_mask(self.variables, self._shard_batch(tiles_u8))
        out = np.asarray(out[:t])
        LEDGER.add_down(out)
        return out

    def binarize_image(self, image: np.ndarray) -> np.ndarray:
        """(H0, W0, C) uint8 -> (height, W_rs, 1) uint8 {0,255}."""
        cfg = self.config
        img_rs = _prep_line(image, cfg)
        plan = plan_tiles(img_rs.shape[1], cfg.width, cfg.overlap)
        if self.fused:
            if self.mesh is not None:
                from stroke_derenderer_tpu.parallel import replicate
                img_rs = jax.device_put(img_rs, replicate(self.mesh))
            LEDGER.add_up(img_rs)
            out = np.asarray(self._fused_program(plan)(self.variables, img_rs))
            LEDGER.add_down(out)
            return out
        tiles = cut_tiles_np(img_rs, plan)
        masks = self.binarize_tiles(tiles)
        return stitch_tiles_np(masks, plan)

    # --- reference-API conveniences (evaluate_binarize.py method names) ---

    def preprocess_image(self, image: np.ndarray):
        """resize-to-height + cut into padded tiles: returns (tiles, plan)
        (reference preprocess_images, evaluate_binarize.py:67-82)."""
        img_rs = _prep_line(image, self.config)
        plan = plan_tiles(img_rs.shape[1], self.config.width,
                          self.config.overlap)
        return cut_tiles_np(img_rs, plan), plan

    def model_predict(self, tiles_u8: np.ndarray) -> np.ndarray:
        """Device forward + threshold on a tile stack
        (reference model_predict, evaluate_binarize.py:85-115 — minus its
        minibatch loop; the whole stack is one program)."""
        return self.binarize_tiles(tiles_u8)

    def postprocess_stack(self, masks: np.ndarray, plan: TilePlan) -> np.ndarray:
        """Max-blend stitch back to the line image
        (reference postprocess_stack, evaluate_binarize.py:118-127)."""
        return stitch_tiles_np(masks, plan)

    def binarize_images(self, images) -> list[np.ndarray]:
        """Batch over images: all tiles of all images run in one device
        batch (cross-image batching the reference can't do). In fused mode
        same-width images share batched fused programs (device cut/stitch,
        bit-packed mask download)."""
        cfg = self.config
        if not len(images):
            return []
        # Resized widths from shapes alone (the reference's int-truncating
        # ratio, common.py:85-93): the actual resize is deferred into the
        # fused path's chunks so it overlaps device compute.
        plans = []
        for image in images:
            h, w = np.asarray(image).shape[:2]
            rs_w = w if h == cfg.height else int(w * (cfg.height / h))
            plans.append(plan_tiles(rs_w, cfg.width, cfg.overlap))

        # Width groups large enough to amortize a per-width compile take the
        # fused program; the ragged rest share the bucketed tile batch.
        counts_by_plan: dict[TilePlan, int] = {}
        for plan in plans:
            counts_by_plan[plan] = counts_by_plan.get(plan, 0) + 1
        fmin = cfg.fused_batch_min if not self.fused else 1
        fused_i = [i for i, plan in enumerate(plans)
                   if fmin > 0 and counts_by_plan[plan] >= fmin]

        out: list[np.ndarray | None] = [None] * len(images)
        if fused_i:
            self._binarize_images_fused(images, plans, fused_i, out)
        rest = [i for i in range(len(images)) if out[i] is None]
        if rest:
            all_tiles = [cut_tiles_np(_prep_line(images[i], cfg), plans[i])
                         for i in rest]
            masks = self.binarize_tiles(np.concatenate(all_tiles, axis=0))
            ofs = 0
            for i, tiles in zip(rest, all_tiles):
                n = tiles.shape[0]
                out[i] = stitch_tiles_np(masks[ofs:ofs + n], plans[i])
                ofs += n
        return out  # type: ignore[return-value]
