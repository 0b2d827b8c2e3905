"""Configuration dataclasses.

Mirrors the reference's two-level config scheme (module defaults overridden
by a JSON config file, reference evaluate_binarize.py:19-45 and
evaluate_strokes.py:24-50) with typed dataclasses. Defaults are identical to
the reference constants so a reference ``configs_binarizer.json`` /
``configs_strokes.json`` drops in unchanged.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Sequence

# Reference defaults (evaluate_binarize.py:19-24).
_BIN_HEIGHT = 128
_BIN_WIDTH = 128 * 3
_BIN_CHANNELS = 3
_BIN_OVERLAP = 128 // 2
_BIN_THR = 0.5
_BIN_MINIBATCH = 8

# Reference defaults (evaluate_strokes.py:24-31, 50).
_IMG_SIZE = 224
_MARGIN = 2
_MAX_LENGTH = 384
_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)
_ENC_IMAGE_SIZE = 14

# Stroke token grammar (evaluate_strokes.py:31).
PAD, BOS, EOS = 0, 1, 2


def _load_params(configs_path: str | Path | None, params: dict) -> dict:
    """JSON file entries override kwargs, which override defaults — the same
    precedence as the reference (``params.update(params_configs)`` at
    evaluate_binarize.py:30-34)."""
    merged = dict(params)
    if configs_path is not None:
        with open(configs_path) as f:
            merged.update(json.load(f))
    return merged


@dataclasses.dataclass(frozen=True)
class BinarizerConfig:
    """Binarization pipeline + attention-UNet architecture config."""

    # Pipeline (reference names, reference defaults).
    height: int = _BIN_HEIGHT
    width: int = _BIN_WIDTH
    channels: int = _BIN_CHANNELS
    overlap: int = _BIN_OVERLAP
    bin_thr: float = _BIN_THR
    minibatch: int = _BIN_MINIBATCH

    # Architecture (new: the reference ships the net as an opaque ONNX file).
    features: tuple[int, ...] = (32, 64, 128, 256)
    bottleneck: int = 512
    norm: str = "group"  # "group" (default: pure apply) | "batch" | "none"

    # TPU execution.
    compute_dtype: str = "bfloat16"
    # "int8": dynamic-quant conv stacks on the MXU int8 path (2x bf16 peak
    # on v5e; ops/quant.py). Param tree is unchanged — any checkpoint runs
    # in either mode. Execution policy, never frozen into model dirs.
    quant: str = "none"
    # Pad tile-batch sizes up to a multiple of this to bound recompiles.
    batch_bucket: int = 8
    # binarize_images: width groups with at least this many images run the
    # batched fused program (device cut/stitch + bit-packed mask download;
    # one compile per distinct width). Measured on v5e: 1.64x the bucketed
    # path (117 vs 193 ms / 8 same-width images), bit-exact. 0 disables.
    fused_batch_min: int = 3
    # Split batch calls into this many async sub-dispatches (double
    # buffering: chunk k+1's host prep + upload against chunk k's compute).
    # Default 1 (off): on the tunneled v5e this REGRESSED the e2e bench
    # 61.8 -> 54.9 img/s — the tunnel serializes transfers, so extra
    # dispatches only add per-sync round trips (~33 ms each). Worth
    # re-measuring on hosts whose DMA streams genuinely overlap compute.
    io_chunks: int = 1

    def __post_init__(self):
        object.__setattr__(self, "features", tuple(self.features))

    # Execution policy, not architecture: never frozen into exported model
    # dirs (a dir trained when a default differed would silently pin the
    # old policy on every later load — JSON wins over defaults).
    EXEC_FIELDS = ("batch_bucket", "fused_batch_min", "quant", "io_chunks")

    @classmethod
    def from_json(cls, configs_path: str | Path | None = None, **params) -> "BinarizerConfig":
        merged = _load_params(configs_path, params)
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in merged.items() if k in known})

    def export_dict(self) -> dict:
        """Architecture + pipeline constants for a model-dir config JSON
        (execution-policy fields excluded)."""
        d = dataclasses.asdict(self)
        for k in self.EXEC_FIELDS:
            d.pop(k, None)
        return d


@dataclasses.dataclass(frozen=True)
class StrokesConfig:
    """Stroke-estimation pipeline + captioner architecture config."""

    # Pipeline (reference names, reference defaults).
    image_size: int = _IMG_SIZE
    margin: int = _MARGIN
    max_length: int = _MAX_LENGTH
    mean: Sequence[float] = _IMAGENET_MEAN
    std: Sequence[float] = _IMAGENET_STD
    encode_image_size: int = _ENC_IMAGE_SIZE

    # Architecture (new). The vertex vocabulary is interleaved (x, y) pairs:
    # token 3+v encodes x=v for v<image_size and y=v-image_size otherwise, so
    # vocab = 3 specials + 2*image_size = 451 (evaluate_strokes.py:120-133).
    encoder_arch: str = "resnet50"  # "resnet18" | "resnet50" | "resnet101" | "tiny"
    encoder_norm: str = "group"  # "group" (pure apply) | "batch" (ONNX parity)
    embed_dim: int = 512
    attention_dim: int = 512
    decoder_dim: int = 512
    projection_dim: int = 0  # 0 = no projection (reference projection.onnx is optional)

    # Decoding strategy (new: the reference is greedy-only,
    # evaluate_strokes.py:289). "beam" trades ~beam_size x decode compute
    # for higher-likelihood stroke sequences.
    decode: str = "greedy"  # "greedy" | "beam"
    beam_size: int = 5
    length_penalty: float = 0.0  # GNMT length normalization (beam only)
    # Coverage-driven re-decode (new; 0.0 = off): after the first pass, ink
    # not within ~redecode_tol px of any predicted stroke is re-partitioned
    # and decoded once more when covered fraction < redecode_coverage
    # (counters the early-EOS failure mode on dense glyphs: the model stops
    # but the uncovered ink is still there to be traced).
    redecode_coverage: float = 0.0
    redecode_tol: int = 2
    # Residual passes: each pass re-partitions the still-uncovered ink and
    # decodes it, until the coverage floor is met, a pass recovers nothing
    # new, or the budget is spent. Measured on the mixed set (n=24, CPU,
    # v8 weights): 3 passes lift coverage 0.79 -> 0.91 and cut chamfer
    # 5.1 -> 4.4 px over a single pass at unchanged per-stroke DTW.
    redecode_passes: int = 3
    # Fragment-join radius for merging residual-pass strokes into the base
    # decode (ops/strokes.merge_stroke_fragments). 20 px is the round-4
    # sweep optimum on mixed n=24 seed 0 (DTW falls monotonically to 20,
    # turns by 24), cross-checked on the real-ink set — but it will merge
    # ANY stroke pair with endpoints that close, so dense text layouts
    # (adjacent glyphs, i-dots) may want it lower. The effective radius is
    # max(redecode_join_tol, 2*redecode_tol + 2) so raising redecode_tol
    # still widens the join.
    redecode_join_tol: float = 20.0

    # TPU execution.
    compute_dtype: str = "bfloat16"
    # "int8": dynamic-quant the ENCODER conv stacks on the MXU int8 path
    # (ops/quant.py). The decoder stays bf16 (its small per-step matmuls
    # are latency/bandwidth-bound, and token argmaxes are quant-sensitive).
    quant: str = "none"
    glyph_bucket: int = 8  # pad glyph-batch to a multiple of this
    # Materialize glyph crops ON DEVICE (composite+resize+pad as batched
    # MXU matmuls from a group-id image, ops/device_partition.py) instead
    # of per-group host resizes + crop upload. Measured on v5e
    # (scripts/time_device_partition.py): 1.4x faster strokes stage
    # (122 ms vs 170 ms for 8 line images) at slightly better eval quality
    # (DTW 8.24 vs 8.96, F1 identical, eval.run --n 12), so on by default.
    device_partition: bool = True
    # Route the WHOLE decode loop through the fused Pallas kernels
    # (kernels/fused_decode.py greedy, kernels/fused_beam.py beam): all
    # weights + the encoder sequence stay VMEM-resident across steps, with
    # rounding matched to the XLA path (same token quality). Measured on
    # v5e after the numerics match: greedy 2.8x the XLA while_loop
    # (481 vs 1366 ms, B=80 P=196 E=512 T=384), beam 2.1x (870 vs 1821 ms,
    # B=16 K=5) with better eval DTW (6.12 vs 6.99). On by default on TPU;
    # both paths fall back to XLA off-TPU (see pipeline/strokes.py).
    fused_decode: bool = True
    fused_block_b: int = 16  # greedy kernel rows per grid cell
    # Async sub-dispatch count for cross-image batch calls (double
    # buffering; see BinarizerConfig.io_chunks — measured a REGRESSION on
    # the tunneled v5e, so off by default). 1 disables.
    io_chunks: int = 1
    # Run-length-encode the group-id upload when it beats the dense form
    # (ops/device_partition.pack_gid): gid images are host-built label
    # maps with long background runs, and the tunnel is bandwidth-bound.
    # The device pays one searchsorted expansion per batch.
    gid_rle: bool = True
    # Snap decoded vertices onto the binarized ink within this many px
    # (ops/strokes.refine_strokes): the polyline keeps the model's
    # topology/order while the mask supplies metric accuracy. 0 = off
    # (reference-parity raw decodes).
    refine_snap: float = 0.0
    # Decode-time coverage levers that were MEASURED AND DELETED (round 4;
    # the repo's standing discipline — int8/beam-rerank/endpoint-merge all
    # got the same treatment): an EOS logit bias, an ink-proportional
    # per-row minimum decode length (edge-transition arc-length proxy,
    # calibrated on the glyph cache), and post-decode fragment joining.
    # On mixed n=24 seed 0: min_len at its calibration was output-identical
    # to baseline; join_tol 4 cost +0.6 DTW for nothing; eos_bias 2 bought
    # +0.05 coverage at +1.2 DTW — every combination dominated by residual
    # re-decode (coverage 0.944, chamfer 4.53; models_demo/README.md).

    def __post_init__(self):
        object.__setattr__(self, "mean", tuple(self.mean))
        object.__setattr__(self, "std", tuple(self.std))

    @property
    def vocab_size(self) -> int:
        return 3 + 2 * self.image_size

    @property
    def tgt_shape(self) -> tuple[int, int]:
        return (self.image_size, self.image_size)

    # Execution policy, not architecture (see BinarizerConfig.EXEC_FIELDS):
    # decode strategy and kernel/batching choices evolve with the code and
    # must not be pinned by whatever defaults held at training time.
    EXEC_FIELDS = ("decode", "beam_size", "length_penalty", "glyph_bucket",
                   "device_partition", "fused_decode", "fused_block_b",
                   "redecode_coverage", "redecode_tol", "redecode_passes",
                   "redecode_join_tol",
                   "quant", "io_chunks", "refine_snap", "gid_rle")

    @classmethod
    def from_json(cls, configs_path: str | Path | None = None, **params) -> "StrokesConfig":
        merged = _load_params(configs_path, params)
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in merged.items() if k in known})

    def export_dict(self) -> dict:
        """Architecture + pipeline constants for a model-dir config JSON
        (execution-policy fields excluded)."""
        d = dataclasses.asdict(self)
        for k in self.EXEC_FIELDS:
            d.pop(k, None)
        d["mean"], d["std"] = list(d["mean"]), list(d["std"])
        return d
