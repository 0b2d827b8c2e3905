"""CNN glyph encoder for stroke estimation.

The reference ships a ResNet-style ``encoder.onnx`` (ImageNet mean/std
normalization at evaluate_strokes.py:29-30; show-attend-tell methodology per
its README:59) mapping (B, 3, 224, 224) -> (B, C, 7, 7) feature maps. Its
``AdaptiveAvgPool2d`` stage is replaced host-side by a 2x duplicate-upsample
to a 14x14 grid, flattened to (B, 196, C) (evaluate_strokes.py:72-91).

Here: a first-party flax ResNet, NHWC, bf16 compute, GroupNorm (pure
inference, no batch-stat state), config-selectable depth. The duplicate
upsample is :func:`encode_postprocess` — on device, one fused reshape.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from stroke_derenderer_tpu.ops.quant import conv_injection

# arch -> (block kind, stage sizes, stem width, channel multiplier)
ARCHS = {
    "resnet18": ("basic", (2, 2, 2, 2), 64, 1),
    "resnet34": ("basic", (3, 4, 6, 3), 64, 1),
    "resnet50": ("bottleneck", (3, 4, 6, 3), 64, 4),
    "resnet101": ("bottleneck", (3, 4, 23, 3), 64, 4),
    "tiny": ("basic", (1, 1, 1, 1), 8, 1),  # for fast tests
}


def _gn(dtype, norm: str = "group"):
    # group_size=8 divides every width used here, including the tiny test
    # arch. "batch" (inference-mode running stats) exists for torch-exported
    # ONNX weight parity (weights/graph_import.py): torch ResNets are BN.
    if norm == "batch":
        return nn.BatchNorm(use_running_average=True, dtype=dtype)
    return nn.GroupNorm(num_groups=None, group_size=8, dtype=dtype)


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    norm: str = "group"
    quant: str = "none"

    @nn.compact
    def __call__(self, x):
        conv = conv_injection(self.quant)
        residual = x
        # Explicit (1,1) padding, not "SAME": identical at stride 1, but
        # SAME pads (0,1) on stride-2 convs where torch pads (1,1) — a
        # one-pixel grid shift that breaks torch-exported weight parity.
        y = nn.Conv(self.features, (3, 3), (self.strides, self.strides),
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, conv_general_dilated=conv)(x)
        y = nn.relu(_gn(self.dtype, self.norm)(y))
        y = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype,
                    conv_general_dilated=conv)(y)
        y = _gn(self.dtype, self.norm)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1), (self.strides, self.strides),
                               use_bias=False, dtype=self.dtype, name="proj",
                               conv_general_dilated=conv)(x)
            residual = _gn(self.dtype, self.norm)(residual)
        return nn.relu(y + residual)


class BottleneckBlock(nn.Module):
    features: int  # inner width; output is 4x
    strides: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    norm: str = "group"
    quant: str = "none"

    @nn.compact
    def __call__(self, x):
        conv = conv_injection(self.quant)
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    conv_general_dilated=conv)(x)
        y = nn.relu(_gn(self.dtype, self.norm)(y))
        y = nn.Conv(self.features, (3, 3), (self.strides, self.strides),
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, conv_general_dilated=conv)(y)
        y = nn.relu(_gn(self.dtype, self.norm)(y))
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False,
                    dtype=self.dtype, conv_general_dilated=conv)(y)
        y = _gn(self.dtype, self.norm)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features * 4, (1, 1),
                               (self.strides, self.strides), use_bias=False,
                               dtype=self.dtype, name="proj",
                               conv_general_dilated=conv)(x)
            residual = _gn(self.dtype, self.norm)(residual)
        return nn.relu(y + residual)


class ResNetEncoder(nn.Module):
    """(B, 224, 224, 3) normalized float -> (B, 7, 7, C) feature map."""
    arch: str = "resnet50"
    dtype: jnp.dtype = jnp.bfloat16
    norm: str = "group"
    quant: str = "none"  # "int8": conv stacks contract on the int8 MXU path

    @property
    def out_features(self) -> int:
        kind, _, stem, mult = ARCHS[self.arch]
        return stem * 8 * mult

    @nn.compact
    def __call__(self, x):
        kind, stages, stem, _ = ARCHS[self.arch]
        block = BasicBlock if kind == "basic" else BottleneckBlock
        x = x.astype(self.dtype)
        x = nn.Conv(stem, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="stem",
                    conv_general_dilated=conv_injection(self.quant))(x)
        x = nn.relu(_gn(self.dtype, self.norm)(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for i, n_blocks in enumerate(stages):
            features = stem * (2 ** i)
            for b in range(n_blocks):
                strides = 2 if (b == 0 and i > 0) else 1
                x = block(features, strides, self.dtype, self.norm,
                          self.quant)(x)
        return x.astype(jnp.float32)


def encode_postprocess(enc_map: jnp.ndarray, enc_image_size: int = 14) -> jnp.ndarray:
    """(B, 7, 7, C) -> (B, enc_image_size**2, C) by 2x nearest duplication.

    Device-side equivalent of the reference's AdaptiveAvgPool2d replacement
    (evaluate_strokes.py:72-91): each 7x7 cell is written to all four parity
    positions of its 2x2 patch on the 14x14 grid — i.e. a plain 2x nearest
    upsample — then the grid flattens to a 196-position sequence.
    """
    b, h, w, c = enc_map.shape
    rep = enc_image_size // h
    x = jnp.repeat(jnp.repeat(enc_map, rep, axis=1), rep, axis=2)
    return x.reshape(b, enc_image_size * enc_image_size, c)
