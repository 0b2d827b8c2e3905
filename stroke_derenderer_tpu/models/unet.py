"""Attention U-Net text-segmentation model (the binarizer).

The reference runs an attention-UNet as an opaque ``binarizer.onnx``
(methodology per its README:54-55, derived from an attention-UNet
skeletonization net) over (B, 3, 128, 384) tiles in [0, 1], emitting
(B, 1, 128, 384) foreground probabilities thresholded at 0.5
(evaluate_binarize.py:99-103). Here the architecture is first-party:

  * NHWC layout (TPU-native; channels-last keeps the 128-lane dimension
    dense for the MXU's convolution tiling),
  * bfloat16 compute / float32 params, float32 sigmoid output,
  * GroupNorm by default: inference is pure (no running-stats collection)
    and training needs no cross-device batch-stat sync,
  * classic attention-gated skip connections (additive attention on each
    skip path, gated by the upsampled decoder feature).

Encoder depth and widths are config-driven (BinarizerConfig.features /
bottleneck); the 128x384 default input pools 4x to an 8x24 bottleneck.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from stroke_derenderer_tpu.ops.quant import conv_injection


def _norm(norm: str, dtype, features: int):
    if norm == "group":
        return nn.GroupNorm(num_groups=None, group_size=min(16, features),
                            dtype=dtype)
    if norm == "batch":
        return nn.BatchNorm(use_running_average=True, dtype=dtype)
    return lambda x: x


class ConvBlock(nn.Module):
    """Two 3x3 conv + norm + ReLU stages."""
    features: int
    norm: str = "group"
    dtype: jnp.dtype = jnp.bfloat16
    quant: str = "none"  # "int8": dynamic-quant MXU conv (ops/quant.py)

    @nn.compact
    def __call__(self, x):
        for _ in range(2):
            x = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                        dtype=self.dtype,
                        conv_general_dilated=conv_injection(self.quant))(x)
            x = _norm(self.norm, self.dtype, self.features)(x)
            x = nn.relu(x)
        return x


class AttentionGate(nn.Module):
    """Additive attention gate: the upsampled decoder feature g modulates
    the encoder skip x via sigmoid(psi(relu(Wg g + Wx x)))."""
    inter_features: int
    dtype: jnp.dtype = jnp.bfloat16
    quant: str = "none"

    @nn.compact
    def __call__(self, g, x):
        conv = conv_injection(self.quant)
        wg = nn.Conv(self.inter_features, (1, 1), dtype=self.dtype,
                     name="gate_proj", conv_general_dilated=conv)(g)
        wx = nn.Conv(self.inter_features, (1, 1), dtype=self.dtype,
                     name="skip_proj", conv_general_dilated=conv)(x)
        # psi stays float: its sigmoid output gates the skip path and is
        # sensitive to the last-layer quant step.
        alpha = nn.sigmoid(nn.Conv(1, (1, 1), dtype=self.dtype, name="psi")(
            nn.relu(wg + wx)))
        return x * alpha


class AttentionUNet(nn.Module):
    """(B, H, W, C) float in [0,1] -> (B, H, W, 1) float32 probabilities."""
    features: Sequence[int] = (32, 64, 128, 256)
    bottleneck: int = 512
    norm: str = "group"
    dtype: jnp.dtype = jnp.bfloat16
    quant: str = "none"  # "int8": conv stacks contract on the int8 MXU path

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        skips = []
        for f in self.features:
            x = ConvBlock(f, self.norm, self.dtype, self.quant)(x)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = ConvBlock(self.bottleneck, self.norm, self.dtype, self.quant)(x)
        for f, skip in zip(reversed(self.features), reversed(skips)):
            x = nn.ConvTranspose(f, (2, 2), strides=(2, 2), dtype=self.dtype)(x)
            gated = AttentionGate(max(f // 2, 4), self.dtype, self.quant)(x, skip)
            x = jnp.concatenate([gated, x], axis=-1)
            x = ConvBlock(f, self.norm, self.dtype, self.quant)(x)
        logits = nn.Conv(1, (1, 1), dtype=jnp.float32, name="head")(
            x.astype(jnp.float32))
        return nn.sigmoid(logits)
