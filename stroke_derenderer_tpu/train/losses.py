"""Training losses.

The reference trains out-of-repo in torch (its README:18: "All model
training is done with Pytorch" — no scripts ship). Training is first-class
here: the binarizer learns from (tile, mask) pairs with BCE + Dice (the
standard segmentation pairing for thin-stroke masks, where plain BCE
underweights foreground), and the captioner learns teacher-forced
cross-entropy over the PAD/BOS/EOS + interleaved-vertex token grammar
(evaluate_strokes.py:94-135) with PAD positions masked out.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

from stroke_derenderer_tpu.config import PAD

_EPS = 1e-6


def dice_loss(probs: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """1 - Dice coefficient, averaged over the batch. probs/target: (B,H,W,1)."""
    p = probs.reshape(probs.shape[0], -1)
    t = target.reshape(target.shape[0], -1)
    inter = jnp.sum(p * t, axis=1)
    denom = jnp.sum(p, axis=1) + jnp.sum(t, axis=1)
    return jnp.mean(1.0 - (2.0 * inter + _EPS) / (denom + _EPS))


def binarize_loss(probs: jnp.ndarray, target: jnp.ndarray,
                  dice_weight: float = 1.0) -> jnp.ndarray:
    """BCE + Dice on sigmoid probabilities in (0, 1)."""
    p = jnp.clip(probs, _EPS, 1.0 - _EPS)
    bce = -jnp.mean(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))
    return bce + dice_weight * dice_loss(probs, target)


def caption_loss(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Teacher-forced CE: logits (B, T, V) vs next-token targets (B, T);
    positions where the target is PAD are masked."""
    mask = (targets != PAD).astype(jnp.float32)
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, targets)
    return jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1.0)
