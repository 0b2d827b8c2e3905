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


def caption_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                 coord_sigma: float = 0.0) -> jnp.ndarray:
    """Teacher-forced CE: logits (B, T, V) vs next-token targets (B, T);
    positions where the target is PAD are masked.

    ``coord_sigma`` > 0 enables coordinate-aware label smoothing: vertex
    tokens are interleaved pixel positions (token 3+v encodes x=v or
    y=v-image_size, evaluate_strokes.py:120-133), so the target mass is
    spread as a Gaussian over neighboring coordinates WITHIN the same axis
    range (x mass never bleeds into y tokens or specials). PAD/BOS/EOS
    targets stay hard."""
    mask = (targets != PAD).astype(jnp.float32)
    if coord_sigma <= 0.0:
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, targets)
        return jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    import jax
    v = logits.shape[-1]
    s = (v - 3) // 2                       # image_size
    k = max(1, int(3.0 * coord_sigma))
    ds = jnp.arange(-k, k + 1)
    gauss = jnp.exp(-0.5 * (ds / coord_sigma) ** 2)

    is_coord = targets >= 3
    axis_start = jnp.where(targets < 3 + s, 3, 3 + s)
    pos = targets - axis_start             # position within its axis
    neigh = pos[..., None] + ds
    valid = is_coord[..., None] & (neigh >= 0) & (neigh < s)
    w = jnp.where(valid, gauss, 0.0)
    # Specials (and any all-invalid row) put all mass on the true token.
    w = jnp.where(is_coord[..., None], w, (ds == 0).astype(jnp.float32))
    w = w / jnp.maximum(w.sum(-1, keepdims=True), _EPS)

    tok = jnp.clip(targets[..., None] + ds, 0, v - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    lp = jnp.take_along_axis(logp, tok, axis=-1)   # (B, T, 2K+1)
    ce = -jnp.sum(w * lp, axis=-1)
    return jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1.0)
