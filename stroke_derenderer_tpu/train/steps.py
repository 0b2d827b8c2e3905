"""Sharded train steps (pjit over a ('dp', 'tp') mesh).

One step trains the full two-stage derenderer: the attention-UNet binarizer
on (tile, mask) pairs and the encoder+attentive-decoder captioner on
(glyph crop, token sequence) pairs. Sharding:

  * all batch axes             P('dp')            — data parallel over ICI
  * conv kernels / vocab head  P(..., 'tp')       — tensor parallel where the
    dimension divides; XLA/GSPMD inserts the collectives
  * optimizer state follows the param layout (same specs)

The steps are plain jitted functions over explicitly device_put inputs —
the canonical pjit recipe (mesh -> annotate -> let XLA insert collectives).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from stroke_derenderer_tpu.train.losses import binarize_loss, caption_loss


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int = 0


def device_normalize_u8(crops_u8: jax.Array, mean, std) -> jax.Array:
    """(B, S, S) uint8 -> (B, S, S, 3) f32 model input, entirely on device:
    per-sample minmax rescale then ImageNet normalize — bit-equivalent (to
    f32 rounding) to imagenet_normalize_np(minmax_normalize_np(crop)) in
    ops/normalize.py. Lets training ship raw uint8 crops over the link."""
    x = crops_u8.astype(jnp.float32)
    mn = jnp.min(x, axis=(1, 2), keepdims=True)
    mx = jnp.max(x, axis=(1, 2), keepdims=True)
    scale = jnp.where(mx > mn, 255.0 / jnp.maximum(mx - mn, 1e-12), 0.0)
    # rint + clip matches the uint8 round-trip of the host chain.
    u8 = jnp.clip(jnp.rint((x - mn) * scale), 0.0, 255.0)
    return ((u8[..., None] / 255.0 - jnp.asarray(mean, jnp.float32))
            / jnp.asarray(std, jnp.float32))


def _make_update(loss_of_params: Callable, tx: optax.GradientTransformation):
    def update(params, opt_state, *batch):
        loss, grads = jax.value_and_grad(loss_of_params)(params, *batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss
    return update


def make_binarizer_train_step(model, tx: optax.GradientTransformation):
    """Returns jittable ``step(params, opt_state, tiles, masks)``.
    tiles: (B, H, W, C) float in [0,1]; masks: (B, H, W, 1) float {0,1}."""
    def loss_fn(params, tiles, masks):
        probs = model.apply({"params": params}, tiles)
        return binarize_loss(probs, masks)
    return _make_update(loss_fn, tx)


def make_captioner_train_step(encoder, decoder, tx: optax.GradientTransformation,
                              enc_image_size: int = 14, proj=None,
                              coord_sigma: float = 0.0,
                              sample_prob: float = 0.0,
                              total_steps: int = 0,
                              ss_ramp_frac: float = 1.0,
                              normalize_on_device: bool = False,
                              mean=None, std=None):
    """Returns jittable ``step(params, opt_state, images, tokens_in,
    tokens_out)`` where params = {'encoder': ..., 'decoder': ...[, 'proj']}.
    Teacher forcing: tokens_in are shifted-right targets. ``coord_sigma``
    enables coordinate-aware label smoothing (train/losses.py).

    ``normalize_on_device`` moves the minmax + ImageNet normalize chain
    into the jitted step: ``images`` then arrive as raw uint8 crops
    (B, S, S) — 12x fewer wire bytes per step than the host-normalized
    (B, S, S, 3) float32, which matters when the accelerator sits behind
    a ~50 MB/s tunnel, and it drops the per-sample host normalize loop
    from the (1-core) input path. Bit-equivalent to
    imagenet_normalize_np(minmax_normalize_np(crop)) up to f32 rounding.

    ``sample_prob`` > 0 enables scheduled sampling: a first (gradient-
    stopped) teacher-forced pass produces the model's own next-token
    predictions, and each input token is replaced by the model's previous
    prediction with probability p — ramped linearly from 0 to sample_prob
    over ``total_steps`` — before the loss pass. This narrows the
    train-time/decode-time input distribution gap of autoregressive
    decoding. The step then has signature
    ``step(params, opt_state, images, tokens_in, tokens_out, step_idx)``.
    """
    from stroke_derenderer_tpu.config import PAD
    from stroke_derenderer_tpu.models import encode_postprocess

    if normalize_on_device:
        _prep = lambda crops_u8: device_normalize_u8(crops_u8, mean, std)
    else:
        _prep = lambda images: images

    def encode(params, images):
        fm = encoder.apply({"params": params["encoder"]}, _prep(images))
        seq = encode_postprocess(fm, enc_image_size)
        if proj is not None:
            seq = proj.apply({"params": params["proj"]}, seq)
        return seq

    if sample_prob <= 0.0:
        def loss_fn(params, images, tokens_in, tokens_out):
            seq = encode(params, images)
            logits = decoder.apply({"params": params["decoder"]}, seq,
                                   tokens_in)
            return caption_loss(logits, tokens_out, coord_sigma=coord_sigma)
        return _make_update(loss_fn, tx)

    def loss_fn(params, images, tokens_in, tokens_out, step_idx):
        seq = encode(params, images)
        dec = lambda toks: decoder.apply({"params": params["decoder"]},
                                         seq, toks)
        # Pass 1: model's own predictions under teacher forcing (no grad —
        # argmax is non-differentiable anyway).
        preds = jnp.argmax(jax.lax.stop_gradient(dec(tokens_in)),
                           axis=-1).astype(tokens_in.dtype)
        prev_pred = jnp.concatenate([tokens_in[:, :1], preds[:, :-1]], axis=1)
        # Reach full sample_prob after ss_ramp_frac of the run (a ramp over
        # the WHOLE run means most steps train at far below the nominal
        # rate — r11 at nominal 0.25 averaged ~0.12 effective).
        ramp = jnp.clip(step_idx / max(total_steps * ss_ramp_frac, 1.0),
                        0.0, 1.0)
        p = sample_prob * ramp
        key = jax.random.PRNGKey(0)
        key = jax.random.fold_in(key, step_idx.astype(jnp.int32))
        take = jax.random.bernoulli(key, p, tokens_in.shape)
        mixed = jnp.where(take & (tokens_in != PAD), prev_pred, tokens_in)
        return caption_loss(dec(mixed), tokens_out, coord_sigma=coord_sigma)

    return _make_update(loss_fn, tx)


def make_sharded_train_step(step_fn, mesh, donate: bool = True):
    """jit a train step over a mesh: params/opt_state keep their (already
    device_put) shardings; batch tensors arrive sharded on 'dp'. Leaving
    in_shardings unspecified lets jit infer from argument placement — the
    layouts are set once by parallel.shard_params / batch_sharding."""
    return jax.jit(step_fn, donate_argnums=(0, 1) if donate else ())
