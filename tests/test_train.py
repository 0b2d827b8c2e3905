"""Training: losses decrease, steps are jittable, checkpoint round-trips."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from stroke_derenderer_tpu.config import BinarizerConfig, StrokesConfig
from stroke_derenderer_tpu.models import AttentionUNet
from stroke_derenderer_tpu.train import (
    binarize_loss, caption_loss, make_binarizer_train_step,
    make_captioner_train_step,
)
from stroke_derenderer_tpu.weights.store import (
    build_strokes_models, init_strokes_variables,
)


def test_binarize_loss_basics():
    probs = jnp.full((2, 8, 8, 1), 0.5)
    target = jnp.zeros((2, 8, 8, 1))
    perfect = binarize_loss(target + 1e-6, target)
    mediocre = binarize_loss(probs, target)
    assert float(perfect) < float(mediocre)


def test_caption_loss_masks_pad():
    logits = jnp.zeros((1, 3, 5))
    t_all_pad = jnp.zeros((1, 3), jnp.int32)
    assert float(caption_loss(logits, t_all_pad)) == 0.0
    t = jnp.array([[1, 2, 0]], jnp.int32)
    assert float(caption_loss(logits, t)) > 0.0


def test_binarizer_training_reduces_loss():
    model = AttentionUNet(features=(8,), bottleneck=16, dtype=jnp.float32)
    x = jax.random.uniform(jax.random.PRNGKey(0), (4, 16, 32, 3))
    y = (x[..., :1] > 0.5).astype(jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), x)
    params = variables["params"]
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)
    step = jax.jit(make_binarizer_train_step(model, tx))

    losses = []
    for _ in range(20):
        params, opt_state, loss = step(params, opt_state, x, y)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9


def test_captioner_training_reduces_loss():
    cfg = StrokesConfig(encoder_arch="tiny", embed_dim=8, attention_dim=8,
                        decoder_dim=8, image_size=56, encode_image_size=4,
                        compute_dtype="float32")
    encoder, decoder, enc_vars, dec_vars, _ = init_strokes_variables(cfg, 0)
    params = {"encoder": enc_vars["params"], "decoder": dec_vars["params"]}
    imgs = jax.random.uniform(jax.random.PRNGKey(2), (2, 56, 56, 3))
    tok_in = jnp.array([[1, 5, 9, 4], [1, 7, 3, 8]], jnp.int32)
    tok_out = jnp.array([[5, 9, 4, 2], [7, 3, 8, 2]], jnp.int32)
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)
    step = jax.jit(make_captioner_train_step(
        encoder, decoder, tx, enc_image_size=cfg.encode_image_size))

    losses = []
    for _ in range(15):
        params, opt_state, loss = step(params, opt_state, imgs, tok_in, tok_out)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_trained_params_roundtrip_through_store(tmp_path):
    from stroke_derenderer_tpu.weights import save_variables, load_variables

    model = AttentionUNet(features=(8,), bottleneck=16, dtype=jnp.float32)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 32, 3)))
    save_variables(v, tmp_path / "m.msgpack")
    v2 = load_variables(jax.eval_shape(lambda: v), tmp_path / "m.msgpack")
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 32, 3))
    np.testing.assert_array_equal(
        np.asarray(model.apply(v, x)), np.asarray(model.apply(v2, x)))
