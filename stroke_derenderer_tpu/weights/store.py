"""Parameter store: init, save, load.

The reference's "checkpoint" is a directory of opaque ONNX files downloaded
out-of-band (main.py:43-62, SURVEY.md §5). Here the model directory holds
flax param trees serialized with flax.serialization (msgpack) plus the same
two JSON config files the reference uses:

    <models>/binarizer.msgpack
    <models>/configs_binarizer.json
    <models>/strokes_encoder.msgpack
    <models>/strokes_decoder.msgpack
    <models>/strokes_projection.msgpack      (optional, like projection.onnx)
    <models>/configs_strokes.json

:func:`materialize_model_dir` writes a fresh randomly-initialized model
directory — no pretrained weights ship with this environment; training (see
stroke_derenderer_tpu.train) or the ONNX importer (weights/importer.py)
produce real ones.
"""

from __future__ import annotations

import json
from pathlib import Path

import flax.serialization
import jax
import jax.numpy as jnp

from stroke_derenderer_tpu.config import BinarizerConfig, StrokesConfig
from stroke_derenderer_tpu.models import AttentionUNet, AttentiveDecoder, ResNetEncoder


def _init_on_cpu(init_fn, *args):
    """Run a flax .init on the host CPU backend: random init is tiny
    compute, but compiling init graphs on a (possibly tunneled) TPU costs
    minutes per model. Params move to the accelerator lazily at first use.

    Must pick a LOCAL device: in a multi-process group jax.devices() leads
    with process 0's devices, and eagerly computing onto another process's
    (non-addressable) device crashes the runtime."""
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return init_fn(*args)
    with jax.default_device(cpu):
        return init_fn(*args)


def save_variables(variables, path: str | Path) -> None:
    Path(path).write_bytes(flax.serialization.to_bytes(variables))


def load_variables(template, path: str | Path):
    return flax.serialization.from_bytes(template, Path(path).read_bytes())


def build_binarizer_model(config: BinarizerConfig) -> AttentionUNet:
    return AttentionUNet(features=tuple(config.features),
                         bottleneck=config.bottleneck, norm=config.norm,
                         dtype=jnp.dtype(config.compute_dtype),
                         quant=config.quant)


def binarizer_template(config: BinarizerConfig):
    """Abstract variable tree (for from_bytes) without materializing params."""
    model = build_binarizer_model(config)
    dummy = jnp.zeros((1, config.height, config.width, config.channels), jnp.float32)
    return model, jax.eval_shape(model.init, jax.random.PRNGKey(0), dummy)


def init_binarizer_variables(config: BinarizerConfig, seed: int = 0):
    model = build_binarizer_model(config)
    rng = jax.random.PRNGKey(seed)
    dummy = jnp.zeros((1, config.height, config.width, config.channels), jnp.float32)
    return model, _init_on_cpu(model.init, rng, dummy)


def build_strokes_models(config: StrokesConfig):
    dtype = jnp.dtype(config.compute_dtype)
    encoder = ResNetEncoder(arch=config.encoder_arch, dtype=dtype,
                            norm=config.encoder_norm, quant=config.quant)
    enc_dim = (config.projection_dim or encoder.out_features)
    decoder = AttentiveDecoder(
        vocab_size=config.vocab_size, embed_dim=config.embed_dim,
        attention_dim=config.attention_dim, decoder_dim=config.decoder_dim,
        encoder_dim=enc_dim, dtype=dtype)
    return encoder, decoder


def init_strokes_variables(config: StrokesConfig, seed: int = 0):
    encoder, decoder = build_strokes_models(config)
    rng_e, rng_d, rng_p = jax.random.split(jax.random.PRNGKey(seed), 3)
    img = jnp.zeros((1, config.image_size, config.image_size, 3), jnp.float32)
    enc_vars = _init_on_cpu(encoder.init, rng_e, img)

    n_pos = config.encode_image_size ** 2
    enc_dim = config.projection_dim or encoder.out_features
    dec_vars = _init_on_cpu(
        decoder.init, rng_d, jnp.zeros((1, n_pos, enc_dim)),
        jnp.zeros((1, 4), jnp.int32))

    proj_vars = None
    if config.projection_dim:
        import flax.linen as nn
        proj = nn.Dense(config.projection_dim, dtype=jnp.dtype(config.compute_dtype))
        proj_vars = _init_on_cpu(
            proj.init, rng_p, jnp.zeros((1, n_pos, encoder.out_features)))
    return encoder, decoder, enc_vars, dec_vars, proj_vars


def materialize_model_dir(model_dir: str | Path,
                          bin_config: BinarizerConfig | None = None,
                          strokes_config: StrokesConfig | None = None,
                          seed: int = 0) -> None:
    """Write a complete randomly-initialized model directory."""
    import dataclasses

    bin_config = bin_config or BinarizerConfig()
    strokes_config = strokes_config or StrokesConfig()
    model_dir = Path(model_dir)
    model_dir.mkdir(parents=True, exist_ok=True)

    _, bin_vars = init_binarizer_variables(bin_config, seed)
    save_variables(bin_vars, model_dir / "binarizer.msgpack")
    with open(model_dir / "configs_binarizer.json", "w") as f:
        json.dump(bin_config.export_dict(), f, indent=1)

    _, _, enc_vars, dec_vars, proj_vars = init_strokes_variables(strokes_config, seed)
    save_variables(enc_vars, model_dir / "strokes_encoder.msgpack")
    save_variables(dec_vars, model_dir / "strokes_decoder.msgpack")
    if proj_vars is not None:
        save_variables(proj_vars, model_dir / "strokes_projection.msgpack")
    with open(model_dir / "configs_strokes.json", "w") as f:
        json.dump(strokes_config.export_dict(), f, indent=1)
