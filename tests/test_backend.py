"""Backend-selection hardening (utils/backend.py): the JAX_PLATFORMS env
var must be authoritative even when a PJRT plugin re-registers itself as
the default platform during import (the axon plugin does; with a wedged
tunnel the first device probe then hangs instead of failing over)."""

import os

import jax

from stroke_derenderer_tpu.utils import honor_platform_env


def test_honor_platform_env_applies_env(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    honor_platform_env()
    assert jax.config.jax_platforms == "cpu"
    assert jax.devices()[0].platform == "cpu"


def test_honor_platform_env_noop_when_unset(monkeypatch):
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    before = jax.config.jax_platforms
    honor_platform_env()
    assert jax.config.jax_platforms == before
