"""Backend selection hardening.

The axon TPU plugin can re-register itself as the default platform during
``import jax``, silently overriding ``JAX_PLATFORMS=cpu`` from the
environment. When the plugin's tunnel is wedged, the first device probe
then hangs forever instead of failing over to the requested backend.
Applying the env request through ``jax.config`` BEFORE any device probe
restores the documented env-var semantics (a no-op when the env and the
plugin already agree).
"""

from __future__ import annotations

import os


def honor_platform_env() -> None:
    """Make the JAX_PLATFORMS env var authoritative over plugin hijack.

    Call at entrypoint start, before anything touches ``jax.devices()``.
    """
    plats = os.environ.get("JAX_PLATFORMS", "")
    if plats:
        import jax

        jax.config.update("jax_platforms", plats)


def enable_compile_cache(cache_dir: str | None = None) -> None:
    """Persistent XLA compilation cache for the CLI/serve/eval/bench
    entrypoints. The tunneled rig's remote compile service is slow AND
    variable (the same UNet program measured 87 s and 305 s on the same
    day); caching makes every entrypoint's second run skip it entirely.
    Default location is the user cache dir, not the repo. Failures are
    ignored: a read-only filesystem must never break inference."""
    try:
        import jax

        cache_dir = cache_dir or os.environ.get(
            "SD_TPU_COMPILE_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache",
                         "stroke_derenderer_tpu", "xla"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
