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
