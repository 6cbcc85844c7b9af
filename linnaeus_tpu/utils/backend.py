"""Backend-selection workaround shared by the CLI, tools, and driver entry.

The tunneled TPU plugin ('axon') ignores the ``JAX_PLATFORMS`` environment
variable, so ``JAX_PLATFORMS=cpu`` runs still initialize the TPU backend —
and hang at first device use when the tunnel is down (observed during a
backend outage). Mirroring the env var into jax.config restores the
documented semantics for every backend.
"""

from __future__ import annotations

import os


def honor_jax_platforms_env() -> str | None:
    """Mirror JAX_PLATFORMS into jax.config (no-op when unset). Returns the
    applied value. Never fatal — must be called before first backend use."""
    value = os.environ.get("JAX_PLATFORMS", "")
    if not value:
        return None
    import jax

    try:
        jax.config.update("jax_platforms", value)
    except Exception:
        return None
    return value
