"""Honor the JAX_PLATFORMS env var explicitly.

This environment exports ``JAX_PLATFORMS=axon`` (the TPU tunnel) ambiently.
Once a platform plugin registers, JAX ignores a later env-var-only override,
so ``JAX_PLATFORMS=cpu python <entry>`` would silently run on the TPU unless
the entry point also pushes the value into the config (the same force-
override tests/conftest.py applies). Every process entry point (the CLI and
each tools/ script) calls :func:`apply_jax_platforms_env` before its first
device touch.
"""

from __future__ import annotations

import os


def apply_jax_platforms_env() -> None:
    """Push ``$JAX_PLATFORMS`` into ``jax.config`` if the var is set.

    Safe to call multiple times and after backend initialization (an
    in-process caller that already set the platform up keeps it: the
    update raises once the backend is live, which we swallow).
    """
    if not os.environ.get("JAX_PLATFORMS"):
        return
    import jax

    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:  # noqa: BLE001 - backend already initialized
        pass
