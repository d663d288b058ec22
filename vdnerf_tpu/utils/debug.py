"""Developer observability: NaN guards and profiler hooks.

The reference has no sanitizers or tracing (SURVEY.md §5); this module adds
the TPU-idiomatic equivalents:

- :func:`enable_nan_debugging` — jax debug_nans/debug_infs for dev runs
  (VDNERF_DEBUG_NANS=1).
- :func:`check_finite` — explicit in-graph guard usable in production steps
  (adds a cheap reduction; raises on host sync via error token).
- :func:`profile_trace` — context manager around ``jax.profiler.trace``;
  point TensorBoard at the directory to see the XLA op timeline
  (VDNERF_PROFILE_DIR=/path enables it inside the runner train loop).
"""

from __future__ import annotations

import contextlib
import os

import jax
import jax.numpy as jnp


def enable_nan_debugging(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)
    jax.config.update("jax_debug_infs", enable)


if os.environ.get("VDNERF_DEBUG_NANS", "") in ("1", "true"):
    enable_nan_debugging(True)


def check_finite(tree, name: str = "tree"):
    """In-graph finite check; returns a bool scalar you can assert on host."""
    leaves = jax.tree_util.tree_leaves(tree)
    ok = jnp.asarray(True)
    for leaf in leaves:
        ok = jnp.logical_and(ok, jnp.all(jnp.isfinite(leaf)))
    return ok


@contextlib.contextmanager
def profile_trace(log_dir: str | None = None):
    log_dir = log_dir or os.environ.get("VDNERF_PROFILE_DIR")
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield
