"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the standard JAX idiom for testing pjit/shard_map code without TPU
hardware; the real-chip path is exercised by bench.py and the driver.
Must run before jax is imported anywhere.
"""

import os

# Force-set: the ambient environment exports JAX_PLATFORMS=axon (the TPU
# tunnel), which must be overridden, not defaulted, for CPU-mesh tests.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
