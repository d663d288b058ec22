"""Fused Pallas SDF-forward kernel vs the jnp reference (interpret mode on
the CPU mesh; the compiled path is exercised on real hardware by bench/CLI)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdnerf_tpu.models.fields import SDFConfig, sdf_init, sdf_value
from vdnerf_tpu.ops.pallas.sdf_fwd import sdf_value_pallas


@pytest.mark.parametrize(
    "cfg",
    [
        SDFConfig(d_hidden=64, n_layers=4, d_out=65, skip_in=(2,)),
        SDFConfig(d_hidden=32, n_layers=2, d_out=33, skip_in=()),
        SDFConfig(d_hidden=64, n_layers=4, d_out=65, skip_in=(2,), scale=2.0),
    ],
)
def test_pallas_matches_jnp(cfg):
    params = sdf_init(jax.random.PRNGKey(0), cfg)
    pts = jax.random.normal(jax.random.PRNGKey(1), (300, 3)) * 0.7
    ref = np.asarray(sdf_value(cfg, params, pts))
    out = np.asarray(
        sdf_value_pallas(cfg, params, pts, tile=128, interpret=True)
    )
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_pallas_pads_ragged_batch():
    cfg = SDFConfig(d_hidden=32, n_layers=2, d_out=33, skip_in=())
    params = sdf_init(jax.random.PRNGKey(0), cfg)
    pts = jax.random.normal(jax.random.PRNGKey(1), (77, 3)) * 0.5
    out = np.asarray(
        sdf_value_pallas(cfg, params, pts, tile=64, interpret=True)
    )
    assert out.shape == (77, 1)
    ref = np.asarray(sdf_value(cfg, params, pts))
    np.testing.assert_allclose(out, ref, atol=1e-5)
