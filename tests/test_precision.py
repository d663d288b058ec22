"""Mixed-precision policy: bf16 activations must keep the training math
finite and close to fp32."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdnerf_tpu.models.precision import enable_bf16, get_matmul_dtype


@pytest.fixture
def bf16_policy():
    enable_bf16(True)
    yield
    enable_bf16(False)


def test_policy_toggle():
    assert get_matmul_dtype() is None
    enable_bf16(True)
    assert get_matmul_dtype() == jnp.bfloat16
    enable_bf16(False)
    assert get_matmul_dtype() is None


def test_render_close_to_fp32(bf16_policy):
    from tests.test_renderer import demo_rays, small_nets
    from vdnerf_tpu.ops import render

    nets, params = small_nets()
    rays_o, rays_d, near, far = demo_rays(4)

    out_bf16 = render(nets, params, rays_o, rays_d, near, far,
                      perturb_overwrite=0)
    enable_bf16(False)
    out_fp32 = render(nets, params, rays_o, rays_d, near, far,
                      perturb_overwrite=0)
    c16 = np.asarray(out_bf16["color_fine"])
    c32 = np.asarray(out_fp32["color_fine"])
    assert np.isfinite(c16).all()
    # bf16 activations: colors agree to a few percent
    assert np.abs(c16 - c32).max() < 0.05
    # the sdf channel and weights stay fp32
    assert out_bf16["weights"].dtype == jnp.float32


def test_grad_finite_under_bf16(bf16_policy):
    from tests.test_renderer import demo_rays, small_nets
    from vdnerf_tpu.ops import render

    nets, params = small_nets()
    rays_o, rays_d, near, far = demo_rays(4)

    def loss(p):
        out = render(nets, p, rays_o, rays_d, near, far, perturb_overwrite=0)
        return jnp.mean(jnp.abs(out["color_fine"])) + 0.1 * out["gradient_error"]

    g = jax.grad(loss)(params)
    assert all(
        np.isfinite(np.asarray(l)).all()
        for l in jax.tree_util.tree_leaves(g)
    )
