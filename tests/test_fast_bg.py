"""skip_bg_inside fast path (RendererConfig): semantics and exactness.

The fast path evaluates the background NeRF only at the outside block plus
one sample. For rays whose non-tail inside samples all lie within the unit
sphere (every non-grazing ray that hits the sphere), the composite must be
BIT-EQUAL to the faithful path; for grazing/missing rays it is a documented
approximation (alpha=0 where the faithful path had near-zero blend weight).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_renderer import small_nets
from vdnerf_tpu.data.dataset import near_far_from_sphere
from vdnerf_tpu.ops.renderer import render


@pytest.fixture(scope="module")
def outputs():
    nets, params = small_nets(n_outside=8)
    n = 48
    rng = np.random.default_rng(0)
    o = np.tile([[0.0, 0.0, -2.5]], (n, 1)).astype(np.float32)
    targets = rng.normal(size=(n, 3)) * np.array([0.45, 0.45, 0.05])
    d = targets - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d, jnp.float32)
    near, far = near_far_from_sphere(o, d)

    def go(fast):
        nets_x = dataclasses.replace(
            nets,
            renderer=dataclasses.replace(nets.renderer, skip_bg_inside=fast),
        )
        return render(
            nets_x, params, o, d, near, far, perturb_overwrite=0,
            background_rgb=jnp.ones((1, 3)), cos_anneal_ratio=1.0,
        )

    return go(False), go(True)


def test_exact_for_rays_inside_sphere(outputs):
    ref, fast = outputs
    inside = np.asarray(ref["inside_sphere"])[:, :-1]  # tail sample covered
    exact = inside.all(axis=1)
    assert exact.sum() >= 5  # the scene produces both ray classes
    for k in ("color_fine", "weight_sum", "gradient_error_num"):
        a, b = np.asarray(ref[k]), np.asarray(fast[k])
        np.testing.assert_allclose(a[exact], b[exact], atol=1e-6)


def test_approximation_bounded_elsewhere(outputs):
    ref, fast = outputs
    a, b = np.asarray(ref["color_fine"]), np.asarray(fast["color_fine"])
    # random-init bg density leaks at most modest alpha through the skipped
    # block; trained bg density there decays toward zero (empty space)
    assert np.abs(a - b).max() < 0.2
    np.testing.assert_allclose(
        np.asarray(ref["weight_sum"]), np.asarray(fast["weight_sum"]),
        atol=1e-4,
    )


def test_conf_exposes_skip_bg_inside():
    """The fast path is reachable from the HOCON surface
    (model.neus_renderer.skip_bg_inside), not only the library API."""
    from vdnerf_tpu.train.builder import build_networks
    from vdnerf_tpu.utils.hocon import parse_string

    conf = parse_string(
        """
        model {
            sdf_network { d_hidden = 32, n_layers = 2 }
            variance_network { init_val = 0.3 }
            rendering_network { d_feature = 32, d_hidden = 32, n_layers = 2 }
            nerf { D = 2, W = 32 }
            neus_renderer {
                n_samples = 8
                n_importance = 4
                n_outside = 4
                up_sample_steps = 1
                perturb = 1.0
                skip_bg_inside = True
            }
        }
        """
    )
    nets = build_networks(conf, extract_depth=False)
    assert nets.renderer.skip_bg_inside is True


def test_sdf_quantities_unchanged(outputs):
    """The fast path only touches the bg NeRF; SDF-side outputs are equal."""
    ref, fast = outputs
    for k in ("s_val", "gradient_error", "cdf_fine"):
        np.testing.assert_allclose(
            np.asarray(ref[k]), np.asarray(fast[k]), atol=1e-6
        )
