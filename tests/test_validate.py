"""Regression tests for the chunked validation renderer.

Covers the eikonal-metric padding bug: ``ImageRenderer.render_rays`` pads the
last chunk to a static shape, and the per-image ``gradient_error`` must drop
the padded rays before accumulating (reference computes it over exactly the
image's rays, dpt_runner.py:447-456 + renderer.py:311-315).
"""

import jax
import jax.numpy as jnp
import numpy as np

from vdnerf_tpu.train.config import TrainConfig
from vdnerf_tpu.train.step import SceneStatic
from vdnerf_tpu.train.validate import ImageRenderer

from test_renderer import demo_rays, small_nets


def _make_renderer(chunk):
    nets, params = small_nets()
    tcfg = TrainConfig(batch_size=8, anneal_end=0, use_white_bkgd=True)
    scene = SceneStatic(H=8, W=8)
    return ImageRenderer(nets, tcfg, scene, chunk=chunk), params


def test_gradient_error_invariant_to_chunk_padding():
    # 20 rays: chunk=5 divides exactly (no padding), chunk=8 pads the last
    # chunk with 4 phantom rays, chunk=32 pads 12. The eikonal metric (and
    # every per-ray output) must be identical across all three.
    rays_o, rays_d, _, _ = demo_rays(20)
    rays_o = np.asarray(rays_o)
    rays_d = np.asarray(rays_d)

    outs = {}
    for chunk in (5, 8, 32):
        renderer, params = _make_renderer(chunk)
        outs[chunk] = renderer.render_rays(params, rays_o, rays_d, step=0)

    ref = outs[5]
    assert ref["gradient_error"] > 0.0
    for chunk in (8, 32):
        got = outs[chunk]
        np.testing.assert_allclose(
            got["gradient_error"], ref["gradient_error"], rtol=1e-5,
            err_msg=f"chunk={chunk} eikonal metric differs (padding leak)",
        )
        np.testing.assert_allclose(
            got["color"], ref["color"], rtol=1e-5, atol=1e-6
        )
        assert got["color"].shape == (20, 3)
