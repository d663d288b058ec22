import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdnerf_tpu.data.dataset import near_far_from_sphere
from vdnerf_tpu.models import (
    NeRFConfig,
    RenderConfig,
    SDFConfig,
    nerf_init,
    render_net_init,
    sdf_init,
    variance_init,
)
from vdnerf_tpu.ops import NeuSNetworks, RendererConfig, render


def small_nets(with_depth=False, n_outside=32):
    """Small-but-structured network bundle for fast CPU tests."""
    sdf = SDFConfig(d_hidden=64, n_layers=4, d_out=65, skip_in=(2,), multires=6)
    color = RenderConfig(d_feature=64, d_hidden=64, n_layers=2, d_out=3)
    nerf = NeRFConfig(
        D=2, W=64, multires=4, multires_view=2,
        gen_depth_feats=with_depth, dpt_dim=8,
    )
    depth = (
        RenderConfig(d_feature=64, d_hidden=64, n_layers=2, d_out=8)
        if with_depth
        else None
    )
    rcfg = RendererConfig(
        n_samples=16, n_importance=16, n_outside=n_outside,
        up_sample_steps=4, perturb=1.0,
    )
    nets = NeuSNetworks(sdf=sdf, color=color, nerf=nerf, renderer=rcfg, depth=depth)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    params = {
        "sdf": sdf_init(ks[0], sdf),
        "color": render_net_init(ks[1], color),
        "nerf": nerf_init(ks[2], nerf),
        "variance": variance_init(0.3),
    }
    if with_depth:
        params["depth"] = render_net_init(ks[3], depth)
    return nets, params


def demo_rays(n=8):
    key = jax.random.PRNGKey(42)
    # cameras on a radius-3 shell looking at the origin
    dirs = jax.random.normal(key, (n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    rays_o = -3.0 * dirs
    rays_d = dirs
    near, far = near_far_from_sphere(rays_o, rays_d)
    return rays_o, rays_d, near, far


def test_render_shapes_and_invariants():
    nets, params = small_nets()
    rays_o, rays_d, near, far = demo_rays(8)
    out = render(
        nets, params, rays_o, rays_d, near, far,
        key=jax.random.PRNGKey(1), background_rgb=jnp.ones((1, 3)),
        cos_anneal_ratio=0.5,
    )
    n_total = 32  # n_samples + n_importance
    assert out["color_fine"].shape == (8, 3)
    assert out["weights"].shape == (8, n_total + nets.renderer.n_outside)
    assert out["gradients"].shape == (8, n_total, 3)
    assert out["cdf_fine"].shape == (8, n_total)
    assert out["inside_sphere"].shape == (8, n_total)
    w = np.asarray(out["weights"])
    assert (w >= 0).all()
    assert (w.sum(-1) <= 1.0 + 1e-4).all()
    assert np.isfinite(np.asarray(out["gradient_error"]))
    assert np.isfinite(np.asarray(out["color_fine"])).all()
    assert out["render_feats"] is None


def test_render_deterministic_without_perturb():
    nets, params = small_nets()
    rays_o, rays_d, near, far = demo_rays(4)
    out1 = render(nets, params, rays_o, rays_d, near, far, perturb_overwrite=0)
    out2 = render(nets, params, rays_o, rays_d, near, far, perturb_overwrite=0)
    np.testing.assert_array_equal(
        np.asarray(out1["color_fine"]), np.asarray(out2["color_fine"])
    )


def test_render_with_depth_head():
    nets, params = small_nets(with_depth=True)
    rays_o, rays_d, near, far = demo_rays(4)
    out = render(
        nets, params, rays_o, rays_d, near, far, key=jax.random.PRNGKey(0)
    )
    assert out["render_feats"].shape == (4, 8)
    assert np.isfinite(np.asarray(out["render_feats"])).all()


def test_render_no_background():
    nets, params = small_nets(n_outside=0)
    rays_o, rays_d, near, far = demo_rays(4)
    out = render(
        nets, params, rays_o, rays_d, near, far, key=jax.random.PRNGKey(0)
    )
    assert out["weights"].shape == (4, 32)
    assert np.isfinite(np.asarray(out["color_fine"])).all()


def test_render_weights_concentrate_on_surface():
    """Geometric init = sphere of radius 0.5: rays from outside should put
    their mass near depth (3 - 0.5) along center-pointing rays."""
    nets, params = small_nets()
    rays_o = jnp.asarray([[0.0, 0.0, -3.0]])
    rays_d = jnp.asarray([[0.0, 0.0, 1.0]])
    near, far = near_far_from_sphere(rays_o, rays_d)
    out = render(nets, params, rays_o, rays_d, near, far, perturb_overwrite=0)
    w = np.asarray(out["weights"])[0, :32]
    z = np.asarray(out["z_vals"])[0]
    exp_depth = (w[: len(z)] * z[: len(w)]).sum() / max(w.sum(), 1e-9)
    assert abs(exp_depth - 2.5) < 0.3


def test_render_is_jittable_and_differentiable():
    nets, params = small_nets()
    rays_o, rays_d, near, far = demo_rays(4)

    @jax.jit
    def loss(p, key):
        out = render(
            nets, p, rays_o, rays_d, near, far, key=key,
            background_rgb=jnp.ones((1, 3)), cos_anneal_ratio=0.3,
        )
        return (
            jnp.mean(jnp.abs(out["color_fine"] - 0.5))
            + out["gradient_error"] * 0.1
        )

    g = jax.grad(loss)(params, jax.random.PRNGKey(0))
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # all networks receive gradient signal
    for net in ("sdf", "color", "variance"):
        sub = jax.tree_util.tree_leaves(g[net])
        assert any(np.abs(np.asarray(l)).max() > 0 for l in sub), net
