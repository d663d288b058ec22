import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdnerf_tpu.models import (
    NeRFConfig,
    RenderConfig,
    SDFConfig,
    get_embedder,
    nerf_apply,
    nerf_init,
    render_net_apply,
    render_net_init,
    sdf_apply,
    sdf_init,
    sdf_value_grad_feat,
    variance_apply,
    variance_init,
)
from vdnerf_tpu.models.layers import init_linear, linear, softplus_beta


# ---------------------------------------------------------------------------
# embedder
# ---------------------------------------------------------------------------


def test_embedder_ordering_and_values(rng):
    x = rng.normal(size=(5, 3)).astype(np.float32)
    embed_fn, out_dim = get_embedder(multires=4, input_dims=3)
    y = np.asarray(embed_fn(jnp.asarray(x)))
    assert out_dim == 3 * (1 + 2 * 4)
    assert y.shape == (5, out_dim)
    np.testing.assert_allclose(y[:, :3], x, atol=1e-6)
    # block order: sin(f0 x), cos(f0 x), sin(f1 x), ...
    freqs = 2.0 ** np.linspace(0, 3, 4)
    for i, f in enumerate(freqs):
        s = 3 + i * 6
        np.testing.assert_allclose(y[:, s : s + 3], np.sin(x * f), atol=1e-5)
        np.testing.assert_allclose(y[:, s + 3 : s + 6], np.cos(x * f), atol=1e-5)


def test_embedder_multires_zero_identity(rng):
    x = rng.normal(size=(4, 3)).astype(np.float32)
    embed_fn, out_dim = get_embedder(0, 3)
    assert out_dim == 3
    np.testing.assert_array_equal(np.asarray(embed_fn(x)), x)


# ---------------------------------------------------------------------------
# layers: weight norm + softplus parity vs torch
# ---------------------------------------------------------------------------


def test_weight_norm_matches_torch(rng):
    torch = pytest.importorskip("torch")
    d_in, d_out, n = 7, 5, 11
    x = rng.normal(size=(n, d_in)).astype(np.float32)

    p = init_linear(jax.random.PRNGKey(0), d_in, d_out, weight_norm=True)
    lin = torch.nn.Linear(d_in, d_out)
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(np.asarray(p["v"]).T))
        lin.bias.copy_(torch.from_numpy(np.asarray(p["b"])))
    lin = torch.nn.utils.weight_norm(lin)
    # perturb g to exercise the reparameterization, same value both sides
    with torch.no_grad():
        lin.weight_g.mul_(1.7)
    p = dict(p, g=p["g"] * 1.7)

    ours = np.asarray(linear(p, jnp.asarray(x)))
    theirs = lin(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_softplus_beta_matches_torch(rng):
    torch = pytest.importorskip("torch")
    x = np.linspace(-1.0, 1.0, 101).astype(np.float32)
    ours = np.asarray(softplus_beta(jnp.asarray(x), beta=100.0))
    theirs = torch.nn.Softplus(beta=100)(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


# ---------------------------------------------------------------------------
# SDF network
# ---------------------------------------------------------------------------


def test_sdf_geometric_init_is_sphere():
    """At geometric init the SDF approximates ||x|| - bias (reference
    fields.py:45-63 initializes to the SDF of a radius-`bias` sphere)."""
    cfg = SDFConfig()
    params = sdf_init(jax.random.PRNGKey(0), cfg)
    pts = np.stack(
        np.meshgrid(*[np.linspace(-0.9, 0.9, 5)] * 3), axis=-1
    ).reshape(-1, 3).astype(np.float32)
    sdf = np.asarray(sdf_apply(cfg, params, jnp.asarray(pts)))[:, 0]
    expected = np.linalg.norm(pts, axis=-1) - cfg.bias
    # loose tolerance: softplus MLP only approximates the sphere
    assert np.abs(sdf - expected).mean() < 0.12


def test_sdf_output_shapes():
    cfg = SDFConfig()
    params = sdf_init(jax.random.PRNGKey(1), cfg)
    pts = jnp.ones((17, 3)) * 0.1
    out = sdf_apply(cfg, params, pts)
    assert out.shape == (17, 257)


def test_sdf_value_grad_feat_matches_autodiff():
    cfg = SDFConfig()
    params = sdf_init(jax.random.PRNGKey(2), cfg)
    pts = jax.random.normal(jax.random.PRNGKey(3), (9, 3)) * 0.5
    sdf, grad, feat = sdf_value_grad_feat(cfg, params, pts)
    assert sdf.shape == (9, 1) and grad.shape == (9, 3) and feat.shape == (9, 256)

    grad_ref = jax.vmap(
        jax.grad(lambda p: sdf_apply(cfg, params, p[None])[0, 0])
    )(pts)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(grad_ref), atol=1e-5)

    # geometric init => gradient is approximately the unit radial direction
    dirs = np.asarray(pts) / np.linalg.norm(np.asarray(pts), axis=-1, keepdims=True)
    cos = (np.asarray(grad) * dirs).sum(-1) / np.linalg.norm(np.asarray(grad), axis=-1)
    assert cos.mean() > 0.95 and cos.min() > 0.8


def test_sdf_second_order_differentiable():
    """The eikonal loss differentiates through the SDF gradient; make sure
    grad-of-grad composes (replaces torch's create_graph=True double
    backward, reference fields.py:97-108 + renderer.py:313-315)."""
    cfg = SDFConfig(n_layers=2, d_hidden=32, d_out=33, skip_in=())
    params = sdf_init(jax.random.PRNGKey(4), cfg)
    pts = jax.random.normal(jax.random.PRNGKey(5), (4, 3)) * 0.3

    def eikonal(p):
        _, grad, _ = sdf_value_grad_feat(cfg, p, pts)
        return jnp.mean((jnp.linalg.norm(grad, axis=-1) - 1.0) ** 2)

    g = jax.grad(eikonal)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)


def test_sdf_scale():
    cfg_scaled = SDFConfig(scale=2.0)
    params = sdf_init(jax.random.PRNGKey(6), cfg_scaled)
    pts = jnp.asarray([[0.2, 0.1, -0.1]])
    out = sdf_apply(cfg_scaled, params, pts)
    # same params evaluated manually: forward(x*scale), sdf / scale
    cfg_unscaled = SDFConfig(scale=1.0)
    out2 = sdf_apply(cfg_unscaled, params, pts * 2.0)
    np.testing.assert_allclose(
        np.asarray(out[:, 0]), np.asarray(out2[:, 0]) / 2.0, atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(out[:, 1:]), np.asarray(out2[:, 1:]), atol=1e-6)


# ---------------------------------------------------------------------------
# rendering network / NeRF / variance
# ---------------------------------------------------------------------------


def test_render_net_shapes_and_range():
    cfg = RenderConfig(d_out=3)
    params = render_net_init(jax.random.PRNGKey(0), cfg)
    n = 13
    k = jax.random.PRNGKey(1)
    pts, normals, dirs = (jax.random.normal(k, (n, 3)) for _ in range(3))
    feats = jax.random.normal(k, (n, 256))
    out = render_net_apply(cfg, params, pts, normals, dirs, feats)
    assert out.shape == (n, 3)
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) <= 1).all()


def test_render_net_depth_head():
    cfg = RenderConfig(d_out=96)
    params = render_net_init(jax.random.PRNGKey(0), cfg)
    n = 5
    k = jax.random.PRNGKey(1)
    out = render_net_apply(
        cfg, params,
        jax.random.normal(k, (n, 3)), jax.random.normal(k, (n, 3)),
        jax.random.normal(k, (n, 3)), jax.random.normal(k, (n, 256)),
    )
    assert out.shape == (n, 96)


def test_nerf_shapes():
    cfg = NeRFConfig(gen_depth_feats=True, dpt_dim=96)
    params = nerf_init(jax.random.PRNGKey(0), cfg)
    n = 7
    pts = jax.random.normal(jax.random.PRNGKey(1), (n, 4))
    dirs = jax.random.normal(jax.random.PRNGKey(2), (n, 3))
    alpha, rgb, feat = nerf_apply(cfg, params, pts, dirs)
    assert alpha.shape == (n, 1) and rgb.shape == (n, 3) and feat.shape == (n, 96)


def test_nerf_no_depth_head():
    cfg = NeRFConfig()
    params = nerf_init(jax.random.PRNGKey(0), cfg)
    alpha, rgb, feat = nerf_apply(
        cfg, params, jnp.ones((3, 4)), jnp.ones((3, 3))
    )
    assert feat is None


def test_variance():
    p = variance_init(0.3)
    np.testing.assert_allclose(
        float(variance_apply(p)), float(np.exp(3.0)), rtol=1e-6
    )
