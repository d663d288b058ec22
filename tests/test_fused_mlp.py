"""Fused Pallas MLP kernels (ops/pallas/fused_mlp.py) vs the jnp path.

Interpret mode on CPU. Strategy: with the kernels' matmul dtype forced to
f32, forward AND all gradients (params, every tensor input) must match the
f32 jnp path to fp32 tolerance — this pins the math (concat order, skip
unstitching, embedding VJP, relu/sigmoid backprop, cross-tile dW
accumulation, padded-row masking). The production bf16 mode is then checked
against the f32 reference at the same looseness the shipped bf16 jnp path
exhibits (~0.17 rel-to-max — measured side by side).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np
import pytest

from vdnerf_tpu.models import precision
from vdnerf_tpu.models.fields import (
    NeRFConfig,
    RenderConfig,
    nerf_apply,
    nerf_init,
    render_net_apply,
    render_net_init,
)
from vdnerf_tpu.ops.pallas import fused_mlp


@pytest.fixture
def f32_kernel(monkeypatch):
    """Force the kernels' matmul compute to f32 for exact-parity checks."""
    monkeypatch.setattr(fused_mlp, "_BF16", jnp.float32)
    yield


@pytest.fixture(autouse=True)
def reset_policy():
    yield
    precision.set_fused_mlp(False)
    precision.enable_bf16(False)


def rel_max(a, b) -> float:
    leaves = jtu.tree_leaves(
        jax.tree.map(
            lambda x, y: float(
                jnp.abs(x - y).max() / (jnp.abs(y).max() + 1e-8)
            ),
            a, b,
        )
    )
    return max(leaves) if leaves else 0.0


def _render_inputs(n, d_feature):
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    pts = jax.random.normal(ks[0], (n, 3))
    nrm = jax.random.normal(ks[1], (n, 3))
    dirs = jax.random.normal(ks[2], (n, 3))
    feat = jax.random.normal(ks[3], (n, d_feature)) * 0.5
    return pts, nrm, dirs, feat


@pytest.mark.parametrize("mode", ["idr", "no_view_dir", "no_normal"])
def test_render_net_fused_fwd_and_grads_f32(f32_kernel, mode):
    # mode-consistent dims as the reference confs set them: no_view_dir
    # drops the embedded view dirs (d_in=6, no view embedding), no_normal
    # drops the normals (d_in=6)
    kw = {"idr": dict(d_in=9, multires_view=4),
          "no_view_dir": dict(d_in=6, multires_view=0),
          "no_normal": dict(d_in=6, multires_view=4)}[mode]
    cfg = RenderConfig(mode=mode, d_hidden=64, n_layers=3, d_feature=32, **kw)
    params = render_net_init(jax.random.PRNGKey(0), cfg)
    pts, nrm, dirs, feat = _render_inputs(37, cfg.d_feature)  # pad path

    def loss(fused, params, pts, nrm, dirs, feat):
        precision.set_fused_mlp(fused)
        out = render_net_apply(cfg, params, pts, nrm, dirs, feat)
        return jnp.sum(jnp.sin(out * 3.0)), out

    (_, out_f), g_f = jax.value_and_grad(
        lambda *a: loss(True, *a), argnums=(0, 1, 2, 3, 4), has_aux=True
    )(params, pts, nrm, dirs, feat)
    (_, out_r), g_r = jax.value_and_grad(
        lambda *a: loss(False, *a), argnums=(0, 1, 2, 3, 4), has_aux=True
    )(params, pts, nrm, dirs, feat)

    np.testing.assert_allclose(out_f, out_r, atol=1e-6)
    assert rel_max(g_f, g_r) < 1e-5


@pytest.mark.parametrize("gen_depth_feats", [False, True])
def test_nerf_fused_fwd_and_grads_f32(f32_kernel, gen_depth_feats):
    cfg = NeRFConfig(
        D=4, W=64, skips=(2,), gen_depth_feats=gen_depth_feats, dpt_dim=24
    )
    params = nerf_init(jax.random.PRNGKey(1), cfg)
    n = 53
    pts4 = jax.random.normal(jax.random.PRNGKey(7), (n, 4))
    views = jax.random.normal(jax.random.PRNGKey(8), (n, 3))

    def loss(fused, params, pts4, views):
        precision.set_fused_mlp(fused)
        alpha, rgb, dpt = nerf_apply(cfg, params, pts4, views)
        total = jnp.sum(jnp.tanh(alpha)) + jnp.sum(rgb * rgb)
        if dpt is not None:
            total = total + jnp.sum(jnp.abs(dpt))
        return total, (alpha, rgb, dpt)

    (_, out_f), g_f = jax.value_and_grad(
        lambda *a: loss(True, *a), argnums=(0, 1, 2), has_aux=True
    )(params, pts4, views)
    (_, out_r), g_r = jax.value_and_grad(
        lambda *a: loss(False, *a), argnums=(0, 1, 2), has_aux=True
    )(params, pts4, views)

    for f, r in zip(jtu.tree_leaves(out_f), jtu.tree_leaves(out_r)):
        np.testing.assert_allclose(f, r, atol=1e-5)
    assert rel_max(g_f, g_r) < 1e-5


def test_bf16_kernel_matches_f32_reference_within_bf16_envelope():
    """Production mode (bf16 MXU inputs): same tolerance class as the
    shipped bf16 jnp path (grad rel-to-max ~0.17 measured)."""
    cfg = RenderConfig()
    params = render_net_init(jax.random.PRNGKey(0), cfg)
    pts, nrm, dirs, feat = _render_inputs(64, cfg.d_feature)

    def loss(fused, bf16, params):
        precision.set_fused_mlp(fused)
        precision.enable_bf16(bf16)
        out = render_net_apply(cfg, params, pts, nrm, dirs, feat)
        return jnp.sum(jnp.sin(out * 3.0)), out

    (_, o_fused), g_fused = jax.value_and_grad(
        lambda p: loss(True, False, p), has_aux=True
    )(params)
    (_, o_f32), g_f32 = jax.value_and_grad(
        lambda p: loss(False, False, p), has_aux=True
    )(params)
    (_, o_jnp16), g_jnp16 = jax.value_and_grad(
        lambda p: loss(False, True, p), has_aux=True
    )(params)

    # forward: bf16-rounding-level agreement with the f32 truth
    assert float(jnp.abs(o_fused - o_f32).max()) < 5e-3
    # gradient noise no worse than ~2x the shipped bf16 jnp path's noise
    noise_fused = rel_max(g_fused, g_f32)
    noise_jnp = rel_max(g_jnp16, g_f32)
    assert noise_fused < max(2.0 * noise_jnp, 0.05)


def test_full_render_parity_with_fused_kernels(f32_kernel):
    """End-to-end: render() with fused kernels == render() without, f32."""
    from vdnerf_tpu.models.fields import SDFConfig
    from vdnerf_tpu.ops.renderer import (
        NeuSNetworks,
        RendererConfig,
        render,
    )
    from vdnerf_tpu.train import init_params

    nets = NeuSNetworks(
        sdf=SDFConfig(d_hidden=64, n_layers=4, d_out=65),
        color=RenderConfig(d_hidden=64, n_layers=2, d_feature=64),
        nerf=NeRFConfig(D=3, W=64, skips=(1,)),
        renderer=RendererConfig(n_samples=16, n_importance=16, n_outside=8,
                                up_sample_steps=2),
    )
    params = init_params(jax.random.PRNGKey(0), nets, 0.3)
    n = 9
    rays_o = jnp.asarray(
        np.random.default_rng(0).normal(size=(n, 3)), jnp.float32
    ) * 0.1 + jnp.asarray([0.0, 0.0, -2.0])
    rays_d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    near, far = jnp.full((n, 1), 1.0), jnp.full((n, 1), 3.0)

    def go(fused):
        precision.set_fused_mlp(fused)
        return render(
            nets, params, rays_o, rays_d, near, far,
            perturb_overwrite=0, background_rgb=jnp.ones((1, 3)),
            cos_anneal_ratio=1.0,
        )

    out_f, out_r = go(True), go(False)
    np.testing.assert_allclose(
        out_f["color_fine"], out_r["color_fine"], atol=2e-5
    )
    np.testing.assert_allclose(
        out_f["weight_sum"], out_r["weight_sum"], atol=2e-5
    )


def test_fused_grads_flow_through_weight_norm(f32_kernel):
    """d(loss)/d(v,g) must chain through the effective-weight computation."""
    cfg = RenderConfig(d_hidden=32, n_layers=2, d_feature=16, weight_norm=True)
    params = render_net_init(jax.random.PRNGKey(2), cfg)
    assert "v" in params["layers"][0]  # weight-normalized
    pts, nrm, dirs, feat = _render_inputs(8, cfg.d_feature)

    def loss(fused, params):
        precision.set_fused_mlp(fused)
        return jnp.sum(render_net_apply(cfg, params, pts, nrm, dirs, feat))

    g_f = jax.grad(lambda p: loss(True, p))(params)
    g_r = jax.grad(lambda p: loss(False, p))(params)
    assert rel_max(g_f, g_r) < 1e-5
    # nonzero v and g grads
    assert float(jnp.abs(g_f["layers"][0]["v"]).max()) > 0
    assert float(jnp.abs(g_f["layers"][0]["g"]).max()) > 0
