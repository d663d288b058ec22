"""Cross-implementation parity: our JAX renderer vs the reference PyTorch
implementation, imported as an oracle at test time.

The reference repo (read-only at /root/reference) runs on CPU torch for
small models as long as nothing calls .cuda(). We build reference networks,
transplant their exact weights into our parameter pytrees through the torch
converter, render the same rays through both stacks, and require fp32-level
agreement on every output. This validates the entire math chain: embedder,
weight-norm linears, geometric-init MLPs, hierarchical up-sampling,
inverse-CDF sampling, background NeRF blending, logistic-CDF compositing,
and the eikonal statistics.

Skipped automatically when the reference checkout is unavailable.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "dpt_models")),
    reason="reference checkout not available",
)

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_modules():
    import types

    # stub the reference's unavailable deps (mcubes, icecream) — unused by
    # the code paths under test
    for name, attrs in (
        ("mcubes", {"marching_cubes": lambda *a, **k: None}),
        ("icecream", {"ic": lambda *a, **k: a}),
    ):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[name] = mod

    sys.path.insert(0, REFERENCE)
    try:
        from dpt_models import fields as ref_fields  # noqa: PLC0415
        from dpt_models import renderer as ref_renderer  # noqa: PLC0415
    finally:
        sys.path.pop(0)
    return ref_fields, ref_renderer


SDF_KW = dict(d_in=3, d_out=65, d_hidden=64, n_layers=4, skip_in=[2],
              multires=6, bias=0.5, scale=1.0, geometric_init=True,
              weight_norm=True)
COLOR_KW = dict(d_feature=64, mode="idr", d_in=9, d_out=3, d_hidden=64,
                n_layers=2, weight_norm=True, multires_view=4,
                squeeze_out=True)
DEPTH_KW = dict(COLOR_KW, d_out=8)
NERF_KW = dict(D=2, W=64, d_in=4, d_in_view=3, multires=4, multires_view=2,
               skips=[4], use_viewdirs=True, gen_depth_feats=True, dpt_dim=8)


@pytest.fixture(scope="module")
def twin_setup(ref_modules):
    """Reference torch nets + our configs/params carrying identical weights."""
    ref_fields, ref_renderer = ref_modules
    torch.manual_seed(0)
    t_sdf = ref_fields.SDFNetwork(**SDF_KW)
    t_color = ref_fields.RenderingNetwork(**COLOR_KW)
    t_depth = ref_fields.RenderingNetwork(**DEPTH_KW)
    t_nerf = ref_fields.NeRF(**NERF_KW)
    t_var = ref_fields.SingleVarianceNetwork(0.3)

    from vdnerf_tpu.io.checkpoints import import_torch_checkpoint
    from vdnerf_tpu.models.fields import NeRFConfig, RenderConfig, SDFConfig
    from vdnerf_tpu.ops.renderer import NeuSNetworks, RendererConfig

    nets = NeuSNetworks(
        sdf=SDFConfig(**dict(SDF_KW, skip_in=(2,))),
        color=RenderConfig(**COLOR_KW),
        depth=RenderConfig(**DEPTH_KW),
        nerf=NeRFConfig(**{k: tuple(v) if isinstance(v, list) else v
                           for k, v in NERF_KW.items()}),
        renderer=RendererConfig(n_samples=16, n_importance=16, n_outside=8,
                                up_sample_steps=4, perturb=0.0),
    )
    ckpt = {
        "sdf_network_fine": t_sdf.state_dict(),
        "color_network_fine": t_color.state_dict(),
        "depth_network_fine": t_depth.state_dict(),
        "variance_network_fine": t_var.state_dict(),
        "nerf": t_nerf.state_dict(),
        "iter_step": 0,
    }
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".pth") as f:
        torch.save(ckpt, f.name)
        params, _ = import_torch_checkpoint(f.name, nets, extract_depth=True)

    t_renderer = ref_renderer.NeuSRenderer(
        t_nerf, t_sdf, t_var, t_color, t_depth,
        n_samples=16, n_importance=16, n_outside=8, up_sample_steps=4,
        perturb=0.0,
    )
    return nets, params, t_renderer, (t_sdf, t_color, t_nerf, t_var)


def rays(n=6):
    rng = np.random.default_rng(3)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = -3.0 * d
    from vdnerf_tpu.data.dataset import near_far_from_sphere
    import jax.numpy as jnp

    near, far = near_far_from_sphere(jnp.asarray(o), jnp.asarray(d))
    return (
        o.astype(np.float32), d.astype(np.float32),
        np.asarray(near), np.asarray(far),
    )


def test_sdf_network_parity(twin_setup):
    nets, params, _, (t_sdf, *_rest) = twin_setup
    from vdnerf_tpu.models.fields import sdf_apply
    import jax.numpy as jnp

    pts = np.random.default_rng(0).normal(size=(50, 3)).astype(np.float32) * 0.6
    ours = np.asarray(sdf_apply(nets.sdf, params["sdf"], jnp.asarray(pts)))
    theirs = t_sdf(torch.from_numpy(pts)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, atol=3e-5)


def test_sdf_gradient_parity(twin_setup):
    nets, params, _, (t_sdf, *_rest) = twin_setup
    from vdnerf_tpu.models.fields import sdf_value_grad_feat
    import jax.numpy as jnp

    pts = np.random.default_rng(1).normal(size=(20, 3)).astype(np.float32) * 0.5
    _, ours, _ = sdf_value_grad_feat(nets.sdf, params["sdf"], jnp.asarray(pts))
    theirs = t_sdf.gradient(torch.from_numpy(pts)).squeeze(1).detach().numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=3e-5)


def test_full_render_parity(twin_setup):
    """End-to-end render: every output within fp32 accumulation tolerance."""
    nets, params, t_renderer, _ = twin_setup
    import jax.numpy as jnp

    from vdnerf_tpu.ops.renderer import render

    o, d, near, far = rays(6)
    ours = render(
        nets, params, jnp.asarray(o), jnp.asarray(d),
        jnp.asarray(near), jnp.asarray(far),
        perturb_overwrite=0,
        background_rgb=jnp.ones((1, 3)),
        cos_anneal_ratio=0.37,
    )
    theirs = t_renderer.render(
        torch.from_numpy(o), torch.from_numpy(d),
        torch.from_numpy(near), torch.from_numpy(far),
        perturb_overwrite=0,
        background_rgb=torch.ones(1, 3),
        cos_anneal_ratio=0.37,
    )

    def cmp(name, a, b, atol):
        a = np.asarray(a)
        b = b.detach().numpy()
        np.testing.assert_allclose(a, b, atol=atol, err_msg=name)

    cmp("color_fine", ours["color_fine"], theirs["color_fine"], 2e-4)
    cmp("weight_sum", ours["weight_sum"], theirs["weight_sum"], 2e-4)
    cmp("weights", ours["weights"], theirs["weights"], 2e-4)
    cmp("z_vals", ours["z_vals"], theirs["z_vals"], 2e-4)
    cmp("cdf_fine", ours["cdf_fine"], theirs["cdf_fine"], 2e-4)
    cmp("s_val", ours["s_val"], theirs["s_val"], 1e-5)
    cmp("render_feats", ours["render_feats"], theirs["render_feats"], 2e-4)
    cmp(
        "gradient_error",
        ours["gradient_error"], theirs["gradient_error"], 1e-4,
    )
    cmp("inside_sphere", ours["inside_sphere"], theirs["inside_sphere"], 0)


# -- flagship-dimension parity ------------------------------------------------
#
# The shipped model is 8x256 SDF / 4x256 color / 8x256 bg NeRF with
# 64 + 64 (4x16 rounds) + 32 samples (confs/womsk_white.conf:47-89,
# renderer.py:332-439). fp32 accumulation error and the 80->96->112->128
# merge ordering behave differently at real depth/width than at the toy
# dims above, so parity is asserted here at the full size (small ray count,
# CPU).

FLAGSHIP_SDF_KW = dict(d_in=3, d_out=257, d_hidden=256, n_layers=8,
                       skip_in=[4], multires=6, bias=0.5, scale=1.0,
                       geometric_init=True, weight_norm=True)
FLAGSHIP_COLOR_KW = dict(d_feature=256, mode="idr", d_in=9, d_out=3,
                         d_hidden=256, n_layers=4, weight_norm=True,
                         multires_view=4, squeeze_out=True)
FLAGSHIP_NERF_KW = dict(D=8, W=256, d_in=4, d_in_view=3, multires=10,
                        multires_view=4, skips=[4], use_viewdirs=True)


@pytest.fixture(scope="module")
def flagship_twin(ref_modules):
    """Full womsk_white-dimension twins with transplanted weights."""
    ref_fields, ref_renderer = ref_modules
    torch.manual_seed(7)
    t_sdf = ref_fields.SDFNetwork(**FLAGSHIP_SDF_KW)
    t_color = ref_fields.RenderingNetwork(**FLAGSHIP_COLOR_KW)
    t_nerf = ref_fields.NeRF(**FLAGSHIP_NERF_KW)
    t_var = ref_fields.SingleVarianceNetwork(0.3)

    from vdnerf_tpu.io.checkpoints import import_torch_checkpoint
    from vdnerf_tpu.models.fields import NeRFConfig, RenderConfig, SDFConfig
    from vdnerf_tpu.ops.renderer import NeuSNetworks, RendererConfig

    nets = NeuSNetworks(
        sdf=SDFConfig(**dict(FLAGSHIP_SDF_KW, skip_in=(4,))),
        color=RenderConfig(**FLAGSHIP_COLOR_KW),
        nerf=NeRFConfig(**{k: tuple(v) if isinstance(v, list) else v
                           for k, v in FLAGSHIP_NERF_KW.items()}),
        renderer=RendererConfig(n_samples=64, n_importance=64, n_outside=32,
                                up_sample_steps=4, perturb=0.0),
    )
    ckpt = {
        "sdf_network_fine": t_sdf.state_dict(),
        "color_network_fine": t_color.state_dict(),
        "variance_network_fine": t_var.state_dict(),
        "nerf": t_nerf.state_dict(),
        "iter_step": 0,
    }
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".pth") as f:
        torch.save(ckpt, f.name)
        params, _ = import_torch_checkpoint(f.name, nets, extract_depth=False)

    t_renderer = ref_renderer.NeuSRenderer(
        t_nerf, t_sdf, t_var, t_color, None,
        n_samples=64, n_importance=64, n_outside=32, up_sample_steps=4,
        perturb=0.0,
    )
    return nets, params, t_renderer


def test_flagship_render_parity(flagship_twin):
    """Full 8x256 model, full 64+64+32 sampling ladder, bit-close render."""
    nets, params, t_renderer = flagship_twin
    import jax.numpy as jnp

    from vdnerf_tpu.ops.renderer import render

    o, d, near, far = rays(4)
    ours = render(
        nets, params, jnp.asarray(o), jnp.asarray(d),
        jnp.asarray(near), jnp.asarray(far),
        perturb_overwrite=0,
        background_rgb=jnp.ones((1, 3)),
        cos_anneal_ratio=0.61,
    )
    theirs = t_renderer.render(
        torch.from_numpy(o), torch.from_numpy(d),
        torch.from_numpy(near), torch.from_numpy(far),
        perturb_overwrite=0,
        background_rgb=torch.ones(1, 3),
        cos_anneal_ratio=0.61,
    )

    def cmp(name, a, b, atol):
        np.testing.assert_allclose(
            np.asarray(a), b.detach().numpy(), atol=atol, err_msg=name
        )

    # tolerances scaled for fp32 accumulation across 256-wide, 8-deep chains
    cmp("z_vals", ours["z_vals"], theirs["z_vals"], 5e-4)
    cmp("color_fine", ours["color_fine"], theirs["color_fine"], 1e-3)
    cmp("weight_sum", ours["weight_sum"], theirs["weight_sum"], 1e-3)
    cmp("weights", ours["weights"], theirs["weights"], 1e-3)
    cmp("cdf_fine", ours["cdf_fine"], theirs["cdf_fine"], 1e-3)
    cmp("s_val", ours["s_val"], theirs["s_val"], 1e-5)
    cmp("gradient_error", ours["gradient_error"], theirs["gradient_error"],
        5e-4)


def test_train_gradient_parity(twin_setup):
    """d(loss)/d(params) vs torch autograd on transplanted weights.

    The reference's actual training signal (dpt_runner.py:227-257): L1 color
    + eikonal (second-order through grad-sdf) + mask-BCE + distillation L1,
    differentiated through the whole render. The torch grads are mapped into
    our pytree layout through the same converter the weights use (the
    [out,in]->[in,out] transpose is linear, so it maps gradients too).
    """
    nets, params, t_renderer, (t_sdf, t_color, t_nerf, t_var) = twin_setup
    import jax
    import jax.numpy as jnp

    from vdnerf_tpu.ops.renderer import render

    o, d, near, far = rays(6)
    rng = np.random.default_rng(5)
    true_rgb = rng.uniform(0, 1, (6, 3)).astype(np.float32)
    gt_feats = rng.uniform(0, 1, (6, 8)).astype(np.float32)
    mask = np.array([[1.0], [1.0], [0.0], [1.0], [0.0], [1.0]], np.float32)
    igr_w, mask_w, depth_w = 0.1, 0.1, 0.5

    # ---- torch side
    for net in (t_sdf, t_color, t_nerf, t_var):
        net.zero_grad(set_to_none=True)
    t_depth_net = t_renderer.depth_network
    t_depth_net.zero_grad(set_to_none=True)
    t_out = t_renderer.render(
        torch.from_numpy(o), torch.from_numpy(d),
        torch.from_numpy(near), torch.from_numpy(far),
        perturb_overwrite=0, background_rgb=torch.ones(1, 3),
        cos_anneal_ratio=0.37,
    )
    t_mask = torch.from_numpy(mask)
    t_mask_sum = t_mask.sum() + 1e-5
    t_color_err = (t_out["color_fine"] - torch.from_numpy(true_rgb)) * t_mask
    t_color_loss = t_color_err.abs().sum() / t_mask_sum
    t_w = t_out["weight_sum"].clip(1e-3, 1.0 - 1e-3)
    t_bce = torch.nn.functional.binary_cross_entropy(t_w, t_mask)
    t_depth_err = (t_out["render_feats"] - torch.from_numpy(gt_feats)) * t_mask
    t_depth_loss = t_depth_err.abs().sum() / t_mask_sum
    t_loss = (
        t_color_loss
        + igr_w * t_out["gradient_error"]
        + mask_w * t_bce
        + depth_w * t_depth_loss
    )
    t_loss.backward()

    def grad_sd(net):
        return {
            k: (p.grad if p.grad is not None else torch.zeros_like(p))
            for k, p in net.named_parameters()
        }

    grad_ckpt = {
        "sdf_network_fine": grad_sd(t_sdf),
        "color_network_fine": grad_sd(t_color),
        "depth_network_fine": grad_sd(t_depth_net),
        "variance_network_fine": grad_sd(t_var),
        "nerf": grad_sd(t_nerf),
        "iter_step": 0,
    }
    import tempfile

    from vdnerf_tpu.io.checkpoints import import_torch_checkpoint

    with tempfile.NamedTemporaryFile(suffix=".pth") as f:
        torch.save(grad_ckpt, f.name)
        t_grads, _ = import_torch_checkpoint(f.name, nets, extract_depth=True)

    # ---- jax side
    def loss_fn(p):
        out = render(
            nets, p, jnp.asarray(o), jnp.asarray(d),
            jnp.asarray(near), jnp.asarray(far),
            perturb_overwrite=0, background_rgb=jnp.ones((1, 3)),
            cos_anneal_ratio=0.37,
        )
        m = jnp.asarray(mask)
        m_sum = m.sum() + 1e-5
        color_loss = jnp.abs(
            (out["color_fine"] - jnp.asarray(true_rgb)) * m
        ).sum() / m_sum
        w = jnp.clip(out["weight_sum"], 1e-3, 1.0 - 1e-3)
        bce = -(m * jnp.log(w) + (1.0 - m) * jnp.log(1.0 - w)).mean()
        depth_loss = jnp.abs(
            (out["render_feats"] - jnp.asarray(gt_feats)) * m
        ).sum() / m_sum
        return (
            color_loss
            + igr_w * out["gradient_error"]
            + mask_w * bce
            + depth_w * depth_loss
        )

    j_grads = jax.grad(loss_fn)(params)

    flat_t = jax.tree_util.tree_flatten_with_path(t_grads)[0]
    flat_j = dict(
        ("/".join(map(str, path)), leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(j_grads)[0]
    )
    assert len(flat_t) > 20
    checked = 0
    for path, t_leaf in flat_t:
        name = "/".join(map(str, path))
        j_leaf = flat_j[name]
        t_np = np.asarray(t_leaf)
        j_np = np.asarray(j_leaf)
        scale = max(np.abs(t_np).max(), 1e-3)
        np.testing.assert_allclose(
            j_np / scale, t_np / scale, atol=2e-4,
            err_msg=f"grad mismatch: {name}",
        )
        checked += 1
    assert checked == len(flat_t)
