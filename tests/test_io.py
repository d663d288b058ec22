import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdnerf_tpu.io import (
    checkpoint_path,
    import_torch_checkpoint,
    iter_from_name,
    latest_checkpoint,
    restore_state,
    save_state,
)
from vdnerf_tpu.models.fields import (
    NeRFConfig,
    RenderConfig,
    SDFConfig,
    sdf_apply,
)
from vdnerf_tpu.ops.renderer import NeuSNetworks, RendererConfig
from vdnerf_tpu.train import TrainConfig, init_params, init_state


def small_nets():
    return NeuSNetworks(
        sdf=SDFConfig(d_hidden=32, n_layers=2, d_out=33, skip_in=()),
        color=RenderConfig(d_feature=32, d_hidden=32, n_layers=2),
        nerf=NeRFConfig(D=2, W=32, multires=2, multires_view=2),
        renderer=RendererConfig(n_samples=8, n_importance=8, n_outside=4,
                                up_sample_steps=2),
    )


def test_state_roundtrip(tmp_path):
    nets = small_nets()
    tcfg = TrainConfig()
    params = init_params(jax.random.PRNGKey(0), nets, 0.3)
    cams = {"pose_all": jnp.eye(4)[None], "intrin_inv_all": jnp.eye(4)[None]}
    state = init_state(params, tcfg, cams, jax.random.PRNGKey(1))
    # mutate so restore provably overwrites
    state["step"] = jnp.asarray(17, jnp.int32)

    p = checkpoint_path(str(tmp_path), 17)
    save_state(p, state)
    assert os.path.exists(p)

    template = init_state(
        init_params(jax.random.PRNGKey(9), nets, 0.3), tcfg, cams,
        jax.random.PRNGKey(2),
    )
    restored = restore_state(p, template)
    assert int(restored["step"]) == 17
    for a, b in zip(
        jax.tree_util.tree_leaves(state["params"]),
        jax.tree_util.tree_leaves(restored["params"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latest_checkpoint_discovery(tmp_path):
    nets = small_nets()
    params = init_params(jax.random.PRNGKey(0), nets, 0.3)
    for it in (10, 200, 30):
        save_state(checkpoint_path(str(tmp_path), it), {"p": params})
    latest = latest_checkpoint(str(tmp_path))
    assert iter_from_name(latest) == 200


def test_import_torch_checkpoint(tmp_path):
    """Round-trip: build torch modules with the reference's state-dict key
    layout, import, and check the JAX forward matches torch's."""
    torch = pytest.importorskip("torch")
    tnn = torch.nn

    nets = small_nets()
    sdf_cfg = nets.sdf

    # torch twin of the SDF net: weight-normed linears named lin0..linN
    class TorchSDF(tnn.Module):
        def __init__(self, dims):
            super().__init__()
            for l in range(len(dims) - 1):
                lin = tnn.utils.weight_norm(tnn.Linear(dims[l], dims[l + 1]))
                setattr(self, f"lin{l}", lin)

    dims = sdf_cfg.dims
    tsdf = TorchSDF(dims)

    class TorchColor(tnn.Module):
        def __init__(self, dims):
            super().__init__()
            for l in range(len(dims) - 1):
                setattr(
                    self, f"lin{l}",
                    tnn.utils.weight_norm(tnn.Linear(dims[l], dims[l + 1])),
                )

    tcolor = TorchColor(nets.color.dims)

    class TorchNeRF(tnn.Module):
        def __init__(self, cfg):
            super().__init__()
            self.pts_linears = tnn.ModuleList(
                [tnn.Linear(cfg.input_ch, cfg.W)]
                + [
                    tnn.Linear(
                        cfg.W + cfg.input_ch if i in cfg.skips else cfg.W,
                        cfg.W,
                    )
                    for i in range(cfg.D - 1)
                ]
            )
            self.views_linears = tnn.ModuleList(
                [tnn.Linear(cfg.input_ch_view + cfg.W, cfg.W // 2)]
            )
            self.feature_linear = tnn.Linear(cfg.W, cfg.W)
            self.alpha_linear = tnn.Linear(cfg.W, 1)
            self.rgb_linear = tnn.Linear(cfg.W // 2, cfg.rgb_dims)

    tnerf = TorchNeRF(nets.nerf)

    ckpt = {
        "sdf_network_fine": tsdf.state_dict(),
        "color_network_fine": tcolor.state_dict(),
        "variance_network_fine": {"variance": torch.tensor(0.42)},
        "nerf": tnerf.state_dict(),
        "depth_network_fine": None,
        "iter_step": 12345,
    }
    pth = str(tmp_path / "ckpt_012345.pth")
    torch.save(ckpt, pth)

    params, it = import_torch_checkpoint(pth, nets, extract_depth=False)
    assert it == 12345
    np.testing.assert_allclose(float(params["variance"]["variance"]), 0.42)

    # forward parity on the SDF trunk
    x = np.random.default_rng(0).normal(size=(7, 3)).astype(np.float32) * 0.4
    ours = np.asarray(sdf_apply(sdf_cfg, params["sdf"], jnp.asarray(x)))

    def torch_sdf_forward(x):
        import torch as th

        from vdnerf_tpu.models.embedder import get_embedder

        embed_fn, _ = get_embedder(sdf_cfg.multires, 3)
        inp = th.from_numpy(np.asarray(embed_fn(x * sdf_cfg.scale)))
        h = inp
        n_lin = len(dims) - 1
        for l in range(n_lin):
            h = getattr(tsdf, f"lin{l}")(h)
            if l < n_lin - 1:
                h = th.nn.functional.softplus(h, beta=100)
        out = th.cat([h[:, :1] / sdf_cfg.scale, h[:, 1:]], dim=-1)
        return out.detach().numpy()

    theirs = torch_sdf_forward(x)
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def _torch_model_set(nets):
    """Torch twins of all four networks, reference state-dict layout."""
    import torch
    tnn = torch.nn

    class TorchLayered(tnn.Module):
        def __init__(self, dims):
            super().__init__()
            for l in range(len(dims) - 1):
                setattr(self, f"lin{l}",
                        tnn.utils.weight_norm(tnn.Linear(dims[l], dims[l + 1])))

    class TorchNeRF(tnn.Module):
        def __init__(self, cfg):
            super().__init__()
            self.pts_linears = tnn.ModuleList(
                [tnn.Linear(cfg.input_ch, cfg.W)]
                + [tnn.Linear(cfg.W + cfg.input_ch if i in cfg.skips else cfg.W,
                              cfg.W) for i in range(cfg.D - 1)]
            )
            self.views_linears = tnn.ModuleList(
                [tnn.Linear(cfg.input_ch_view + cfg.W, cfg.W // 2)]
            )
            self.feature_linear = tnn.Linear(cfg.W, cfg.W)
            self.alpha_linear = tnn.Linear(cfg.W, 1)
            self.rgb_linear = tnn.Linear(cfg.W // 2, cfg.rgb_dims)

    class TorchVar(tnn.Module):
        def __init__(self):
            super().__init__()
            self.variance = tnn.Parameter(torch.tensor(0.3))

    return (TorchNeRF(nets.nerf), TorchLayered(nets.sdf.dims), TorchVar(),
            TorchLayered(nets.color.dims))


def test_adam_moment_import_steps_identically(tmp_path):
    """The converted torch Adam moments must make optax take the SAME next
    update step as torch does (VERDICT r2 #7: warm-optimizer resume).

    Drives a real torch Adam for 3 steps with seeded synthetic gradients,
    saves the reference checkpoint format (params_to_train order
    dpt_runner.py:116-130 + optimizer state dpt_runner.py:373), imports
    params+moments, grafts them into a fresh optax.adam state, then applies
    one more identical gradient in both frameworks and compares the
    resulting parameters."""
    torch = pytest.importorskip("torch")

    from vdnerf_tpu.io.checkpoints import (
        _convert_param_tree,
        import_torch_checkpoint,
    )
    from vdnerf_tpu.runner import _restore_adam_moments

    nets = small_nets()
    torch.manual_seed(0)
    tnerf, tsdf, tvar, tcolor = _torch_model_set(nets)
    params_to_train = (
        list(tnerf.parameters()) + list(tsdf.parameters())
        + list(tvar.parameters()) + list(tcolor.parameters())
    )
    lr = 5e-3
    opt = torch.optim.Adam(params_to_train, lr=lr)

    net_named = {
        "nerf": tnerf, "sdf_network_fine": tsdf,
        "variance_network_fine": tvar, "color_network_fine": tcolor,
    }

    def set_grads(seed):
        g = torch.Generator().manual_seed(seed)
        grad_of = {}
        for key, mod in net_named.items():
            grad_of[key] = {}
            for name, p in mod.named_parameters():
                t = torch.randn(p.shape, generator=g) * 0.01
                p.grad = t.clone()
                grad_of[key][name] = t
        return grad_of

    for s in range(3):
        set_grads(s)
        opt.step()

    ckpt = {
        "sdf_network_fine": tsdf.state_dict(),
        "color_network_fine": tcolor.state_dict(),
        "variance_network_fine": tvar.state_dict(),
        "nerf": tnerf.state_dict(),
        "depth_network_fine": None,
        "optimizer": opt.state_dict(),
        "iter_step": 3,
    }
    pth = str(tmp_path / "ckpt_000003.pth")
    torch.save(ckpt, pth)

    params, it, moments = import_torch_checkpoint(
        pth, nets, extract_depth=False, with_optimizer=True
    )
    assert it == 3
    assert moments is not None
    mu, nu, count = moments
    assert count == 3
    # moment trees mirror the params tree exactly
    assert (jax.tree_util.tree_structure(mu)
            == jax.tree_util.tree_structure(params))

    import optax

    jopt = optax.adam(lr)
    opt_state = _restore_adam_moments(jopt.init(params), mu, nu, count)

    # one more identical step on both sides
    grad_of = set_grads(99)
    opt.step()
    grads = _convert_param_tree(
        lambda k: grad_of[k], nets, extract_depth=False, ckpt=ckpt
    )
    updates, _ = jopt.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)

    theirs = _convert_param_tree(
        lambda k: net_named[k].state_dict(), nets, extract_depth=False,
        ckpt=ckpt,
    )
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(new_params)[0],
        jax.tree_util.tree_flatten_with_path(theirs)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, err_msg=str(pa)
        )

    # a cold optimizer (no moment graft) takes a DIFFERENT step — the graft
    # is load-bearing, not vacuous
    cold_updates, _ = jopt.update(grads, jopt.init(params), params)
    cold = optax.apply_updates(params, cold_updates)
    diffs = [
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(jax.tree_util.tree_leaves(cold),
                        jax.tree_util.tree_leaves(theirs))
    ]
    assert max(diffs) > 1e-4
