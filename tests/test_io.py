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
