"""End-to-end: synthetic sphere scene -> short training -> PSNR improves.

This is the CPU-sized equivalent of the reference's empirical quality loop
(SURVEY.md §4): train a tiny NeuS on an analytic sphere and verify learning
happens, plus multi-chip (8-device CPU mesh) sharded-step correctness.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdnerf_tpu.data.dataset import SceneData
from vdnerf_tpu.data.rays import RayStore
from vdnerf_tpu.data.synthetic import make_synthetic_scene, write_synthetic_conf
from vdnerf_tpu.parallel import make_mesh, make_sharded_train_step, shard_batch
from vdnerf_tpu.train import (
    SceneStatic,
    TrainConfig,
    build_networks,
    init_params,
    init_state,
    make_train_step,
)
from vdnerf_tpu.utils.hocon import load_conf


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    d = tmp_path_factory.mktemp("scene")
    meta = make_synthetic_scene(str(d), n_images=6, H=48, W=48)
    conf_path = str(d / "synthetic.conf")
    write_synthetic_conf(
        conf_path, data_dir=str(d), exp_dir=str(d / "exp"),
        end_iter=60, batch_size=128,
    )
    conf = load_conf(conf_path)
    scene_data = SceneData(conf["dataset"])
    store = RayStore(scene_data.images_lis, scene_data.masks_lis)
    return meta, conf, scene_data, store


def _setup(conf, scene_data, perturb_override=None):
    tcfg = TrainConfig.from_conf(conf)
    nets = build_networks(conf, tcfg.extract_depth)
    if perturb_override is not None:
        nets = dataclasses.replace(
            nets,
            renderer=dataclasses.replace(nets.renderer, perturb=perturb_override),
        )
    params = init_params(
        jax.random.PRNGKey(0), nets, conf.get_float("model.variance_network.init_val")
    )
    cams = {
        "pose_all": jnp.asarray(scene_data.pose_all),
        "intrin_inv_all": jnp.asarray(scene_data.intrinsics_all_inv),
    }
    scene_static = SceneStatic(H=scene_data.H, W=scene_data.W)
    state = init_state(params, tcfg, cams, jax.random.PRNGKey(1))
    return tcfg, nets, scene_static, state


def test_training_improves_psnr(scene):
    meta, conf, scene_data, store = scene
    tcfg, nets, scene_static, state = _setup(conf, scene_data)
    step_fn = jax.jit(make_train_step(nets, tcfg, scene_static))

    rng = np.random.default_rng(0)
    psnrs, losses = [], []
    for i in range(60):
        batch = store.sample_pixels(i % store.n_images, tcfg.batch_size, rng)
        state, metrics = step_fn(state, batch)
        psnrs.append(float(metrics["psnr"]))
        losses.append(float(metrics["loss"]))

    assert np.isfinite(losses).all()
    first, last = np.mean(psnrs[:10]), np.mean(psnrs[-10:])
    assert last > first + 1.0, (first, last)
    assert int(state["step"]) == 60


def test_training_improves_psnr_resampled(scene):
    """Production fast path #2 (importance-resampled render core) TRAINS:
    same scene and budget as the faithful e2e above, with the with-gradient
    core shrunk to half the ladder width (24 of 48)."""
    meta, conf, scene_data, store = scene
    tcfg, nets, scene_static, state = _setup(conf, scene_data)
    nets = dataclasses.replace(
        nets, renderer=dataclasses.replace(nets.renderer, n_render_samples=24)
    )
    step_fn = jax.jit(make_train_step(nets, tcfg, scene_static))

    rng = np.random.default_rng(0)
    psnrs, losses = [], []
    for i in range(60):
        batch = store.sample_pixels(i % store.n_images, tcfg.batch_size, rng)
        state, metrics = step_fn(state, batch)
        psnrs.append(float(metrics["psnr"]))
        losses.append(float(metrics["loss"]))

    assert np.isfinite(losses).all()
    first, last = np.mean(psnrs[:10]), np.mean(psnrs[-10:])
    assert last > first + 1.0, (first, last)


def test_sharded_step_matches_single_chip(scene):
    meta, conf, scene_data, store = scene
    # perturb=0 so single-chip and sharded paths see identical samples
    tcfg, nets, scene_static, state = _setup(conf, scene_data, perturb_override=0.0)

    rng = np.random.default_rng(1)
    batch = store.sample_pixels(0, tcfg.batch_size, rng)

    single = jax.jit(make_train_step(nets, tcfg, scene_static))
    s1, m1 = single(state, batch)

    mesh = make_mesh()
    assert mesh.devices.size == 8
    sharded = make_sharded_train_step(nets, tcfg, scene_static, mesh)
    s8, m8 = sharded(state, shard_batch(batch, mesh))

    np.testing.assert_allclose(
        float(m1["loss"]), float(m8["loss"]), rtol=2e-4
    )
    np.testing.assert_allclose(
        float(m1["psnr"]), float(m8["psnr"]), rtol=2e-4
    )
    # params after one step agree (grads psum'd == full-batch grads)
    l1 = jax.tree_util.tree_leaves(s1["params"])
    l8 = jax.tree_util.tree_leaves(s8["params"])
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-3
        )


def test_grad_accum_matches_monolithic(scene):
    """grad_accum=2 with an all-ones mask reproduces the monolithic step:
    the per-microbatch normalizers (mask_sum, BCE count) are then exactly
    proportional, so mean-of-microbatch losses == the full-batch loss (the
    eikonal ratio differs only by its per-microbatch denominators)."""
    meta, conf, scene_data, store = scene
    tcfg, nets, scene_static, state = _setup(conf, scene_data,
                                             perturb_override=0.0)

    rng = np.random.default_rng(3)
    batch = store.sample_pixels(0, tcfg.batch_size, rng)
    batch = dict(batch, mask=np.ones_like(batch["mask"]))

    mono = jax.jit(make_train_step(nets, tcfg, scene_static))
    s1, m1 = mono(state, batch)
    accum = jax.jit(make_train_step(nets, tcfg, scene_static, grad_accum=2))
    s2, m2 = accum(state, batch)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=2e-3)
    np.testing.assert_allclose(float(m1["psnr"]), float(m2["psnr"]), rtol=2e-3)
    assert int(s2["step"]) == 1
    l1 = jax.tree_util.tree_leaves(s1["params"])
    l2 = jax.tree_util.tree_leaves(s2["params"])
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=5e-3
        )


def test_grad_accum_composes_with_sharding(scene):
    """2 microbatches per shard on the 8-device mesh: runs, finite, steps."""
    meta, conf, scene_data, store = scene
    tcfg, nets, scene_static, state = _setup(conf, scene_data,
                                             perturb_override=0.0)
    rng = np.random.default_rng(4)
    batch = store.sample_pixels(0, tcfg.batch_size, rng)
    mesh = make_mesh()
    sharded = make_sharded_train_step(nets, tcfg, scene_static, mesh,
                                      grad_accum=2)
    s, m = sharded(state, shard_batch(batch, mesh))
    assert np.isfinite(float(m["loss"]))
    assert int(s["step"]) == 1


def test_depth_distillation_loss_path(scene, tmp_path):
    """wdepth-mode: a depth head + feature distillation loss trains."""
    meta, conf, scene_data, store = scene
    import copy

    # enable extract_depth with a small depth head, synthesize 8-ch feats
    conf_d = copy.deepcopy(conf.to_dict())
    conf_d["train"].update(
        extract_depth=True, depth_start_iter=2, only_depth=False,
        depth_before_color=False, depth_weight=0.2, rgb_dims=3,
    )
    conf_d["model"]["nerf"].update(gen_depth_feats=True, dpt_dim=8)
    conf_d["model"]["depth_extract_network"] = dict(
        conf_d["model"]["rendering_network"], d_out=8
    )
    from vdnerf_tpu.utils.hocon import Config

    conf2 = Config(conf_d)
    tcfg = TrainConfig.from_conf(conf2)
    nets = build_networks(conf2, True)
    params = init_params(jax.random.PRNGKey(0), nets, 0.3)
    cams = {
        "pose_all": jnp.asarray(scene_data.pose_all),
        "intrin_inv_all": jnp.asarray(scene_data.intrinsics_all_inv),
    }
    scene_static = SceneStatic(H=scene_data.H, W=scene_data.W)
    state = init_state(params, tcfg, cams, jax.random.PRNGKey(1))
    step_fn = jax.jit(make_train_step(nets, tcfg, scene_static))

    rng = np.random.default_rng(2)
    for i in range(5):
        batch = store.sample_pixels(i % store.n_images, 64, rng)
        batch["feats"] = rng.uniform(0, 1, (64, 8)).astype(np.float32)
        state, metrics = step_fn(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert "depth_loss" in metrics and np.isfinite(float(metrics["depth_loss"]))
    assert int(state["step"]) == 5


def test_learnable_cameras_path(scene):
    """Learned pose/focal: gradients flow (fixing the reference's .item()
    focal-detach bug) and refinement gating works."""
    meta, conf, scene_data, store = scene
    import copy

    conf_d = copy.deepcopy(conf.to_dict())
    conf_d["train"].update(
        focal_learnable=True, poses_learnable=True,
        focal_lr=1e-3, pose_lr=1e-3, focal_lr_gamma=0.9, pose_lr_gamma=0.9,
        step_size=10, start_refine_pose_iter=1, start_refine_focal_iter=1,
    )
    from vdnerf_tpu.utils.hocon import Config
    from vdnerf_tpu.data.cameras import init_focal_params, init_pose_params

    conf2 = Config(conf_d)
    tcfg = TrainConfig.from_conf(conf2)
    assert tcfg.learnable
    nets = build_networks(conf2, False)
    params = init_params(jax.random.PRNGKey(0), nets, 0.3)
    cams = {
        "pose": init_pose_params(scene_data.n_images),
        "focal": init_focal_params(float(scene_data.focal), scene_data.W),
        "init_c2w": jnp.asarray(scene_data.pose_all),
    }
    scene_static = SceneStatic(
        H=scene_data.H, W=scene_data.W, learnable=True
    )
    state = init_state(params, tcfg, cams, jax.random.PRNGKey(1))
    step_fn = jax.jit(make_train_step(nets, tcfg, scene_static))

    rng = np.random.default_rng(3)
    fx0 = float(state["cams"]["focal"]["fx"])
    # step 0: refine gate closed (0 > 1 false) -> cams unchanged
    batch = store.sample_pixels(0, 64, rng)
    state, _ = step_fn(state, batch)
    assert float(state["cams"]["focal"]["fx"]) == fx0
    np.testing.assert_array_equal(np.asarray(state["cams"]["pose"]["r"]), 0.0)
    # subsequent steps: gate open -> pose and focal move
    for i in range(3):
        batch = store.sample_pixels(i % store.n_images, 64, rng)
        state, metrics = step_fn(state, batch)
    assert float(state["cams"]["focal"]["fx"]) != fx0
    assert np.abs(np.asarray(state["cams"]["pose"]["r"])).max() > 0
    assert np.isfinite(float(metrics["loss"]))
