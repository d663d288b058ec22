"""The COMPLETE VDN view-dependence-normalization cycle, end-to-end through
the real CLIs (SURVEY.md's 5-step loop):

  1. train NeuS                (cli --mode train)
  2. export depth-from-SDF     (cli --mode getfeats_<it>)
  3. finetune monodepth encoder (wavelet.finetune CLI)
  4. extract encoder features   (wavelet.predict CLI)
  5. retrain NeuS with the distillation head consuming those features

Tiny sizes, CPU. This is the integration test for the framework's headline
capability.
"""

import os

import numpy as np
import pytest

from vdnerf_tpu.data.synthetic import make_synthetic_scene, write_synthetic_conf

WDEPTH_CONF = """\
general {{
    base_exp_dir = {exp_dir}
    recording = []
}}
dataset {{
    data_dir = {data_dir}
    img_dir = image
    depth_dir = wavelet_feats/0
    render_cameras_name = image/cameras_sphere.npz
    object_cameras_name = image/cameras_sphere.npz
}}
train {{
    learning_rate = 5e-4
    learning_rate_alpha = 0.05
    end_iter = 8
    batch_size = 64
    validate_resolution_level = 2
    warm_up_end = 2
    anneal_end = 4
    use_white_bkgd = True
    save_freq = 8
    val_freq = 100
    val_mesh_freq = 100
    report_freq = 5
    igr_weight = 0.1
    mask_weight = 0.0
    use_mask = False
    depth_weight = 0.2
    extract_depth = True
    depth_start_iter = 2
    only_depth = False
    depth_before_color = False
    rgb_dims = 3
}}
model {{
    nerf {{
        D = 2, d_in = 4, d_in_view = 3, W = 64,
        multires = 4, multires_view = 2, output_ch = 4, skips = [4],
        rgb_dims = 3, use_viewdirs = True,
        gen_depth_feats = True, dpt_dim = 32,
    }}
    sdf_network {{
        d_out = 65
        d_in = 3
        d_hidden = 64
        n_layers = 4
        skip_in = [2]
        multires = 6
        bias = 0.5
        scale = 1.0
        geometric_init = True
        weight_norm = True
    }}
    variance_network {{ init_val = 0.3 }}
    rendering_network {{
        d_feature = 64
        mode = idr
        d_in = 9
        d_out = 3
        d_hidden = 64
        n_layers = 2
        weight_norm = True
        multires_view = 4
        squeeze_out = True
    }}
    depth_extract_network {{
        d_feature = 64
        mode = idr
        d_in = 9
        d_out = 32
        d_hidden = 64
        n_layers = 2
        weight_norm = True
        multires_view = 4
        squeeze_out = True
    }}
    neus_renderer {{
        n_samples = 12
        n_importance = 12
        n_outside = 4
        up_sample_steps = 4
        perturb = 1.0
    }}
}}
"""


@pytest.mark.slow
@pytest.mark.heavy_e2e
def test_full_vdn_cycle(tmp_path):
    d = str(tmp_path)
    make_synthetic_scene(d, n_images=3, H=64, W=64)
    base_conf = os.path.join(d, "base.conf")
    write_synthetic_conf(
        base_conf, data_dir=d, exp_dir=os.path.join(d, "exp"),
        end_iter=8, batch_size=64, save_freq=8, val_freq=100,
        val_mesh_freq=100,
    )

    from vdnerf_tpu.cli import main as cli_main

    # 1. base NeuS training
    cli_main(["--conf", base_conf, "--mode", "train"])
    assert os.path.exists(os.path.join(d, "exp/checkpoints/ckpt_000008.npz"))

    # 2. depth-from-SDF export
    cli_main(["--conf", base_conf, "--mode", "getfeats_8"])
    sdf_dir = os.path.join(d, "image", "depth_from_sdf")
    assert len(os.listdir(sdf_dir)) == 3

    # 3. finetune the monodepth encoder on those depths
    from vdnerf_tpu.wavelet.finetune import finetune

    logpath = finetune([
        "-r", os.path.dirname(d), "--case", os.path.basename(d),
        "--epochs", "1", "-bs", "2", "--image_size", "64",
        "--encoder_type", "mobilenet_light",
        "--logdir", os.path.join(d, "wavelet_log"),
        "--val_freq", "100", "--save_freq", "1",
    ])
    ckpts = []
    for root, _dirs, files in os.walk(logpath):
        ckpts += [os.path.join(root, f) for f in files if f == "model.npz"]
    assert ckpts

    # 4. extract 96-ch (here 32-ch mobilenet) features
    from vdnerf_tpu.wavelet.predict import main as predict_main

    predict_main([
        "-ckpt", os.path.dirname(ckpts[0]), "--ckpt_name", "model.npz",
        "-d", os.path.join(d, "image"),
        "--encoder_type", "mobilenet_light",
    ])
    feat_dir = os.path.join(d, "image", "wavelet_feats", "0")
    assert len(os.listdir(feat_dir)) == 3

    # 5. retrain with the distillation loss consuming those features
    wdepth_conf = os.path.join(d, "wdepth.conf")
    with open(wdepth_conf, "w") as f:
        f.write(WDEPTH_CONF.format(
            data_dir=d, exp_dir=os.path.join(d, "exp_wdepth")
        ))
    cli_main(["--conf", wdepth_conf, "--mode", "train"])
    assert os.path.exists(
        os.path.join(d, "exp_wdepth/checkpoints/ckpt_000008.npz")
    )
    # the distillation loss actually ran (metrics carried a depth term)
    import json

    with open(os.path.join(d, "exp_wdepth/logs/metrics.jsonl")) as f:
        records = [json.loads(line) for line in f]
    assert any("depth_loss" in r for r in records)
    assert all(np.isfinite(r["loss"]) for r in records)


@pytest.mark.slow
@pytest.mark.heavy_e2e
def test_vdn_cycle_densenet_leg(tmp_path):
    """Cycle steps 3-4 with the DEFAULT encoder (DenseNet-161): finetune on
    depth-from-SDF pseudo-GT, then extract the real 96-channel VDN features
    (reference finetune_for_vdn.py:53, predict.py:190-193). The mobilenet
    test above covers the full 5-step loop; this leg proves the flagship
    densenet path trains and exports end-to-end."""
    d = str(tmp_path)
    make_synthetic_scene(d, n_images=2, H=64, W=64)

    # fabricate the depth_from_sdf export (step 2's artifact) directly
    sdf_dir = os.path.join(d, "image", "depth_from_sdf")
    os.makedirs(sdf_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(2):
        depth = (2.5 + 0.2 * rng.random((64, 64, 1))).astype(np.float32)
        np.save(os.path.join(sdf_dir, f"sdf_{i:03d}.npy"), depth)

    from vdnerf_tpu.wavelet.finetune import finetune

    logpath = finetune([
        "-r", os.path.dirname(d), "--case", os.path.basename(d),
        "--epochs", "1", "-bs", "1", "--image_size", "64",
        "--encoder_type", "densenet",
        "--logdir", os.path.join(d, "wavelet_log"),
        "--val_freq", "100", "--save_freq", "1",
    ])
    ckpts = []
    for root, _dirs, files in os.walk(logpath):
        ckpts += [os.path.join(root, f) for f in files if f == "model.npz"]
    assert ckpts

    from vdnerf_tpu.wavelet.predict import main as predict_main

    predict_main([
        "-ckpt", os.path.dirname(ckpts[0]), "--ckpt_name", "model.npz",
        "-d", os.path.join(d, "image"),
        "--encoder_type", "densenet",
    ])
    feat_dir = os.path.join(d, "image", "wavelet_feats", "0")
    feats = sorted(os.listdir(feat_dir))
    assert len(feats) == 2
    arr = np.load(os.path.join(feat_dir, feats[0]))
    # (1, 96, H/2, W/2): the reference's NCHW npy layout, 96 channels
    assert arr.shape == (1, 96, 32, 32)
    assert np.isfinite(arr).all()


def test_cycle_tool_conf_template(tmp_path):
    """tools/vdn_cycle_run.write_conf_file: dpt_dim must flow into BOTH the
    NeRF dpt head and the depth_extract_network (a 32-ch mobilenet teacher
    needs a 32-ch head; hardcoded 96 broke that)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "vdn_cycle_run",
        os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     "tools", "vdn_cycle_run.py"),
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    from vdnerf_tpu.utils.hocon import load_conf

    d = str(tmp_path)
    for dim, wdepth in ((32, True), (96, True), (None, False)):
        p = m.write_conf_file(
            os.path.join(d, f"t_{dim}.conf"), os.path.join(d, "exp"), d,
            iters=60, batch=64, wdepth=wdepth, dpt_dim=dim or 96,
        )
        conf = load_conf(p)
        if wdepth:
            assert conf.get_int("model.nerf.dpt_dim") == dim
            assert conf.get_int("model.depth_extract_network.d_out") == dim
            assert conf.get_bool("train.extract_depth")
            # default onset is leg-relative (iters // 10)
            assert conf.get_int("train.depth_start_iter") == 6
        else:
            assert "depth_extract_network" not in conf.get("model", {})
            assert conf.get_int("train.end_iter") == 60

    # an absolute depth_start_iter override decouples the distillation
    # onset from the leg length (the 25k-plateau schedule probe)
    p = m.write_conf_file(
        os.path.join(d, "t_abs.conf"), os.path.join(d, "exp"), d,
        iters=60, batch=64, wdepth=True, dpt_dim=96, depth_start_iter=3,
    )
    assert load_conf(p).get_int("train.depth_start_iter") == 3

    # lr_end_iter + igr_weight overrides (the §2c lr-clamp probe arm and
    # the §5 eik-boost arms) land in the conf; defaults omit/keep them
    p = m.write_conf_file(
        os.path.join(d, "t_lr.conf"), os.path.join(d, "exp"), d,
        iters=60, batch=64, wdepth=True, dpt_dim=96, lr_end_iter=30,
        igr_weight=1.0,
    )
    conf = load_conf(p)
    assert conf.get_int("train.lr_end_iter") == 30
    assert conf.get_float("train.igr_weight") == 1.0
    base = load_conf(m.write_conf_file(
        os.path.join(d, "t_base.conf"), os.path.join(d, "exp"), d,
        iters=60, batch=64, wdepth=True, dpt_dim=96,
    ))
    assert base.get_int("train.lr_end_iter", default=0) == 0
    assert base.get_float("train.igr_weight") == 0.1
    # the remaining leg-relative quantities (anneal iters//4, warmup
    # iters//50) are overridable too — the §2c pinned-schedule arm
    assert base.get_int("train.anneal_end") == 1000  # max(60//4, 1000)
    assert base.get_int("train.warm_up_end") == 100
    pinned = load_conf(m.write_conf_file(
        os.path.join(d, "t_pin.conf"), os.path.join(d, "exp"), d,
        iters=60, batch=64, wdepth=True, dpt_dim=96, anneal_end=12,
        warm_up_end=5,
    ))
    assert pinned.get_int("train.anneal_end") == 12
    assert pinned.get_int("train.warm_up_end") == 5


def _load_cycle_tool():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "vdn_cycle_run",
        os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     "tools", "vdn_cycle_run.py"),
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_cycle_tool_learn_and_resample_conf(tmp_path):
    """The round-5 additions to write_conf_file: the learn surface
    (reference womsk_learn_*_colmap.conf keys + the noisy-cameras npz) and
    the resampled-core knobs for the wdepth validation arms."""
    from vdnerf_tpu.utils.hocon import load_conf

    m = _load_cycle_tool()
    d = str(tmp_path)
    p = m.write_conf_file(
        os.path.join(d, "learn_rs.conf"), os.path.join(d, "exp"), d,
        iters=60, batch=64, wdepth=True, dpt_dim=96,
        render_samples=96, resample_frac=1.0, resample_from=40,
        learn=True, cam_npz="cameras_sphere_noisy.npz",
    )
    conf = load_conf(p)
    assert conf.get_bool("train.focal_learnable")
    assert conf.get_bool("train.poses_learnable")
    assert conf.get_int("train.start_refine_pose_iter") == -1
    assert conf.get_float("train.pose_lr") == 5e-4
    assert conf.get_int("model.neus_renderer.n_render_samples") == 96
    assert conf.get_float("model.neus_renderer.resample_uniform_frac") == 1.0
    assert conf.get_int("train.resample_from") == 40
    assert conf.get_string("dataset.render_cameras_name").endswith(
        "cameras_sphere_noisy.npz"
    )
    # and the full TrainConfig/builder path accepts the combination
    from vdnerf_tpu.train.builder import build_networks
    from vdnerf_tpu.train.config import TrainConfig

    tcfg = TrainConfig.from_conf(conf)
    assert tcfg.learnable and tcfg.resample_from == 40
    nets = build_networks(conf, tcfg.extract_depth)
    assert nets.renderer.n_render_samples == 96

    # defaults: no learn keys, no resample keys
    base = load_conf(m.write_conf_file(
        os.path.join(d, "plain.conf"), os.path.join(d, "exp"), d,
        iters=60, batch=64, wdepth=False,
    ))
    assert not base.get_bool("train.focal_learnable", default=False)
    assert base.get_int("model.neus_renderer.n_render_samples", default=0) == 0
    assert base.get_string("dataset.render_cameras_name").endswith(
        "image/cameras_sphere.npz"
    )


def test_umeyama_and_pose_recovery_stats():
    """_umeyama recovers an exact synthetic similarity; pose_recovery_stats
    reports ~zero aligned error when learned = similarity(GT) and nonzero
    raw error (the gauge), using a fake runner carrying only state['cams']."""
    import numpy as np
    from scipy.spatial.transform import Rotation as Rot

    from vdnerf_tpu.utils.so3 import make_c2w

    m = _load_cycle_tool()
    rng = np.random.default_rng(0)

    # exact similarity recovery on random points
    src = rng.normal(size=(24, 3))
    R_true = Rot.from_rotvec([0.05, -0.08, 0.03]).as_matrix()
    s_true, t_true = 1.02, np.array([0.05, -0.02, 0.01])
    dst = s_true * src @ R_true.T + t_true
    s, R, t = m._umeyama(src, dst)
    assert abs(s - s_true) < 1e-9
    np.testing.assert_allclose(R, R_true, atol=1e-9)
    np.testing.assert_allclose(t, t_true, atol=1e-9)

    # GT camera ring
    import jax.numpy as jnp

    from vdnerf_tpu.data.synthetic import look_at_pose

    gt = np.stack([
        look_at_pose(2.5 * np.array([np.cos(a), np.sin(a), 0.3]),
                     np.zeros(3)).astype(np.float64)
        for a in np.linspace(0, 2 * np.pi, 24, endpoint=False)
    ])
    # "learned" = the same cameras expressed in a gauge-drifted world frame:
    # c2w' = T_sim @ c2w with the rotation/translation part of a similarity
    T = np.eye(4)
    T[:3, :3] = R_true
    T[:3, 3] = t_true
    learned = np.einsum("ij,njk->nik", T, gt)
    learned[:, :3, 3] = gt[:, :3, 3] @ R_true.T * s_true + t_true

    class FakeRunner:
        state = {"cams": {
            # zero delta on init == learned poses pass through
            "pose": {"r": jnp.zeros((24, 3)), "t": jnp.zeros((24, 3))},
            "init_c2w": jnp.asarray(learned),
        }}

    stats, sim = m.pose_recovery_stats(FakeRunner(), gt)
    # float32 cams + arccos near 1.0 leave ~0.02 deg of numerical noise
    assert stats["aligned_rot_err_deg"] < 0.05, stats
    assert stats["aligned_center_err"] < 1e-5, stats
    assert stats["raw_rot_err_deg"] > 1.0, stats  # the injected gauge
    # the fit maps learned -> GT, i.e. the INVERSE of the injected
    # similarity: scale 1/s_true
    assert abs(stats["gauge_scale"] - 1.0 / s_true) < 1e-6
    # the returned similarity maps learned centers onto GT centers
    s2, R2, t2 = sim
    np.testing.assert_allclose(
        # cams round-trip through float32 jnp arrays inside the fake state
        s2 * learned[:, :3, 3] @ R2.T + t2, gt[:, :3, 3], atol=1e-5
    )
    # make_c2w import kept meaningful: zero-delta pose params really are
    # the identity delta in our parametrization
    np.testing.assert_allclose(
        np.asarray(make_c2w(jnp.zeros(3), jnp.zeros(3))), np.eye(4),
        atol=1e-7,
    )
