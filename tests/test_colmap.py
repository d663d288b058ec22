"""COLMAP pipeline roundtrip on a synthesized sparse model."""

import os
import struct

import numpy as np
import pytest

from vdnerf_tpu.colmap import read_model
from vdnerf_tpu.colmap.pipeline import (
    gen_cameras,
    load_colmap_data,
    save_poses,
)
from vdnerf_tpu.data.dataset import load_K_Rt_from_P
from vdnerf_tpu.data.synthetic import look_at_pose
from vdnerf_tpu.mesh.extract import load_ply, save_ply


def write_fake_colmap_model(sparse_dir, poses_c2w, f, W, H, points):
    os.makedirs(sparse_dir, exist_ok=True)
    # cameras.bin: one SIMPLE_PINHOLE camera
    with open(os.path.join(sparse_dir, "cameras.bin"), "wb") as fo:
        fo.write(struct.pack("<Q", 1))
        fo.write(struct.pack("<iiQQ", 1, 0, W, H))
        fo.write(struct.pack("<3d", f, W / 2, H / 2))
    # images.bin
    with open(os.path.join(sparse_dir, "images.bin"), "wb") as fo:
        fo.write(struct.pack("<Q", len(poses_c2w)))
        for i, c2w in enumerate(poses_c2w):
            w2c = np.linalg.inv(c2w)
            q = read_model.rotmat2qvec(w2c[:3, :3])
            t = w2c[:3, 3]
            fo.write(struct.pack("<i", i + 1))
            fo.write(struct.pack("<4d", *q))
            fo.write(struct.pack("<3d", *t))
            fo.write(struct.pack("<i", 1))
            fo.write(f"{i:03d}.png".encode() + b"\x00")
            fo.write(struct.pack("<Q", 0))
    # points3D.bin
    with open(os.path.join(sparse_dir, "points3D.bin"), "wb") as fo:
        fo.write(struct.pack("<Q", len(points)))
        for j, p in enumerate(points):
            fo.write(struct.pack("<Q", j + 1))
            fo.write(struct.pack("<3d", *p))
            fo.write(struct.pack("<3B", 128, 128, 128))
            fo.write(struct.pack("<d", 0.5))
            fo.write(struct.pack("<Q", 1))
            fo.write(struct.pack("<ii", 1, 0))


@pytest.fixture
def fake_scene(tmp_path):
    d = str(tmp_path)
    n = 5
    poses = []
    for i in range(n):
        th = 2 * np.pi * i / n
        eye = 3.0 * np.array([np.cos(th), np.sin(th), 0.4])
        poses.append(look_at_pose(eye, np.zeros(3)).astype(np.float64))
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(100, 3)) * 0.4
    write_fake_colmap_model(os.path.join(d, "sparse/0"), poses, 400.0, 640, 480, pts)
    return d, np.stack(poses), pts


def test_read_binary_model(fake_scene):
    d, poses, pts = fake_scene
    cams = read_model.read_cameras_binary(os.path.join(d, "sparse/0/cameras.bin"))
    assert cams[1].model == "SIMPLE_PINHOLE" and cams[1].width == 640
    ims = read_model.read_images_binary(os.path.join(d, "sparse/0/images.bin"))
    assert len(ims) == 5
    # qvec roundtrip: recovered w2c rotation matches
    im = ims[1]
    np.testing.assert_allclose(
        im.qvec2rotmat(), np.linalg.inv(poses[0])[:3, :3], atol=1e-6
    )
    p3d = read_model.read_points3d_binary(os.path.join(d, "sparse/0/points3D.bin"))
    assert len(p3d) == 100


def test_full_pipeline_roundtrip(fake_scene):
    d, poses, pts = fake_scene
    poses_llff, pts3d, perm, names = load_colmap_data(d)
    assert poses_llff.shape == (3, 5, 5)
    save_poses(d, poses_llff, pts3d, perm)
    assert os.path.exists(os.path.join(d, "poses.npy"))
    verts, _ = load_ply(os.path.join(d, "sparse_points.ply"))
    assert len(verts) == 100

    # the user crop step: keep everything
    save_ply(
        os.path.join(d, "sparse_points_interest.ply"),
        verts, np.zeros((0, 3), np.int64),
    )
    npz_path = gen_cameras(d)
    cam = np.load(npz_path)

    # roundtrip: decomposing world_mat @ scale_mat must recover each pose
    # (rotation exactly; translation normalized into the unit sphere)
    scale = cam["scale_mat_000"]
    for i in range(5):
        P = (cam[f"world_mat_{i:03d}"] @ scale)[:3, :4]
        intr, pose = load_K_Rt_from_P(None, P)
        np.testing.assert_allclose(intr[0, 0], 400.0, rtol=1e-4)
        np.testing.assert_allclose(pose[:3, :3], poses[i][:3, :3], atol=1e-4)
        expected_t = (poses[i][:3, 3] - scale[:3, 3]) / scale[0, 0]
        np.testing.assert_allclose(pose[:3, 3], expected_t, atol=1e-4)


def test_capture_to_training_e2e(tmp_path):
    """The capture-preparation path a real user takes, end to end through the
    CLIs (VERDICT r2 #8: P1 -> P5 -> C1): imgs2poses CLI on a scene dir with
    an existing sparse/0 (colmap binary skipped, reference
    pose_utils.py:290-293 path), the user's crop step, gen_cameras CLI, then
    an actual Runner(train) consuming the produced npz."""
    import json

    from vdnerf_tpu.colmap.gen_cameras_cli import main as gen_cameras_main
    from vdnerf_tpu.colmap.imgs2poses import main as imgs2poses_main
    from vdnerf_tpu.data.synthetic import make_synthetic_scene

    d = str(tmp_path)
    # a real renderable capture: analytic sphere scene, stems 000..003
    meta = make_synthetic_scene(d, n_images=4, H=48, W=48)
    # its true poses/focal expressed as a COLMAP sparse reconstruction,
    # points on the radius-0.5 object sphere
    rng = np.random.default_rng(1)
    sph = rng.normal(size=(200, 3))
    sph = 0.5 * sph / np.linalg.norm(sph, axis=-1, keepdims=True)
    write_fake_colmap_model(
        os.path.join(d, "sparse/0"),
        [p.astype(np.float64) for p in meta["poses"]],
        float(meta["K"][0, 0]), meta["W"], meta["H"], sph,
    )

    # P1: imgs2poses CLI (colmap run skipped — model already present)
    imgs2poses_main([d])
    assert os.path.exists(os.path.join(d, "poses.npy"))
    # the manual crop step: keep the full sparse cloud
    verts, _ = load_ply(os.path.join(d, "sparse_points.ply"))
    save_ply(
        os.path.join(d, "sparse_points_interest.ply"),
        verts, np.zeros((0, 3), np.int64),
    )
    # P5: gen_cameras CLI
    gen_cameras_main([d])
    npz = os.path.join(d, "cameras_sphere_colmap.npz")
    assert os.path.exists(npz)

    # C1: train through the Runner on the produced npz
    conf_path = os.path.join(d, "colmap_e2e.conf")
    with open(conf_path, "w") as f:
        f.write(f"""
general {{
    base_exp_dir = {os.path.join(d, "exp")}
    recording = []
}}
dataset {{
    data_dir = {d}
    img_dir = image
    depth_dir = 00
    render_cameras_name = cameras_sphere_colmap.npz
    object_cameras_name = cameras_sphere_colmap.npz
}}
train {{
    learning_rate = 5e-4
    learning_rate_alpha = 0.05
    end_iter = 8
    batch_size = 32
    validate_resolution_level = 4
    warm_up_end = 2
    anneal_end = 4
    use_white_bkgd = True
    save_freq = 8
    val_freq = 100
    val_mesh_freq = 100
    report_freq = 4
    igr_weight = 0.1
    mask_weight = 0.1
}}
model {{
    nerf {{
        D = 2, d_in = 4, d_in_view = 3, W = 32,
        multires = 4, multires_view = 2, output_ch = 4, skips = [4],
        rgb_dims = 3, use_viewdirs = True
    }}
    sdf_network {{
        d_out = 33, d_in = 3, d_hidden = 32, n_layers = 2,
        skip_in = [1], multires = 4, bias = 0.5, scale = 1.0,
        geometric_init = True, weight_norm = True
    }}
    variance_network {{
        init_val = 0.3
    }}
    rendering_network {{
        d_feature = 32, mode = idr, d_in = 9, d_out = 3,
        d_hidden = 32, n_layers = 2, weight_norm = True,
        multires_view = 2, squeeze_out = True
    }}
    neus_renderer {{
        n_samples = 12, n_importance = 8, n_outside = 4,
        up_sample_steps = 4, perturb = 1.0
    }}
}}
""")
    from vdnerf_tpu.runner import Runner

    runner = Runner(conf_path, mode="train")
    # the capture's cameras survived the pipeline: poses decomposed from
    # world_mat @ scale_mat look at the object from ~cam_dist (unit-scaled)
    assert runner.scene_data.n_images == 4
    runner.train()
    assert runner.iter_step == 8
    # checkpoint + metrics written
    assert os.path.exists(
        os.path.join(d, "exp", "checkpoints", "ckpt_000008.npz")
    )
    metrics_path = os.path.join(d, "exp", "logs", "metrics.jsonl")
    with open(metrics_path) as f:
        recs = [json.loads(l) for l in f if l.strip()]
    assert recs and all(np.isfinite(r["loss"]) for r in recs)
