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
