"""Visual-hull mesh cleaning (vdnerf_tpu/mesh/clean.py).

Synthetic setup: a cube mesh at the origin (the "object") plus a far-away
cube (the "junk shell"), viewed by cameras that only see the origin cube.
Cleaning must cull the far cube whole and keep the object watertight.
"""

from __future__ import annotations

import numpy as np

from vdnerf_tpu.mesh.clean import (
    clean_mesh,
    edge_stats,
    hull_membership,
    mesh_components,
)


def cube_mesh(center, half):
    c = np.asarray(center, np.float64)
    v = np.array(
        [
            [-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
            [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1],
        ],
        np.float64,
    ) * half + c
    f = np.array(
        [
            [0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
            [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
            [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7],
        ],
        np.int64,
    )
    return v, f


def look_at_world_mat(eye, H, W, focal):
    """P = K @ w2c for a camera at ``eye`` looking at the origin."""
    eye = np.asarray(eye, np.float64)
    z = -eye / np.linalg.norm(eye)
    up = np.array([0.0, 0.0, 1.0])
    if abs(z @ up) > 0.99:
        up = np.array([0.0, 1.0, 0.0])
    x = np.cross(z, up)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x, y, z, eye
    K = np.eye(4)
    K[0, 0] = K[1, 1] = focal
    K[0, 2], K[1, 2] = W / 2, H / 2
    return K @ np.linalg.inv(c2w)


def _scene(H=64, W=64, n_views=6):
    """Cameras on a ring seeing only the origin cube; masks = its square."""
    wms, masks = [], []
    for i in range(n_views):
        th = 2 * np.pi * i / n_views
        eye = 3.0 * np.array([np.cos(th), np.sin(th), 0.3])
        wm = look_at_world_mat(eye, H, W, focal=1.2 * W)
        wms.append(wm)
        # rasterize the origin cube's mask by projecting a dense point cloud
        pts = np.random.default_rng(i).uniform(-0.3, 0.3, (4000, 3))
        ph = np.concatenate([pts, np.ones((len(pts), 1))], axis=1) @ wm.T
        px = (ph[:, 0] / ph[:, 2]).astype(int)
        py = (ph[:, 1] / ph[:, 2]).astype(int)
        m = np.zeros((H, W), np.uint8)
        ok = (px >= 0) & (px < W) & (py >= 0) & (py < H)
        m[py[ok], px[ok]] = 1
        import cv2 as cv

        m = cv.dilate(m, np.ones((3, 3), np.uint8))
        masks.append(m)
    return np.stack(masks), np.stack(wms)


def test_components_and_membership():
    v1, f1 = cube_mesh([0, 0, 0], 0.25)
    v2, f2 = cube_mesh([1.6, 0, 0], 0.2)
    verts = np.concatenate([v1, v2])
    tris = np.concatenate([f1, f2 + 8])
    labels = mesh_components(verts, tris)
    assert len(np.unique(labels)) == 2
    assert (labels[:8] == labels[0]).all() and (labels[8:] == labels[8]).all()

    masks, wms = _scene()
    mem = hull_membership(verts, masks, wms, dilate=4)
    assert mem[:8].min() > 0.9       # object cube: inside every view
    assert mem[8:].max() < 0.5       # far cube: outside the hull


def test_clean_mesh_culls_out_of_hull_junk():
    v1, f1 = cube_mesh([0, 0, 0], 0.25)
    v2, f2 = cube_mesh([1.6, 0, 0], 0.2)
    verts = np.concatenate([v1, v2])
    tris = np.concatenate([f1, f2 + 8])
    masks, wms = _scene()

    cv_, ct, stats = clean_mesh(verts, tris, masks, wms, dilate=4)
    assert stats["kept_verts"] == 8
    assert len(ct) == 12
    es = edge_stats(ct)
    assert es["watertight"] and es["boundary_edges"] == 0
    # kept geometry is the origin cube
    assert np.abs(cv_).max() < 0.3


def test_hull_membership_scale_mats_frame():
    """Real-capture frame contract: verts in the normalized object frame +
    a non-identity scale_mat must project identically to world-frame verts
    through world_mat alone (P @ scale_mat composition)."""
    v1, _f1 = cube_mesh([0, 0, 0], 0.25)
    masks, wms = _scene()

    # world = scale * object + center  (reference gen_cameras.py:65-73)
    s, center = 2.5, np.array([6.0, -3.0, 1.5])
    scale_mat = np.eye(4)
    scale_mat[:3, :3] *= s
    scale_mat[:3, 3] = center
    # cameras built for the WORLD-frame cube at `center` with half-size .25*s
    wms_world = []
    masks_world = []
    H = W = 64
    for i in range(len(wms)):
        th = 2 * np.pi * i / len(wms)
        eye = center + 3.0 * s * np.array([np.cos(th), np.sin(th), 0.3])
        wm = look_at_world_mat(eye - center, H, W, focal=1.2 * W)
        # look_at_world_mat targets the origin; shift to target `center`
        T = np.eye(4)
        T[:3, 3] = -center
        wm = wm @ T
        wms_world.append(wm)
        pts = center + np.random.default_rng(i).uniform(
            -0.3 * s, 0.3 * s, (4000, 3)
        )
        ph = np.concatenate([pts, np.ones((len(pts), 1))], axis=1) @ wm.T
        px = (ph[:, 0] / ph[:, 2]).astype(int)
        py = (ph[:, 1] / ph[:, 2]).astype(int)
        m = np.zeros((H, W), np.uint8)
        ok = (px >= 0) & (px < W) & (py >= 0) & (py < H)
        m[py[ok], px[ok]] = 1
        import cv2 as cv

        masks_world.append(cv.dilate(m, np.ones((3, 3), np.uint8)))
    wms_world = np.stack(wms_world)
    masks_world = np.stack(masks_world)
    scale_mats = np.tile(scale_mat[None], (len(wms_world), 1, 1))

    # object-frame verts + scale_mats: inside the hull
    mem = hull_membership(v1, masks_world, wms_world, dilate=4,
                          scale_mats=scale_mats)
    assert mem.min() > 0.9
    # without the composition the object-frame verts are in the WRONG frame
    mem_wrong = hull_membership(v1, masks_world, wms_world, dilate=4)
    assert mem_wrong.min() < mem.min()


def test_edge_stats_detects_open_mesh():
    v, f = cube_mesh([0, 0, 0], 1.0)
    assert edge_stats(f)["watertight"]
    open_stats = edge_stats(f[:-1])  # remove one face -> 3 boundary edges
    assert not open_stats["watertight"]
    assert open_stats["boundary_edges"] == 3
    assert edge_stats(np.zeros((0, 3), np.int64))["watertight"] is False
