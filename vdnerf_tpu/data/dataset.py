"""Scene dataset: images, masks, cameras_sphere npz conventions.

Host-side loader with capability parity to ``dpt_models/dataset.py``:

- ``load_K_Rt_from_P`` — decompose P = K[R|t] (reference dataset.py:13-34,
  via cv2.decomposeProjectionMatrix; numpy RQ fallback included).
- :class:`SceneData` — image list, per-image ``world_mat_<stem>`` /
  ``scale_mat_<stem>`` from the camera npz, unit-sphere object bbox
  (reference dataset.py:37-109). The npz key convention (filename stems) is
  kept identical for data parity.
- :func:`near_far_from_sphere` — ray-vs-unit-sphere chord midpoint +- 1
  (reference dataset.py:111-118), pure jnp so it lives inside the jitted
  train step.
"""

from __future__ import annotations

import os
from glob import glob

import jax
import jax.numpy as jnp
import numpy as np

try:
    import cv2 as cv
except ImportError:  # pragma: no cover
    cv = None


def _rq3(A: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """RQ decomposition of a 3x3 matrix via flipped QR."""
    # reverse rows, transpose, QR, then undo
    P = np.flipud(np.eye(3))
    A_ = P @ A
    Q_, R_ = np.linalg.qr(A_.T)
    R = P @ R_.T @ P
    Q = P @ Q_.T
    # fix signs so R has a positive diagonal
    signs = np.sign(np.diag(R))
    signs[signs == 0] = 1
    R = R * signs[None, :]
    Q = Q * signs[:, None]
    return R, Q


def load_K_Rt_from_P(filename: str | None, P: np.ndarray | None = None):
    """Decompose a 3x4 projection matrix into intrinsics + c2w pose.

    Matches reference dataset.py:13-34 (K normalized by K[2,2]; pose is the
    camera-to-world transform).
    """
    if P is None:
        lines = open(filename).read().splitlines()
        if len(lines) == 4:
            lines = lines[1:]
        lines = [
            [x[0], x[1], x[2], x[3]] for x in (x.split(" ") for x in lines)
        ]
        P = np.asarray(lines).astype(np.float32).squeeze()

    if cv is not None:
        out = cv.decomposeProjectionMatrix(P)
        K = out[0]
        R = out[1]
        t = out[2]
        t = (t[:3] / t[3])[:, 0]
    else:  # numpy fallback
        M = P[:3, :3]
        K, R = _rq3(M)
        # camera center C solves P [C;1] = 0
        C = -np.linalg.inv(M) @ P[:3, 3]
        t = C

    K = K / K[2, 2]
    intrinsics = np.eye(4)
    intrinsics[:3, :3] = K

    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = R.transpose()
    pose[:3, 3] = t
    return intrinsics, pose


class SceneData:
    """Camera/image metadata for one scene (host side)."""

    def __init__(self, conf):
        self.conf = conf
        self.data_dir = conf.get_string("data_dir")
        self.img_dir = conf.get_string("img_dir")
        self.depth_dir = conf.get_string("depth_dir")
        self.render_cameras_name = conf.get_string("render_cameras_name")
        self.object_cameras_name = conf.get_string("object_cameras_name")
        self.camera_outside_sphere = conf.get_bool(
            "camera_outside_sphere", default=True
        )
        self.scale_mat_scale = conf.get_float("scale_mat_scale", default=1.1)

        self.images_lis = sorted(
            glob(os.path.join(self.data_dir, self.img_dir, "*.png"))
        )
        self.n_images = len(self.images_lis)
        if self.n_images == 0:
            raise FileNotFoundError(
                f"no images in {os.path.join(self.data_dir, self.img_dir)}"
            )
        self.masks_lis = [
            os.path.join(
                self.data_dir, self.img_dir, "mask",
                f"{os.path.splitext(os.path.basename(f))[0]}.png",
            )
            for f in self.images_lis
        ]
        self.depth_lis = [
            os.path.join(
                self.data_dir, self.img_dir, self.depth_dir,
                f"{os.path.splitext(os.path.basename(f))[0]}.npy",
            )
            for f in self.images_lis
        ]
        img0 = cv.imread(self.images_lis[0])
        self.H, self.W = img0.shape[:2]
        self.image_pixels = self.H * self.W

        camera_dict = np.load(
            os.path.join(self.data_dir, self.render_cameras_name)
        )
        self.camera_dict = camera_dict
        stems = [
            os.path.splitext(os.path.basename(f))[0] for f in self.images_lis
        ]
        self.world_mats_np = [
            camera_dict[f"world_mat_{s}"].astype(np.float32) for s in stems
        ]
        self.scale_mats_np = [
            camera_dict[f"scale_mat_{s}"].astype(np.float32) for s in stems
        ]

        intrinsics_all = []
        pose_all = []
        for scale_mat, world_mat in zip(self.scale_mats_np, self.world_mats_np):
            P = (world_mat @ scale_mat)[:3, :4]
            intrinsics, pose = load_K_Rt_from_P(None, P)
            intrinsics_all.append(intrinsics.astype(np.float32))
            pose_all.append(pose.astype(np.float32))
        self.intrinsics_all = np.stack(intrinsics_all)  # [n, 4, 4]
        self.intrinsics_all_inv = np.linalg.inv(self.intrinsics_all)
        self.focal = self.intrinsics_all[0][0, 0]
        self.pose_all = np.stack(pose_all)  # [n, 4, 4]

        object_bbox_min = np.array([-1.01, -1.01, -1.01, 1.0])
        object_bbox_max = np.array([1.01, 1.01, 1.01, 1.0])
        object_scale_mat = self.scale_mats_np[0]
        inv0 = np.linalg.inv(self.scale_mats_np[0])
        object_bbox_min = inv0 @ object_scale_mat @ object_bbox_min[:, None]
        object_bbox_max = inv0 @ object_scale_mat @ object_bbox_max[:, None]
        self.object_bbox_min = object_bbox_min[:3, 0]
        self.object_bbox_max = object_bbox_max[:3, 0]


def near_far_from_sphere(
    rays_o: jax.Array, rays_d: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Near/far as unit-sphere chord midpoint -/+ 1 (reference
    dataset.py:111-118)."""
    a = jnp.sum(rays_d**2, axis=-1, keepdims=True)
    b = 2.0 * jnp.sum(rays_o * rays_d, axis=-1, keepdims=True)
    mid = 0.5 * (-b) / a
    return mid - 1.0, mid + 1.0
