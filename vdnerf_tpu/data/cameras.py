"""Camera models and ray generation — differentiable, in-graph.

The reference generates rays on the host and `.cuda()`s each batch
(poses.py:189-212); here the pixel->ray math is pure jnp so it sits inside
the jitted train step. That is required for learned poses/intrinsics: their
gradients flow through ray generation.

Parity notes:
- :func:`learn_pose_c2w` <-> reference LearnPose (poses.py:16-47): per-camera
  axis-angle + translation composed as a delta on the initial c2w.
- :func:`learn_intrin_K` <-> reference LearnIntrin (poses.py:50-93) with the
  reference's gradient bug FIXED: the reference builds K from
  ``self.fx.item()`` + numpy, silently detaching the focal from autograd; we
  build K with jnp so d(loss)/d(focal) actually flows. Parametrization kept:
  fx = a^2 * W (order 2) or a * W (order 1), principal point fixed at
  (W/2, H/2).
- :func:`pixels_to_rays` <-> poses.py:189-212 (K^-1 p, normalize, rotate).
- :func:`rays_grid` <-> poses.py:168-187 (full-image rays at a resolution
  level, returned [H', W', 3] like the reference after its transpose).
- :func:`interpolate_pose` <-> poses.py:214-252 (slerp rotation + lerp
  translation, via our pure-JAX slerp).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vdnerf_tpu.utils.so3 import make_c2w, slerp


# -- learnable camera parameters --------------------------------------------


def init_pose_params(n_cams: int) -> dict:
    """Zero delta poses (reference poses.py:35-36)."""
    return {
        "r": jnp.zeros((n_cams, 3), dtype=jnp.float32),
        "t": jnp.zeros((n_cams, 3), dtype=jnp.float32),
    }


def learn_pose_c2w(pose_params: dict, init_c2w: jax.Array, cam_id) -> jax.Array:
    """c2w for one camera: exp(r), t as a delta on the init pose."""
    r = pose_params["r"][cam_id]
    t = pose_params["t"][cam_id]
    delta = make_c2w(r, t)
    return delta @ init_c2w[cam_id]


def all_learned_c2w(pose_params: dict, init_c2w: jax.Array) -> jax.Array:
    """[N, 4, 4] learned poses for every camera (batched Rodrigues)."""
    delta = make_c2w(pose_params["r"], pose_params["t"])
    return delta @ init_c2w


def perturb_poses(
    poses, rng, rot_scale: float = 0.025, trans_scale: float = 0.02
):
    """COLMAP-grade camera noise: left-multiply each rotation by a random
    rotvec (~2 deg mean geodesic angle at the default scale — chi(3) mean
    1.6 x 0.025 rad) and jitter translations. Shared by the camera-
    refinement tools (pose_refine_demo, flagship_run --learn)."""
    import numpy as np
    from scipy.spatial.transform import Rotation as Rot

    out = np.array(poses, copy=True)
    for i in range(out.shape[0]):
        out[i, :3, :3] = (
            Rot.from_rotvec(rng.normal(scale=rot_scale, size=3))
            .as_matrix().astype(out.dtype) @ out[i, :3, :3]
        )
        out[i, :3, 3] += rng.normal(scale=trans_scale, size=3)
    return out


def init_focal_params(init_focal: float | None, W: int, order: int = 2) -> dict:
    if init_focal is None:
        coe = 1.0
    elif order == 2:
        coe = float(jnp.sqrt(init_focal / float(W)))
    elif order == 1:
        coe = float(init_focal / float(W))
    else:
        raise ValueError("focal order must be 1 or 2")
    return {"fx": jnp.asarray(coe, dtype=jnp.float32)}


def learn_intrin_K(focal_params: dict, H: int, W: int, order: int = 2) -> jax.Array:
    """Differentiable 4x4 K (fixes the reference's .item() detach bug)."""
    fx = focal_params["fx"]
    f = fx**2 * W if order == 2 else fx * W
    zero = jnp.zeros_like(f)
    one = jnp.ones_like(f)
    K = jnp.stack(
        [
            jnp.stack([f, zero, zero + W / 2.0, zero]),
            jnp.stack([zero, f, zero + H / 2.0, zero]),
            jnp.stack([zero, zero, one, zero]),
            jnp.stack([zero, zero, zero, one]),
        ]
    )
    return K


# -- pixel -> ray math -------------------------------------------------------


def pixels_to_rays(
    pose: jax.Array,
    intrinsic_inv: jax.Array,
    pixels_x: jax.Array,
    pixels_y: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Camera rays for pixel coordinates.

    pose: [4, 4] c2w; intrinsic_inv: [4, 4] (or [3, 3]); pixels: [...].
    Returns (rays_o [..., 3], rays_d [..., 3]) unit-norm directions.
    """
    p = jnp.stack(
        [
            pixels_x.astype(jnp.float32),
            pixels_y.astype(jnp.float32),
            jnp.ones_like(pixels_x, dtype=jnp.float32),
        ],
        axis=-1,
    )
    Kinv = intrinsic_inv[:3, :3]
    p = jnp.einsum("ij,...j->...i", Kinv, p)
    rays_v = p / jnp.linalg.norm(p, axis=-1, keepdims=True)
    rays_v = jnp.einsum("ij,...j->...i", pose[:3, :3], rays_v)
    rays_o = jnp.broadcast_to(pose[:3, 3], rays_v.shape)
    return rays_o, rays_v


def rays_grid(
    pose: jax.Array,
    intrinsic_inv: jax.Array,
    H: int,
    W: int,
    resolution_level: int = 1,
) -> tuple[jax.Array, jax.Array]:
    """Full-image ray grid at a resolution level, [H//l, W//l, 3] pair.

    Matches the reference's linspace(0, W-1, W//l) pixel grid
    (poses.py:172-175) and its output orientation (rows = image rows).
    """
    l = resolution_level
    tx = jnp.linspace(0, W - 1, W // l)
    ty = jnp.linspace(0, H - 1, H // l)
    px, py = jnp.meshgrid(tx, ty, indexing="xy")  # [H//l, W//l]
    return pixels_to_rays(pose, intrinsic_inv, px, py)


def interpolate_pose(
    pose_0: jax.Array, pose_1: jax.Array, ratio
) -> jax.Array:
    """Pose between two cameras: slerp rotation, lerp translation in the
    inverse (w2c) frame — mirrors poses.py:234-249."""
    inv0 = jnp.linalg.inv(pose_0)
    inv1 = jnp.linalg.inv(pose_1)
    rot = slerp(inv0[:3, :3], inv1[:3, :3], ratio)
    trans = (1.0 - ratio) * inv0[:3, 3] + ratio * inv1[:3, 3]
    pose = jnp.eye(4, dtype=pose_0.dtype)
    pose = pose.at[:3, :3].set(rot)
    pose = pose.at[:3, 3].set(trans)
    return jnp.linalg.inv(pose)


def rays_between(
    pose_0: jax.Array,
    pose_1: jax.Array,
    intrinsic_inv: jax.Array,
    ratio,
    H: int,
    W: int,
    resolution_level: int = 1,
) -> tuple[jax.Array, jax.Array]:
    pose = interpolate_pose(pose_0, pose_1, ratio)
    return rays_grid(pose, intrinsic_inv, H, W, resolution_level)
