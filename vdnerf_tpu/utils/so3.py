"""Rotation / rigid-transform utilities in pure JAX (batched, jittable).

Capability parity with the reference's ``dpt_models/lie_group_helper.py``
(vec2skew / Exp / make_c2w, lines 47-81) and the scipy Slerp usage in
``dpt_models/poses.py:214-252`` — rebuilt vectorized so the TPU path never
leaves XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def vec2skew(v: jax.Array) -> jax.Array:
    """[..., 3] axis vectors -> [..., 3, 3] skew-symmetric matrices."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    rows = jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )
    return rows


def so3_exp(r: jax.Array) -> jax.Array:
    """so(3) axis-angle [..., 3] -> SO(3) matrices [..., 3, 3] (Rodrigues).

    Matches the reference's ``Exp`` (lie_group_helper.py:60-69), but is
    batched and — unlike a plain ``norm`` — differentiable at r = 0: learned
    delta poses start at exactly zero (poses.py:35-36), and d|r|/dr is NaN
    there, so the norm is computed as sqrt(|r|^2 + eps).
    """
    skew = vec2skew(r)
    sq = jnp.sum(r * r, axis=-1)[..., None, None]
    # double-where: the untaken branch must not produce inf/NaN in the
    # backward pass (theta powers underflow fp32 near zero)
    small = sq < 1e-8
    safe_sq = jnp.where(small, 1.0, sq)
    theta = jnp.sqrt(safe_sq)
    A = jnp.where(small, 1.0 - sq / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - sq / 24.0, (1.0 - jnp.cos(theta)) / safe_sq)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), skew.shape)
    return eye + A * skew + B * (skew @ skew)


def make_c2w(r: jax.Array, t: jax.Array) -> jax.Array:
    """Axis-angle [..., 3] + translation [..., 3] -> [..., 4, 4] c2w.

    Reference: lie_group_helper.py:72-81.
    """
    R = so3_exp(r)
    batch = r.shape[:-1]
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)  # [..., 3, 4]
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=r.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def mat_to_quat(R: jax.Array) -> jax.Array:
    """[..., 3, 3] rotation matrices -> [..., 4] quaternions (w, x, y, z).

    Shepperd's numerically-stable branch-free formulation.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # four candidate constructions (each proportional to the quaternion,
    # scaled by 2*sqrt(1+diag term)); pick the best-conditioned one
    q0 = jnp.stack([1 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    q1 = jnp.stack(
        [m21 - m12, 1 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1
    )
    q2 = jnp.stack(
        [m02 - m20, m01 + m10, 1 - m00 + m11 - m22, m12 + m21], axis=-1
    )
    q3 = jnp.stack(
        [m10 - m01, m02 + m20, m12 + m21, 1 - m00 - m11 + m22], axis=-1
    )
    cases = jnp.stack([q0, q1, q2, q3], axis=-2)  # [..., 4, 4]
    scores = jnp.stack([tr, m00, m11, m22], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cases, idx[..., None, None], axis=-2)[..., 0, :]
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_mat(q: jax.Array) -> jax.Array:
    """[..., 4] quaternions (w, x, y, z) -> [..., 3, 3] rotation matrices."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        axis=-1,
    )
    row1 = jnp.stack(
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        axis=-1,
    )
    row2 = jnp.stack(
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        axis=-1,
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def slerp(R0: jax.Array, R1: jax.Array, ratio) -> jax.Array:
    """Spherical interpolation between two rotation matrices.

    Replaces the reference's scipy ``Slerp`` (poses.py:239-242) with a pure
    quaternion slerp so novel-view interpolation can stay on-device.
    """
    q0 = mat_to_quat(R0)
    q1 = mat_to_quat(R1)
    dot = jnp.sum(q0 * q1, axis=-1)
    q1 = jnp.where(dot[..., None] < 0, -q1, q1)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(dot)
    sin_theta = jnp.sin(theta)
    # fall back to lerp when the rotations are (nearly) identical
    use_lerp = sin_theta < 1e-6
    w0 = jnp.where(use_lerp, 1.0 - ratio, jnp.sin((1.0 - ratio) * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    w1 = jnp.where(use_lerp, ratio, jnp.sin(ratio * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    q = w0[..., None] * q0 + w1[..., None] * q1
    return quat_to_mat(q)


def umeyama(src, dst):
    """Host-side least-squares similarity (s, R, t) with s*R@src_i + t
    ~= dst_i (Umeyama 1991), fit from 3-D point sets (numpy, QC-path only).

    Photometric self-consistency fixes learned cameras only up to a global
    similarity — the fields absorb the gauge — so learned-vs-GT pose and
    mesh comparisons (tools/vdn_cycle_run.py, tools/flagship_run.py) must
    quotient it out before measuring residuals. Fit from camera centers.
    """
    import numpy as np

    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    mu_s, mu_d = src.mean(0), dst.mean(0)
    sc, dc = src - mu_s, dst - mu_d
    cov = dc.T @ sc / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1.0
    R = U @ S @ Vt
    var_s = (sc ** 2).sum() / len(src)
    s = float(np.trace(np.diag(D) @ S) / var_s)
    t = mu_d - s * R @ mu_s
    return s, R, t
