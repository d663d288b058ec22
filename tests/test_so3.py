import numpy as np
import pytest
from scipy.spatial.transform import Rotation as Rot
from scipy.spatial.transform import Slerp

from vdnerf_tpu.utils import so3


def test_exp_matches_scipy(rng):
    r = rng.normal(size=(16, 3)).astype(np.float32)
    R = np.asarray(so3.so3_exp(r))
    R_ref = Rot.from_rotvec(r).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_exp_at_zero():
    R = np.asarray(so3.so3_exp(np.zeros(3, dtype=np.float32)))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-6)


def test_exp_grad_finite_at_zero():
    """Learned delta poses start at exactly r=0 (reference poses.py:35-36);
    the exp-map gradient must be finite there."""
    import jax
    import jax.numpy as jnp

    def f(r):
        return jnp.sum(so3.so3_exp(r) @ jnp.array([1.0, 2.0, 3.0]))

    g = np.asarray(jax.grad(f)(jnp.zeros(3)))
    assert np.isfinite(g).all()
    # analytic: d(R v)/dr at r=0 is -skew(v); sum over rows
    v = np.array([1.0, 2.0, 3.0])
    expected = -np.asarray(so3.vec2skew(v)).sum(axis=0)
    np.testing.assert_allclose(g, expected, atol=1e-5)


def test_make_c2w(rng):
    r = rng.normal(size=3).astype(np.float32) * 0.3
    t = rng.normal(size=3).astype(np.float32)
    c2w = np.asarray(so3.make_c2w(r, t))
    assert c2w.shape == (4, 4)
    np.testing.assert_allclose(c2w[:3, :3], Rot.from_rotvec(r).as_matrix(), atol=1e-5)
    np.testing.assert_allclose(c2w[:3, 3], t, atol=1e-6)
    np.testing.assert_allclose(c2w[3], [0, 0, 0, 1])


def test_quat_roundtrip(rng):
    R = Rot.random(32, random_state=1).as_matrix().astype(np.float32)
    q = so3.mat_to_quat(R)
    R2 = np.asarray(so3.quat_to_mat(q))
    np.testing.assert_allclose(R, R2, atol=1e-5)


@pytest.mark.parametrize("ratio", [0.0, 0.25, 0.5, 1.0])
def test_slerp_matches_scipy(ratio):
    rots = Rot.random(2, random_state=7)
    R0, R1 = rots.as_matrix().astype(np.float32)
    ours = np.asarray(so3.slerp(R0, R1, ratio))
    ref = Slerp([0, 1], rots)(ratio).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_umeyama_recovers_exact_similarity():
    """Shared gauge-fit helper (used by both the cycle and flagship tools
    for learned-camera QC): recovers an exact synthetic (s, R, t), and the
    reflection guard keeps R a proper rotation."""
    rng = np.random.default_rng(3)
    src = rng.normal(size=(24, 3))
    R_true = Rot.random(random_state=11).as_matrix()
    s_true, t_true = 1.37, np.array([0.4, -0.2, 0.9])
    dst = s_true * src @ R_true.T + t_true
    s, R, t = so3.umeyama(src, dst)
    assert abs(s - s_true) < 1e-9
    np.testing.assert_allclose(R, R_true, atol=1e-9)
    np.testing.assert_allclose(t, t_true, atol=1e-9)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-9)
