import numpy as np
import pytest

import jax.numpy as jnp

from vdnerf_tpu.mesh import (
    chamfer_distance,
    extract_geometry,
    mesh_chamfer,
    sample_surface,
)


def sphere_mesh(radius, res=48):
    def neg_sdf(pts):
        return -(jnp.linalg.norm(pts, axis=-1) - radius)

    return extract_geometry([-1, -1, -1], [1, 1, 1], res, 0.0, neg_sdf)


def test_sample_surface_on_sphere():
    v, t = sphere_mesh(0.5)
    pts = sample_surface(v, t, 5000)
    r = np.linalg.norm(pts, axis=-1)
    assert abs(r.mean() - 0.5) < 0.01


def test_chamfer_identical_meshes_near_zero():
    v, t = sphere_mesh(0.5)
    m = mesh_chamfer(v, t, v, t, n_points=20000)
    # sampling-noise floor (~1/sqrt(density)); well below the 0.2 signal in
    # the radius-difference test and the 0.043 grid spacing
    assert m["chamfer"] < 0.02


def test_chamfer_detects_radius_difference():
    v1, t1 = sphere_mesh(0.5)
    v2, t2 = sphere_mesh(0.6)
    m = mesh_chamfer(v1, t1, v2, t2, n_points=20000)
    np.testing.assert_allclose(m["chamfer"], 0.2, atol=0.02)  # 2 x 0.1
    np.testing.assert_allclose(m["accuracy"], 0.1, atol=0.01)


def test_chamfer_point_sets():
    a = np.zeros((10, 3))
    b = np.ones((10, 3))
    m = chamfer_distance(a, b)
    np.testing.assert_allclose(m["chamfer"], 2 * np.sqrt(3), rtol=1e-6)
    np.testing.assert_allclose(m["hausdorff"], np.sqrt(3), rtol=1e-6)
