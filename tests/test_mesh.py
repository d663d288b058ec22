import os

import jax.numpy as jnp
import numpy as np
import pytest

from vdnerf_tpu.mesh import (
    extract_fields,
    extract_geometry,
    load_ply,
    marching_cubes,
    save_ply,
)


def sphere_field(res=48, radius=0.6):
    g = np.linspace(-1, 1, res, dtype=np.float32)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    return np.sqrt(x**2 + y**2 + z**2) - radius


def test_marching_on_sphere():
    field = -sphere_field()  # reference queries -sdf (renderer.py:446)
    verts, tris = marching_cubes(field, 0.0)
    assert len(verts) > 100 and len(tris) > 100
    assert tris.max() < len(verts)
    # vertices in grid-index coords: map to [-1,1] and check radius
    res = field.shape[0]
    world = verts / (res - 1) * 2.0 - 1.0
    r = np.linalg.norm(world, axis=-1)
    assert abs(r.mean() - 0.6) < 0.01
    assert np.abs(r - 0.6).max() < 0.05


def test_marching_empty():
    field = np.full((8, 8, 8), -1.0, dtype=np.float32)
    verts, tris = marching_cubes(field, 0.0)
    assert len(verts) == 0 and len(tris) == 0


def test_marching_watertight_interior():
    """Every interior edge must be shared by exactly two triangles."""
    field = -sphere_field(res=24)
    verts, tris = marching_cubes(field, 0.0)
    from collections import Counter

    edges = Counter()
    for t in tris:
        for a, b in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            edges[(min(a, b), max(a, b))] += 1
    counts = np.array(list(edges.values()))
    assert (counts == 2).mean() > 0.99  # sphere fully inside the grid


def test_extract_fields_matches_direct():
    def q(pts):
        return jnp.linalg.norm(pts, axis=-1) - 0.5

    u = extract_fields([-1, -1, -1], [1, 1, 1], 32, q, chunk=1000)
    g = np.linspace(-1, 1, 32, dtype=np.float32)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    expected = np.sqrt(x**2 + y**2 + z**2) - 0.5
    np.testing.assert_allclose(u, expected, atol=1e-5)


def test_extract_fields_sharded():
    import jax

    def q(pts):
        return jnp.linalg.norm(pts, axis=-1) - 0.5

    u = extract_fields(
        [-1, -1, -1], [1, 1, 1], 16, q, chunk=2048, devices=jax.devices()
    )
    u_ref = extract_fields([-1, -1, -1], [1, 1, 1], 16, q, chunk=2048)
    np.testing.assert_allclose(u, u_ref, atol=1e-6)


def test_extract_geometry_world_coords():
    def neg_sdf(pts):
        return -(jnp.linalg.norm(pts, axis=-1) - 0.5)

    verts, tris = extract_geometry(
        [-1.01, -1.01, -1.01], [1.01, 1.01, 1.01], 64, 0.0, neg_sdf
    )
    r = np.linalg.norm(verts, axis=-1)
    assert abs(r.mean() - 0.5) < 0.01


def test_ply_roundtrip(tmp_path):
    verts = np.random.default_rng(0).normal(size=(17, 3)).astype(np.float32)
    tris = np.array([[0, 1, 2], [3, 4, 5], [6, 7, 8]], dtype=np.int64)
    p = str(tmp_path / "m.ply")
    save_ply(p, verts, tris)
    v2, t2 = load_ply(p)
    np.testing.assert_allclose(verts, v2, atol=1e-6)
    np.testing.assert_array_equal(tris, t2)
