"""Shared geometry-QC helper (vdnerf_tpu/mesh/qc.py).

The cycle and flagship tools both delegate their extract -> hull-clean ->
Chamfer sequence here; these tests pin the helper's contract: near-zero
Chamfer when reconstruction == ground truth, JSON-safe (RFC 8259) output
for collapsed runs, and PLY side-car writing.
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from test_mesh_clean import _scene
from vdnerf_tpu.mesh.qc import geometry_qc


def sphere_neg_sdf(pts):
    return -(jnp.linalg.norm(pts, axis=-1) - 0.25)


def test_qc_identical_surfaces_chamfer_near_zero(tmp_path):
    masks, wms = _scene()
    prefix = os.path.join(str(tmp_path), "m")
    qc = geometry_qc(
        sphere_neg_sdf, sphere_neg_sdf,
        [-0.6] * 3, [0.6] * 3, 48, masks, wms,
        n_points=20000, ply_prefix=prefix,
    )
    assert qc["raw"]["n_verts"] > 0 and qc["raw"]["watertight"]
    assert qc["clean"]["watertight"]
    # same field both sides: chamfer is sampling noise only
    assert qc["chamfer"]["chamfer"] is not None
    assert qc["chamfer"]["chamfer"] < 0.02
    assert qc["chamfer"]["hausdorff"] < 0.06
    assert os.path.exists(prefix + ".ply")
    assert os.path.exists(prefix + "_clean.ply")
    # report is strict-RFC JSON (no Infinity/NaN literals)
    json.loads(json.dumps(qc, allow_nan=False))


def test_qc_collapsed_field_is_json_safe():
    masks, wms = _scene()

    def empty_neg_sdf(pts):  # SDF positive everywhere -> no iso-surface
        return -(jnp.linalg.norm(pts, axis=-1) + 1.0)

    qc = geometry_qc(
        empty_neg_sdf, sphere_neg_sdf,
        [-0.6] * 3, [0.6] * 3, 32, masks, wms, n_points=1000,
    )
    assert qc["raw"]["n_verts"] == 0
    assert qc["clean"] is None
    assert all(v is None for v in qc["chamfer"].values())
    json.loads(json.dumps(qc, allow_nan=False))


def test_qc_hull_clean_culls_junk_component():
    """A second far-away blob outside every mask must be culled, and the
    chamfer must then match the clean sphere (the blob would otherwise
    dominate accuracy)."""
    masks, wms = _scene()

    def two_blob_neg_sdf(pts):
        d1 = jnp.linalg.norm(pts, axis=-1) - 0.25
        d2 = jnp.linalg.norm(pts - jnp.array([0.45, 0.45, 0.0]), axis=-1) - 0.08
        return -jnp.minimum(d1, d2)

    qc = geometry_qc(
        two_blob_neg_sdf, sphere_neg_sdf,
        [-0.6] * 3, [0.6] * 3, 48, masks, wms, n_points=20000,
    )
    assert qc["clean"]["n_verts"] < qc["raw"]["n_verts"]
    assert qc["chamfer"]["chamfer"] < 0.02


def test_qc_matches_scale_mat_frame():
    """Non-identity scale_mats (real-capture normalized-object frame) keep
    genuine surface un-culled via the P @ scale_mat composition."""
    masks, wms = _scene()
    s = 2.0
    scale = np.eye(4)
    scale[:3, :3] *= s
    # cameras in a frame where world = s * object: rebuild world mats by
    # composing the object-frame P with the INVERSE scale so that
    # P_world @ scale == P_object (the identity-frame ground truth)
    wms_world = np.stack([wm @ np.linalg.inv(scale) for wm in wms])
    scale_mats = np.tile(scale[None], (len(wms), 1, 1))
    qc = geometry_qc(
        sphere_neg_sdf, sphere_neg_sdf,
        [-0.6] * 3, [0.6] * 3, 32, masks, wms_world,
        scale_mats=scale_mats, n_points=2000,
    )
    assert qc["clean"]["n_verts"] > 0
    assert qc["clean"]["hull_culled_verts"] == 0
