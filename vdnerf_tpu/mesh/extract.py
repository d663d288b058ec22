"""SDF grid evaluation (jitted, shardable) + surface extraction + PLY I/O.

Capability parity with the reference's mesh path
(``dpt_models/renderer.py:10-41,441-446`` + ``dpt_runner.py:699-713``):

- :func:`extract_fields`: dense SDF sampling of a resolution^3 grid. The
  reference triple-loops 64-point chunks with a GPU->CPU copy per 64^3 block;
  here the whole grid goes through one jitted, chunked evaluation
  (``lax.map`` over static-shape point blocks), optionally sharded over a
  device mesh (the 512^3 = 134M-query workload is embarrassingly parallel).
- :func:`extract_geometry`: -SDF iso-surface at ``threshold`` via the native
  marching-tetrahedra extractor, vertices rescaled to the object bbox.
- :func:`save_ply` / :func:`load_ply`: minimal binary-little-endian PLY
  (replaces the reference's trimesh export, dpt_runner.py:710-711).
"""

from __future__ import annotations

import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from vdnerf_tpu.mesh.native import marching_cubes


def extract_fields(
    bound_min,
    bound_max,
    resolution: int,
    query_fn: Callable[[jax.Array], jax.Array],
    chunk: int = 64**3,
    devices=None,
) -> np.ndarray:
    """Evaluate ``query_fn`` ([N,3] -> [N]) on a dense grid -> [r, r, r].

    ``query_fn`` is wrapped in one jit; points are processed in static-shape
    chunks so the program compiles once regardless of resolution. When
    ``devices`` (a 1-D list) is given, each chunk is sharded over them.
    """
    bound_min = np.asarray(bound_min, dtype=np.float32)
    bound_max = np.asarray(bound_max, dtype=np.float32)
    xs = np.linspace(bound_min[0], bound_max[0], resolution, dtype=np.float32)
    ys = np.linspace(bound_min[1], bound_max[1], resolution, dtype=np.float32)
    zs = np.linspace(bound_min[2], bound_max[2], resolution, dtype=np.float32)
    # build points lazily per chunk to bound host memory at 512^3
    total = resolution**3

    n_dev = len(devices) if devices else 1
    chunk = max(n_dev, (chunk // n_dev) * n_dev)

    query_jit = jax.jit(query_fn)
    sharding = None
    if devices:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.asarray(devices), ("data",))
        sharding = NamedSharding(mesh, P("data"))

    out = np.empty(total, dtype=np.float32)
    yz = resolution * resolution
    for start in range(0, total, chunk):
        stop = min(start + chunk, total)
        idx = np.arange(start, stop)
        pts = np.stack(
            [xs[idx // yz], ys[(idx // resolution) % resolution], zs[idx % resolution]],
            axis=-1,
        )
        n = pts.shape[0]
        if n < chunk:  # pad to the static shape so jit compiles once
            pts = np.concatenate(
                [pts, np.zeros((chunk - n, 3), dtype=np.float32)], axis=0
            )
        pts_dev = jax.device_put(pts, sharding) if sharding else jnp.asarray(pts)
        vals = np.asarray(query_jit(pts_dev)).reshape(-1)
        out[start:stop] = vals[:n]
    return out.reshape(resolution, resolution, resolution)


def extract_geometry(
    bound_min,
    bound_max,
    resolution: int,
    threshold: float,
    query_fn: Callable[[jax.Array], jax.Array],
    devices=None,
) -> tuple[np.ndarray, np.ndarray]:
    """Iso-surface of ``query_fn`` (e.g. -sdf) at ``threshold``.

    Returns (vertices [V,3] in world/bbox coordinates, triangles [T,3]).
    """
    u = extract_fields(bound_min, bound_max, resolution, query_fn, devices=devices)
    vertices, triangles = marching_cubes(u, float(threshold))
    b_min = np.asarray(bound_min, dtype=np.float32)
    b_max = np.asarray(bound_max, dtype=np.float32)
    if len(vertices):
        vertices = vertices / (resolution - 1.0) * (b_max - b_min)[None, :] + b_min[None, :]
    return vertices, triangles


def save_ply(path: str, vertices: np.ndarray, triangles: np.ndarray) -> None:
    """Binary little-endian PLY writer (what trimesh would emit)."""
    vertices = np.asarray(vertices, dtype="<f4")
    triangles = np.asarray(triangles, dtype="<i4")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    header = (
        "ply\n"
        "format binary_little_endian 1.0\n"
        f"element vertex {len(vertices)}\n"
        "property float x\nproperty float y\nproperty float z\n"
        f"element face {len(triangles)}\n"
        "property list uchar int vertex_indices\n"
        "end_header\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(vertices.tobytes())
        counts = np.full((len(triangles), 1), 3, dtype=np.uint8)
        face_block = bytearray()
        for c, tri in zip(counts, triangles):
            face_block += c.tobytes() + tri.tobytes()
        f.write(bytes(face_block))


def load_ply(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Read back a PLY written by :func:`save_ply` (tests/tools)."""
    with open(path, "rb") as f:
        data = f.read()
    header_end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:header_end].decode("ascii").splitlines()
    n_v = n_f = 0
    for line in header:
        if line.startswith("element vertex"):
            n_v = int(line.split()[-1])
        elif line.startswith("element face"):
            n_f = int(line.split()[-1])
    body = data[header_end:]
    verts = np.frombuffer(body, dtype="<f4", count=n_v * 3).reshape(n_v, 3)
    offset = n_v * 12
    tris = np.empty((n_f, 3), dtype=np.int64)
    pos = offset
    for i in range(n_f):
        cnt = body[pos]
        pos += 1
        tris[i] = np.frombuffer(body, dtype="<i4", count=cnt, offset=pos)[:3]
        pos += 4 * cnt
    return verts.copy(), tris
