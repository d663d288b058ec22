"""ctypes binding + on-demand build of the native marching-tetrahedra lib.

Replaces the reference's PyMCubes C++ dependency (renderer.py:6,36). The
shared library is compiled from ``native/marching_tets.cpp`` with g++ on
first use and cached next to the source, keyed by a source hash.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "marching_tets.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")

_lib = None


def _build_lib() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    os.makedirs(_BUILD_DIR, exist_ok=True)
    so_path = os.path.join(_BUILD_DIR, f"libmarching_tets_{digest}.so")
    if not os.path.exists(so_path):
        _compile(so_path)
    return so_path


def _compile(so_path: str) -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", so_path,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _get_lib():
    global _lib
    if _lib is None:
        so_path = _build_lib()
        try:
            lib = ctypes.CDLL(so_path)
        except OSError:
            # a cached .so built on another host may not load (e.g. missing
            # ISA extensions from -march=native) — rebuild for this machine
            os.unlink(so_path)
            _compile(so_path)
            lib = ctypes.CDLL(so_path)
        lib.mt_run.restype = ctypes.c_longlong
        lib.mt_run.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_longlong, ctypes.c_longlong, ctypes.c_longlong,
            ctypes.c_float,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_longlong)),
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_longlong),
        ]
        lib.mt_free.restype = None
        lib.mt_free.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


def marching_cubes(
    field: np.ndarray, iso: float = 0.0
) -> tuple[np.ndarray, np.ndarray]:
    """Extract the iso-surface of a dense [nx, ny, nz] float field.

    Returns (vertices [V, 3] float32 in grid-index coordinates,
    triangles [T, 3] int64) — the same convention as PyMCubes, which the
    caller rescales to the object bbox (reference renderer.py:40).
    """
    lib = _get_lib()
    field = np.ascontiguousarray(field, dtype=np.float32)
    nx, ny, nz = field.shape

    out_verts = ctypes.POINTER(ctypes.c_float)()
    out_tris = ctypes.POINTER(ctypes.c_longlong)()
    n_verts = ctypes.c_longlong()
    n_tris = ctypes.c_longlong()

    rc = lib.mt_run(
        field.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nx, ny, nz, ctypes.c_float(iso),
        ctypes.byref(out_verts), ctypes.byref(out_tris),
        ctypes.byref(n_verts), ctypes.byref(n_tris),
    )
    if rc != 0:
        raise RuntimeError(f"marching_tets failed with code {rc}")
    if n_verts.value == 0 or n_tris.value == 0:
        lib.mt_free(out_verts)
        lib.mt_free(out_tris)
        return (
            np.zeros((0, 3), dtype=np.float32),
            np.zeros((0, 3), dtype=np.int64),
        )
    try:
        verts = np.ctypeslib.as_array(out_verts, (n_verts.value, 3)).copy()
        tris = np.ctypeslib.as_array(out_tris, (n_tris.value, 3)).copy()
    finally:
        lib.mt_free(out_verts)
        lib.mt_free(out_tris)
    return verts.astype(np.float32), tris.astype(np.int64)
