from vdnerf_tpu.mesh.extract import (
    extract_fields,
    extract_geometry,
    load_ply,
    save_ply,
)
from vdnerf_tpu.mesh.native import marching_cubes

__all__ = [
    "extract_fields",
    "extract_geometry",
    "load_ply",
    "save_ply",
    "marching_cubes",
]
