from vdnerf_tpu.ops.pallas.sdf_fwd import sdf_value_pallas

__all__ = ["sdf_value_pallas"]
