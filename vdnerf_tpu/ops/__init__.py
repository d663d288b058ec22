from vdnerf_tpu.ops.renderer import (
    NeuSNetworks,
    RendererConfig,
    render,
    render_core,
    render_core_outside,
)
from vdnerf_tpu.ops.sampling import merge_z_vals, sample_pdf, up_sample

__all__ = [
    "NeuSNetworks",
    "RendererConfig",
    "render",
    "render_core",
    "render_core_outside",
    "merge_z_vals",
    "sample_pdf",
    "up_sample",
]
