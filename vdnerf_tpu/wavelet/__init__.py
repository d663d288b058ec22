from vdnerf_tpu.wavelet.haar import (
    haar_dwt2,
    haar_dwt2_multi,
    haar_idwt2,
    haar_idwt2_multi,
)
from vdnerf_tpu.wavelet.model import MonodepthModel, WaveletOpts, create_model

__all__ = [
    "haar_dwt2",
    "haar_dwt2_multi",
    "haar_idwt2",
    "haar_idwt2_multi",
    "MonodepthModel",
    "WaveletOpts",
    "create_model",
]
