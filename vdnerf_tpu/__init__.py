"""vdnerf_tpu: a TPU-native (JAX/XLA/Pallas) rebuild of VDN-NeRF.

Re-implements the full capability surface of the reference
(BoifZ/VDN-NeRF: NeuS-style neural implicit surfaces with
view-dependence normalization via monodepth-feature distillation)
as an idiomatic JAX framework:

- ``models``   : positional embedder, SDF / rendering / background-NeRF MLPs,
                 variance scalar, wavelet monodepth encoder/decoder.
- ``ops``      : volume-rendering math (hierarchical up-sampling, inverse-CDF
                 sampling, logistic-CDF alpha compositing) plus Pallas kernels.
- ``parallel`` : device-mesh construction and sharded train steps
                 (data parallelism over rays via ``shard_map`` + ``psum``).
- ``data``     : camera npz conventions, host-side image stores, ray generation.
- ``train``    : jitted train step, losses, LR schedules, the runner CLI.
- ``mesh``     : sharded SDF grid evaluation + native marching cubes + PLY.
- ``io``       : checkpointing (orbax-style), torch-checkpoint import,
                 tensorboard metrics, run recording.
- ``wavelet``  : monodepth side-car (DenseNet encoder, Haar-wavelet decoder,
                 finetune and feature-extraction pipelines).
"""

__version__ = "0.1.0"
