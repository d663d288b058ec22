from vdnerf_tpu.train.builder import build_networks, init_params
from vdnerf_tpu.train.config import TrainConfig
from vdnerf_tpu.train.step import (
    SceneStatic,
    init_state,
    make_loss_fn,
    make_train_scan_step,
    make_train_step,
)

__all__ = [
    "build_networks",
    "init_params",
    "TrainConfig",
    "SceneStatic",
    "init_state",
    "make_loss_fn",
    "make_train_scan_step",
    "make_train_step",
]
