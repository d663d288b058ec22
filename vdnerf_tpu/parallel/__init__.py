from vdnerf_tpu.parallel.mesh import (
    make_mesh,
    make_sharded_train_scan_step,
    make_sharded_train_step,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "make_sharded_train_scan_step",
    "make_sharded_train_step",
    "shard_batch",
]
