from vdnerf_tpu.io.checkpoints import (
    checkpoint_path,
    import_torch_checkpoint,
    import_torch_pnf_checkpoint,
    iter_from_name,
    latest_checkpoint,
    restore_state,
    save_state,
)
from vdnerf_tpu.io.logging import MetricsWriter, Throughput
from vdnerf_tpu.io.recording import record_run

__all__ = [
    "checkpoint_path",
    "import_torch_checkpoint",
    "import_torch_pnf_checkpoint",
    "iter_from_name",
    "latest_checkpoint",
    "restore_state",
    "save_state",
    "MetricsWriter",
    "Throughput",
    "record_run",
]
