"""Metrics/observability: TensorBoard scalars + throughput counters.

Keeps the reference's scalar names (dpt_runner.py:244-245,261-267) so runs
are directly comparable in TensorBoard, and adds the TPU north-star counter
(rays/sec) the reference lacks. Falls back to JSONL when tensorboardX is
unavailable.
"""

from __future__ import annotations

import json
import os
import time

try:
    from tensorboardX import SummaryWriter
except ImportError:  # pragma: no cover
    SummaryWriter = None

_SCALAR_MAP = {
    "loss": "Loss/loss",
    "color_loss": "Loss/color_loss",
    "eikonal_loss": "Loss/eikonal_loss",
    "depth_loss": "Loss/depth_loss",
    "mask_loss": "Loss/mask_loss",
    "s_val": "Statistics/s_val",
    "cdf": "Statistics/cdf",
    "weight_max": "Statistics/weight_max",
    "psnr": "Statistics/psnr",
    "psnr_dfeat": "Statistics/psnr_dfeat",
    "rays_per_sec": "Perf/rays_per_sec",
    "lr": "Perf/lr",
}


class MetricsWriter:
    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._tb = SummaryWriter(log_dir=log_dir) if SummaryWriter else None
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")

    def write(self, step: int, metrics: dict) -> None:
        rec = {"step": int(step)}
        for k, v in metrics.items():
            val = float(v)
            rec[k] = val
            if self._tb is not None:
                self._tb.add_scalar(_SCALAR_MAP.get(k, k), val, step)
        self._jsonl.write(json.dumps(rec) + "\n")

    def write_image(self, step: int, tag: str, img) -> None:
        """HWC uint8/float image (reference wavelet/train.py:113-166 logs
        validation images)."""
        if self._tb is not None:
            import numpy as np

            arr = np.asarray(img)
            if arr.dtype != np.uint8:
                arr = (arr * 255).clip(0, 255).astype(np.uint8)
            self._tb.add_image(tag, arr, step, dataformats="HWC")

    def write_histogram(self, step: int, tag: str, values) -> None:
        if self._tb is not None:
            import numpy as np

            self._tb.add_histogram(tag, np.asarray(values), step)

    def flush(self) -> None:
        if self._tb is not None:
            self._tb.flush()
        self._jsonl.flush()

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        self._jsonl.close()


class Throughput:
    """Simple rays/sec EMA over train steps."""

    def __init__(self, batch_size: int):
        self.batch_size = batch_size
        self._last = None
        self.rays_per_sec = 0.0

    def tick(self, n_steps: int = 1) -> float:
        """Record that ``n_steps`` train steps completed since the last tick
        (>1 for the multi-step-per-dispatch path)."""
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            inst = n_steps * self.batch_size / max(dt, 1e-9)
            self.rays_per_sec = (
                inst if self.rays_per_sec == 0.0
                else 0.9 * self.rays_per_sec + 0.1 * inst
            )
        self._last = now
        return self.rays_per_sec
