"""Batch-size footgun guard (VERDICT r4 weak #4).

Measured on the tunneled v5e (docs/PERF_r03.md §3, BENCH_r04.json): the
axon TPU compiler RET_CHECKs (register allocation) on the monolithic
batch-4096 train-step program, and monolithic 2048 already rolls off
13-32% vs 512 — while the same effective batch as grad-accumulated <=2048
microbatches keeps full throughput. The reference conf surface freely
allows batch_size = 4096 (its womsk_white.conf batch_size line), so
TrainConfig must make the RET_CHECK region unreachable by default:
auto-raise grad_accum whenever batch_size/grad_accum > MAX_MONOLITHIC_BATCH.
"""

import logging

from vdnerf_tpu.train.config import MAX_MONOLITHIC_BATCH, TrainConfig
from vdnerf_tpu.utils.hocon import Config


def test_default_batches_untouched():
    for b in (128, 512, 1024, 2048):
        assert TrainConfig(batch_size=b).grad_accum == 1


def test_monolithic_4096_auto_splits(caplog):
    with caplog.at_level(logging.WARNING, "vdnerf_tpu.train.config"):
        tcfg = TrainConfig(batch_size=4096)
    assert tcfg.grad_accum == 2
    assert tcfg.batch_size // tcfg.grad_accum <= MAX_MONOLITHIC_BATCH
    assert any("RET_CHECK" in r.message for r in caplog.records)


def test_explicit_grad_accum_respected():
    # a user-chosen split that already stays under the limit is kept as-is
    tcfg = TrainConfig(batch_size=4096, grad_accum=8)
    assert tcfg.grad_accum == 8
    # ... but an explicit split that still lands in the RET_CHECK region is
    # raised (the guard is about the compiled program, not the default)
    tcfg = TrainConfig(batch_size=8192, grad_accum=2)
    assert tcfg.batch_size // tcfg.grad_accum <= MAX_MONOLITHIC_BATCH


def test_non_power_of_two_split_divides():
    tcfg = TrainConfig(batch_size=6144)  # 3 * 2048
    assert tcfg.batch_size % tcfg.grad_accum == 0
    assert tcfg.batch_size // tcfg.grad_accum <= MAX_MONOLITHIC_BATCH


def test_guard_active_through_conf_path():
    """The conf -> TrainConfig path (what the CLI/runner use) is guarded."""
    conf = Config({"train": {
        "learning_rate": 5e-4, "learning_rate_alpha": 0.05,
        "end_iter": 1000, "batch_size": 4096,
        "validate_resolution_level": 4, "use_white_bkgd": True,
        "save_freq": 100, "val_freq": 100, "val_mesh_freq": 100,
        "report_freq": 100, "igr_weight": 0.1, "mask_weight": 0.0,
    }})
    tcfg = TrainConfig.from_conf(conf)
    assert tcfg.batch_size // tcfg.grad_accum <= MAX_MONOLITHIC_BATCH
