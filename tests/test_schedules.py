import numpy as np
import pytest

from vdnerf_tpu.train.schedules import (
    focal_lr_milestones,
    multistep_schedule,
    neus_lr_schedule,
    pose_lr_milestones,
)
from vdnerf_tpu.train.step import cos_anneal_ratio, depth_ramp_weight


def test_neus_lr_warmup_and_cosine():
    sched = neus_lr_schedule(5e-4, warm_up_end=5000, end_iter=300_000,
                             alpha=0.05)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(2500)), 5e-4 * 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(sched(5000)), 5e-4, rtol=1e-5)
    # cosine end: alpha * base (reference dpt_runner.py:310-323)
    np.testing.assert_allclose(float(sched(300_000)), 5e-4 * 0.05, rtol=1e-4)
    # midpoint: (1+alpha)/2 * base
    mid = (300_000 + 5000) / 2
    np.testing.assert_allclose(
        float(sched(mid)), 5e-4 * (1 + 0.05) / 2, rtol=1e-3
    )


def test_neus_lr_no_warmup():
    sched = neus_lr_schedule(1e-3, warm_up_end=0, end_iter=100, alpha=0.05)
    np.testing.assert_allclose(float(sched(0)), 1e-3, rtol=1e-6)


def test_neus_lr_end_iter_clamp():
    """TrainConfig.lr_end_iter clamps the cosine horizon shorter than the
    run (the GEOMETRY_r04 §2c lr-stretch probe knob): the schedule is
    IDENTICAL to the short-horizon schedule before the clamp (step.py:185
    passes ``lr_end_iter or end_iter`` as the horizon), and holds the
    alpha*lr floor — not cos climbing back up — after it."""
    short = neus_lr_schedule(5e-4, warm_up_end=500, end_iter=12_000,
                             alpha=0.05)
    # past the horizon: pinned at the floor, for arbitrarily large steps
    floor = 5e-4 * 0.05
    for step in (12_000, 15_000, 25_000, 1_000_000):
        np.testing.assert_allclose(float(short(step)), floor, rtol=1e-4)
    # and monotone non-increasing after warmup (no cosine rebound)
    steps = np.arange(500, 26_000, 250)
    vals = np.array([float(short(s)) for s in steps])
    assert np.all(np.diff(vals) <= 1e-12)


def test_multistep_schedule():
    ms = pose_lr_milestones(warm_up_end=10, end_iter=50, step_size=10)
    assert ms == (10, 20, 30, 40)
    sched = multistep_schedule(1.0, ms, gamma=0.5)
    np.testing.assert_allclose(float(sched(5)), 1.0)
    np.testing.assert_allclose(float(sched(10)), 0.5)
    np.testing.assert_allclose(float(sched(25)), 0.25)
    np.testing.assert_allclose(float(sched(45)), 0.0625)


def test_focal_milestones_reference_quirk():
    """The reference passes the literal tuple (warm_up, end, step) where it
    meant a range (dpt_runner.py:94-95) — reproduced deliberately."""
    assert focal_lr_milestones(5000, 300_000, 500) == (5000, 300_000, 500)


def test_cos_anneal_ratio():
    assert cos_anneal_ratio(0, 0) == 1.0  # disabled -> always 1
    np.testing.assert_allclose(float(cos_anneal_ratio(25, 50)), 0.5)
    np.testing.assert_allclose(float(cos_anneal_ratio(100, 50)), 1.0)


def test_depth_ramp_weight():
    # sigmoid ramp centered at total/2 (reference dpt_runner.py:167-171)
    np.testing.assert_allclose(float(depth_ramp_weight(2500, 5000)), 0.5)
    assert float(depth_ramp_weight(0, 5000)) < 0.01
    assert float(depth_ramp_weight(5000, 5000)) > 0.99
