"""Learning-rate schedules.

- :func:`neus_lr_schedule`: linear warmup then cosine decay to
  ``alpha * base_lr`` (reference dpt_runner.py:310-323).
- :func:`multistep_schedule`: torch MultiStepLR equivalent,
  factor = gamma ** (#milestones passed). The reference decays the pose LR at
  every ``step_size`` steps from ``warm_up_end`` (dpt_runner.py:96-97) and —
  faithfully reproduced — the focal LR at exactly the three literal values
  (warm_up_end, end_iter, step_size) because the reference passes a tuple
  where it meant a range (dpt_runner.py:94-95).
"""

from __future__ import annotations

import jax.numpy as jnp


def neus_lr_schedule(
    base_lr: float, warm_up_end: int, end_iter: int, alpha: float
):
    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        warm = step / jnp.maximum(warm_up_end, 1)
        # clip: past the horizon (possible when TrainConfig.lr_end_iter
        # clamps the cosine shorter than the run) hold the alpha*lr floor
        # instead of letting cos(pi*progress) climb back up
        progress = jnp.clip(
            (step - warm_up_end) / jnp.maximum(end_iter - warm_up_end, 1),
            0.0, 1.0,
        )
        cos = (jnp.cos(jnp.pi * progress) + 1.0) * 0.5 * (1 - alpha) + alpha
        factor = jnp.where(step < warm_up_end, warm, cos)
        if warm_up_end == 0:
            factor = cos
        return base_lr * factor

    return schedule


def multistep_schedule(base_lr: float, milestones: tuple[int, ...], gamma: float):
    ms = jnp.asarray(sorted(milestones), dtype=jnp.int32)

    def schedule(step):
        n_passed = jnp.sum(jnp.asarray(step, jnp.int32) >= ms)
        return base_lr * gamma ** n_passed.astype(jnp.float32)

    return schedule


def pose_lr_milestones(warm_up_end: int, end_iter: int, step_size: int):
    return tuple(range(warm_up_end, end_iter, max(step_size, 1)))


def focal_lr_milestones(warm_up_end: int, end_iter: int, step_size: int):
    # faithful to the reference's literal tuple (dpt_runner.py:94-95)
    return (warm_up_end, end_iter, step_size)
