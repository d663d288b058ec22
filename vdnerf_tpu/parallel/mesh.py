"""Device mesh + sharded training.

The workload is embarrassingly parallel over rays (no sequence axis, no
attention — see SURVEY.md §2.4), so the parallelism strategy is 1-D data
parallelism: a ``('data',)`` mesh over all chips, the ray batch sharded along
it, parameters replicated, and gradients/loss-sums reduced with ``psum``
(riding ICI within a slice — XLA inserts the collectives).

The single-chip and multi-chip train steps share the same loss code
(``make_loss_fn(axis_name=...)``); the psum'd global sums make the sharded
loss numerically identical to the single-chip one.
"""

from __future__ import annotations


import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from vdnerf_tpu.ops.renderer import NeuSNetworks
from vdnerf_tpu.train.config import TrainConfig
from vdnerf_tpu.train.step import SceneStatic, make_train_step

AXIS = "data"


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (AXIS,))


def batch_specs(leading_steps: bool = False) -> dict:
    """PartitionSpecs for a pixel batch: per-ray arrays sharded, scalars
    replicated. With ``leading_steps`` every leaf has an unsharded leading
    step axis (the multi-step-per-dispatch layout)."""
    if leading_steps:
        return {
            "img_idx": P(None),
            "pixels_x": P(None, AXIS),
            "pixels_y": P(None, AXIS),
            "color": P(None, AXIS),
            "mask": P(None, AXIS),
            "feats": P(None, AXIS),
        }
    return {
        "img_idx": P(),
        "pixels_x": P(AXIS),
        "pixels_y": P(AXIS),
        "color": P(AXIS),
        "mask": P(AXIS),
        "feats": P(AXIS),
    }


def shard_batch(batch: dict, mesh: Mesh, leading_steps: bool = False) -> dict:
    """Place a host batch onto the mesh with the canonical shardings."""
    specs = batch_specs(leading_steps)
    return {
        k: jax.device_put(v, NamedSharding(mesh, specs[k]))
        for k, v in batch.items()
    }


def make_sharded_train_step(
    nets: NeuSNetworks,
    tcfg: TrainConfig,
    scene: SceneStatic,
    mesh: Mesh,
    grad_accum: int = 1,
):
    """shard_map'd train step: state replicated, rays sharded, grads psum'd.

    Per-shard perturb RNG is decorrelated by folding in the axis index, so
    multi-chip training is statistically (not bitwise) equivalent to
    single-chip. ``grad_accum`` composes: each shard scans its microbatches,
    then the accumulated grads are psum'd once.
    """
    inner = make_train_step(
        nets, tcfg, scene, axis_name=AXIS, grad_accum=grad_accum
    )

    state_spec = P()  # replicated pytree
    sharded = shard_map(
        inner,
        mesh=mesh,
        in_specs=(state_spec, batch_specs()),
        out_specs=(state_spec, P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_train_scan_step(
    nets: NeuSNetworks,
    tcfg: TrainConfig,
    scene: SceneStatic,
    mesh: Mesh,
    grad_accum: int = 1,
):
    """Multi-step-per-dispatch variant of :func:`make_sharded_train_step`:
    the scan runs INSIDE the shard_map (one collective program per K steps).
    Batches carry a leading step axis (see ``batch_specs(leading_steps=True)``);
    metrics come back stacked [K]."""
    from vdnerf_tpu.train.step import make_train_scan_step

    inner = make_train_scan_step(
        nets, tcfg, scene, axis_name=AXIS, grad_accum=grad_accum
    )
    state_spec = P()
    sharded = shard_map(
        inner,
        mesh=mesh,
        in_specs=(state_spec, batch_specs(leading_steps=True)),
        out_specs=(state_spec, P()),
        check_vma=False,
    )
    return jax.jit(sharded)
