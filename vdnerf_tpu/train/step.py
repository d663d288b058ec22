"""The jitted NeuS train step: ray-gen -> render -> losses -> Adam.

One fused XLA program per step, covering the reference's per-iteration work
(dpt_runner.py:190-267): random-pixel ray generation (in-graph, so learned
pose/focal gradients flow), the full NeuS render, the L1-color + eikonal +
mask-BCE (+ sigmoid-ramped distillation) loss, and the optimizer updates —
including the camera-refinement gating (optimizers step only after
``start_refine_pose_iter``, dpt_runner.py:250-257).

Data parallelism: pass ``axis_name`` to get a loss built from ``psum``-ed
global sums; the same function then runs under ``shard_map`` over a device
mesh with the ray batch sharded (see ``vdnerf_tpu.parallel``). The psum'd
sums make the sharded loss/grads bit-equivalent to the single-chip ones
(modulo per-shard perturb RNG decorrelation).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

from vdnerf_tpu.data.cameras import (
    learn_intrin_K,
    learn_pose_c2w,
    pixels_to_rays,
)
from vdnerf_tpu.data.dataset import near_far_from_sphere
from vdnerf_tpu.ops.renderer import NeuSNetworks, render
from vdnerf_tpu.train.config import TrainConfig
from vdnerf_tpu.train.schedules import (
    focal_lr_milestones,
    multistep_schedule,
    neus_lr_schedule,
    pose_lr_milestones,
)

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class SceneStatic:
    """Static (hashable) scene facts needed inside the train step."""

    H: int
    W: int
    focal_order: int = 2
    learnable: bool = False


def _psum(x, axis_name):
    return jax.lax.psum(x, axis_name) if axis_name is not None else x


def depth_ramp_weight(depth_iter, total_iter: int = 5000):
    """Sigmoid distillation-loss ramp (reference dpt_runner.py:167-171)."""
    d = jnp.asarray(depth_iter, jnp.float32)
    return 1.0 / (jnp.exp(-10.0 * (d / total_iter - 0.5)) + 1.0)


def cos_anneal_ratio(step, anneal_end: int):
    """min(1, step/anneal_end); 1.0 when annealing disabled
    (reference dpt_runner.py:304-308)."""
    if anneal_end == 0:
        return 1.0
    return jnp.minimum(1.0, jnp.asarray(step, jnp.float32) / anneal_end)


def rays_from_batch(scene: SceneStatic, cams: Params, batch: dict):
    """In-graph ray generation for a pixel batch.

    ``cams`` holds either static per-camera matrices
    ({'pose_all', 'intrin_inv_all'}) or, when scene.learnable, the learned
    parameters ({'pose': {r,t}, 'focal': {fx}, 'init_c2w'}).
    """
    idx = batch["img_idx"]
    if scene.learnable:
        c2w = learn_pose_c2w(cams["pose"], cams["init_c2w"], idx)
        K = learn_intrin_K(cams["focal"], scene.H, scene.W, scene.focal_order)
        intrin_inv = jnp.linalg.inv(K)
    else:
        c2w = cams["pose_all"][idx]
        intrin_inv = cams["intrin_inv_all"][idx]
    return pixels_to_rays(c2w, intrin_inv, batch["pixels_x"], batch["pixels_y"])


def make_loss_fn(
    nets: NeuSNetworks,
    tcfg: TrainConfig,
    scene: SceneStatic,
    axis_name: str | None = None,
):
    """loss_fn((params, cams), batch, step, key) -> (loss, metrics)."""

    def loss_fn(trainables, batch, step, key):
        params, cams = trainables
        rays_o, rays_d = rays_from_batch(scene, cams, batch)
        near, far = near_far_from_sphere(rays_o, rays_d)
        true_rgb = batch["color"]
        mask_raw = batch["mask"]

        background_rgb = None
        if tcfg.use_white_bkgd:
            background_rgb = jnp.ones((1, 3), dtype=jnp.float32)

        if tcfg.use_mask:
            mask = (mask_raw > 0.1).astype(jnp.float32)
        else:
            mask = jnp.ones_like(mask_raw)
        mask_sum = _psum(jnp.sum(mask), axis_name) + 1e-5

        out = render(
            nets, params, rays_o, rays_d, near, far,
            key=key,
            background_rgb=background_rgb,
            cos_anneal_ratio=cos_anneal_ratio(step, tcfg.anneal_end),
            depth_before_color=tcfg.depth_before_color,
        )

        color_fine = out["color_fine"]
        weight_sum = out["weight_sum"]

        color_error = (color_fine - true_rgb) * mask
        color_fine_loss = _psum(jnp.sum(jnp.abs(color_error)), axis_name) / mask_sum
        sq = _psum(jnp.sum((color_fine - true_rgb) ** 2 * mask), axis_name)
        psnr = 20.0 * jnp.log10(1.0 / jnp.sqrt(sq / (mask_sum * 3.0)))

        eik_num = _psum(jnp.sum(out["gradient_error_num"]), axis_name)
        eik_den = _psum(jnp.sum(out["gradient_error_den"]), axis_name)
        eikonal_loss = eik_num / (eik_den + 1e-5)

        w = jnp.clip(weight_sum, 1e-3, 1.0 - 1e-3)
        bce = -(mask * jnp.log(w) + (1.0 - mask) * jnp.log(1.0 - w))
        n_total = _psum(jnp.asarray(bce.size, jnp.float32), axis_name)
        mask_loss = _psum(jnp.sum(bce), axis_name) / n_total

        loss = (
            color_fine_loss
            + eikonal_loss * tcfg.igr_weight
            + mask_loss * tcfg.mask_weight
        )

        metrics = {
            "loss": loss,
            "color_loss": color_fine_loss,
            "eikonal_loss": eikonal_loss,
            "mask_loss": mask_loss,
            "psnr": psnr,
            "s_val": jnp.mean(out["s_val"]),
            "cdf": _psum(jnp.sum(out["cdf_fine"][:, :1] * mask), axis_name)
            / mask_sum,
            "weight_max": _psum(jnp.sum(out["weight_max"] * mask), axis_name)
            / mask_sum,
        }

        if tcfg.extract_depth:
            gt_feats = batch["feats"]
            dfe = (out["render_feats"] - gt_feats) * mask
            depth_fine_loss = _psum(jnp.sum(jnp.abs(dfe)), axis_name) / mask_sum
            dsq = _psum(
                jnp.sum((out["render_feats"] - gt_feats) ** 2 * mask), axis_name
            )
            psnr_dfeat = 20.0 * jnp.log10(
                1.0 / jnp.sqrt(dsq / (mask_sum * 3.0))
            )
            gate = (step > tcfg.depth_start_iter).astype(jnp.float32)
            depth_iter = jnp.maximum(step - tcfg.depth_start_iter - 1, 0)
            ramp = depth_ramp_weight(depth_iter, tcfg.depth_ramp_iters)
            loss = loss + gate * ramp * tcfg.depth_loss_scale * depth_fine_loss
            metrics["loss"] = loss
            metrics["depth_loss"] = depth_fine_loss
            metrics["psnr_dfeat"] = psnr_dfeat

        return loss, metrics

    return loss_fn


def make_optimizers(tcfg: TrainConfig):
    main_sched = neus_lr_schedule(
        tcfg.learning_rate, tcfg.warm_up_end,
        tcfg.lr_end_iter or tcfg.end_iter,
        tcfg.learning_rate_alpha,
    )
    main_opt = optax.adam(learning_rate=main_sched)
    pose_opt = focal_opt = pose_sched = focal_sched = None
    if tcfg.learnable:
        # scale_by_adam + external LR: the reference steps the LR scheduler
        # every iteration but the optimizer only after start_refine, so the
        # LR must be a function of the GLOBAL step, not the update count.
        pose_opt = optax.scale_by_adam()
        focal_opt = optax.scale_by_adam()
        pose_sched = multistep_schedule(
            tcfg.pose_lr,
            pose_lr_milestones(tcfg.warm_up_end, tcfg.end_iter, tcfg.step_size),
            tcfg.pose_lr_gamma,
        )
        focal_sched = multistep_schedule(
            tcfg.focal_lr,
            focal_lr_milestones(tcfg.warm_up_end, tcfg.end_iter, tcfg.step_size),
            tcfg.focal_lr_gamma,
        )
    return main_opt, pose_opt, focal_opt, pose_sched, focal_sched


def init_state(
    params: Params,
    tcfg: TrainConfig,
    cams: Params,
    key: jax.Array,
) -> dict:
    main_opt, pose_opt, focal_opt, _, _ = make_optimizers(tcfg)
    state = {
        "params": params,
        "opt_state": main_opt.init(params),
        "cams": cams,
        "step": jnp.asarray(0, jnp.int32),
        "key": key,
    }
    if tcfg.learnable:
        state["pose_opt_state"] = pose_opt.init(cams["pose"])
        state["focal_opt_state"] = focal_opt.init(cams["focal"])
    return state


def make_train_scan_step(
    nets: NeuSNetworks,
    tcfg: TrainConfig,
    scene: SceneStatic,
    axis_name: str | None = None,
    grad_accum: int = 1,
):
    """K training steps per dispatch: scan_step(state, batches) -> (state,
    stacked metrics [K]).

    ``batches`` is a pixel batch with a leading step axis on every leaf
    (img_idx: [K], pixels_x: [K, B], ...). One host->device dispatch per K
    steps amortizes the per-call overhead (~3-4 ms enqueue + upload against
    a ~13 ms step on the tunneled v5e: measured 30.7k -> 36k+ rays/s
    sustained at K=10). Per-iteration metrics remain available — they come
    back stacked.
    """
    step_fn = make_train_step(nets, tcfg, scene, axis_name, grad_accum)

    def scan_step(state, batches):
        return jax.lax.scan(step_fn, state, batches)

    return scan_step


def make_train_step(
    nets: NeuSNetworks,
    tcfg: TrainConfig,
    scene: SceneStatic,
    axis_name: str | None = None,
    grad_accum: int = 1,
):
    """Returns train_step(state, batch) -> (state, metrics). Pure, jittable.

    ``grad_accum`` > 1 splits the ray batch into that many microbatches and
    accumulates gradients through a ``lax.scan`` before one optimizer step.
    This is the large-effective-batch path: the axon TPU compiler RET_CHECKs
    (register allocation) on the monolithic batch-4096 program, so e.g.
    effective 4096 runs as 2x2048 with identical peak register pressure to
    batch 2048. Semantics: the mean of per-microbatch losses (each
    normalized by its own mask/eikonal sums) — the same estimator
    non-psum'd data parallelism would produce; identical to the monolithic
    loss when the per-microbatch normalizers are equal.
    """
    loss_fn = make_loss_fn(nets, tcfg, scene, axis_name)
    main_opt, pose_opt, focal_opt, pose_sched, focal_sched = make_optimizers(
        tcfg
    )

    def value_and_grad_accum(trainables, batch, step, key):
        if grad_accum <= 1:
            return jax.value_and_grad(loss_fn, has_aux=True)(
                trainables, batch, step, key
            )

        img_idx = batch["img_idx"]

        def split(x):
            x = jnp.asarray(x)
            return x.reshape((grad_accum, -1) + x.shape[1:])

        micro = {
            k: split(v) for k, v in batch.items() if k != "img_idx"
        }
        keys = jax.random.split(key, grad_accum)

        def body(carry, xs):
            acc_g, acc_loss, acc_metrics = carry
            sub_batch, k = xs
            sub_batch = dict(sub_batch, img_idx=img_idx)
            (loss, metrics), g = jax.value_and_grad(
                loss_fn, has_aux=True
            )(trainables, sub_batch, step, k)
            acc_g = jax.tree_util.tree_map(jnp.add, acc_g, g)
            acc_metrics = jax.tree_util.tree_map(
                jnp.add, acc_metrics, metrics
            )
            return (acc_g, acc_loss + loss, acc_metrics), ()

        zero_g = jax.tree_util.tree_map(jnp.zeros_like, trainables)
        # trace one microbatch to get the metrics structure
        first = {k: v[0] for k, v in micro.items()}
        first = dict(first, img_idx=img_idx)
        _, m0 = jax.eval_shape(
            lambda t: loss_fn(t, first, step, keys[0]), trainables
        )
        zero_m = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), m0
        )
        (acc_g, acc_loss, acc_m), _ = jax.lax.scan(
            body, (zero_g, jnp.zeros(()), zero_m), (micro, keys)
        )
        inv = 1.0 / grad_accum
        acc_g = jax.tree_util.tree_map(lambda g: g * inv, acc_g)
        acc_m = jax.tree_util.tree_map(lambda m: m * inv, acc_m)
        return (acc_loss * inv, acc_m), acc_g

    def train_step(state, batch):
        step = state["step"]
        key, sub = jax.random.split(state["key"])
        if axis_name is not None:
            sub = jax.random.fold_in(sub, jax.lax.axis_index(axis_name))

        (loss, metrics), (g_params, g_cams) = value_and_grad_accum(
            (state["params"], state["cams"]), batch, step, sub
        )
        if axis_name is not None:
            g_params = jax.lax.psum(g_params, axis_name)
            g_cams = jax.lax.psum(g_cams, axis_name)

        updates, opt_state = main_opt.update(
            g_params, state["opt_state"], state["params"]
        )
        params = optax.apply_updates(state["params"], updates)

        new_state = dict(
            state,
            params=params,
            opt_state=opt_state,
            step=step + 1,
            key=key,
        )

        if tcfg.learnable:
            refine = step > tcfg.start_refine_pose_iter

            def do_pose(_):
                upd, st = pose_opt.update(
                    g_cams["pose"], state["pose_opt_state"]
                )
                upd = jax.tree_util.tree_map(
                    lambda u: -pose_sched(step) * u, upd
                )
                return optax.apply_updates(state["cams"]["pose"], upd), st

            def skip_pose(_):
                return state["cams"]["pose"], state["pose_opt_state"]

            def do_focal(_):
                upd, st = focal_opt.update(
                    g_cams["focal"], state["focal_opt_state"]
                )
                upd = jax.tree_util.tree_map(
                    lambda u: -focal_sched(step) * u, upd
                )
                return optax.apply_updates(state["cams"]["focal"], upd), st

            def skip_focal(_):
                return state["cams"]["focal"], state["focal_opt_state"]

            new_pose, pose_st = jax.lax.cond(refine, do_pose, skip_pose, None)
            new_focal, focal_st = jax.lax.cond(
                refine, do_focal, skip_focal, None
            )
            new_state["cams"] = dict(
                state["cams"], pose=new_pose, focal=new_focal
            )
            new_state["pose_opt_state"] = pose_st
            new_state["focal_opt_state"] = focal_st

        return new_state, metrics

    return train_step
