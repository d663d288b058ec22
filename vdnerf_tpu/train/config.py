"""Typed training configuration, built from the HOCON ``train`` block.

Mirrors the reference runner's conf consumption (dpt_runner.py:51-105) into
one frozen dataclass that is hashable and therefore jit-static.
"""

from __future__ import annotations

import dataclasses
import logging

from vdnerf_tpu.utils.hocon import Config

log = logging.getLogger(__name__)

# Largest per-dispatch ray batch a single train-step program may compile
# with. Measured on the tunneled v5e (docs/PERF_r03.md §3, BENCH_r04.json):
# monolithic batches roll off gently past 512 (2048 -> 32.5k rays/s vs
# 512 -> 37.5k; a 13-32% cache rolloff, not a cliff), and the axon compiler
# RET_CHECKs (register allocation) outright on the monolithic 4096 program —
# while the same effective batch as grad-accumulated <=2048 microbatches
# keeps full throughput (4096 = 2x2048 -> 38.1k). TrainConfig auto-raises
# grad_accum so the RET_CHECK region is unreachable by default.
MAX_MONOLITHIC_BATCH = 2048


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 5e-4
    learning_rate_alpha: float = 0.05
    end_iter: int = 300_000
    batch_size: int = 512
    validate_resolution_level: int = 4
    warm_up_end: int = 0
    anneal_end: int = 0
    use_white_bkgd: bool = True
    save_freq: int = 10_000
    val_freq: int = 5_000
    val_mesh_freq: int = 10_000
    report_freq: int = 500
    igr_weight: float = 0.1
    mask_weight: float = 0.0
    use_mask: bool = False
    # microbatch count for gradient accumulation (large effective batches;
    # the axon TPU compiler RET_CHECKs on monolithic batch>=4096 programs)
    grad_accum: int = 1
    # training steps fused into one device dispatch (lax.scan): amortizes the
    # host->device call overhead (~3-4 ms/call on the tunneled TPU vs a
    # ~13 ms step). The runner clips this to divide every report/save/val
    # cadence so observable behavior is unchanged.
    steps_per_call: int = 1
    # cosine-lr horizon override (0 = end_iter, the reference schedule):
    # clamps the cosine's end point independently of how long the run
    # trains — steps past lr_end_iter hold the alpha*lr floor. Probe knob
    # for the 25k-camlight plateau (the 25k leg's stretched cosine takes
    # larger photometric steps late; docs/GEOMETRY_r03.md §2c).
    lr_end_iter: int = 0
    # onset iteration for the importance-resampled render core
    # (neus_renderer.n_render_samples): before this iteration the runner
    # trains on the faithful full-width core. Resampling from iteration 0
    # collapses geometry — the early weight estimate is noise, so samples
    # (and the eikonal regularizer's coverage) chase noise peaks in a
    # positive-feedback loop (docs/RESAMPLE_AB_CPU.json) — while switching
    # after the surface has formed keeps the fast core's full speedup.
    resample_from: int = 0
    # depth distillation (wdepth confs)
    extract_depth: bool = False
    depth_start_iter: int = 0
    depth_weight: float = 0.0
    only_depth: bool = False
    depth_before_color: bool = False
    rgb_dims: int = 3
    depth_ramp_iters: int = 5_000  # sigmoid ramp span (dpt_runner.py:167-171)
    # opt-in multiplier on the ramped distillation loss (1.0 = the
    # reference's schedule, which ramps to a full 1.0x L1 over 96 channels;
    # a deliberate divergence knob for geometry-preserving sweeps)
    depth_loss_scale: float = 1.0
    # learned cameras (learn confs)
    learnable: bool = False
    focal_lr: float = 0.0
    pose_lr: float = 0.0
    focal_lr_gamma: float = 1.0
    pose_lr_gamma: float = 1.0
    step_size: int = 1
    start_refine_pose_iter: int = 0
    start_refine_focal_iter: int = 0

    def __post_init__(self):
        # batch-size footgun guard (VERDICT r4 weak #4): a user setting
        # batch_size 4096 monolithic (the reference conf surface allows it,
        # womsk_white.conf:20) would hit the axon RET_CHECK; auto-split into
        # the smallest microbatch count that (a) divides batch_size and
        # (b) keeps every microbatch <= MAX_MONOLITHIC_BATCH. Estimator
        # note: grad_accum averages per-microbatch losses (each normalized
        # by its own mask/eikonal sums) — identical to the monolithic loss
        # when the per-microbatch normalizers are equal (train/step.py).
        accum = max(self.grad_accum, 1)
        if self.batch_size // accum > MAX_MONOLITHIC_BATCH:
            new_accum = -(-self.batch_size // MAX_MONOLITHIC_BATCH)
            while self.batch_size % new_accum:
                new_accum += 1
            log.warning(
                "batch_size %d / grad_accum %d = %d rays per dispatch "
                "exceeds the measured monolithic limit (%d: the axon TPU "
                "compiler RET_CHECKs at 4096, and 2048 already rolls off "
                "13-32%% vs 512 — BENCH_r04.json: 2048 mono 32.5k rays/s < "
                "512 mono 37.5k < 4096 as 2x2048 accum 38.1k); auto-setting "
                "grad_accum=%d. Set grad_accum >= that explicitly to choose "
                "your own split.",
                self.batch_size, accum, self.batch_size // accum,
                MAX_MONOLITHIC_BATCH, new_accum,
            )
            object.__setattr__(self, "grad_accum", new_accum)

    @classmethod
    def from_conf(cls, conf: Config) -> "TrainConfig":
        t = conf["train"]
        extract_depth = t.get_bool("extract_depth", default=False)
        learnable = t.get_bool("focal_learnable", default=False)
        kw = dict(
            learning_rate=t.get_float("learning_rate"),
            learning_rate_alpha=t.get_float("learning_rate_alpha"),
            end_iter=t.get_int("end_iter"),
            batch_size=t.get_int("batch_size"),
            validate_resolution_level=t.get_int("validate_resolution_level"),
            warm_up_end=t.get_int("warm_up_end", default=0),
            anneal_end=t.get_int("anneal_end", default=0),
            use_white_bkgd=t.get_bool("use_white_bkgd"),
            save_freq=t.get_int("save_freq"),
            val_freq=t.get_int("val_freq"),
            val_mesh_freq=t.get_int("val_mesh_freq"),
            report_freq=t.get_int("report_freq"),
            igr_weight=t.get_float("igr_weight"),
            mask_weight=t.get_float("mask_weight"),
            use_mask=t.get_bool("use_mask", default=False),
            grad_accum=t.get_int("grad_accum", default=1),
            steps_per_call=t.get_int("steps_per_call", default=1),
            resample_from=t.get_int("resample_from", default=0),
            lr_end_iter=t.get_int("lr_end_iter", default=0),
            extract_depth=extract_depth,
            rgb_dims=t.get_int("rgb_dims", default=3) if extract_depth else 3,
            learnable=learnable,
        )
        if extract_depth:
            kw.update(
                only_depth=t.get_bool("only_depth", default=False),
                depth_before_color=t.get_bool("depth_before_color", default=False),
                depth_start_iter=t.get_int("depth_start_iter"),
                depth_weight=t.get_float("depth_weight", default=0.0),
                depth_loss_scale=t.get_float("depth_loss_scale", default=1.0),
            )
        if learnable:
            kw.update(
                focal_lr=t.get_float("focal_lr"),
                pose_lr=t.get_float("pose_lr"),
                focal_lr_gamma=t.get_float("focal_lr_gamma"),
                pose_lr_gamma=t.get_float("pose_lr_gamma"),
                step_size=t.get_int("step_size"),
                start_refine_pose_iter=t.get_int("start_refine_pose_iter"),
                start_refine_focal_iter=t.get_int("start_refine_focal_iter"),
            )
        return cls(**kw)
