"""Training/evaluation runner: the orchestration layer over the framework.

Capability parity with the reference's ``Runner`` (dpt_runner.py:23-738) and
its CLI mode surface (dpt_runner.py:741-786):

- ``train``               — the 300k-iteration loop with periodic
                            save/validate/mesh and the final all-image eval.
- ``validate_mesh_<it>``  — 512^3 SDF grid -> marching cubes -> world .ply.
- ``interpolate_<i>_<j>`` — 60-frame slerp novel-view video.
- ``getfeats_<it>``       — per-image depth-from-SDF export (the VDN cycle).
- ``valimg_<it>``         — masked+unmasked L1/PSNR over all images.
- ``showcam_<it>``        — camera-pose dump (the reference's open3d viewer
                            depends on a module absent from its repo;
                            here the learned/init poses are exported to npz).

TPU specifics: the train step is one jitted XLA program (sharded over a
('data',) mesh when >1 device is visible); images stay in host RAM and only
pixel batches cross to the device; validation renders run chunked through a
single compiled program.
"""

from __future__ import annotations

import logging
import math
import os
import signal

import jax
import jax.numpy as jnp
import numpy as np

from vdnerf_tpu.data.cameras import init_focal_params, init_pose_params
from vdnerf_tpu.data.dataset import SceneData
from vdnerf_tpu.data.rays import RayStore
from vdnerf_tpu.io import (
    MetricsWriter,
    Throughput,
    checkpoint_path,
    import_torch_checkpoint,
    latest_checkpoint,
    record_run,
    restore_state,
    save_state,
)
from vdnerf_tpu.mesh import extract_geometry, save_ply
from vdnerf_tpu.parallel import (
    make_mesh,
    make_sharded_train_scan_step,
    make_sharded_train_step,
    shard_batch,
)
from vdnerf_tpu.train import (
    SceneStatic,
    TrainConfig,
    build_networks,
    init_params,
    init_state,
    make_train_scan_step,
    make_train_step,
)
from vdnerf_tpu.train.validate import (
    ImageRenderer,
    export_depth_from_sdf,
    interpolate_frames,
    val_image_metrics,
    write_video,
)
from vdnerf_tpu.models.fields import sdf_value
from vdnerf_tpu.utils.hocon import load_conf

try:
    import cv2 as cv
except ImportError:  # pragma: no cover
    cv = None

log = logging.getLogger(__name__)


def _restore_adam_moments(opt_state, mu, nu, count: int):
    """Graft converted torch Adam moments into an optax.adam state.

    ``opt_state`` is the freshly-init'd chain state (ScaleByAdamState,
    schedule/lr state, ...). The mu/nu pytrees mirror the params tree
    (vdnerf_tpu/io/checkpoints.py import_torch_adam_moments); every state
    in the chain that carries a ``count`` (ScaleByAdamState for bias
    correction, ScaleByScheduleState for the LR schedule) gets the torch
    step count so resumed training continues mid-schedule rather than
    restarting warm-up.
    """
    count_arr = jnp.asarray(count, jnp.int32)
    new_states = []
    for s in opt_state:
        fields = getattr(s, "_fields", ())
        if "mu" in fields and "nu" in fields:
            s = s._replace(mu=mu, nu=nu, count=count_arr)
        elif "count" in fields:
            s = s._replace(count=count_arr)
        new_states.append(s)
    return tuple(new_states)


class Runner:
    def __init__(
        self,
        conf_path: str,
        mode: str = "train",
        case: str = "CASE_NAME",
        img_dir: str = "image",
        npz_postfix: str = "",
        is_continue: bool = False,
        seed: int = 0,
    ):
        self.conf_path = conf_path
        self.mode = mode
        self.conf = load_conf(conf_path, case, img_dir, npz_postfix)

        self.base_exp_dir = self.conf.get_string("general.base_exp_dir")
        if img_dir != "image":
            self.base_exp_dir += "_" + img_dir.split("image")[-1]
        os.makedirs(self.base_exp_dir, exist_ok=True)

        self.scene_data = SceneData(self.conf["dataset"])
        self.tcfg = TrainConfig.from_conf(self.conf)
        self.nets = build_networks(self.conf, self.tcfg.extract_depth)
        self.scene = SceneStatic(
            H=self.scene_data.H,
            W=self.scene_data.W,
            focal_order=self.conf.get_int("model.focal.order", default=2)
            if self.tcfg.learnable
            else 2,
            learnable=self.tcfg.learnable,
        )

        key = jax.random.PRNGKey(seed)
        k_params, k_state = jax.random.split(key)
        params = init_params(
            k_params, self.nets,
            self.conf.get_float("model.variance_network.init_val"),
        )
        if self.tcfg.learnable:
            cams = {
                "pose": init_pose_params(self.scene_data.n_images),
                "focal": init_focal_params(
                    float(self.scene_data.focal), self.scene_data.W,
                    self.scene.focal_order,
                ),
                "init_c2w": jnp.asarray(self.scene_data.pose_all),
            }
        else:
            cams = {
                "pose_all": jnp.asarray(self.scene_data.pose_all),
                "intrin_inv_all": jnp.asarray(
                    self.scene_data.intrinsics_all_inv
                ),
            }
        self.state = init_state(params, self.tcfg, cams, k_state)

        self.store = None
        if "mesh" not in mode:
            self.store = RayStore(
                self.scene_data.images_lis,
                self.scene_data.masks_lis,
                self.scene_data.depth_lis,
                with_depth=self.tcfg.extract_depth,
            )

        self.renderer = ImageRenderer(self.nets, self.tcfg, self.scene)
        self.rng = np.random.default_rng(seed)

        if is_continue:
            latest = latest_checkpoint(self.base_exp_dir)
            if latest is not None:
                log.info("resuming from %s", latest)
                self.load_checkpoint(latest)

        if mode.startswith("train"):
            record_run(
                self.base_exp_dir,
                self.conf.get("general.recording", []),
                conf_path,
            )

    # -- checkpointing ------------------------------------------------------

    @property
    def iter_step(self) -> int:
        return int(self.state["step"])

    def save_checkpoint(self) -> str:
        path = checkpoint_path(self.base_exp_dir, self.iter_step)
        save_state(path, self.state)
        if self.tcfg.learnable:
            # separate pose/focal checkpoint, mirroring the reference's
            # two-file scheme (dpt_runner.py:383-401)
            pnf = {
                "cams": self.state["cams"],
                "pose_opt_state": self.state["pose_opt_state"],
                "focal_opt_state": self.state["focal_opt_state"],
                "step": self.state["step"],
            }
            save_state(
                checkpoint_path(self.base_exp_dir, self.iter_step, "pnf"), pnf
            )
        return path

    def load_checkpoint(self, path: str) -> None:
        self.state = restore_state(path, self.state)

    def load_checkpoint_iter(self, iter_step: int) -> None:
        """Load ckpt_<iter>; falls back to a reference torch .pth if present."""
        path = checkpoint_path(self.base_exp_dir, iter_step)
        if os.path.exists(path):
            self.load_checkpoint(path)
            return
        torch_path = os.path.join(
            self.base_exp_dir, "checkpoints", f"ckpt_{iter_step:06d}.pth"
        )
        if os.path.exists(torch_path):
            params, step, moments = import_torch_checkpoint(
                torch_path, self.nets, self.tcfg.extract_depth,
                with_optimizer=True,
            )
            self.state["params"] = params
            self.state["step"] = jnp.asarray(step, jnp.int32)
            if moments is not None:
                mu, nu, count = moments
                self.state["opt_state"] = _restore_adam_moments(
                    self.state["opt_state"], mu, nu, count
                )
                log.info(
                    "imported torch checkpoint %s (params + Adam moments, "
                    "count=%d): continued training resumes with a warm "
                    "optimizer", torch_path, count,
                )
            else:
                log.warning(
                    "imported torch checkpoint %s carries no optimizer "
                    "state: continued training restarts the optimizer from "
                    "zero (evaluation is unaffected)", torch_path,
                )
            self._maybe_load_torch_pnf(iter_step)
            return
        raise FileNotFoundError(path)

    def _maybe_load_torch_pnf(self, iter_step: int) -> None:
        """Restore learned pose/focal from a reference pnf_*.pth if present
        (dpt_runner.py:361-362,383-389)."""
        if not self.tcfg.learnable:
            return
        pnf_path = os.path.join(
            self.base_exp_dir, "pnf_checkpoints", f"pnf_{iter_step:06d}.pth"
        )
        if os.path.exists(pnf_path):
            from vdnerf_tpu.io import import_torch_pnf_checkpoint

            cams, _ = import_torch_pnf_checkpoint(pnf_path)
            self.state["cams"] = dict(self.state["cams"], **cams)

    # -- training -----------------------------------------------------------

    def train(self) -> None:
        if self.conf.get_bool("train.bf16", default=False):
            from vdnerf_tpu.models.precision import enable_bf16

            enable_bf16(True)
        writer = MetricsWriter(os.path.join(self.base_exp_dir, "logs"))
        devices = jax.devices()

        # K steps per device dispatch: K must divide every observable cadence
        # (metric write=10, report/save/val/mesh freqs), the remaining
        # iteration count, AND the resume iteration (so window-end steps are
        # ≡ 0 mod K and land on every event multiple) — behavior is then
        # identical to K=1 (same sampling stream, same event iters) while the
        # ~3-4 ms/call host overhead is paid once per K steps.
        res_step = self.tcfg.end_iter - self.iter_step
        # phased resample onset (tcfg.resample_from): iterations <= the
        # boundary train on the faithful full-width core, the rest on the
        # importance-resampled core — one program switch at a dispatch-window
        # boundary (the gcd clipping below aligns it), costing one extra
        # compile and nothing else. From-zero resampling collapses geometry
        # (docs/RESAMPLE_AB_CPU.json): the early weight estimate is noise.
        resample_boundary = 0
        if (self.nets.renderer.n_render_samples > 0
                and self.tcfg.resample_from > self.iter_step):
            resample_boundary = min(self.tcfg.resample_from,
                                    self.tcfg.end_iter)
        k = max(1, self.tcfg.steps_per_call)
        for m in (10, self.tcfg.report_freq, self.tcfg.save_freq,
                  self.tcfg.val_freq, self.tcfg.val_mesh_freq, res_step,
                  self.iter_step, resample_boundary):
            if m:  # gcd(k, 0) would keep k; iter_step=0 imposes no constraint
                k = math.gcd(k, m)

        def build_step(nets):
            if len(devices) > 1:
                mesh = make_mesh(devices)
                if k > 1:
                    fn = make_sharded_train_scan_step(
                        nets, self.tcfg, self.scene, mesh,
                        grad_accum=self.tcfg.grad_accum,
                    )
                    return fn, lambda b: shard_batch(b, mesh,
                                                     leading_steps=True)
                fn = make_sharded_train_step(
                    nets, self.tcfg, self.scene, mesh,
                    grad_accum=self.tcfg.grad_accum,
                )
                return fn, lambda b: shard_batch(b, mesh)
            maker = make_train_scan_step if k > 1 else make_train_step
            fn = jax.jit(maker(
                nets, self.tcfg, self.scene,
                grad_accum=self.tcfg.grad_accum,
            ))
            return fn, lambda b: b

        if resample_boundary:
            import dataclasses as _dc

            faithful_nets = _dc.replace(
                self.nets,
                renderer=_dc.replace(self.nets.renderer, n_render_samples=0),
            )
            step_fn, place = build_step(faithful_nets)
            # jit traces lazily: the resample program only compiles when the
            # boundary window actually dispatches it
            resample_step_fn, resample_place = build_step(self.nets)
        else:
            step_fn, place = build_step(self.nets)
            resample_step_fn, resample_place = step_fn, place

        # Preemption-safe training (SURVEY §5: the reference has none — its
        # only recovery is manual --is_continue after a crash). TPU jobs get
        # preempted with a SIGTERM grace window; request a checkpoint-and-
        # clean-exit at the next dispatch-window boundary. Resume-from-latest
        # picks the saved iteration up (unaligned iterations are handled by
        # the steps_per_call gcd clipping above).
        self._preempt_signal: int | None = None

        def _request_preempt(signum, _frame):
            self._preempt_signal = signum

        prev_sigterm = None
        try:
            prev_sigterm = signal.signal(signal.SIGTERM, _request_preempt)
        except ValueError:
            pass  # not the main thread (e.g. test harness): no hook

        image_perm = self.rng.permutation(self.scene_data.n_images)
        perm_pos = 0
        throughput = Throughput(self.tcfg.batch_size)

        profile_dir = os.environ.get("VDNERF_PROFILE_DIR")
        # host-side iteration counter: reading self.iter_step mid-loop would
        # block on a device->host transfer (~30 ms RTT on the tunneled TPU),
        # defeating the multi-step-dispatch amortization
        host_step = self.iter_step
        # the finally clause restores the previous SIGTERM handler on EVERY
        # exit path (normal completion, preemption return, exceptions) —
        # multi-leg in-process drivers (tools/vdn_cycle_run.py) call train()
        # repeatedly, and a stale handler would silently swallow SIGTERM for
        # the rest of the process after one failed leg
        try:
            for _ in range(res_step // k):
                # image draw and pixel sampling interleave per step exactly
                # as with K=1 (the permutation refill can land mid-window),
                # so the sampling stream is bit-identical across
                # steps_per_call settings
                step_batches = []
                for _j in range(k):
                    idx = int(image_perm[perm_pos % len(image_perm)])
                    step_batches.append(
                        self.store.sample_pixels(idx, self.tcfg.batch_size,
                                                 self.rng)
                    )
                    perm_pos += 1
                    if perm_pos % len(image_perm) == 0:
                        image_perm = self.rng.permutation(
                            self.scene_data.n_images
                        )
                if profile_dir and host_step <= 10 < host_step + k:
                    jax.profiler.start_trace(profile_dir)
                if k > 1:
                    batch = {
                        name: np.stack([b[name] for b in step_batches])
                        for name in step_batches[0]
                    }
                else:
                    batch = step_batches[0]
                first_step = host_step + 1
                if first_step > resample_boundary:
                    step_fn, place = resample_step_fn, resample_place
                self.state, metrics_k = step_fn(self.state, place(batch))
                host_step += k
                if profile_dir and host_step - k <= 15 < host_step:
                    jax.profiler.stop_trace()

                rays_ps = throughput.tick(k)
                due_steps = [
                    s for s in range(first_step, host_step + 1)
                    if s % 10 == 0 or s <= 1
                    or s % self.tcfg.report_freq == 0
                ]
                if due_steps:
                    # one bulk device->host transfer for the window — each
                    # per-scalar float() costs a full tunnel RTT; windows
                    # with nothing due stay fully async
                    mk = jax.device_get(metrics_k)
                    for s in due_steps:
                        metrics = (
                            {n: v[s - first_step] for n, v in mk.items()}
                            if k > 1 else mk
                        )
                        if s % 10 == 0 or s <= 1:
                            writer.write(
                                s, {**metrics, "rays_per_sec": rays_ps}
                            )
                        if s % self.tcfg.report_freq == 0:
                            log.info(
                                "iter %d loss=%.5f psnr=%.3f rays/s=%.0f",
                                s, float(metrics["loss"]),
                                float(metrics["psnr"]), rays_ps,
                            )
                step = host_step
                if self._preempt_signal is not None:
                    # checkpoint BEFORE the periodic validations: the grace
                    # window after SIGTERM is short, renders can take
                    # minutes
                    self.save_checkpoint()
                    writer.flush()
                    log.warning(
                        "preemption signal %d: checkpoint saved at iter %d; "
                        "rerun with --is_continue to resume",
                        self._preempt_signal, step,
                    )
                    return
                if step % self.tcfg.save_freq == 0:
                    self.save_checkpoint()
                if step % self.tcfg.val_freq == 0:
                    self.validate_image()
                if step % self.tcfg.val_mesh_freq == 0:
                    res, world = 128, False
                    if step % 150000 == 0:
                        res, world = 512, True
                    elif step % 50000 == 0:
                        res = 256
                    self.validate_mesh(world_space=world, resolution=res)
        finally:
            if prev_sigterm is not None:
                signal.signal(signal.SIGTERM, prev_sigterm)
        writer.flush()
        self.val_all_imgs(resolution_level=2, both_mask=True)

    # -- validation ---------------------------------------------------------

    def validate_image(self, idx: int = -1, resolution_level: int = -1) -> None:
        if idx < 0:
            idx = int(self.rng.integers(self.scene_data.n_images))
        if resolution_level < 0:
            resolution_level = self.tcfg.validate_resolution_level
        out = self.renderer.render_image(
            self.state["params"], self.state["cams"], idx, resolution_level,
            self.iter_step,
        )
        img = (out["img"] * 255).clip(0, 255).astype(np.uint8)
        normal = (out["normal"] * 128 + 128).clip(0, 255).astype(np.uint8)
        os.makedirs(
            os.path.join(self.base_exp_dir, "validations_fine"), exist_ok=True
        )
        os.makedirs(os.path.join(self.base_exp_dir, "normals"), exist_ok=True)
        gt = self.store.image_at(idx, resolution_level).astype(np.uint8)
        stacked = np.concatenate([img, gt], axis=0)
        if cv is not None:
            cv.imwrite(
                os.path.join(
                    self.base_exp_dir, "validations_fine",
                    f"{self.iter_step:08d}_0_{idx}.png",
                ),
                stacked,
            )
            cv.imwrite(
                os.path.join(
                    self.base_exp_dir, "normals",
                    f"{self.iter_step:08d}_0_{idx}.png",
                ),
                normal,
            )

    def val_img(
        self, idx: int, resolution_level: int = 1,
        gen_depth_for_finetune: bool = False, both_mask: bool = False,
    ):
        gt = self.store.image_at(idx, resolution_level) / 255.0
        mask = self.store.mask_at(idx, resolution_level)
        if self.tcfg.use_mask or both_mask:
            mask = (mask > 0.1).astype(np.float32)
        else:
            mask = np.ones_like(mask)

        out = self.renderer.render_image(
            self.state["params"], self.state["cams"], idx, resolution_level,
            self.iter_step,
        )
        img = out["img"]

        if gen_depth_for_finetune:
            fname = os.path.basename(self.scene_data.images_lis[idx])
            stem = os.path.splitext(fname)[0]
            npy_path = os.path.join(
                self.scene_data.data_dir, self.scene_data.img_dir,
                "depth_from_sdf", f"sdf_{stem}.npy",
            )
            png_path = os.path.join(
                self.base_exp_dir, "weight_max",
                f"weight_max_{self.iter_step}_{idx}.png",
            )
            export_depth_from_sdf(out["weight_depth"], npy_path, png_path)

        l1, psnr = val_image_metrics(img, gt, mask)
        l1_full = psnr_full = None
        if both_mask:
            ones = np.ones_like(mask)
            l1_full, psnr_full = val_image_metrics(img, gt, ones)
        return l1, psnr, out["gradient_error"], l1_full, psnr_full

    def val_all_imgs(
        self, resolution_level: int = -1,
        gen_depth_for_finetune: bool = False, both_mask: bool = False,
    ) -> dict:
        if resolution_level < 0:
            resolution_level = self.tcfg.validate_resolution_level
        l1s, psnrs, geiks, l1s_f, psnrs_f = [], [], [], [], []
        for idx in range(self.scene_data.n_images):
            l1, psnr, ge, l1f, pf = self.val_img(
                idx, resolution_level, gen_depth_for_finetune, both_mask
            )
            l1s.append(l1)
            psnrs.append(psnr)
            geiks.append(ge)
            if both_mask:
                l1s_f.append(l1f)
                psnrs_f.append(pf)
        summary = {
            "l1": float(np.mean(l1s)),
            "psnr": float(np.mean(psnrs)),
            "gradient_error": float(np.mean(geiks)),
        }
        if both_mask:
            summary["l1_unmasked"] = float(np.mean(l1s_f))
            summary["psnr_unmasked"] = float(np.mean(psnrs_f))
        log.info("val_all_imgs: %s", summary)
        print(summary)
        return summary

    # -- mesh -----------------------------------------------------------------

    def validate_mesh(
        self, world_space: bool = False, resolution: int = 256,
        threshold: float = 0.0,
    ) -> str:
        params = self.state["params"]
        nets = self.nets

        if os.environ.get("VDNERF_MESH_PALLAS", "") in ("1", "true"):
            from vdnerf_tpu.ops.pallas import sdf_value_pallas

            def neg_sdf(pts):
                return -sdf_value_pallas(nets.sdf, params["sdf"], pts)[..., 0]
        else:

            def neg_sdf(pts):
                return -sdf_value(nets.sdf, params["sdf"], pts)[..., 0]

        verts, tris = extract_geometry(
            self.scene_data.object_bbox_min,
            self.scene_data.object_bbox_max,
            resolution, threshold, neg_sdf, devices=jax.devices(),
        )
        if world_space and len(verts):
            sm = self.scene_data.scale_mats_np[0]
            verts = verts * sm[0, 0] + sm[:3, 3][None]
        path = os.path.join(
            self.base_exp_dir, "meshes", f"{self.iter_step:08d}.ply"
        )
        save_ply(path, verts, tris)
        return path

    # -- novel views ----------------------------------------------------------

    def interpolate_view(self, idx0: int, idx1: int) -> str:
        frames = interpolate_frames(
            self.renderer, self.state["params"], self.state["cams"],
            idx0, idx1, step=self.iter_step,
        )
        path = os.path.join(
            self.base_exp_dir, "render",
            f"{self.iter_step:08d}_{idx0}_{idx1}.mp4",
        )
        write_video(path, frames)
        return path

    # -- camera poses -----------------------------------------------------------

    def get_gt_poses(self, cameras_npz_path: str) -> np.ndarray | None:
        """GT c2w poses from a cameras npz (reference dpt_runner.py:618-642).

        Accepts the reference's integer-indexed keys (``world_mat_%d``) as
        well as this framework's stem-keyed convention.
        """
        from vdnerf_tpu.data.dataset import load_K_Rt_from_P

        if not os.path.exists(cameras_npz_path):
            return None
        camera_dict = np.load(cameras_npz_path)
        stems = [
            os.path.splitext(os.path.basename(f))[0]
            for f in self.scene_data.images_lis
        ]
        poses = []
        for i, stem in enumerate(stems):
            for key in (f"world_mat_{stem}", f"world_mat_{i}"):
                if key in camera_dict:
                    break
            else:
                return None
            scale_key = key.replace("world_mat", "scale_mat")
            world_mat = camera_dict[key].astype(np.float32)
            scale_mat = camera_dict.get(
                scale_key, np.eye(4, dtype=np.float32)
            ).astype(np.float32)
            _, pose = load_K_Rt_from_P(None, (world_mat @ scale_mat)[:3, :4])
            poses.append(pose.astype(np.float32))
        return np.stack(poses)

    def show_cam_pose(self, gt_cameras_path: str | None = None) -> str:
        """Export learned vs initial vs GT camera poses: npz + a matplotlib
        frustum PNG (the reference's open3d viewer, dpt_runner.py:644-697,
        imports a module missing from its repo)."""
        from vdnerf_tpu.data.cameras import all_learned_c2w, learn_intrin_K
        from vdnerf_tpu.utils.camvis import plot_cam_poses

        out = {"init_c2w": np.asarray(self.scene_data.pose_all)}
        pose_sets = {"init": out["init_c2w"]}
        fx = float(self.scene_data.focal)
        if self.tcfg.learnable:
            cams = self.state["cams"]
            out["learned_c2w"] = np.asarray(
                all_learned_c2w(cams["pose"], cams["init_c2w"])
            )
            K = learn_intrin_K(
                cams["focal"], self.scene.H, self.scene.W,
                self.scene.focal_order,
            )
            out["learned_K"] = np.asarray(K)
            pose_sets["learned"] = out["learned_c2w"]
            fx = float(out["learned_K"][0, 0])

        if gt_cameras_path is None:
            gt_cameras_path = os.path.join(
                self.scene_data.data_dir,
                self.conf.get_string(
                    "dataset.gt_cameras_name",
                    default=self.scene_data.render_cameras_name,
                ),
            )
        gt = self.get_gt_poses(gt_cameras_path)
        if gt is not None:
            out["gt_c2w"] = gt
            pose_sets["gt"] = gt

        path = os.path.join(
            self.base_exp_dir, "cam_poses", f"pose_{self.iter_step:06d}.npz"
        )
        os.makedirs(os.path.dirname(path), exist_ok=True)
        np.savez(path, **out)
        plot_cam_poses(
            path.replace(".npz", ".png"), pose_sets,
            self.scene.H, self.scene.W, fx,
        )
        return path
