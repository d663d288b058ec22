"""Flagship-scale convergence run on one TPU chip.

The round-1 evidence for convergence lived at toy dimensions; this script is
the full-scale QC loop the reference runs empirically
(dpt_runner.py:277-288): train the actual womsk_white-dimension model
(8x256 SDF, 4x256 color, 8x256 bg NeRF, 64+64 inside + 32 outside samples,
batch 512) on a nontrivial analytic scene (sphere + torus + bump compound
SDF, 24 shaded views at 256x256), then

- track the masked full-image PSNR curve during training,
- extract the final mesh at 512^3 through the native marching-tets extractor,
- verify the mesh is watertight (every edge shared by exactly 2 triangles),
- measure Chamfer distance against the analytic ground-truth surface
  (the same field extracted at 512^3).

Train modes:

- ``womsk`` (default): the exact womsk_white.conf loss configuration
  (use_mask=False, mask_weight=0, white bkgd, n_outside=32) on a scene with
  a TEXTURED backdrop — the real-capture setting those confs target. The
  bg NeRF has real work to do (modeling the backdrop), so the foreground/
  background factorization is well-posed.
- ``masked``: mask-supervised training on the white-background scene with
  ``n_outside=0``, the classic NeuS wmask recipe. Measured: combining mask
  BCE WITH the background NeRF (a combination no reference conf ships) is
  degenerate — the bg NeRF can satisfy both the color and the mask loss and
  the SDF's zero set leaves the bbox (s_val stuck at init, empty mesh).

PSNR is always reported over the true object masks (kept in eval_mask/ for
the womsk scene), so the two modes are comparable.

Writes results to <out>/flagship_report.json and prints a summary.

Usage: python tools/flagship_run.py [--iters 25000] [--out /tmp/vdn_flagship]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=25000)
    p.add_argument("--out", type=str, default="/tmp/vdn_flagship")
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--views", type=int, default=24)
    p.add_argument("--img-res", type=int, default=256)
    p.add_argument("--val-every", type=int, default=2500)
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--train-mode", choices=["womsk", "masked", "wdepth"],
                   default="womsk")
    p.add_argument("--fused", action="store_true",
                   help="use the fused Pallas MLP kernels")
    p.add_argument("--fast-bg", action="store_true",
                   help="skip_bg_inside: bg NeRF on the outside block only")
    p.add_argument("--render-samples", type=int, default=0,
                   help="importance-resampled render core width "
                   "(RendererConfig.n_render_samples; 0 = faithful)")
    p.add_argument("--resample-from", type=int, default=0,
                   help="phased onset for --render-samples (the runner's "
                   "train.resample_from): faithful core through this "
                   "iteration, resampled core after — one program switch "
                   "at a scan-window boundary")
    p.add_argument("--resample-frac", type=float, default=0.25,
                   help="resample PDF's uniform floor "
                   "(RendererConfig.resample_uniform_frac). Mask-free "
                   "training needs >= 0.5: the default floor's "
                   "concentration prunes the diffuse ladder tails "
                   "(PERF_r03.md section 4 floor sweep)")
    p.add_argument("--learn", action="store_true",
                   help="womsk_learn path: noisy initial poses + learned "
                        "pose/focal refinement")
    p.add_argument("--learn-frozen", action="store_true",
                   help="control for --learn: same noisy poses, frozen "
                        "(no refinement) — isolates the refinement benefit")
    p.add_argument("--shading", choices=["fixed", "camlight", "glossy"],
                   default="fixed",
                   help="'camlight' = light co-located with the camera + "
                        "specular: the view-dependent-radiance setting "
                        "(shape-radiance ambiguity) the VDN paper targets")
    p.add_argument("--geometry", choices=["compound", "arch"],
                   default="compound",
                   help="analytic scene geometry (data/synthetic.py "
                        "GEOMETRIES); the Chamfer ground truth follows it")
    p.add_argument("--depth-loss-scale", type=float, default=1.0,
                   help="wdepth distillation-loss multiplier "
                        "(train.depth_loss_scale). The shipped "
                        "womsk_white_wdepth_tpu.conf operating point is 10 "
                        "(GEOMETRY_r04 section 6 dose-response); default "
                        "stays 1.0 so earlier FLAGSHIP_* wdepth artifacts "
                        "remain comparable")
    p.add_argument("--feat-max-freq", type=float, default=5.0,
                   help="wdepth teacher-feature top frequency (rad per depth "
                        "unit); ~5 matches the smoothness of real wavelet-"
                        "net features, 12 is an adversarially sharp teacher")
    args = p.parse_args(argv)

    from vdnerf_tpu.utils.platforms import apply_jax_platforms_env

    apply_jax_platforms_env()
    import jax

    import jax.numpy as jnp
    import numpy as np

    from vdnerf_tpu.models.precision import enable_bf16

    enable_bf16(not args.fp32)

    from vdnerf_tpu.data.dataset import SceneData
    from vdnerf_tpu.data.rays import RayStore
    from vdnerf_tpu.data.synthetic import make_compound_scene
    from vdnerf_tpu.models.fields import (
        NeRFConfig,
        RenderConfig,
        SDFConfig,
        sdf_value,
    )
    from vdnerf_tpu.ops.renderer import NeuSNetworks, RendererConfig
    from vdnerf_tpu.train import (
        SceneStatic,
        TrainConfig,
        init_params,
        init_state,
        make_train_scan_step,
    )
    from vdnerf_tpu.train.validate import ImageRenderer, val_image_metrics
    from vdnerf_tpu.utils.hocon import Config

    from vdnerf_tpu.models.precision import set_fused_mlp

    if args.fused:
        set_fused_mlp(True)

    os.makedirs(args.out, exist_ok=True)
    print(f"devices: {jax.devices()}", flush=True)

    wdepth = args.train_mode == "wdepth"
    womsk = args.train_mode in ("womsk", "wdepth")
    t_gen = time.time()
    make_compound_scene(
        args.out, n_images=args.views, H=args.img_res, W=args.img_res,
        background="textured" if womsk else "white",
        shading=args.shading, geometry=args.geometry,
    )
    print(f"scene: {args.views} views {args.img_res}^2 "
          f"({args.train_mode}, {args.shading}) rendered in "
          f"{time.time()-t_gen:.0f}s", flush=True)

    conf = Config({
        "dataset": {
            "data_dir": args.out, "img_dir": "image", "depth_dir": "00",
            "render_cameras_name": "image/cameras_sphere.npz",
            "object_cameras_name": "image/cameras_sphere.npz",
        }
    })
    sd = SceneData(conf["dataset"])

    if wdepth:
        # 96-ch teacher features for the distillation branch: multi-frequency
        # sin/cos encodings of the TRUE depth of the analytic scene, saved in
        # the on-disk layout the VDN cycle uses (image/00/<stem>.npy, NCHW;
        # reference dpt_runner.py getfeats -> wavelet predict). A stand-in
        # for the wavelet net's 96-ch statistics with the same loss path,
        # schedule, and store-side normalization.
        from vdnerf_tpu.data.synthetic import GEOMETRIES, _sphere_trace

        scene_sdf = GEOMETRIES[args.geometry][0]

        fH, fW = args.img_res // 2, args.img_res // 2
        feat_dir = os.path.join(args.out, "image", "00")
        os.makedirs(feat_dir, exist_ok=True)
        freqs = np.linspace(0.5, args.feat_max_freq, 48)
        t_feat = time.time()
        for i in range(sd.n_images):
            c2w = sd.pose_all[i].astype(np.float64)
            Kinv = np.linalg.inv(sd.intrinsics_all[i][:3, :3]).astype(
                np.float64
            )
            xs, ys = np.meshgrid(np.arange(fW), np.arange(fH))
            pix = np.stack(
                [(xs + 0.5) * sd.W / fW, (ys + 0.5) * sd.H / fH,
                 np.ones_like(xs)], axis=-1,
            ).astype(np.float64)
            d = pix @ Kinv.T
            d /= np.linalg.norm(d, axis=-1, keepdims=True)
            d = d @ c2w[:3, :3].T
            o = np.broadcast_to(c2w[:3, 3], d.shape)
            t, hit = _sphere_trace(o, d, 0.05, 4.0, sdf=scene_sdf)
            depth = np.where(hit, t, 3.0)
            feats = np.concatenate(
                [np.sin(depth[None] * freqs[:, None, None]),
                 np.cos(depth[None] * freqs[:, None, None])], axis=0
            )
            stem = os.path.splitext(os.path.basename(sd.images_lis[i]))[0]
            np.save(os.path.join(feat_dir, f"{stem}.npy"),
                    feats.astype(np.float32))
        print(f"teacher features: {sd.n_images} views 96x{fH}x{fW} "
              f"in {time.time()-t_feat:.0f}s", flush=True)
        store = RayStore(sd.images_lis, sd.masks_lis,
                         depth_lis=sd.depth_lis, with_depth=True)
    else:
        store = RayStore(sd.images_lis, sd.masks_lis)

    # flagship dimensions: the womsk_white.conf defaults. masked mode drops
    # the bg NeRF (n_outside=0, NeuS wmask recipe) — see module docstring.
    # wdepth adds the 96-ch depth head + NeRF dpt head + ramped distillation
    # loss (womsk_white_wdepth.conf dims).
    dpt_dim = 96
    nets = NeuSNetworks(
        sdf=SDFConfig(), color=RenderConfig(),
        nerf=NeRFConfig(gen_depth_feats=wdepth, dpt_dim=dpt_dim),
        renderer=RendererConfig(n_outside=32 if womsk else 0,
                                skip_bg_inside=args.fast_bg,
                                n_render_samples=args.render_samples,
                                resample_uniform_frac=args.resample_frac),
        depth=RenderConfig(d_out=dpt_dim) if wdepth else None,
    )
    tcfg = TrainConfig(
        batch_size=args.batch, end_iter=args.iters,
        warm_up_end=max(args.iters // 50, 100),
        anneal_end=max(args.iters // 4, 1000),
        use_white_bkgd=True,
        use_mask=not womsk, mask_weight=0.0 if womsk else 0.1,
        extract_depth=wdepth,
        # the reference starts distillation at iter 5000 of 300k with a
        # 5000-iter sigmoid ramp; same early-fraction schedule here
        depth_start_iter=args.iters // 10 if wdepth else 0,
        depth_ramp_iters=max(args.iters // 10, 1) if wdepth else 5000,
        depth_loss_scale=args.depth_loss_scale if wdepth else 1.0,
    )
    if args.learn and args.learn_frozen:
        raise SystemExit("--learn and --learn-frozen are mutually exclusive "
                         "(the frozen run IS the control for --learn)")
    if args.learn or args.learn_frozen:
        # womsk_learn_* path: perturb the true poses (~2 deg mean rotations,
        # 0.02 translations — COLMAP-grade noise); --learn lets the
        # refinement recover photometric consistency, --learn-frozen keeps
        # the same noisy poses static as the control
        from vdnerf_tpu.data.cameras import perturb_poses

        perturbed = perturb_poses(sd.pose_all, np.random.default_rng(5))
    if args.learn:
        import dataclasses as _dc

        from vdnerf_tpu.data.cameras import (
            init_focal_params,
            init_pose_params,
        )

        tcfg = _dc.replace(
            tcfg, learnable=True, focal_lr=5e-4, pose_lr=5e-4,
            focal_lr_gamma=0.9, pose_lr_gamma=0.9,
            step_size=max(args.iters // 50, 100),
            start_refine_pose_iter=-1, start_refine_focal_iter=-1,
        )
    params = init_params(jax.random.PRNGKey(0), nets, 0.3)
    if args.learn:
        cams = {
            "pose": init_pose_params(sd.n_images),
            "focal": init_focal_params(float(sd.focal), sd.W),
            "init_c2w": jnp.asarray(perturbed),
        }
    else:
        cams = {
            "pose_all": jnp.asarray(
                perturbed if args.learn_frozen else sd.pose_all
            ),
            "intrin_inv_all": jnp.asarray(sd.intrinsics_all_inv),
        }
    scene = SceneStatic(H=sd.H, W=sd.W, learnable=args.learn)
    state = init_state(params, tcfg, cams, jax.random.PRNGKey(1))
    # 10 steps per device dispatch (the runner's steps_per_call path):
    # amortizes the ~3-4 ms/call host overhead against the ~13 ms step
    k_scan = 10
    while (args.val_every % k_scan or args.iters % k_scan
           or args.resample_from % k_scan):
        k_scan //= 2  # degrade gracefully for odd CLI settings
    k_scan = max(k_scan, 1)
    scan_step = jax.jit(make_train_scan_step(nets, tcfg, scene))
    faithful_scan_step = None
    if args.render_samples and args.resample_from > 0:
        import dataclasses as _dc

        faithful_scan_step = jax.jit(make_train_scan_step(
            _dc.replace(nets, renderer=_dc.replace(
                nets.renderer, n_render_samples=0)),
            tcfg, scene,
        ))
    img_renderer = ImageRenderer(nets, tcfg, scene)

    def eval_mask_at(idx: int, res_level: int) -> np.ndarray:
        """Object mask for metrics: eval_mask/ for the womsk scene (training
        masks there are dummy all-white), the training mask otherwise."""
        if womsk:
            import cv2 as cv

            stem = os.path.splitext(os.path.basename(sd.images_lis[idx]))[0]
            m = cv.imread(
                os.path.join(args.out, "image", "eval_mask", f"{stem}.png"), 0
            ) / 255.0
            if res_level > 1:
                m = cv.resize(
                    m, (sd.W // res_level, sd.H // res_level),
                    interpolation=cv.INTER_AREA,
                )
            return m[..., None]
        return store.mask_at(idx, res_level)

    def masked_psnr(idx: int, res_level: int) -> tuple[float, float, float]:
        # state["cams"] so learnable runs render through the LEARNED cameras
        out = img_renderer.render_image(
            state["params"], state["cams"], idx, res_level,
            int(state["step"])
        )
        gt = store.image_at(idx, res_level) / 255.0
        mask = (eval_mask_at(idx, res_level) > 0.1).astype(np.float32)
        l1, psnr = val_image_metrics(out["img"], gt, mask)
        return l1, psnr, out["gradient_error"]

    # fixed validation panel: 4 evenly-spaced held-out-ish views, averaged —
    # a single random view per checkpoint made the round-2 PSNR curves swing
    # 5 dB between checkpoints (VERDICT r2 weak #5 / next #4); the fixed
    # 4-view mean is monotone-interpretable
    val_views = [
        int(i) for i in np.linspace(0, sd.n_images - 1, 4).round()
    ]

    curve = []
    last_metrics = {}
    rng = np.random.default_rng(0)
    t0 = time.time()
    startup_s = None
    onset_compile_s = None
    val_wall = 0.0
    for i0 in range(0, args.iters, k_scan):
        idxs = [(i0 + j) % sd.n_images for j in range(k_scan)]
        batches = store.sample_pixel_steps(idxs, tcfg.batch_size, rng)
        fn = (faithful_scan_step
              if faithful_scan_step is not None and i0 < args.resample_from
              else scan_step)
        onset_window = (faithful_scan_step is not None
                        and i0 == args.resample_from and i0 > 0)
        if onset_window:
            # drain queued faithful windows first so the switch window's
            # timer sees only the resample program's compile + one window
            jax.block_until_ready(state["step"])
            t_switch = time.time()
        state, ms = fn(state, batches)
        if i0 == 0:
            # first dispatch absorbs the (remote) XLA compile — time it
            # separately so rays/s reflects steady state, not startup
            # (the round-2 masked-mode "2.3x slowdown" was exactly this)
            jax.block_until_ready(ms["loss"])
            startup_s = time.time() - t0
            print(f"first-dispatch (compile) wall: {startup_s:.0f}s",
                  flush=True)
        elif onset_window:
            # phased-resample runs switch XLA programs here: the first
            # dispatch of the resample program absorbs a SECOND remote
            # compile, which belongs to startup, not steady state
            jax.block_until_ready(ms["loss"])
            onset_compile_s = time.time() - t_switch
            print(f"resample-onset dispatch (second compile) wall: "
                  f"{onset_compile_s:.0f}s", flush=True)
        it = i0 + k_scan
        if it % 500 == 0 or it == k_scan:
            elapsed = time.time() - t0
            m = {name: v[-1] for name, v in ms.items()}
            dl = (f" dfeat {float(m['depth_loss']):.4f}"
                  if "depth_loss" in m else "")
            print(
                f"iter {it} train-psnr {float(m['psnr']):.2f} "
                f"loss {float(m['loss']):.4f} s_val {float(m['s_val']):.4f}"
                f"{dl} [{it * tcfg.batch_size / elapsed:.0f} rays/s]",
                flush=True,
            )
            last_metrics = {n: float(v) for n, v in m.items()}
        if it % args.val_every == 0 or it == args.iters:
            # drain queued async train windows BEFORE starting the val timer,
            # or up to val_every iters of train work get billed to val_wall
            # and steady_rays_per_sec over-reports (the it%500 sync above
            # only covers val_every multiples of 500)
            jax.block_until_ready(ms["loss"])
            t_val = time.time()
            vals = [masked_psnr(v, 2) for v in val_views]
            l1 = float(np.mean([v[0] for v in vals]))
            psnr = float(np.mean([v[1] for v in vals]))
            geik = float(np.mean([v[2] for v in vals]))
            curve.append(
                {"iter": it, "masked_psnr_res2": psnr, "l1": l1,
                 "gradient_error": geik, "n_views": len(val_views),
                 "wall_s": time.time() - t0}
            )
            print(f"  val @ {it}: masked PSNR {psnr:.2f} dB "
                  f"(mean of {len(val_views)} fixed views)  "
                  f"eikonal {geik:.4f}", flush=True)
            val_wall += time.time() - t_val
    train_wall = time.time() - t0
    rays_per_sec = args.iters * tcfg.batch_size / train_wall
    # steady state excludes the compile-absorbing windows (first dispatch +
    # the resample-onset program switch, if any) and the interleaved
    # validation renders
    compile_wall = (startup_s or 0.0) + (onset_compile_s or 0.0)
    compile_windows = int(startup_s is not None) + int(
        onset_compile_s is not None
    )
    steady_rays_per_sec = (
        (args.iters - compile_windows * k_scan) * tcfg.batch_size
        / max(train_wall - compile_wall - val_wall, 1e-9)
        if compile_windows else rays_per_sec
    )
    print(f"trained {args.iters} iters in {train_wall:.0f}s "
          f"({rays_per_sec:.0f} rays/s incl. startup; "
          f"{steady_rays_per_sec:.0f} rays/s steady-state excl. "
          f"{compile_wall:.0f}s compile)", flush=True)

    # persist the trained state so the run is resumable/inspectable
    from vdnerf_tpu.io import checkpoint_path, save_state

    save_state(checkpoint_path(args.out, args.iters), state)

    # final full-res masked PSNR over 4 evenly spaced views
    finals = [
        masked_psnr(i, 1)
        for i in range(0, sd.n_images, max(sd.n_images // 4, 1))
    ]
    final_psnr = float(np.mean([f[1] for f in finals]))
    final_eik = float(np.mean([f[2] for f in finals]))
    print(f"final full-res masked PSNR {final_psnr:.2f} dB "
          f"(eikonal {final_eik:.4f})", flush=True)

    pose_stats = None
    if args.learn:
        from vdnerf_tpu.data.cameras import all_learned_c2w

        learned = np.asarray(all_learned_c2w(
            state["cams"]["pose"], state["cams"]["init_c2w"]
        ))

        def rot_err_deg(a, b):
            R = np.matmul(a[:, :3, :3], np.swapaxes(b[:, :3, :3], 1, 2))
            tr = np.clip((np.trace(R, axis1=1, axis2=2) - 1.0) / 2.0, -1, 1)
            return float(np.degrees(np.arccos(tr)).mean())

        # raw errors vs GT are gauge-limited (photometric self-consistency
        # fixes cameras only up to a similarity; the fields absorb the
        # rest) — quotient the gauge out with a camera-center Umeyama fit,
        # exactly as tools/vdn_cycle_run.py does, so learn-arm pose AND
        # mesh numbers are comparable across both tools
        from vdnerf_tpu.utils.so3 import umeyama

        gt64 = np.asarray(sd.pose_all, np.float64)
        learned64 = np.asarray(learned, np.float64)
        s_g, R_g, t_g = umeyama(learned64[:, :3, 3], gt64[:, :3, 3])
        gauge_sim = (s_g, R_g, t_g)
        aligned = learned64.copy()
        aligned[:, :3, :3] = np.einsum("ij,njk->nik", R_g,
                                       learned64[:, :3, :3])
        aligned[:, :3, 3] = s_g * learned64[:, :3, 3] @ R_g.T + t_g

        def center_err(a, b):
            return float(np.linalg.norm(
                np.asarray(a, np.float64)[:, :3, 3]
                - np.asarray(b, np.float64)[:, :3, 3], axis=-1).mean())

        pose_stats = {
            "init_rot_err_deg": round(rot_err_deg(perturbed, sd.pose_all), 4),
            "final_rot_err_deg": round(rot_err_deg(learned, sd.pose_all), 4),
            "init_center_err": round(center_err(perturbed, sd.pose_all), 5),
            "final_center_err": round(center_err(learned, sd.pose_all), 5),
            "aligned_rot_err_deg": round(rot_err_deg(aligned, gt64), 4),
            "aligned_center_err": round(center_err(aligned, gt64), 5),
            "gauge_scale": round(s_g, 6),
            "gauge_rot_deg": round(float(np.degrees(np.arccos(
                np.clip((np.trace(R_g) - 1.0) / 2.0, -1, 1)))), 4),
            "pose_param_delta_max_r": round(float(
                np.abs(np.asarray(state["cams"]["pose"]["r"])).max()
            ), 5),
            "pose_param_delta_max_t": round(float(
                np.abs(np.asarray(state["cams"]["pose"]["t"])).max()
            ), 5),
            "focal_coef": round(float(
                np.asarray(state["cams"]["focal"]["fx"]).ravel()[0]
            ), 5),
        }
        print(f"pose refine: {pose_stats}", flush=True)

    # 512^3 mesh through the native extractor
    params_f = state["params"]

    if args.learn:
        # learned-camera runs: the reconstruction lives in the learned
        # gauge — query the SDF through the Umeyama similarity so the mesh
        # is extracted in the GT frame and the Chamfer measures surface
        # error with the gauge quotiented out (same transform as
        # tools/vdn_cycle_run.py geometry_qc)
        R_j = jnp.asarray(gauge_sim[1], jnp.float32)
        t_j = jnp.asarray(gauge_sim[2], jnp.float32)

        def neg_sdf(pts):  # pts in the GT frame
            p_l = ((pts - t_j) @ R_j) / gauge_sim[0]
            return -sdf_value(nets.sdf, params_f["sdf"], p_l)[..., 0]
    else:
        def neg_sdf(pts):
            return -sdf_value(nets.sdf, params_f["sdf"], pts)[..., 0]

    # visual-hull cleaning: mask-free training leaves spurious far-field
    # shells GROWN OUT of the true surface (unconstrained SDF); cull
    # triangles outside the multi-view hull of the object masks (the
    # NeuS-ecosystem clean_mesh step; vdnerf_tpu/mesh/clean.py)
    eval_masks = np.stack(
        [
            (eval_mask_at(i, 1)[..., 0] > 0.5)
            for i in range(sd.n_images)
        ]
    ).astype(np.uint8)
    # hull-clip cameras: --learn meshes are gauge-aligned into the GT frame
    # above, so the GT projection matrices are the right hull; the frozen
    # control's reconstruction stays in the noisy frame (per-camera noise
    # is not a coherent similarity — no gauge to quotient), so clip with
    # the cameras the mesh was reconstructed under
    if args.learn:
        world_mats = np.stack(sd.world_mats_np)
    elif args.learn_frozen:
        world_mats = np.stack([
            sd.intrinsics_all[i] @ np.linalg.inv(perturbed[i])
            for i in range(sd.n_images)
        ])
    else:
        world_mats = np.stack(sd.world_mats_np)
    # ground truth: the analytic compound SDF (single source of truth with
    # the scene renderer — vdnerf_tpu/data/synthetic.py); the extract ->
    # clean -> Chamfer sequence is the shared vdnerf_tpu.mesh.qc helper so
    # this tool and the VDN cycle measure geometry identically
    from vdnerf_tpu.data.synthetic import GEOMETRIES
    from vdnerf_tpu.mesh.qc import geometry_qc

    gt_sdf_jnp = GEOMETRIES[args.geometry][1]
    qc = geometry_qc(
        neg_sdf, lambda p: -gt_sdf_jnp(p),
        sd.object_bbox_min, sd.object_bbox_max, args.resolution,
        eval_masks, world_mats,
        ply_prefix=os.path.join(args.out, "flagship_mesh"),
        log=lambda m: print(m, flush=True),
    )
    cmanifold = (
        {k: v for k, v in qc["clean"].items()
         if k in ("n_edges", "boundary_edges", "nonmanifold_edges",
                  "watertight")}
        if qc["clean"] else
        {"n_edges": 0, "boundary_edges": 0, "nonmanifold_edges": 0,
         "watertight": False}
    )
    chamfer = qc["chamfer"]

    report = {
        "config": {
            "iters": args.iters, "batch": args.batch, "views": args.views,
            "img_res": args.img_res, "mesh_res": args.resolution,
            "model": (
                "flagship womsk_white_wdepth dims (8x256 SDF, 64+64+32 "
                "samples, 96-ch depth head)" if wdepth else
                "flagship womsk_white dims (8x256 SDF, 64+64+32 samples)"
            ),
            "train_mode": args.train_mode,
            "shading": args.shading,
            "geometry": args.geometry,
            "learn_cameras": args.learn,
            "learn_frozen_control": args.learn_frozen,
            # learn arms extract the mesh through the camera-center Umeyama
            # similarity (GT frame), so chamfer is gauge-quotiented
            "gauge_aligned_geometry": bool(args.learn),
            "bf16": not args.fp32, "fused_mlp": args.fused,
            "fast_bg": args.fast_bg,
            "render_samples": args.render_samples,
            "resample_from": args.resample_from,
            "resample_frac": args.resample_frac,
            "depth_loss_scale": args.depth_loss_scale if wdepth else None,
        },
        "train_wall_s": round(train_wall, 1),
        "startup_compile_s": round(startup_s, 1) if startup_s else None,
        "resample_onset_compile_s": (
            round(onset_compile_s, 1) if onset_compile_s else None
        ),
        "val_wall_s": round(val_wall, 1),
        "rays_per_sec": round(rays_per_sec, 1),
        "steady_rays_per_sec": round(steady_rays_per_sec, 1),
        "psnr_curve": curve,
        "final_masked_psnr_fullres": round(final_psnr, 3),
        "final_eikonal": round(final_eik, 5),
        "final_train_metrics": last_metrics,
        "pose_refinement": pose_stats,
        "mesh": qc["raw"],
        "mesh_clean": qc["clean"],
        "chamfer": chamfer,
    }
    with open(os.path.join(args.out, "flagship_report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({
        "final_masked_psnr": report["final_masked_psnr_fullres"],
        "chamfer": report["chamfer"]["chamfer"],
        "watertight": cmanifold["watertight"],
        "boundary_edges": cmanifold["boundary_edges"],
        "train_wall_s": report["train_wall_s"],
    }), flush=True)
    return report


if __name__ == "__main__":
    main()
