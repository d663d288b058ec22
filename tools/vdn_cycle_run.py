"""The full 5-step VDN view-dependence-normalization cycle at scale, on TPU,
through the REAL product CLIs (the reference's workflow, SURVEY.md §3.4:
dpt_runner.py train → getfeats → wavelet finetune_for_vdn.py →
wavelet predict.py → dpt_runner.py train wdepth):

  1. train NeuS (flagship womsk dims) on the compound analytic scene
  2. export depth-from-SDF maps        (cli --mode getfeats_<it>)
  3. finetune the wavelet monodepth encoder on those depths
  4. extract the 96-ch VDN features    (wavelet predict CLI)
  5. retrain NeuS with the distillation head consuming those features

tests/test_vdn_cycle.py runs this loop at toy sizes on CPU; this tool is the
at-scale QC evidence (flagship model dims, 256² views, DenseNet-161
encoder). Writes <out>/vdn_cycle_report.json.

Usage: python tools/vdn_cycle_run.py [--iters 12000] [--out /tmp/vdn_cycle]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_CONF = """\
general {{
    base_exp_dir = {exp_dir}
    recording = []
}}
dataset {{
    data_dir = {data_dir}
    img_dir = image
    depth_dir = {depth_dir}
    render_cameras_name = image/{cam_npz}
    object_cameras_name = image/{cam_npz}
}}
train {{
    learning_rate = 5e-4
    learning_rate_alpha = 0.05
    end_iter = {iters}
    batch_size = {batch}
    steps_per_call = 10
    validate_resolution_level = 4
    warm_up_end = {warm_up}
    anneal_end = {anneal}
    use_white_bkgd = True
    save_freq = {iters}
    val_freq = {val_freq}
    val_mesh_freq = {iters}
    report_freq = 500
    igr_weight = {igr_weight}
    mask_weight = 0.0
    use_mask = False
{extra_train}
}}
model {{
    nerf {{
        D = 8, d_in = 4, d_in_view = 3, W = 256,
        multires = 10, multires_view = 4, output_ch = 4, skips = [4],
        rgb_dims = 3, use_viewdirs = True{nerf_extra}
    }}
    sdf_network {{
        d_out = 257
        d_in = 3
        d_hidden = 256
        n_layers = 8
        skip_in = [4]
        multires = 6
        bias = 0.5
        scale = 1.0
        geometric_init = True
        weight_norm = True
    }}
    variance_network {{ init_val = 0.3 }}
    rendering_network {{
        d_feature = 256
        mode = idr
        d_in = 9
        d_out = 3
        d_hidden = 256
        n_layers = 4
        weight_norm = True
        multires_view = 4
        squeeze_out = True
    }}
{depth_block}
    neus_renderer {{
        n_samples = 64
        n_importance = 64
        n_outside = 32
        up_sample_steps = 4
        perturb = 1.0
        skip_bg_inside = {fast_bg}{renderer_extra}
    }}
}}
"""

DEPTH_BLOCK = """\
    depth_extract_network {{
        d_feature = 256
        mode = idr
        d_in = 9
        d_out = {dpt_dim}
        d_hidden = 256
        n_layers = 4
        weight_norm = True
        multires_view = 4
        squeeze_out = True
    }}
"""


# analytic scene geometry for this process's QC ground truths; set once in
# main() from --geometry (module-level so the leg helpers that share a
# Runner don't each thread it through their signatures)
_GEOMETRY = "compound"


def object_masked_psnr(runner, scene_dir, n_views=4, res_level=2):
    """Masked PSNR (+ mean eikonal error) over the TRUE object masks
    (eval_mask/, metrics-only — training uses the womsk dummy white
    masks)."""
    import cv2 as cv
    import numpy as np

    from vdnerf_tpu.train.validate import val_image_metrics

    sd = runner.scene_data
    psnrs, eiks = [], []
    for idx in range(0, sd.n_images, max(sd.n_images // n_views, 1)):
        out = runner.renderer.render_image(
            runner.state["params"], runner.state["cams"], idx, res_level,
            runner.iter_step,
        )
        gt = runner.store.image_at(idx, res_level) / 255.0
        stem = os.path.splitext(os.path.basename(sd.images_lis[idx]))[0]
        m = cv.imread(
            os.path.join(scene_dir, "image", "eval_mask", f"{stem}.png"), 0
        ) / 255.0
        if res_level > 1:
            m = cv.resize(m, (sd.W // res_level, sd.H // res_level),
                          interpolation=cv.INTER_AREA)
        mask = (m[..., None] > 0.1).astype(np.float32)
        _l1, psnr = val_image_metrics(out["img"], gt, mask)
        psnrs.append(psnr)
        eiks.append(out["gradient_error"])
    return float(np.mean(psnrs)), float(np.mean(eiks))


def make_noisy_cameras(scene_dir, seed=5):
    """Write ``image/cameras_sphere_noisy.npz``: the scene's GT cameras with
    COLMAP-grade pose noise (perturb_poses: ~2 deg mean rotations, 0.02
    translations — the same generator flagship_run --learn uses). This
    mirrors the reference's two-npz convention (cameras_sphere.npz = GT,
    cameras_sphere_colmap.npz = the estimated cameras its learn confs point
    at, e.g. confs/womsk_learn_white_wdepth_colmap.conf dataset block).
    Returns (gt_pose_all, noisy_pose_all, gt_world_mats)."""
    import numpy as np

    from vdnerf_tpu.data.cameras import perturb_poses
    from vdnerf_tpu.data.dataset import SceneData
    from vdnerf_tpu.utils.hocon import Config

    conf = Config({"dataset": {
        "data_dir": scene_dir, "img_dir": "image", "depth_dir": "00",
        "render_cameras_name": "image/cameras_sphere.npz",
        "object_cameras_name": "image/cameras_sphere.npz",
    }})
    sd = SceneData(conf["dataset"])
    gt = np.asarray(sd.pose_all, np.float64)
    noisy = perturb_poses(gt, np.random.default_rng(seed))
    cam_npz = {}
    gt_world_mats = []
    for i in range(sd.n_images):
        stem = os.path.splitext(os.path.basename(sd.images_lis[i]))[0]
        K = np.asarray(sd.intrinsics_all[i], np.float64)
        cam_npz[f"world_mat_{stem}"] = (
            K @ np.linalg.inv(noisy[i])
        ).astype(np.float32)
        cam_npz[f"scale_mat_{stem}"] = np.eye(4, dtype=np.float32)
        gt_world_mats.append((K @ np.linalg.inv(gt[i])).astype(np.float32))
    np.savez(os.path.join(scene_dir, "image", "cameras_sphere_noisy.npz"),
             **cam_npz)
    np.savez(os.path.join(scene_dir, "cameras_sphere_noisy.npz"), **cam_npz)
    return gt, noisy, np.stack(gt_world_mats)


def _umeyama(src, dst):
    """Camera-center gauge fit — shared vdnerf_tpu.utils.so3.umeyama (the
    flagship tool gauge-aligns its learn arms with the SAME similarity so
    both tools' learned-camera Chamfer/pose numbers are comparable)."""
    from vdnerf_tpu.utils.so3 import umeyama

    return umeyama(src, dst)


def pose_recovery_stats(runner, gt_pose_all):
    """Learned-camera recovery vs GT: raw errors (gauge included) AND
    similarity-aligned errors (gauge quotiented via _umeyama on camera
    centers). Returns (stats_dict, (s, R, t)) — the similarity maps the
    learned/reconstruction frame into the GT frame and is reused to
    gauge-align the mesh Chamfer and the depth-export QC."""
    import numpy as np

    from vdnerf_tpu.data.cameras import all_learned_c2w

    cams = runner.state["cams"]
    learned = np.asarray(
        all_learned_c2w(cams["pose"], cams["init_c2w"]), np.float64
    )
    init = np.asarray(cams["init_c2w"], np.float64)
    gt = np.asarray(gt_pose_all, np.float64)

    def rot_err_deg(a, b):
        R = np.matmul(a[:, :3, :3], np.swapaxes(b[:, :3, :3], 1, 2))
        tr = np.clip((np.trace(R, axis1=1, axis2=2) - 1.0) / 2.0, -1, 1)
        return float(np.degrees(np.arccos(tr)).mean())

    def center_err(a, b):
        return float(
            np.linalg.norm(a[:, :3, 3] - b[:, :3, 3], axis=-1).mean()
        )

    s, R, t = _umeyama(learned[:, :3, 3], gt[:, :3, 3])
    aligned = learned.copy()
    aligned[:, :3, :3] = np.einsum("ij,njk->nik", R, learned[:, :3, :3])
    aligned[:, :3, 3] = s * learned[:, :3, 3] @ R.T + t
    gauge_angle = float(np.degrees(np.arccos(
        np.clip((np.trace(R) - 1.0) / 2.0, -1, 1)
    )))
    stats = {
        "init_rot_err_deg": round(rot_err_deg(init, gt), 4),
        "init_center_err": round(center_err(init, gt), 5),
        "raw_rot_err_deg": round(rot_err_deg(learned, gt), 4),
        "raw_center_err": round(center_err(learned, gt), 5),
        "aligned_rot_err_deg": round(rot_err_deg(aligned, gt), 4),
        "aligned_center_err": round(center_err(aligned, gt), 5),
        "gauge_scale": round(s, 6),
        "gauge_rot_deg": round(gauge_angle, 4),
        "gauge_trans": round(float(np.linalg.norm(t)), 5),
    }
    return stats, (s, R, t)


def depth_export_qc(runner, scene_dir, n_views=4, res_level=2, sim=None):
    """Accuracy of the depth-from-SDF export against the ANALYTIC surface.

    The getfeats export (argmax-weight sample depth per ray,
    reference dpt_runner.py:449-473) is the INPUT to the next cycle
    iteration (wavelet finetune pseudo-GT). VERDICT r3 weak #3: eikonal
    discipline degrades under distillation and this export is its first
    real consumer — so measure the export error directly: per-view
    |argmax-weight depth − sphere-traced analytic depth| over the true
    object mask (both are distances along the same unit-norm rays)."""
    import cv2 as cv
    import numpy as np

    from vdnerf_tpu.data.cameras import rays_grid
    from vdnerf_tpu.data.synthetic import GEOMETRIES, _sphere_trace

    gt_sdf = GEOMETRIES[_GEOMETRY][0]
    sd = runner.scene_data
    poses, intrin_inv = runner.renderer.resolve_cams(runner.state["cams"])
    abs_errs, rel_errs = [], []
    for idx in range(0, sd.n_images, max(sd.n_images // n_views, 1)):
        out = runner.renderer.render_image(
            runner.state["params"], runner.state["cams"], idx, res_level,
            runner.iter_step,
        )
        wd = np.asarray(out["weight_depth"])[..., 0]
        ro, rd = rays_grid(
            poses[idx], intrin_inv[idx], sd.H, sd.W, res_level
        )
        ro = np.asarray(ro, np.float64)
        rd = np.asarray(rd, np.float64)
        if sim is not None:
            # learned-camera runs: rays live in the reconstruction's gauge-
            # drifted frame; map them into the GT frame (p_gt = s R p + t)
            # before sphere-tracing the analytic surface, and scale the
            # exported depths to GT units
            s_g, R_g, t_g = sim
            ro = s_g * ro @ R_g.T + t_g
            rd = rd @ R_g.T
            wd = wd * s_g
        # trace bounds from the (GT-frame, when sim is set) camera center
        cam_dist = float(np.linalg.norm(ro.reshape(-1, 3)[0]))
        t, hit = _sphere_trace(ro, rd, cam_dist - 1.0, cam_dist + 1.0,
                               sdf=gt_sdf)
        stem = os.path.splitext(os.path.basename(sd.images_lis[idx]))[0]
        m = cv.imread(
            os.path.join(scene_dir, "image", "eval_mask", f"{stem}.png"), 0
        )
        if res_level > 1:
            m = cv.resize(m, (sd.W // res_level, sd.H // res_level),
                          interpolation=cv.INTER_AREA)
        sel = (m > 127) & hit
        if not sel.any():
            continue
        err = np.abs(wd[sel] - t[sel])
        abs_errs.append(err)
        rel_errs.append(err / np.maximum(t[sel], 1e-6))
    if not abs_errs:
        return {"n_views": 0}
    abs_all = np.concatenate(abs_errs)
    rel_all = np.concatenate(rel_errs)
    return {
        "n_views": len(abs_errs),
        "res_level": res_level,
        "abs_mean": round(float(abs_all.mean()), 5),
        "abs_median": round(float(np.median(abs_all)), 5),
        "abs_p95": round(float(np.percentile(abs_all, 95)), 5),
        "rel_mean": round(float(rel_all.mean()), 5),
    }


def geometry_qc(runner, scene_dir, resolution=512, sim=None,
                world_mats=None):
    """512^3 mesh -> visual-hull clean -> Chamfer vs the analytic compound
    surface (VERDICT r2 #1: the cycle must measure GEOMETRY, not just PSNR,
    on both the base and the distilled leg — the paper's central claim is
    that distillation improves it, dpt_runner.py:239-247,
    renderer.py:245-249). Thin adapter over the shared
    vdnerf_tpu.mesh.qc.geometry_qc so the cycle and flagship tools measure
    geometry identically.

    Learned-camera legs pass ``sim`` (the camera-center Umeyama similarity
    from pose_recovery_stats) + GT ``world_mats``: the reconstruction is
    re-expressed in the GT frame before extraction (query at
    p_l = R^T (p_gt - t) / s), so the Chamfer measures surface error with
    the gauge quotiented out and the visual hull uses the GT cameras."""
    import cv2 as cv
    import numpy as np

    from vdnerf_tpu.data.synthetic import GEOMETRIES
    from vdnerf_tpu.mesh.qc import geometry_qc as run_qc
    from vdnerf_tpu.models.fields import sdf_value

    gt_sdf_jnp = GEOMETRIES[_GEOMETRY][1]
    sd = runner.scene_data
    params = runner.state["params"]
    nets = runner.nets

    if sim is not None:
        import jax.numpy as jnp

        s_g, R_g, t_g = sim
        R_j = jnp.asarray(R_g, jnp.float32)
        t_j = jnp.asarray(t_g, jnp.float32)

        def neg_sdf(pts):  # pts in the GT frame
            p_l = ((pts - t_j) @ R_j) / s_g
            return -sdf_value(nets.sdf, params["sdf"], p_l)[..., 0]
    else:
        def neg_sdf(pts):
            return -sdf_value(nets.sdf, params["sdf"], pts)[..., 0]

    eval_masks = []
    for idx in range(sd.n_images):
        stem = os.path.splitext(os.path.basename(sd.images_lis[idx]))[0]
        m = cv.imread(
            os.path.join(scene_dir, "image", "eval_mask", f"{stem}.png"), 0
        )
        eval_masks.append((m > 127).astype(np.uint8))
    qc = run_qc(
        neg_sdf, lambda p: -gt_sdf_jnp(p),
        sd.object_bbox_min, sd.object_bbox_max, resolution,
        np.stack(eval_masks),
        np.stack(sd.world_mats_np) if world_mats is None else world_mats,
    )
    if not qc["raw"]["n_verts"]:
        return {"n_verts": 0, "chamfer": None}
    return {
        "mesh_res": resolution,
        "n_verts": qc["raw"]["n_verts"], "n_tris": qc["raw"]["n_tris"],
        "clean": qc["clean"],
        **qc["chamfer"],
        "wall_s": qc["wall_s"],
    }


def write_conf_file(path, exp_dir, scene_dir, iters, batch, wdepth,
                    depth_weight_scale=1.0, dpt_dim=96,
                    depth_start_iter=None, lr_end_iter=None,
                    igr_weight=0.1, anneal_end=None, warm_up_end=None,
                    render_samples=0, resample_frac=0.25, resample_from=0,
                    learn=False, cam_npz="cameras_sphere.npz"):
    """Render BASE_CONF for one training leg (shared by the full cycle and
    the --skip-to-wdepth continuation). dpt_dim must match the wavelet
    encoder's feature width (96 for densenet, 32 for mobilenet_light).
    depth_start_iter defaults to the leg-relative iters//10 (the reference
    schedule); pass an absolute value to decouple the distillation onset
    from the leg length (the 25k-plateau schedule probe). anneal_end /
    warm_up_end override the remaining leg-relative quantities (iters//4,
    iters//50) for the same purpose — GEOMETRY_r04 §2c.

    render_samples/resample_frac/resample_from plumb the importance-
    resampled render core (RendererConfig.n_render_samples +
    train.resample_from) into a leg, for the resample-on-distillation
    validation arms (VERDICT r4 #1). learn=True writes the reference's
    womsk_learn conf surface (poses/focal learnable, per-run refinement
    from the noisy init in ``cam_npz`` — the cameras_sphere_colmap.npz
    convention, reference dpt_runner.py:88-100 + dpt_models/poses.py)."""
    extra = ""
    if wdepth:
        start = iters // 10 if depth_start_iter is None else depth_start_iter
        extra = (f"    extract_depth = True\n"
                 f"    depth_start_iter = {start}\n"
                 f"    depth_before_color = False\n"
                 f"    depth_loss_scale = {depth_weight_scale}\n"
                 f"    rgb_dims = 3")
    if lr_end_iter:
        extra += f"\n    lr_end_iter = {lr_end_iter}"
    renderer_extra = ""
    if render_samples:
        renderer_extra = (
            f"\n        n_render_samples = {render_samples}"
            f"\n        resample_uniform_frac = {resample_frac}"
        )
        if resample_from:
            extra += f"\n    resample_from = {resample_from}"
    if learn:
        # the reference's learn surface (its womsk_learn_*_colmap.conf):
        # immediate refinement (start_refine_* = -1), stepped-decay pose/
        # focal lrs
        extra += (
            "\n    focal_learnable = True"
            "\n    poses_learnable = True"
            "\n    start_refine_pose_iter = -1"
            "\n    start_refine_focal_iter = -1"
            "\n    focal_lr = 5e-4"
            "\n    pose_lr = 5e-4"
            "\n    focal_lr_gamma = 0.9"
            "\n    pose_lr_gamma = 0.9"
            f"\n    step_size = {max(iters // 50, 100)}"
        )
    with open(path, "w") as f:
        f.write(BASE_CONF.format(
            exp_dir=exp_dir, data_dir=scene_dir, iters=iters,
            igr_weight=igr_weight,
            batch=batch,
            warm_up=(max(iters // 50, 100) if warm_up_end is None
                     else warm_up_end),
            anneal=(max(iters // 4, 1000) if anneal_end is None
                    else anneal_end),
            val_freq=iters // 2,
            extra_train=extra,
            nerf_extra=(f",\n        gen_depth_feats = True, "
                        f"dpt_dim = {dpt_dim}"
                        if wdepth else ""),
            depth_block=(DEPTH_BLOCK.format(dpt_dim=dpt_dim)
                         if wdepth else ""),
            depth_dir="wavelet_feats/0" if wdepth else "00",
            fast_bg="True",
            renderer_extra=renderer_extra,
            cam_npz=cam_npz,
        ))
    return path


def run_wdepth_leg(conf_path, exp_dir, scene_dir, wit, mesh_res, report,
                   seed=0, gt_pose_all=None, gt_world_mats=None):
    """Stage 5 (distilled retrain): train through the real CLI, evaluate
    object-masked PSNR / eikonal / mesh geometry at the leg's final
    checkpoint, and parse the distillation-loss trajectory out of
    metrics.jsonl into ``report``. Shared by the full cycle and
    --skip-to-wdepth so the two report flavors cannot silently diverge.
    ``seed`` feeds the CLI's --seed (host pixel stream + init): every
    archived arm so far is seed 0; non-zero seeds probe whether a
    schedule recipe's formation outcome is seed-robust (GEOMETRY_r04 §2c
    caveat)."""
    import json as _json

    import numpy as np

    from vdnerf_tpu.cli import main as cli_main
    from vdnerf_tpu.runner import Runner

    t5 = time.time()
    cli_main(["--conf", conf_path, "--mode", "train", "--seed", str(seed)])
    report["stages"]["train_wdepth_s"] = round(time.time() - t5, 1)
    runner = Runner(conf_path, mode="eval")
    runner.load_checkpoint_iter(wit)
    psnr, eik = object_masked_psnr(runner, scene_dir)
    report["wdepth_object_masked_psnr_res2"] = round(psnr, 3)
    report["wdepth_eikonal"] = round(eik, 5)
    sim = None
    if gt_pose_all is not None:
        stats, sim = pose_recovery_stats(runner, gt_pose_all)
        report["wdepth_pose_recovery"] = stats
    report["wdepth_geometry"] = geometry_qc(
        runner, scene_dir, mesh_res, sim=sim, world_mats=gt_world_mats
    )
    # the export a NEXT cycle iteration would consume, measured directly
    report["wdepth_depth_export_qc"] = depth_export_qc(
        runner, scene_dir, sim=sim
    )
    with open(os.path.join(exp_dir, "logs", "metrics.jsonl")) as f:
        records = [_json.loads(line) for line in f]
    dlosses = [r["depth_loss"] for r in records if "depth_loss" in r]
    report["distillation"] = {
        "depth_loss_first": round(dlosses[0], 4) if dlosses else None,
        "depth_loss_last": round(dlosses[-1], 4) if dlosses else None,
        "all_losses_finite": bool(
            np.isfinite([r["loss"] for r in records]).all()
        ),
    }
    return report


def wdepth_leg_only(args, scene_dir, wit):
    """--skip-to-wdepth: rerun ONLY the distilled retrain leg (stage 5)
    against the VDN features a completed cycle already extracted into
    --out. The motivating experiment: a 25k mask-free camlight base run
    collapses to the unit-sphere shell (docs/FLAGSHIP_r03_womsk_camlight
    .json) — does a 25k DISTILLED run against the 12k cycle's real wavelet
    teacher survive? (paper's claim, reference dpt_runner.py:239-247)."""
    import json as _json

    import numpy as np

    feat_dir = os.path.join(scene_dir, "image", "wavelet_feats", "0")
    if not os.path.isdir(feat_dir) or not os.listdir(feat_dir):
        raise SystemExit(
            f"--skip-to-wdepth needs VDN features at {feat_dir} from a "
            f"completed cycle run (stages 1-4)"
        )
    tag = args.leg_tag
    exp_dir = os.path.join(args.out, f"exp_wdepth_{wit}{tag}")
    if os.path.exists(exp_dir):
        raise SystemExit(f"{exp_dir} already exists; delete it first")
    report = {"config": vars(args), "stages": {}}
    base_report_path = os.path.join(args.out, "vdn_cycle_report.json")
    if os.path.exists(base_report_path):
        with open(base_report_path) as f:
            base = _json.load(f)
        report["base_from"] = {
            k: base.get(k)
            for k in ("base_object_masked_psnr_res2", "base_eikonal",
                      "base_geometry")
        }

    gt_pose_all = gt_world_mats = None
    cam_npz = "cameras_sphere.npz"
    if args.learn:
        # deterministic (seed-5) regeneration of the same noisy cameras the
        # full learn cycle trained against; also yields the GT poses/mats
        # for the pose-recovery + gauge-aligned geometry metrics
        gt_pose_all, _noisy, gt_world_mats = make_noisy_cameras(scene_dir)
        cam_npz = "cameras_sphere_noisy.npz"
    feats0 = np.load(os.path.join(feat_dir, sorted(os.listdir(feat_dir))[0]))
    conf = write_conf_file(
        os.path.join(args.out, f"wdepth_{wit}{tag}.conf"), exp_dir, scene_dir,
        wit, args.batch, wdepth=True,
        depth_weight_scale=args.depth_weight_scale,
        dpt_dim=int(feats0.shape[1]),
        depth_start_iter=args.depth_start_iter,
        lr_end_iter=args.lr_end_iter,
        anneal_end=args.anneal_end, warm_up_end=args.warm_up_end,
        render_samples=args.render_samples,
        resample_frac=args.resample_frac,
        resample_from=args.resample_from,
        learn=args.learn, cam_npz=cam_npz,
    )
    run_wdepth_leg(conf, exp_dir, scene_dir, wit, args.mesh_res, report,
                   seed=args.seed, gt_pose_all=gt_pose_all,
                   gt_world_mats=gt_world_mats)
    out_path = os.path.join(
        args.out, f"vdn_cycle_report_wdepth{wit}{tag}.json"
    )
    with open(out_path, "w") as f:
        _json.dump(report, f, indent=2)
    print(_json.dumps({
        "wdepth_iters": wit,
        "wdepth_psnr": report["wdepth_object_masked_psnr_res2"],
        "wdepth_eikonal": report["wdepth_eikonal"],
        "wdepth_chamfer": report["wdepth_geometry"]["chamfer"],
        "train_wall_s": report["stages"]["train_wdepth_s"],
    }), flush=True)
    return report


def cycle2_legs(args, scene_dir, wit):
    """--cycle2: a SECOND full cycle iteration (VERDICT r3 #3) seeded by a
    completed cycle's DISTILLED leg. The VDN workflow is a loop
    (reference dpt_runner.py:775-778 → wavelet/finetune_for_vdn.py →
    wavelet/predict.py → retrain): cycle 1's output geometry becomes
    cycle 2's depth teacher. Stages: (2') getfeats from exp_wdepth's
    checkpoint, (3') wavelet finetune WARM-STARTED from the cycle-1 encoder
    (our analog of the reference's torchvision-pretrained init), (4')
    re-extract VDN features, (5') fresh distilled leg → exp_wdepth_c2.
    Cycle-1 intermediates are archived as *_c1 so both generations of
    teacher artifacts survive for inspection. Reports whether distillation
    compounds, saturates, or regresses (wdepth_geometry vs cycle 1's)."""
    import shutil

    import json as _json

    import numpy as np

    from vdnerf_tpu.cli import main as cli_main
    from vdnerf_tpu.wavelet.finetune import finetune
    from vdnerf_tpu.wavelet.predict import main as predict_main

    img_dir = os.path.join(scene_dir, "image")
    wdepth_conf = os.path.join(args.out, "wdepth.conf")
    exp_wdepth = os.path.join(args.out, "exp_wdepth")
    for need in (wdepth_conf, exp_wdepth,
                 os.path.join(img_dir, "wavelet_feats", "0")):
        if not os.path.exists(need):
            raise SystemExit(f"--cycle2 needs a completed cycle in "
                             f"{args.out} (missing {need})")
    exp_c2 = os.path.join(args.out, "exp_wdepth_c2")
    if os.path.exists(exp_c2):
        raise SystemExit(f"{exp_c2} already exists; delete it first")

    report = {"config": vars(args), "stages": {}}
    base_report_path = os.path.join(args.out, "vdn_cycle_report.json")
    if os.path.exists(base_report_path):
        with open(base_report_path) as f:
            base = _json.load(f)
        report["cycle1"] = {
            k: base.get(k)
            for k in ("base_geometry", "wdepth_geometry",
                      "base_object_masked_psnr_res2",
                      "wdepth_object_masked_psnr_res2",
                      "base_eikonal", "wdepth_eikonal",
                      "wdepth_depth_export_qc")
        }

    # -- 2'. depth export from the DISTILLED checkpoint -------------------
    # archive cycle 1's exports first (getfeats rewrites depth_from_sdf/)
    sdf_dir = os.path.join(img_dir, "depth_from_sdf")
    if os.path.isdir(sdf_dir):
        c1 = sdf_dir + "_c1"
        if not os.path.isdir(c1):
            shutil.move(sdf_dir, c1)
    t2 = time.time()
    cli_main(["--conf", wdepth_conf, "--mode", f"getfeats_{wit}"])
    n_exports = len([f for f in os.listdir(sdf_dir) if f.endswith(".npy")])
    assert n_exports == args.views, (n_exports, args.views)
    report["stages"]["getfeats_s"] = round(time.time() - t2, 1)
    print(f"[cycle2] getfeats from exp_wdepth: {n_exports} maps", flush=True)

    # -- 3'. wavelet finetune, warm-started from the cycle-1 encoder ------
    c1_ckpts = []
    for root, _dirs, files in os.walk(os.path.join(args.out, "wavelet_log")):
        c1_ckpts += [os.path.join(root, f) for f in files if f == "model.npz"]
    assert c1_ckpts, "no cycle-1 wavelet checkpoint to warm-start from"
    t3 = time.time()
    logpath = finetune([
        "-r", args.out, "--case", os.path.basename(scene_dir),
        "--epochs", str(args.wavelet_epochs),
        "-bs", str(args.wavelet_bs),
        "--image_size", str(args.img_res),
        "--encoder_type", args.encoder,
        "--logdir", os.path.join(args.out, "wavelet_log_c2"),
        "-ckpt", os.path.dirname(sorted(c1_ckpts)[-1]),
        "--val_freq", "50", "--save_freq", str(args.wavelet_epochs),
    ])
    ckpts = []
    for root, _dirs, files in os.walk(logpath):
        ckpts += [os.path.join(root, f) for f in files if f == "model.npz"]
    assert ckpts, f"no cycle-2 wavelet checkpoint under {logpath}"
    report["stages"]["wavelet_finetune_s"] = round(time.time() - t3, 1)
    print(f"[cycle2] wavelet finetune (warm-start) "
          f"{report['stages']['wavelet_finetune_s']}s", flush=True)

    # -- 4'. VDN feature re-extraction -------------------------------------
    feats_root = os.path.join(img_dir, "wavelet_feats")
    c1_feats = feats_root + "_c1"
    if not os.path.isdir(c1_feats):
        shutil.move(feats_root, c1_feats)
    t4 = time.time()
    predict_main([
        "-ckpt", os.path.dirname(ckpts[0]), "--ckpt_name", "model.npz",
        "-d", img_dir, "--encoder_type", args.encoder,
    ])
    feat_dir = os.path.join(feats_root, "0")
    feats0 = np.load(os.path.join(feat_dir, sorted(os.listdir(feat_dir))[0]))
    report["stages"]["predict_s"] = round(time.time() - t4, 1)
    report["vdn_features"] = {
        "n_views": len(os.listdir(feat_dir)),
        "shape": list(feats0.shape),
        "finite": bool(np.isfinite(feats0).all()),
    }
    print(f"[cycle2] features: {report['vdn_features']}", flush=True)

    # -- 5'. second distilled leg ------------------------------------------
    conf = write_conf_file(
        os.path.join(args.out, "wdepth_c2.conf"), exp_c2, scene_dir,
        wit, args.batch, wdepth=True,
        depth_weight_scale=args.depth_weight_scale,
        dpt_dim=int(feats0.shape[1]),
        depth_start_iter=args.depth_start_iter,
        lr_end_iter=args.lr_end_iter,
        render_samples=args.render_samples,
        resample_frac=args.resample_frac,
        resample_from=args.resample_from,
    )
    run_wdepth_leg(conf, exp_c2, scene_dir, wit, args.mesh_res, report,
                   seed=args.seed)
    out_path = os.path.join(args.out, "vdn_cycle2_report.json")
    with open(out_path, "w") as f:
        _json.dump(report, f, indent=2)
    c1g = report.get("cycle1", {}).get("wdepth_geometry") or {}
    print(_json.dumps({
        "cycle1_wdepth_chamfer": c1g.get("chamfer"),
        "cycle2_wdepth_chamfer": report["wdepth_geometry"]["chamfer"],
        "cycle2_wdepth_psnr": report["wdepth_object_masked_psnr_res2"],
        "cycle2_wdepth_eikonal": report["wdepth_eikonal"],
        "cycle2_depth_export_qc": report["wdepth_depth_export_qc"],
        "train_wall_s": report["stages"]["train_wdepth_s"],
    }), flush=True)
    return report


def eik_boost_probe(args, scene_dir, wit):
    """--eik-boost: late-phase eikonal-recovery probe (VERDICT r3 #4).

    Distillation buys surface accuracy but degrades |∇sdf| discipline
    (GEOMETRY_r03.md: eikonal 0.15-0.71 distilled vs 0.04 undistilled).
    From the completed cycle's distilled checkpoint (exp_wdepth @ wit),
    train ``--eik-iters`` further iterations per boosted igr_weight —
    distillation still on, cosine lr clamped at the wit horizon (the boost
    phase runs at the alpha*lr floor, a pure late-phase anneal) — and
    measure whether eikonal discipline recovers WITHOUT giving back the
    Chamfer, plus the exported-depth error the next cycle iteration would
    inherit. Reference loss under probe: dpt_runner.py:227-247."""
    import shutil

    import json as _json

    from vdnerf_tpu.cli import main as cli_main
    from vdnerf_tpu.runner import Runner

    exp_wdepth = os.path.join(args.out, "exp_wdepth")
    ckpt = os.path.join(exp_wdepth, "checkpoints")
    feat_dir = os.path.join(scene_dir, "image", "wavelet_feats", "0")
    for need in (ckpt, feat_dir):
        if not os.path.exists(need):
            raise SystemExit(f"--eik-boost needs a completed cycle in "
                             f"{args.out} (missing {need})")
    import numpy as np

    feats0 = np.load(os.path.join(feat_dir, sorted(os.listdir(feat_dir))[0]))
    end = wit + args.eik_iters
    report = {"config": vars(args), "arms": {}}
    base_report_path = os.path.join(args.out, "vdn_cycle_report.json")
    if os.path.exists(base_report_path):
        with open(base_report_path) as f:
            base = _json.load(f)
        report["wdepth_baseline"] = {
            k: base.get(k)
            for k in ("wdepth_geometry", "wdepth_eikonal",
                      "wdepth_object_masked_psnr_res2",
                      "wdepth_depth_export_qc", "base_eikonal")
        }
    for w in args.eik_boost:
        tag = f"w{w:g}".replace(".", "p") + args.leg_tag
        exp_dir = os.path.join(args.out, f"exp_eikboost_{tag}")
        if os.path.exists(exp_dir):
            raise SystemExit(f"{exp_dir} already exists; delete it first")
        os.makedirs(exp_dir)
        shutil.copytree(ckpt, os.path.join(exp_dir, "checkpoints"))
        conf = write_conf_file(
            os.path.join(args.out, f"eikboost_{tag}.conf"), exp_dir,
            scene_dir, end, args.batch, wdepth=True,
            depth_weight_scale=args.depth_weight_scale,
            dpt_dim=int(feats0.shape[1]),
            # keep the ORIGINAL leg's onset so the ramp state is unchanged
            # across the resume (wit//10 is fully ramped by step wit)
            depth_start_iter=wit // 10,
            lr_end_iter=wit,
            igr_weight=w,
        )
        t0 = time.time()
        cli_main(["--conf", conf, "--mode", "train", "--is_continue"])
        runner = Runner(conf, mode="eval")
        runner.load_checkpoint_iter(end)
        psnr, eik = object_masked_psnr(runner, scene_dir)
        report["arms"][f"igr_{w:g}"] = {
            "igr_weight": w,
            "train_wall_s": round(time.time() - t0, 1),
            "psnr": round(psnr, 3),
            "eikonal": round(eik, 5),
            "geometry": geometry_qc(runner, scene_dir, args.mesh_res),
            "depth_export_qc": depth_export_qc(runner, scene_dir),
        }
        print(f"[eik-boost] igr={w:g}: eik {eik:.4f}, chamfer "
              f"{report['arms'][f'igr_{w:g}']['geometry']['chamfer']}",
              flush=True)
        del runner
    out_path = os.path.join(args.out,
                            f"eik_boost_report{args.leg_tag}.json")
    with open(out_path, "w") as f:
        _json.dump(report, f, indent=2)
    print(_json.dumps({
        k: {kk: v[kk] for kk in ("eikonal", "psnr")} |
           {"chamfer": v["geometry"]["chamfer"],
            "depth_abs_mean": v["depth_export_qc"].get("abs_mean")}
        for k, v in report["arms"].items()
    }), flush=True)
    return report


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=12000,
                   help="NeuS iters for BOTH training legs")
    p.add_argument("--wdepth-iters", type=int, default=None,
                   help="override iters for the distilled retrain leg only "
                        "(default: --iters). With --skip-to-wdepth this "
                        "lets a LONGER distilled run train against a "
                        "teacher built by a shorter base leg")
    p.add_argument("--skip-to-wdepth", action="store_true",
                   help="reuse an existing --out dir's scene + VDN features "
                        "(stages 1-4 of a completed cycle) and run ONLY the "
                        "distilled retrain leg; writes exp_wdepth_<iters>/ "
                        "and vdn_cycle_report_wdepth<iters>.json")
    p.add_argument("--out", type=str, default="/tmp/vdn_cycle")
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--views", type=int, default=24)
    p.add_argument("--img-res", type=int, default=256)
    p.add_argument("--encoder", type=str, default="densenet",
                   help="wavelet encoder (densenet = the reference flagship)")
    p.add_argument("--wavelet-epochs", type=int, default=6)
    p.add_argument("--wavelet-bs", type=int, default=2)
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--shading", choices=["fixed", "camlight", "glossy"],
                   default="fixed",
                   help="'camlight' = light co-located with the camera + "
                        "specular (the dynamic-lighting shape-radiance-"
                        "ambiguity setting the VDN paper targets)")
    p.add_argument("--geometry", choices=["compound", "arch"],
                   default="compound",
                   help="analytic scene geometry (data/synthetic.py "
                        "GEOMETRIES): 'arch' is a second shape family "
                        "(see-through opening + concave overhang) for "
                        "generality arms; also the scene/case dir name")
    p.add_argument("--mesh-res", type=int, default=512,
                   help="geometry-QC grid resolution for both legs")
    p.add_argument("--depth-weight-scale", type=float, default=1.0,
                   help="scale on the ramped distillation loss (1.0 = the "
                        "reference's schedule)")
    p.add_argument("--depth-start-iter", type=int, default=None,
                   help="absolute distillation onset iter for the wdepth "
                        "leg (default: leg_iters // 10, the reference's "
                        "leg-relative schedule). Decouples the teacher "
                        "engagement point from the leg length")
    p.add_argument("--cycle2", action="store_true",
                   help="run a SECOND cycle iteration from a completed "
                        "cycle in --out: getfeats from exp_wdepth's "
                        "checkpoint, warm-started wavelet finetune, feature "
                        "re-extraction, and a fresh distilled leg "
                        "(exp_wdepth_c2). Cycle-1 teacher artifacts are "
                        "archived as *_c1")
    p.add_argument("--eik-boost", type=float, nargs="+", default=None,
                   help="late-phase eikonal-recovery probe: from the "
                        "completed cycle's distilled checkpoint, train "
                        "--eik-iters more iterations per listed igr_weight "
                        "(distillation on, lr held at the cosine floor) and "
                        "measure eikonal + Chamfer + exported-depth error")
    p.add_argument("--eik-iters", type=int, default=3000,
                   help="extra iterations for each --eik-boost arm")
    p.add_argument("--anneal-end", type=int, default=None,
                   help="override the leg-relative cos-anneal horizon "
                        "(default iters//4). The NeuS alpha-estimation "
                        "anneal governs the formation phase — the last "
                        "leg-relative quantity in the 25k-plateau probe "
                        "(GEOMETRY_r04 §2c)")
    p.add_argument("--warm-up-end", type=int, default=None,
                   help="override the leg-relative lr warmup (default "
                        "iters//50)")
    p.add_argument("--lr-end-iter", type=int, default=None,
                   help="clamp the cosine-lr horizon of the wdepth leg to "
                        "this iteration (train.lr_end_iter; steps past it "
                        "hold the alpha*lr floor). Isolates the lr-stretch "
                        "confound from the onset confound in the 25k-"
                        "plateau schedule probe (GEOMETRY §2c)")
    p.add_argument("--learn", action="store_true",
                   help="learned-cameras arm (the reference's flagship "
                        "womsk_learn_*_colmap regime, dpt_models/poses.py): "
                        "BOTH training legs refine pose + focal from "
                        "COLMAP-grade-noisy initial cameras "
                        "(cameras_sphere_noisy.npz). Reports add raw + "
                        "similarity-aligned pose-recovery errors, and the "
                        "geometry/depth QC is gauge-aligned via the camera-"
                        "center Umeyama fit")
    p.add_argument("--render-samples", type=int, default=0,
                   help="importance-resampled render core width for the "
                        "WDEPTH leg (neus_renderer.n_render_samples; 0 = "
                        "faithful full-width). The base leg always trains "
                        "full-width so resample A/Bs share their teacher")
    p.add_argument("--resample-frac", type=float, default=0.25,
                   help="resample PDF uniform floor "
                        "(resample_uniform_frac); mask-free regimes need "
                        "1.0 (PERF_r03 floor sweep)")
    p.add_argument("--resample-from", type=int, default=0,
                   help="faithful core through this iteration of the wdepth "
                        "leg, resampled core after (train.resample_from; "
                        "must land on a steps_per_call boundary)")
    p.add_argument("--leg-tag", type=str, default="",
                   help="suffix for the --skip-to-wdepth leg's (or "
                        "--eik-boost arms') exp dir / conf / report names, "
                        "so schedule variants of the same --wdepth-iters "
                        "or igr weight coexist in one --out")
    p.add_argument("--seed", type=int, default=0,
                   help="--seed passed to the training CLI for the "
                        "--skip-to-wdepth leg (host pixel stream + init). "
                        "All archived arms are seed 0; use a non-zero seed "
                        "to probe a recipe's seed-robustness")
    args = p.parse_args(argv)

    import numpy as np

    from vdnerf_tpu.models.precision import enable_bf16

    enable_bf16(not args.fp32)

    from vdnerf_tpu.cli import main as cli_main
    from vdnerf_tpu.data.synthetic import make_compound_scene
    from vdnerf_tpu.runner import Runner

    global _GEOMETRY
    _GEOMETRY = args.geometry
    case = args.geometry
    scene_dir = os.path.join(args.out, case)
    wit = args.wdepth_iters or args.iters
    if args.learn and (args.cycle2 or args.eik_boost):
        raise SystemExit("--learn composes with the full cycle and "
                         "--skip-to-wdepth only (not --cycle2/--eik-boost)")
    if args.skip_to_wdepth:
        return wdepth_leg_only(args, scene_dir, wit)
    if args.cycle2:
        return cycle2_legs(args, scene_dir, wit)
    if args.eik_boost:
        return eik_boost_probe(args, scene_dir, wit)
    # a reused out dir would silently evaluate stale artifacts (is_continue
    # picks the HIGHEST-numbered checkpoint regardless of which run wrote
    # it; old depth_from_sdf/wavelet ckpts linger) — refuse it
    for stale in ("exp_base", "exp_wdepth", "wavelet_log", case):
        if os.path.exists(os.path.join(args.out, stale)):
            raise SystemExit(
                f"--out {args.out} already contains '{stale}' from a "
                f"previous run; pass a fresh directory (or delete it)"
            )
    os.makedirs(scene_dir, exist_ok=True)
    report = {"config": vars(args), "stages": {}}

    t0 = time.time()
    make_compound_scene(scene_dir, n_images=args.views, H=args.img_res,
                        W=args.img_res, background="textured",
                        shading=args.shading, geometry=args.geometry)
    # the wavelet NeusDataset reads OBJECT masks from <case>/mask/ (3-ch
    # PNGs, reference data.py:332 — real captures ship them there even for
    # womsk runs; background pixels get the depth-200 rule). The compound
    # scene keeps its true object masks under image/eval_mask/ — mirror
    # them into the wavelet layout.
    import cv2 as cv

    wmask_dir = os.path.join(scene_dir, "mask")
    os.makedirs(wmask_dir, exist_ok=True)
    em_dir = os.path.join(scene_dir, "image", "eval_mask")
    for fn in os.listdir(em_dir):
        m = cv.imread(os.path.join(em_dir, fn), 0)
        cv.imwrite(os.path.join(wmask_dir, fn),
                   np.repeat(m[..., None], 3, axis=-1))
    report["stages"]["scene_gen_s"] = round(time.time() - t0, 1)
    print(f"[cycle] scene: {args.views} views {args.img_res}^2 "
          f"({report['stages']['scene_gen_s']}s)", flush=True)

    gt_pose_all = gt_world_mats = None
    cam_npz = "cameras_sphere.npz"
    if args.learn:
        gt_pose_all, noisy, gt_world_mats = make_noisy_cameras(scene_dir)
        cam_npz = "cameras_sphere_noisy.npz"
        init_rot = float(np.degrees(np.arccos(np.clip(
            (np.trace(np.matmul(
                noisy[:, :3, :3],
                np.swapaxes(gt_pose_all[:, :3, :3], 1, 2)),
                axis1=1, axis2=2) - 1) / 2, -1, 1))).mean())
        print(f"[cycle] learn arm: noisy cameras written "
              f"(mean init rot err {init_rot:.3f} deg)", flush=True)

    def write_conf(path, exp_dir, wdepth, iters=None, dpt_dim=96):
        return write_conf_file(
            path, exp_dir, scene_dir, iters or args.iters, args.batch,
            wdepth, depth_weight_scale=args.depth_weight_scale,
            dpt_dim=dpt_dim,
            depth_start_iter=args.depth_start_iter if wdepth else None,
            lr_end_iter=args.lr_end_iter if wdepth else None,
            render_samples=args.render_samples if wdepth else 0,
            resample_frac=args.resample_frac,
            resample_from=args.resample_from if wdepth else 0,
            learn=args.learn, cam_npz=cam_npz,
        )

    # -- 1. base NeuS training (CLI) ------------------------------------
    base_conf = write_conf(os.path.join(args.out, "base.conf"),
                           os.path.join(args.out, "exp_base"), wdepth=False)
    t1 = time.time()
    cli_main(["--conf", base_conf, "--mode", "train"])
    report["stages"]["train_base_s"] = round(time.time() - t1, 1)
    runner = Runner(base_conf, mode="eval")
    runner.load_checkpoint_iter(args.iters)  # the exact leg, not "latest"
    base_psnr, base_eik = object_masked_psnr(runner, scene_dir)
    report["base_object_masked_psnr_res2"] = round(base_psnr, 3)
    report["base_eikonal"] = round(base_eik, 5)
    base_sim = None
    if args.learn:
        stats, base_sim = pose_recovery_stats(runner, gt_pose_all)
        report["base_pose_recovery"] = stats
        print(f"[cycle] base pose recovery: {stats}", flush=True)
    report["base_geometry"] = geometry_qc(
        runner, scene_dir, args.mesh_res, sim=base_sim,
        world_mats=gt_world_mats,
    )
    report["base_depth_export_qc"] = depth_export_qc(
        runner, scene_dir, sim=base_sim
    )
    print(f"[cycle] base train {report['stages']['train_base_s']}s, "
          f"object-masked PSNR {base_psnr:.2f} dB, eikonal {base_eik:.4f}, "
          f"Chamfer {report['base_geometry']['chamfer']}", flush=True)
    del runner

    # -- 2. depth-from-SDF export (CLI) ----------------------------------
    t2 = time.time()
    cli_main(["--conf", base_conf, "--mode", f"getfeats_{args.iters}"])
    sdf_dir = os.path.join(scene_dir, "image", "depth_from_sdf")
    n_exports = len([f for f in os.listdir(sdf_dir) if f.endswith(".npy")])
    assert n_exports == args.views, (n_exports, args.views)
    report["stages"]["getfeats_s"] = round(time.time() - t2, 1)
    depths = np.stack([
        np.load(os.path.join(sdf_dir, f))
        for f in sorted(os.listdir(sdf_dir)) if f.endswith(".npy")
    ])
    report["depth_export"] = {
        "n_maps": int(n_exports),
        "depth_mean": round(float(depths.mean()), 4),
        "depth_finite": bool(np.isfinite(depths).all()),
    }
    print(f"[cycle] getfeats: {n_exports} maps "
          f"({report['stages']['getfeats_s']}s)", flush=True)

    # -- 3. wavelet encoder finetune on the exported depths ---------------
    from vdnerf_tpu.wavelet.finetune import finetune

    t3 = time.time()
    logpath = finetune([
        "-r", args.out, "--case", case,
        "--epochs", str(args.wavelet_epochs),
        "-bs", str(args.wavelet_bs),
        "--image_size", str(args.img_res),
        "--encoder_type", args.encoder,
        "--logdir", os.path.join(args.out, "wavelet_log"),
        "--val_freq", "50", "--save_freq", str(args.wavelet_epochs),
    ])
    ckpts = []
    for root, _dirs, files in os.walk(logpath):
        ckpts += [os.path.join(root, f) for f in files if f == "model.npz"]
    assert ckpts, f"no wavelet checkpoint under {logpath}"
    report["stages"]["wavelet_finetune_s"] = round(time.time() - t3, 1)
    print(f"[cycle] wavelet finetune ({args.encoder}) "
          f"{report['stages']['wavelet_finetune_s']}s", flush=True)

    # -- 4. 96-ch VDN feature extraction (CLI) ----------------------------
    from vdnerf_tpu.wavelet.predict import main as predict_main

    t4 = time.time()
    predict_main([
        "-ckpt", os.path.dirname(ckpts[0]), "--ckpt_name", "model.npz",
        "-d", os.path.join(scene_dir, "image"),
        "--encoder_type", args.encoder,
    ])
    feat_dir = os.path.join(scene_dir, "image", "wavelet_feats", "0")
    feats0 = np.load(os.path.join(feat_dir, sorted(os.listdir(feat_dir))[0]))
    report["stages"]["predict_s"] = round(time.time() - t4, 1)
    report["vdn_features"] = {
        "n_views": len(os.listdir(feat_dir)),
        "shape": list(feats0.shape),
        "finite": bool(np.isfinite(feats0).all()),
    }
    print(f"[cycle] features: {report['vdn_features']} "
          f"({report['stages']['predict_s']}s)", flush=True)

    # -- 5. retrain with the distillation head on those features ----------
    # honor --wdepth-iters here too, not only under --skip-to-wdepth
    wdepth_conf = write_conf(os.path.join(args.out, "wdepth.conf"),
                             os.path.join(args.out, "exp_wdepth"),
                             wdepth=True, iters=wit,
                             dpt_dim=report["vdn_features"]["shape"][1])
    run_wdepth_leg(wdepth_conf, os.path.join(args.out, "exp_wdepth"),
                   scene_dir, wit, args.mesh_res, report,
                   gt_pose_all=gt_pose_all, gt_world_mats=gt_world_mats)
    print(f"[cycle] wdepth eikonal {report['wdepth_eikonal']:.4f}, "
          f"Chamfer {report['wdepth_geometry']['chamfer']} "
          f"(base {report['base_geometry']['chamfer']})", flush=True)
    dist = report["distillation"]
    assert dist["depth_loss_first"] is not None, \
        "distillation loss never fired"
    print(f"[cycle] wdepth train {report['stages']['train_wdepth_s']}s, "
          f"object-masked PSNR "
          f"{report['wdepth_object_masked_psnr_res2']:.2f} dB, depth_loss "
          f"{dist['depth_loss_first']:.3f} -> {dist['depth_loss_last']:.3f}",
          flush=True)

    report["total_wall_s"] = round(time.time() - t0, 1)
    with open(os.path.join(args.out, "vdn_cycle_report.json"), "w") as f:
        json.dump(report, f, indent=2)
    learn_summary = {}
    if args.learn:
        learn_summary = {
            "base_pose": report["base_pose_recovery"],
            "wdepth_pose": report["wdepth_pose_recovery"],
        }
    print(json.dumps({
        "base_psnr": report["base_object_masked_psnr_res2"],
        "wdepth_psnr": report["wdepth_object_masked_psnr_res2"],
        "base_chamfer": report["base_geometry"]["chamfer"],
        "wdepth_chamfer": report["wdepth_geometry"]["chamfer"],
        **learn_summary,
        "base_eikonal": report["base_eikonal"],
        "wdepth_eikonal": report["wdepth_eikonal"],
        "depth_loss_drop": [report["distillation"]["depth_loss_first"],
                            report["distillation"]["depth_loss_last"]],
        "total_wall_s": report["total_wall_s"],
    }), flush=True)
    return report


if __name__ == "__main__":
    main()
