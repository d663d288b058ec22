"""Faithful-vs-resampled-core convergence A/B through the real CLI.

The importance-resampled render core (``RendererConfig.n_render_samples``,
vdnerf_tpu/ops/renderer.py) is an opt-in production fast path: the
with-gradient render core runs at a reduced width, positions drawn from the
up-sample ladder's own weight estimate. Flagship-scale chip validation
lives in docs/FLAGSHIP_r03_resample*.json; THIS tool is the
platform-independent convergence A/B at reduced dims: train both arms with
the real ``vdnerf_tpu.cli`` on the compound analytic scene (textured
background, mask-free womsk mode — the production recipe the fast path
targets), identical budget and seed, then measure object-masked PSNR and
mesh Chamfer vs the analytic surface for each arm.

Honors JAX_PLATFORMS (e.g. ``env JAX_PLATFORMS=cpu python
tools/resample_ab.py`` runs on host CPU even under the ambient axon env,
applying the config update the env var alone does not survive).

Usage: python tools/resample_ab.py [--iters 2500] [--out docs/RESAMPLE_AB_CPU.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# reduced-dims womsk conf (structure mirrors tools/vdn_cycle_run.BASE_CONF;
# dims match the CPU test tier so the A/B finishes in minutes per arm)
CONF = """\
general {{
    base_exp_dir = {exp_dir}
    recording = []
}}
dataset {{
    data_dir = {data_dir}
    img_dir = image
    depth_dir = 00
    render_cameras_name = image/cameras_sphere.npz
    object_cameras_name = image/cameras_sphere.npz
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
    val_freq = {iters}
    val_mesh_freq = {iters}
    report_freq = 500
    igr_weight = 0.1
    mask_weight = {mask_weight}
    use_mask = {use_mask}
    resample_from = {resample_from}
}}
model {{
    nerf {{
        D = 2, d_in = 4, d_in_view = 3, W = 64,
        multires = 4, multires_view = 2, output_ch = 4, skips = [4],
        rgb_dims = 3, use_viewdirs = True
    }}
    sdf_network {{
        d_out = 65
        d_in = 3
        d_hidden = 64
        n_layers = 4
        skip_in = [2]
        multires = 6
        bias = 0.5
        scale = 1.0
        geometric_init = True
        weight_norm = True
    }}
    variance_network {{ init_val = 0.3 }}
    rendering_network {{
        d_feature = 64
        mode = idr
        d_in = 9
        d_out = 3
        d_hidden = 64
        n_layers = 2
        weight_norm = True
        multires_view = 4
        squeeze_out = True
    }}
    neus_renderer {{
        n_samples = 24
        n_importance = 24
        n_outside = {n_outside}
        up_sample_steps = 4
        perturb = 1.0
        skip_bg_inside = {skip_bg}{resample_block}
    }}
}}
"""


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=2500)
    p.add_argument("--iters-b", type=int, default=0,
                   help="iteration budget for the resample arm only "
                   "(default: same as --iters). Set to ~1.5-1.7x --iters "
                   "for the iso-wall-clock comparison the fast path "
                   "actually targets: it converts its per-step speedup "
                   "into more steps")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--views", type=int, default=10)
    p.add_argument("--img-res", type=int, default=96)
    p.add_argument("--mesh-res", type=int, default=160)
    p.add_argument("--render-samples", type=int, default=24,
                   help="arm-B core width (faithful arm uses the full "
                   "24+24=48-sample ladder)")
    p.add_argument("--onset-frac", type=float, default=0.0,
                   help="resample arm's train.resample_from as a fraction "
                   "of --iters (0 = resample from iteration zero). The "
                   "production recipe trains the faithful core until the "
                   "surface forms, then switches programs at a dispatch-"
                   "window boundary")
    p.add_argument("--fast-bg", action="store_true",
                   help="skip_bg_inside=True in BOTH arms (the production "
                   "recipe): the bg NeRF evaluates only the outside block, "
                   "so the resampled core's concentrated inside ladder "
                   "cannot starve it — the womsk-mode gap mechanism")
    p.add_argument("--masked", action="store_true",
                   help="NeuS wmask regime (true masks + mask BCE, "
                   "n_outside=0) instead of mask-free womsk: geometry "
                   "converges at small budgets, making the Chamfer "
                   "comparison meaningful")
    p.add_argument("--uniform-frac", type=float, default=None,
                   help="resample arm's resample_uniform_frac (default: the "
                   "RendererConfig default, 0.25). The mask-free gap's "
                   "residual mechanism is the radiance field leaning on "
                   "diffuse low-weight ladder tails that the concentrated "
                   "core prunes — a higher uniform floor keeps them covered")
    p.add_argument("--skip-faithful", action="store_true",
                   help="run only the resample arm (sweeps): the faithful "
                   "arm at a given (iters, batch, views, img_res, regime) "
                   "is deterministic on CPU, so its recorded numbers from a "
                   "prior run remain the valid comparator")
    p.add_argument("--workdir", type=str, default="/tmp/resample_ab")
    p.add_argument("--out", type=str, default="docs/RESAMPLE_AB_CPU.json")
    args = p.parse_args(argv)
    if args.masked and args.workdir == "/tmp/resample_ab":
        # masked mode rewrites the scene's training masks in place — never
        # share a scene dir between the two regimes
        args.workdir = "/tmp/resample_ab_masked"

    from vdnerf_tpu.utils.platforms import apply_jax_platforms_env

    apply_jax_platforms_env()

    from vdn_cycle_run import geometry_qc, object_masked_psnr
    from vdnerf_tpu.cli import main as cli_main
    from vdnerf_tpu.data.synthetic import make_compound_scene
    from vdnerf_tpu.runner import Runner

    os.makedirs(args.workdir, exist_ok=True)
    scene_dir = os.path.join(args.workdir, "compound")
    if not os.path.exists(os.path.join(scene_dir, "image",
                                       "cameras_sphere.npz")):
        make_compound_scene(
            scene_dir, n_images=args.views, H=args.img_res, W=args.img_res,
            background="textured", shading="fixed",
        )
    if args.masked:
        # wmask regime trains against the TRUE object masks (the textured
        # scene writes dummy white training masks + real eval_mask/)
        mask_dir = os.path.join(scene_dir, "image", "mask")
        eval_dir = os.path.join(scene_dir, "image", "eval_mask")
        for fn in os.listdir(eval_dir):
            shutil.copyfile(os.path.join(eval_dir, fn),
                            os.path.join(mask_dir, fn))

    report = {"config": vars(args), "arms": {}}
    arms = (("faithful", 0), ("resample", args.render_samples))
    if args.skip_faithful:
        arms = arms[1:]
    for arm, m in arms:
        arm_iters = args.iters_b if m and args.iters_b else args.iters
        exp_dir = os.path.join(args.workdir, f"exp_{arm}")
        if os.path.exists(exp_dir):
            shutil.rmtree(exp_dir)  # never resume a stale arm
        conf = os.path.join(args.workdir, f"{arm}.conf")
        with open(conf, "w") as f:
            f.write(CONF.format(
                exp_dir=exp_dir, data_dir=scene_dir, iters=arm_iters,
                batch=args.batch, warm_up=max(arm_iters // 50, 100),
                anneal=max(arm_iters // 4, 500),
                mask_weight=0.1 if args.masked else 0.0,
                use_mask=args.masked,
                n_outside=0 if args.masked else 8,
                skip_bg=args.fast_bg and not args.masked,
                resample_from=(
                    int(arm_iters * args.onset_frac) if m else 0
                ),
                resample_block=(
                    (f"\n        n_render_samples = {m}"
                     + (f"\n        resample_uniform_frac = "
                        f"{args.uniform_frac}"
                        if args.uniform_frac is not None else ""))
                    if m else ""
                ),
            ))
        t0 = time.time()
        cli_main(["--conf", conf, "--mode", "train"])
        wall = round(time.time() - t0, 1)
        runner = Runner(conf, mode="eval")
        runner.load_checkpoint_iter(arm_iters)
        psnr, eik = object_masked_psnr(runner, scene_dir)
        geo = geometry_qc(runner, scene_dir, args.mesh_res)
        report["arms"][arm] = {
            "core_samples": m or 48,
            "object_masked_psnr_res2": round(psnr, 3),
            "eikonal": round(eik, 5),
            "geometry": geo,
            "train_wall_s": wall,
        }
        print(json.dumps({arm: report["arms"][arm]}), flush=True)

    if not args.skip_faithful:
        f_arm = report["arms"]["faithful"]
        r_arm = report["arms"]["resample"]
        report["delta"] = {
            "psnr_db": round(
                r_arm["object_masked_psnr_res2"]
                - f_arm["object_masked_psnr_res2"], 3,
            ),
            "chamfer_ratio": (
                round(r_arm["geometry"]["chamfer"]
                      / f_arm["geometry"]["chamfer"], 3)
                if f_arm["geometry"].get("chamfer")
                and r_arm["geometry"].get("chamfer")
                else None
            ),
        }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report.get("delta", report["arms"])))
    return report


if __name__ == "__main__":
    main()
