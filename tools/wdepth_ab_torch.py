"""CPU A/B: does DISTILLATION degrade geometry in the REFERENCE too?

Round-2 flagship wdepth runs showed the eikonal error climbing 0.01 -> 0.2+
once the ramped distillation loss engages (docs/FLAGSHIP_r02_wdepth.json).
VERDICT r2 #1 asks whether that is an implementation artifact or intrinsic
to the reference's formulation. This tool trains BOTH stacks at identical
small dims on the same scene with the same synthetic 16-ch teacher
(sin/cos of true depth) and the same distillation schedule
(dpt_runner.py:227-247: L1 on rendered-vs-teacher features, sigmoid ramp,
``depth_iter`` counting only post-start steps), tracking the eikonal error
trajectory in each.

Output: <out>/wdepth_ab.json with both trajectories and the eikonal
before/after distillation starts, per framework.

Usage: python tools/wdepth_ab_torch.py [--iters 600] [--out /tmp/wdepth_ab]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from train_reference_ckpt import (  # noqa: E402
    COLOR_KW,
    NERF_KW,
    RENDER_KW,
    SDF_KW,
    _ref_modules,
)

F_DIM = 16  # teacher feature channels (96 in the flagship; 16 keeps CPU sane)


def make_feat_maps(scene_dir, sd, max_freq):
    """Per-image [F, H, W] teacher maps: sin/cos of the TRUE depth."""
    import numpy as np

    from vdnerf_tpu.data.synthetic import ray_sphere_hit

    freqs = np.linspace(0.5, max_freq, F_DIM // 2)
    maps = []
    for i in range(sd.n_images):
        c2w = sd.pose_all[i].astype(np.float64)
        Kinv = np.linalg.inv(sd.intrinsics_all[i][:3, :3]).astype(np.float64)
        xs, ys = np.meshgrid(np.arange(sd.W), np.arange(sd.H))
        pix = np.stack([xs + 0.5, ys + 0.5, np.ones_like(xs)], axis=-1)
        d = pix.astype(np.float64) @ Kinv.T
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        d = d @ c2w[:3, :3].T
        o = np.broadcast_to(c2w[:3, 3], d.shape)
        t, hit = ray_sphere_hit(
            o.reshape(-1, 3), d.reshape(-1, 3), 0.5
        )
        depth = np.where(hit, t, 3.0).reshape(sd.H, sd.W)
        feats = np.concatenate(
            [np.sin(depth[None] * freqs[:, None, None]),
             np.cos(depth[None] * freqs[:, None, None])], axis=0
        )
        # squash to (0,1) like the RayStore's (x-mu)/sigma -> sigmoid
        maps.append(1.0 / (1.0 + np.exp(-feats)))
    return np.stack(maps).astype(np.float32)  # [N, F, H, W]


def ramp_weight(depth_iter, total):
    import numpy as np

    return float(1.0 / (np.exp(-10.0 * (depth_iter / total - 0.5)) + 1.0))


def _grid_field(neg_sdf_fn, bb, resolution, chunk=64**3):
    """Dense [-bb,bb]^3 grid eval of a HOST-CALLABLE ``pts [N,3] -> -sdf``
    (torch, numpy, or jitted-jax alike — unlike mesh.extract_fields, which
    wraps the query in jax.jit and so cannot take a torch module)."""
    import numpy as np

    xs = np.linspace(-bb, bb, resolution, dtype=np.float32)
    total = resolution**3
    yz = resolution * resolution
    out = np.empty(total, np.float32)
    for start in range(0, total, chunk):
        stop = min(start + chunk, total)
        idx = np.arange(start, stop)
        pts = np.stack(
            [xs[idx // yz], xs[(idx // resolution) % resolution],
             xs[idx % resolution]], axis=-1,
        )
        out[start:stop] = np.asarray(neg_sdf_fn(pts)).reshape(-1)
    return out.reshape(resolution, resolution, resolution)


def sphere_mesh_chamfer(neg_sdf_fn, resolution=128):
    """Small-grid marching on the trained SDF + Chamfer vs the analytic
    r=0.5 sphere (VERDICT r3 #5: the A/B's geometry conclusion must rest on
    SURFACE metrics, not the eikonal proxy GEOMETRY_r03.md shows
    anti-correlates with surface quality under distillation)."""
    import numpy as np

    from vdnerf_tpu.mesh import mesh_chamfer
    from vdnerf_tpu.mesh.native import marching_cubes

    bb = 0.9

    def march(fn):
        u = _grid_field(fn, bb, resolution)
        verts, tris = marching_cubes(u, 0.0)
        if len(verts):
            verts = verts / (resolution - 1.0) * (2 * bb) - bb
        return verts, tris

    verts, tris = march(neg_sdf_fn)
    if not len(verts):
        return {"n_verts": 0, "chamfer": None}
    v_gt, t_gt = march(lambda p: 0.5 - np.linalg.norm(p, axis=-1))
    # 100k surface samples, same as mesh.qc.geometry_qc — the two-sampling
    # noise floor is ~0.006 chamfer on this sphere (measured: identical
    # surfaces at 20k points read 0.0125); report it alongside
    ch = mesh_chamfer(verts, tris, v_gt, t_gt, n_points=100_000)
    floor = mesh_chamfer(v_gt, t_gt, v_gt, t_gt, n_points=100_000)
    return {
        "n_verts": int(len(verts)),
        **{k: round(float(v), 5) for k, v in ch.items()},
        "sampling_floor_chamfer": round(float(floor["chamfer"]), 5),
    }


def run_torch(sd, store, feat_maps, args, eik_every, distill=True):
    import numpy as np
    import torch

    import jax.numpy as jnp

    from vdnerf_tpu.data.cameras import pixels_to_rays
    from vdnerf_tpu.data.dataset import near_far_from_sphere

    ref_fields, ref_renderer = _ref_modules()
    torch.manual_seed(0)
    nerf_kw = dict(NERF_KW, gen_depth_feats=True, dpt_dim=F_DIM)
    t_sdf = ref_fields.SDFNetwork(**SDF_KW)
    t_color = ref_fields.RenderingNetwork(**COLOR_KW)
    t_depth = ref_fields.RenderingNetwork(**dict(COLOR_KW, d_out=F_DIM))
    t_nerf = ref_fields.NeRF(**nerf_kw)
    t_var = ref_fields.SingleVarianceNetwork(0.3)
    renderer = ref_renderer.NeuSRenderer(
        t_nerf, t_sdf, t_var, t_color, t_depth, **RENDER_KW
    )
    params = (list(t_nerf.parameters()) + list(t_sdf.parameters())
              + list(t_var.parameters()) + list(t_color.parameters())
              + list(t_depth.parameters()))
    opt = torch.optim.Adam(params, lr=5e-4)

    def update_lr(it):
        # Same cosine-to-alpha decay the jax side's neus_lr_schedule applies
        # (reference dpt_runner.py:310-323, warm_up_end=0, alpha=0.05) — the
        # two stacks must see identical lr trajectories or any eikonal
        # difference could be schedule-driven.
        alpha = 0.05
        progress = it / args.iters
        factor = (np.cos(np.pi * progress) + 1.0) * 0.5 * (1 - alpha) + alpha
        for g in opt.param_groups:
            g["lr"] = 5e-4 * factor

    rng = np.random.default_rng(0)
    eiks, depth_iter = [], 0
    for it in range(args.iters):
        update_lr(it)
        img_idx = it % sd.n_images
        b = store.sample_pixels(img_idx, args.batch, rng)
        rays_o, rays_d = pixels_to_rays(
            jnp.asarray(sd.pose_all[img_idx]),
            jnp.asarray(sd.intrinsics_all_inv[img_idx]),
            jnp.asarray(b["pixels_x"]), jnp.asarray(b["pixels_y"]),
        )
        near, far = near_far_from_sphere(rays_o, rays_d)
        gt_feats = torch.from_numpy(
            feat_maps[img_idx][:, b["pixels_y"], b["pixels_x"]].T.copy()
        )
        rays_o = torch.from_numpy(np.asarray(rays_o))
        rays_d = torch.from_numpy(np.asarray(rays_d))
        true_rgb = torch.from_numpy(b["color"])
        mask = (torch.from_numpy(b["mask"]) > 0.1).float()
        mask_sum = mask.sum() + 1e-5

        out = renderer.render(
            rays_o, rays_d,
            torch.from_numpy(np.asarray(near)),
            torch.from_numpy(np.asarray(far)),
            background_rgb=torch.ones(1, 3),
            cos_anneal_ratio=min(1.0, it / max(args.iters // 4, 1)),
        )
        color_error = (out["color_fine"] - true_rgb) * mask
        loss = (color_error.abs().sum() / mask_sum
                + 0.1 * out["gradient_error"])
        if distill and it > args.start_iter:
            dfe = (out["render_feats"] - gt_feats) * mask
            dloss = dfe.abs().sum() / mask_sum
            loss = loss + dloss * ramp_weight(depth_iter, args.ramp_iters)
            depth_iter += 1
        opt.zero_grad()
        loss.backward()
        opt.step()
        if (it + 1) % eik_every == 0:
            eiks.append(
                {"iter": it + 1, "eik": float(out["gradient_error"])}
            )
            print(f"[torch] iter {it+1} eik {eiks[-1]['eik']:.4f} "
                  f"loss {float(loss):.4f}", flush=True)

    def neg_sdf(pts):
        with torch.no_grad():
            return -t_sdf.sdf(
                torch.from_numpy(np.asarray(pts, np.float32))
            )[:, 0].numpy()

    return eiks, sphere_mesh_chamfer(neg_sdf)


def run_ours(sd, store, feat_maps, args, eik_every, distill=True):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vdnerf_tpu.models.fields import NeRFConfig, RenderConfig, SDFConfig
    from vdnerf_tpu.ops.renderer import NeuSNetworks, RendererConfig
    from vdnerf_tpu.train import (
        SceneStatic,
        TrainConfig,
        init_params,
        init_state,
        make_train_step,
    )

    nets = NeuSNetworks(
        sdf=SDFConfig(**{**SDF_KW, "skip_in": (2,)}),
        color=RenderConfig(**COLOR_KW),
        nerf=NeRFConfig(**{
            **{k: tuple(v) if isinstance(v, list) else v
               for k, v in NERF_KW.items()},
            "gen_depth_feats": True, "dpt_dim": F_DIM,
        }),
        renderer=RendererConfig(**RENDER_KW),
        depth=RenderConfig(**dict(COLOR_KW, d_out=F_DIM)),
    )
    tcfg = TrainConfig(
        batch_size=args.batch, end_iter=args.iters,
        warm_up_end=0, anneal_end=max(args.iters // 4, 1),
        use_white_bkgd=True, use_mask=True, mask_weight=0.0,
        extract_depth=distill, depth_start_iter=args.start_iter,
        depth_ramp_iters=args.ramp_iters,
    )
    params = init_params(jax.random.PRNGKey(0), nets, 0.3)
    cams = {
        "pose_all": jnp.asarray(sd.pose_all),
        "intrin_inv_all": jnp.asarray(sd.intrinsics_all_inv),
    }
    state = init_state(params, tcfg, cams, jax.random.PRNGKey(1))
    step_fn = jax.jit(make_train_step(nets, tcfg, SceneStatic(H=sd.H, W=sd.W)))

    rng = np.random.default_rng(0)
    eiks = []
    for it in range(args.iters):
        img_idx = it % sd.n_images
        b = store.sample_pixels(img_idx, args.batch, rng)
        b["feats"] = feat_maps[img_idx][:, b["pixels_y"], b["pixels_x"]].T.copy()
        state, m = step_fn(state, b)
        if (it + 1) % eik_every == 0:
            eiks.append(
                {"iter": it + 1, "eik": float(m["eikonal_loss"])}
            )
            print(f"[ours ] iter {it+1} eik {eiks[-1]['eik']:.4f} "
                  f"loss {float(m['loss']):.4f}", flush=True)

    from vdnerf_tpu.models.fields import sdf_value

    final_params = state["params"]
    # params as ARGUMENTS, not closure — closing over them makes XLA
    # constant-fold the MLP (CLAUDE.md)
    neg_sdf_j = jax.jit(
        lambda ps, pts: -sdf_value(nets.sdf, ps, pts)[..., 0]
    )
    return eiks, sphere_mesh_chamfer(
        lambda pts: neg_sdf_j(final_params["sdf"], pts)
    )


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=600)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--start-iter", type=int, default=150)
    p.add_argument("--ramp-iters", type=int, default=150)
    p.add_argument("--max-freq", type=float, default=5.0)
    p.add_argument("--out", type=str, default="/tmp/wdepth_ab")
    p.add_argument("--control", action="store_true",
                   help="also run both stacks UNDISTILLED (same nets/init/"
                        "schedule) so the Chamfer columns have a baseline")
    args = p.parse_args(argv)

    # CPU A/B: both stacks must run on the same host CPU — without this the
    # jax arm silently runs on the ambient axon TPU while torch runs on CPU,
    # corrupting the wall-clock comparison (and contending with any chip job)
    from vdnerf_tpu.utils.platforms import apply_jax_platforms_env

    apply_jax_platforms_env()

    from vdnerf_tpu.data.dataset import SceneData
    from vdnerf_tpu.data.rays import RayStore
    from vdnerf_tpu.data.synthetic import make_synthetic_scene
    from vdnerf_tpu.utils.hocon import Config

    os.makedirs(args.out, exist_ok=True)
    scene_dir = os.path.join(args.out, "scene")
    if not os.path.isdir(os.path.join(scene_dir, "image")):
        make_synthetic_scene(scene_dir, n_images=4, H=64, W=64)
    conf = Config({
        "dataset": {
            "data_dir": scene_dir, "img_dir": "image", "depth_dir": "00",
            "render_cameras_name": "image/cameras_sphere.npz",
            "object_cameras_name": "image/cameras_sphere.npz",
        }
    })
    sd = SceneData(conf["dataset"])
    store = RayStore(sd.images_lis, sd.masks_lis)
    feat_maps = make_feat_maps(scene_dir, sd, args.max_freq)

    eik_every = max(args.iters // 24, 1)
    t0 = time.time()
    ours, ours_geom = run_ours(sd, store, feat_maps, args, eik_every)
    t_ours = time.time() - t0
    t0 = time.time()
    theirs, theirs_geom = run_torch(sd, store, feat_maps, args, eik_every)
    t_torch = time.time() - t0
    controls = {}
    if args.control:
        # undistilled controls: same nets/init/schedule, distillation off —
        # the Chamfer columns need a baseline to call anything "degradation"
        t0 = time.time()
        _, ours_ctrl_geom = run_ours(
            sd, store, feat_maps, args, eik_every, distill=False
        )
        t0 = time.time()
        _, torch_ctrl_geom = run_torch(
            sd, store, feat_maps, args, eik_every, distill=False
        )
        controls = {
            "ours_undistilled_geometry": ours_ctrl_geom,
            "torch_undistilled_geometry": torch_ctrl_geom,
        }

    def pre_post(tr):
        pre = [e["eik"] for e in tr if e["iter"] <= args.start_iter]
        post = [e["eik"] for e in tr if e["iter"] > args.start_iter
                + args.ramp_iters]
        import numpy as np

        return (round(float(np.mean(pre)), 4) if pre else None,
                round(float(np.mean(post[-5:])), 4) if post else None)

    o_pre, o_post = pre_post(ours)
    t_pre, t_post = pre_post(theirs)
    report = {
        "config": vars(args),
        "ours": {"trajectory": ours, "eik_pre_distill": o_pre,
                 "eik_post_distill": o_post, "geometry": ours_geom,
                 "wall_s": round(t_ours, 1)},
        "torch_reference": {"trajectory": theirs, "eik_pre_distill": t_pre,
                            "eik_post_distill": t_post,
                            "geometry": theirs_geom,
                            "wall_s": round(t_torch, 1)},
        **controls,
    }
    with open(os.path.join(args.out, "wdepth_ab.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({
        "ours_eik_pre_post": [o_pre, o_post],
        "torch_eik_pre_post": [t_pre, t_post],
        "ours_chamfer": ours_geom.get("chamfer"),
        "torch_chamfer": theirs_geom.get("chamfer"),
        **{k: v.get("chamfer") for k, v in controls.items()},
    }), flush=True)
    return report


if __name__ == "__main__":
    main()
