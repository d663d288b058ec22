"""End-to-end quality demonstration on one TPU chip.

Trains the full womsk_white-size NeuS on a synthetic normal-colored sphere
(12 views, 128x128, masked mode — see CLAUDE.md on why mask-free training is
degenerate on pure-white synthetic backgrounds), extracts a 256^3 mesh, and
reports Chamfer distance against the analytic sphere.

Reference run on a single v5e chip (4000 iters, bf16, 210 s):
    PSNR ~38-43 dB, mesh 243k verts,
    chamfer 0.041 / accuracy 0.021 / completeness 0.021 / hausdorff 0.035
    (sphere radius 0.5 -> ~4% mean surface error after 1.3% of the
    reference's 300k-iteration budget).

Usage: python tools/quality_demo.py [--iters 4000] [--out /tmp/vdn_quality]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=4000)
    p.add_argument("--out", type=str, default="/tmp/vdn_quality")
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--fp32", action="store_true")
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
    from vdnerf_tpu.data.synthetic import make_synthetic_scene
    from vdnerf_tpu.mesh import extract_geometry, mesh_chamfer, save_ply
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
        make_train_step,
    )
    from vdnerf_tpu.utils.hocon import Config

    os.makedirs(args.out, exist_ok=True)
    make_synthetic_scene(args.out, n_images=12, H=128, W=128, focal=160.0,
                         radius=0.5)
    conf = Config({
        "dataset": {
            "data_dir": args.out, "img_dir": "image", "depth_dir": "00",
            "render_cameras_name": "image/cameras_sphere.npz",
            "object_cameras_name": "image/cameras_sphere.npz",
        }
    })
    sd = SceneData(conf["dataset"])
    store = RayStore(sd.images_lis, sd.masks_lis)

    nets = NeuSNetworks(sdf=SDFConfig(), color=RenderConfig(),
                        nerf=NeRFConfig(), renderer=RendererConfig())
    tcfg = TrainConfig(
        batch_size=512, end_iter=args.iters, warm_up_end=200,
        anneal_end=1000, use_white_bkgd=True, use_mask=True, mask_weight=0.1,
    )
    params = init_params(jax.random.PRNGKey(0), nets, 0.3)
    cams = {
        "pose_all": jnp.asarray(sd.pose_all),
        "intrin_inv_all": jnp.asarray(sd.intrinsics_all_inv),
    }
    state = init_state(params, tcfg, cams, jax.random.PRNGKey(1))
    step = jax.jit(make_train_step(nets, tcfg, SceneStatic(H=sd.H, W=sd.W)))

    rng = np.random.default_rng(0)
    t0 = time.time()
    for i in range(args.iters):
        batch = store.sample_pixels(i % sd.n_images, tcfg.batch_size, rng)
        state, m = step(state, batch)
        if i % 500 == 0:
            print(f"iter {i} psnr {float(m['psnr']):.2f} "
                  f"loss {float(m['loss']):.4f}", flush=True)
    print(f"trained {args.iters} iters in {time.time()-t0:.0f}s, "
          f"final psnr {float(m['psnr']):.2f}")

    params = state["params"]

    def neg_sdf(pts):
        return -sdf_value(nets.sdf, params["sdf"], pts)[..., 0]

    verts, tris = extract_geometry(
        sd.object_bbox_min, sd.object_bbox_max, args.resolution, 0.0, neg_sdf
    )
    print(f"mesh: {len(verts)} verts {len(tris)} tris")
    save_ply(os.path.join(args.out, "mesh.ply"), verts, tris)

    def neg_sphere(pts):
        return -(jnp.linalg.norm(pts, axis=-1) - 0.5)

    v_ref, t_ref = extract_geometry(
        [-1, -1, -1], [1, 1, 1], args.resolution, 0.0, neg_sphere
    )
    r = np.linalg.norm(verts, axis=-1)
    keep = r < 0.9  # ignore any spurious far-field surfaces
    remap = -np.ones(len(verts), np.int64)
    remap[keep] = np.arange(keep.sum())
    tk = remap[tris[np.all(keep[tris], axis=1)]]
    metrics = mesh_chamfer(verts[keep], tk, v_ref, t_ref, n_points=50000)
    print("chamfer vs analytic sphere:",
          {k: round(v, 5) for k, v in metrics.items()})
    return metrics


if __name__ == "__main__":
    main()
