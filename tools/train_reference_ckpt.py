"""Train the REFERENCE (torch) implementation on CPU and save a reference-
format checkpoint.

The bundled ``ckpt_300000.pth`` blobs are stripped from the reference mirror
(``.MISSING_LARGE_BLOBS``), so checkpoint-import parity could otherwise only
be tested against random weights. This script produces a *trained* torch
checkpoint: it builds the reference's own networks + NeuSRenderer
(/root/reference/dpt_models), runs the reference's training objective
(L1 color + 0.1 eikonal + mask BCE, dpt_runner.py:227-257) with Adam on a
synthetic scene, and saves the exact two-file checkpoint layout
(``checkpoints/ckpt_<iter>.pth`` with the reference's state_dict keys,
dpt_runner.py:366-381).

``tests/test_selftrained_parity.py`` consumes the result: imports it through
``import_torch_checkpoint`` and verifies our renderer reproduces the trained
torch model's images end-to-end.

Usage:
    python tools/train_reference_ckpt.py --scene_dir /tmp/scene \
        --out_dir /tmp/ref_exp [--iters 300]
"""

from __future__ import annotations

import argparse
import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE = "/root/reference"

# small-but-structured dims (the reference's code paths, CPU-feasible)
SDF_KW = dict(d_in=3, d_out=65, d_hidden=64, n_layers=4, skip_in=[2],
              multires=6, bias=0.5, scale=1.0, geometric_init=True,
              weight_norm=True)
COLOR_KW = dict(d_feature=64, mode="idr", d_in=9, d_out=3, d_hidden=64,
                n_layers=2, weight_norm=True, multires_view=4,
                squeeze_out=True)
NERF_KW = dict(D=2, W=64, d_in=4, d_in_view=3, multires=4, multires_view=2,
               skips=[4], use_viewdirs=True)
RENDER_KW = dict(n_samples=16, n_importance=16, n_outside=8,
                 up_sample_steps=4, perturb=1.0)
# small depth-extract head for the wdepth checkpoint format
# (reference dpt_runner.py builds it from model.depth_extract_network and
# saves it as 'depth_network_fine', dpt_runner.py:366-381)
DPT_DIM = 4
DEPTH_KW = dict(d_feature=64, mode="idr", d_in=9, d_out=DPT_DIM, d_hidden=64,
                n_layers=2, weight_norm=True, multires_view=4,
                squeeze_out=True)


def _ref_modules():
    for name, attrs in (
        ("mcubes", {"marching_cubes": lambda *a, **k: None}),
        ("icecream", {"ic": lambda *a, **k: a}),
    ):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[name] = mod
    sys.path.insert(0, REFERENCE)
    try:
        from dpt_models import fields as ref_fields  # noqa: PLC0415
        from dpt_models import renderer as ref_renderer  # noqa: PLC0415
    finally:
        sys.path.pop(0)
    return ref_fields, ref_renderer


def train_reference_checkpoint(
    scene_dir: str,
    out_dir: str,
    iters: int = 300,
    batch: int = 128,
    lr: float = 5e-4,
    mask_weight: float = 0.1,
    seed: int = 0,
    log_every: int = 100,
    extract_depth: bool = False,
    learnable: bool = False,
) -> str:
    """Train the reference stack on the scene; returns the saved .pth path.

    extract_depth=True exercises the reference's wdepth format: the
    depth-extract RenderingNetwork joins the renderer, the ramped
    feature-distillation L1 joins the loss (dpt_runner.py:239-247), and the
    checkpoint carries 'depth_network_fine' (dpt_runner.py:366-381).
    learnable=True exercises the learned-camera format: rays are generated
    THROUGH the reference's LearnPose/LearnIntrin nets from noisy initial
    poses (dpt_models/poses.py:16-93,189-212) and the run saves the two-file
    scheme — ckpt_*.pth + pnf_*.pth (dpt_runner.py:383-401)."""
    import numpy as np
    import torch

    from vdnerf_tpu.data.dataset import SceneData
    from vdnerf_tpu.data.rays import RayStore
    from vdnerf_tpu.utils.hocon import Config

    ref_fields, ref_renderer = _ref_modules()

    torch.manual_seed(seed)
    t_sdf = ref_fields.SDFNetwork(**SDF_KW)
    t_color = ref_fields.RenderingNetwork(**COLOR_KW)
    # wdepth: the bg NeRF grows its dpt head too (the outside block must
    # contribute features to the composite, renderer.py:123,295-299)
    nerf_kw = (dict(NERF_KW, gen_depth_feats=True, dpt_dim=DPT_DIM)
               if extract_depth else NERF_KW)
    t_nerf = ref_fields.NeRF(**nerf_kw)
    t_var = ref_fields.SingleVarianceNetwork(0.3)
    t_depth = ref_fields.RenderingNetwork(**DEPTH_KW) if extract_depth else None
    renderer = ref_renderer.NeuSRenderer(t_nerf, t_sdf, t_var, t_color,
                                         t_depth, **RENDER_KW)
    params_to_train = (
        list(t_nerf.parameters()) + list(t_sdf.parameters())
        + list(t_var.parameters()) + list(t_color.parameters())
    )
    if extract_depth:
        params_to_train += list(t_depth.parameters())
    optimizer = torch.optim.Adam(params_to_train, lr=lr)

    conf = Config({
        "dataset": {
            "data_dir": scene_dir, "img_dir": "image", "depth_dir": "00",
            "render_cameras_name": "image/cameras_sphere.npz",
            "object_cameras_name": "image/cameras_sphere.npz",
        }
    })
    sd = SceneData(conf["dataset"])
    store = RayStore(sd.images_lis, sd.masks_lis)

    pose_param_net = intrin_net = None
    optimizer_pose = optimizer_focal = None
    if learnable:
        # the reference's learn setup (dpt_runner.py:88-100): LearnPose /
        # LearnIntrin from the (here: noise-perturbed) initial cameras
        sys.path.insert(0, REFERENCE)
        try:
            from dpt_models.poses import LearnIntrin, LearnPose  # noqa: PLC0415
        finally:
            sys.path.pop(0)
        from vdnerf_tpu.data.cameras import perturb_poses

        noisy = perturb_poses(sd.pose_all, np.random.default_rng(seed + 7))
        pose_param_net = LearnPose(
            sd.n_images, True, True,
            init_c2w=torch.from_numpy(np.asarray(noisy, np.float32)),
        )
        intrin_net = LearnIntrin(
            sd.H, sd.W, req_grad=True, fx_only=True, order=2,
            # the reference passes its dataset's focal as a torch tensor
            init_focal=torch.tensor(float(sd.focal)),
        )
        # the reference hard-codes .to('cuda') in LearnIntrin.forward; this
        # CPU run just repoints the attribute (driving their code, unchanged)
        intrin_net.device = torch.device("cpu")
        optimizer_pose = torch.optim.Adam(pose_param_net.parameters(), lr=lr)
        optimizer_focal = torch.optim.Adam(intrin_net.parameters(), lr=lr)

    # synthetic per-image teacher feature maps for the distillation loss
    # (stand-in for the wavelet predictions the real pipeline bilinearly
    # samples per ray, poses.py:209-212); smooth multi-frequency functions
    # of the pixel grid so the loss has structure to fit
    gt_feat_maps = None
    if extract_depth:
        ys, xs = np.meshgrid(np.arange(sd.H), np.arange(sd.W), indexing="ij")
        freqs = np.linspace(1.0, 3.0, DPT_DIM)
        gt_feat_maps = 0.5 + 0.5 * np.sin(
            freqs[:, None, None] * (xs / sd.W + 0.7 * ys / sd.H)[None]
            * 2 * np.pi
        )
        gt_feat_maps = np.repeat(
            gt_feat_maps.transpose(1, 2, 0)[None], sd.n_images, axis=0
        ).astype(np.float32)  # [n, H, W, C]

    # ray generation through our (parity-tested) pixel->ray math for the
    # static case; learnable runs generate rays through the torch pose/
    # intrin nets so pose gradients flow (the thing the format must carry)
    import jax.numpy as jnp

    from vdnerf_tpu.data.cameras import pixels_to_rays
    from vdnerf_tpu.data.dataset import near_far_from_sphere

    depth_start_iter = iters // 4 if extract_depth else iters

    rng = np.random.default_rng(seed)
    for it in range(iters):
        img_idx = it % sd.n_images
        b = store.sample_pixels(img_idx, batch, rng)
        if learnable:
            # reference gen_random_rays_at math (poses.py:189-212)
            pose = pose_param_net(img_idx)
            intrinsic_inv = torch.inverse(intrin_net())
            p = torch.stack([
                torch.from_numpy(b["pixels_x"]).float(),
                torch.from_numpy(b["pixels_y"]).float(),
                torch.ones(batch),
            ], dim=-1)
            p = torch.matmul(
                intrinsic_inv[None, :3, :3], p[:, :, None]
            ).squeeze(-1)
            rays_d = p / torch.linalg.norm(p, ord=2, dim=-1, keepdim=True)
            rays_d = torch.matmul(
                pose[None, :3, :3], rays_d[:, :, None]
            ).squeeze(-1)
            rays_o = pose[None, :3, 3].expand(rays_d.shape)
            near_j, far_j = near_far_from_sphere(
                jnp.asarray(rays_o.detach().numpy()),
                jnp.asarray(rays_d.detach().numpy()),
            )
            near = torch.from_numpy(np.asarray(near_j))
            far = torch.from_numpy(np.asarray(far_j))
        else:
            rays_o_j, rays_d_j = pixels_to_rays(
                jnp.asarray(sd.pose_all[img_idx]),
                jnp.asarray(sd.intrinsics_all_inv[img_idx]),
                jnp.asarray(b["pixels_x"]), jnp.asarray(b["pixels_y"]),
            )
            near, far = near_far_from_sphere(rays_o_j, rays_d_j)
            rays_o = torch.from_numpy(np.asarray(rays_o_j))
            rays_d = torch.from_numpy(np.asarray(rays_d_j))
            near = torch.from_numpy(np.asarray(near))
            far = torch.from_numpy(np.asarray(far))
        true_rgb = torch.from_numpy(b["color"])
        mask = (torch.from_numpy(b["mask"]) > 0.1).float()
        mask_sum = mask.sum() + 1e-5

        out = renderer.render(
            rays_o, rays_d, near, far,
            background_rgb=torch.ones(1, 3),
            cos_anneal_ratio=min(1.0, it / max(iters // 4, 1)),
        )
        color_error = (out["color_fine"] - true_rgb) * mask
        color_loss = color_error.abs().sum() / mask_sum
        eikonal_loss = out["gradient_error"]
        w = out["weight_sum"].clip(1e-3, 1.0 - 1e-3)
        mask_loss = torch.nn.functional.binary_cross_entropy(w, mask)
        loss = color_loss + 0.1 * eikonal_loss + mask_weight * mask_loss
        if extract_depth and it > depth_start_iter:
            gt_feats = torch.from_numpy(
                gt_feat_maps[img_idx][b["pixels_y"], b["pixels_x"]]
            )
            dfe = (out["render_feats"] - gt_feats) * mask
            loss = loss + dfe.abs().sum() / mask_sum

        optimizer.zero_grad()
        if learnable:
            optimizer_pose.zero_grad()
            optimizer_focal.zero_grad()
        loss.backward()
        optimizer.step()
        if learnable:
            optimizer_pose.step()
            optimizer_focal.step()
        if log_every and (it + 1) % log_every == 0:
            print(f"[ref-train] iter {it+1} loss {float(loss):.4f} "
                  f"color {float(color_loss):.4f}", flush=True)

    ckpt = {
        "nerf": t_nerf.state_dict(),
        "sdf_network_fine": t_sdf.state_dict(),
        "variance_network_fine": t_var.state_dict(),
        "color_network_fine": t_color.state_dict(),
        # the reference always writes the key (None when not extract_depth)
        "depth_network_fine": (t_depth.state_dict() if extract_depth
                               else None),
        "optimizer": optimizer.state_dict(),
        "iter_step": iters,
    }
    ckpt_dir = os.path.join(out_dir, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"ckpt_{iters:06d}.pth")
    torch.save(ckpt, path)
    if learnable:
        pnf = {
            "intrin_net": intrin_net.state_dict(),
            "pose_param_net": pose_param_net.state_dict(),
            "optimizer_focal": optimizer_focal.state_dict(),
            "optimizer_pose": optimizer_pose.state_dict(),
            "poses_iter_step": iters,
        }
        pnf_dir = os.path.join(out_dir, "pnf_checkpoints")
        os.makedirs(pnf_dir, exist_ok=True)
        torch.save(pnf, os.path.join(pnf_dir, f"pnf_{iters:06d}.pth"))
        print(f"saved {path} + pnf_{iters:06d}.pth")
    else:
        print(f"saved {path}")
    return path


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--scene_dir", type=str, default="/tmp/vdn_ref_scene")
    p.add_argument("--out_dir", type=str, default="/tmp/vdn_ref_exp")
    p.add_argument("--iters", type=int, default=300)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--make_scene", action="store_true", default=True)
    args = p.parse_args(argv)

    from vdnerf_tpu.utils.platforms import apply_jax_platforms_env

    apply_jax_platforms_env()

    if args.make_scene and not os.path.isdir(
        os.path.join(args.scene_dir, "image")
    ):
        from vdnerf_tpu.data.synthetic import make_synthetic_scene

        make_synthetic_scene(args.scene_dir, n_images=4, H=64, W=64)
    return train_reference_checkpoint(
        args.scene_dir, args.out_dir, args.iters, args.batch
    )


if __name__ == "__main__":
    main()
