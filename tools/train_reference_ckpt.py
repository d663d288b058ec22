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
) -> str:
    """Train the reference stack on the scene; returns the saved .pth path."""
    import numpy as np
    import torch

    from vdnerf_tpu.data.dataset import SceneData
    from vdnerf_tpu.data.rays import RayStore
    from vdnerf_tpu.utils.hocon import Config

    ref_fields, ref_renderer = _ref_modules()

    torch.manual_seed(seed)
    t_sdf = ref_fields.SDFNetwork(**SDF_KW)
    t_color = ref_fields.RenderingNetwork(**COLOR_KW)
    t_nerf = ref_fields.NeRF(**NERF_KW)
    t_var = ref_fields.SingleVarianceNetwork(0.3)
    renderer = ref_renderer.NeuSRenderer(t_nerf, t_sdf, t_var, t_color, None,
                                         **RENDER_KW)
    params_to_train = (
        list(t_nerf.parameters()) + list(t_sdf.parameters())
        + list(t_var.parameters()) + list(t_color.parameters())
    )
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

    # ray generation through our (parity-tested) pixel->ray math; rays are
    # inputs to the model under training, not the thing being compared
    import jax.numpy as jnp

    from vdnerf_tpu.data.cameras import pixels_to_rays
    from vdnerf_tpu.data.dataset import near_far_from_sphere

    rng = np.random.default_rng(seed)
    for it in range(iters):
        img_idx = it % sd.n_images
        b = store.sample_pixels(img_idx, batch, rng)
        rays_o, rays_d = pixels_to_rays(
            jnp.asarray(sd.pose_all[img_idx]),
            jnp.asarray(sd.intrinsics_all_inv[img_idx]),
            jnp.asarray(b["pixels_x"]), jnp.asarray(b["pixels_y"]),
        )
        near, far = near_far_from_sphere(rays_o, rays_d)
        rays_o = torch.from_numpy(np.asarray(rays_o))
        rays_d = torch.from_numpy(np.asarray(rays_d))
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

        optimizer.zero_grad()
        loss.backward()
        optimizer.step()
        if log_every and (it + 1) % log_every == 0:
            print(f"[ref-train] iter {it+1} loss {float(loss):.4f} "
                  f"color {float(color_loss):.4f}", flush=True)

    ckpt = {
        "nerf": t_nerf.state_dict(),
        "sdf_network_fine": t_sdf.state_dict(),
        "variance_network_fine": t_var.state_dict(),
        "color_network_fine": t_color.state_dict(),
        "optimizer": optimizer.state_dict(),
        "iter_step": iters,
    }
    ckpt_dir = os.path.join(out_dir, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"ckpt_{iters:06d}.pth")
    torch.save(ckpt, path)
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
