"""Measure the ACTUAL reference implementation's training-step time on this
host (CPU torch — no GPU is available here), at the exact flagship workload:
8x256 SDF / 4x256 color / 8x256 bg NeRF, 64+64+32 samples, 512 rays, the
full loss (L1 color + eikonal + mask BCE) and Adam.

This is a supplementary, honestly-labeled datum: the reference targets a
single CUDA GPU (torch==1.8, README.md:9), for which BASELINE.md assumes
~3k rays/s; bench.py's vs_baseline keeps that GPU assumption. This script
records what the same code actually does on this machine's CPUs so the
comparison chain has one fully-measured link.

Writes docs/REFERENCE_CPU_BASELINE.json. Reference: dpt_runner.py:173-299
(train loop), dpt_models/renderer.py:332-439 (render).
"""

from __future__ import annotations

import json
import os
import sys
import time
import types

REFERENCE = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--out", type=str,
                   default=os.path.join(REPO, "docs",
                                        "REFERENCE_CPU_BASELINE.json"))
    args = p.parse_args(argv)

    import numpy as np
    import torch

    # stub the reference's unavailable deps (unused in the train path)
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
    from dpt_models import fields as ref_fields
    from dpt_models import renderer as ref_renderer
    sys.path.pop(0)

    torch.manual_seed(0)
    t_sdf = ref_fields.SDFNetwork(
        d_in=3, d_out=257, d_hidden=256, n_layers=8, skip_in=[4], multires=6,
        bias=0.5, scale=1.0, geometric_init=True, weight_norm=True,
    )
    t_color = ref_fields.RenderingNetwork(
        d_feature=256, mode="idr", d_in=9, d_out=3, d_hidden=256, n_layers=4,
        weight_norm=True, multires_view=4, squeeze_out=True,
    )
    t_nerf = ref_fields.NeRF(
        D=8, W=256, d_in=4, d_in_view=3, multires=10, multires_view=4,
        skips=[4], use_viewdirs=True,
    )
    t_var = ref_fields.SingleVarianceNetwork(0.3)
    renderer = ref_renderer.NeuSRenderer(
        t_nerf, t_sdf, t_var, t_color, None,
        n_samples=64, n_importance=64, n_outside=32, up_sample_steps=4,
        perturb=1.0,
    )
    params = (
        list(t_sdf.parameters()) + list(t_color.parameters())
        + list(t_nerf.parameters()) + list(t_var.parameters())
    )
    opt = torch.optim.Adam(params, lr=5e-4)

    B = args.batch
    rng = np.random.default_rng(0)

    def make_rays():
        o = np.tile([[0.0, 0.0, 3.0]], (B, 1)).astype(np.float32)
        d = rng.normal(size=(B, 3)).astype(np.float32)
        d[:, 2] = -3.0
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        mid = -np.sum(o * d, axis=1, keepdims=True)
        return (torch.from_numpy(o), torch.from_numpy(d),
                torch.from_numpy((mid - 1.0).astype(np.float32)),
                torch.from_numpy((mid + 1.0).astype(np.float32)))

    def step():
        o, d, near, far = make_rays()
        true_rgb = torch.rand(B, 3)
        mask = torch.ones(B, 1)
        out = renderer.render(o, d, near, far,
                              background_rgb=torch.ones(1, 3),
                              cos_anneal_ratio=0.5)
        color_fine = out["color_fine"]
        mask_sum = mask.sum() + 1e-5
        color_error = (color_fine - true_rgb) * mask
        color_loss = torch.nn.functional.l1_loss(
            color_error, torch.zeros_like(color_error), reduction="sum"
        ) / mask_sum
        eikonal_loss = out["gradient_error"]
        mask_loss = torch.nn.functional.binary_cross_entropy(
            out["weight_sum"].clip(1e-3, 1.0 - 1e-3), mask
        )
        loss = color_loss + eikonal_loss * 0.1 + mask_loss * 0.0
        opt.zero_grad()
        loss.backward()
        opt.step()
        return float(loss)

    step()  # warm-up (allocator, denormal paths)
    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        loss = step()
        times.append(time.perf_counter() - t0)
        print(f"  ref step {times[-1]*1e3:.0f} ms loss={loss:.4f}",
              file=sys.stderr, flush=True)
    best = min(times)
    report = {
        "what": ("reference torch implementation, flagship workload "
                 "(8x256 SDF, 64+64+32 samples), full loss + Adam, "
                 "batch 512, CPU"),
        "host_torch": torch.__version__,
        "cpu_count": os.cpu_count(),
        "best_step_ms": round(best * 1e3, 1),
        "rays_per_sec_cpu": round(B / best, 1),
        "note": ("the reference targets a single CUDA GPU (torch==1.8); "
                 "BASELINE.md's assumed ~3k rays/s GPU figure remains the "
                 "vs_baseline denominator in bench.py — this file records "
                 "the measured CPU datum on this host for context"),
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
