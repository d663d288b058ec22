"""One wavelet-finetune window at the REFERENCE's training shapes, on TPU.

The reference finetunes its monodepth side-car at 800x800 inputs, batch
size 4, DenseNet-161 (/root/reference/wavelet/finetune_for_vdn.py:28-44);
every at-scale cycle so far trained the side-car at 256^2/bs2 (CPU-budget
shapes), so the reference-shape path had never run end-to-end on the chip
(VERDICT r4 weak #3). This tool runs exactly one such window:

  1. render an 800^2 analytic scene (n views, textured background),
  2. write sphere-traced analytic depth as the ``depth_from_sdf`` pseudo-GT
     (the getfeats-export layout the finetune consumes,
     reference wavelet/data.py:300-366; here the teacher is exact, so the
     window isolates the side-car itself),
  3. mirror the object masks into the wavelet ``mask/`` layout,
  4. run the REAL finetune CLI at image_size=800, bs=4, densenet for
     --epochs epochs, timing every epoch,
  5. write docs-grade evidence (loss trajectory, wall clock, shapes) to
     <out>/wavelet_800_report.json.

Scratch-vs-pretrained encoder note: the reference initializes the encoder
from a torchvision ImageNet DenseNet (finetune_for_vdn.py:53); no such
weights exist in this environment, so this window (like every cycle run)
starts from scratch init. The converter path itself is numerically verified
against a hand-built torch oracle (tests/test_densenet_oracle.py).

Usage: python tools/wavelet_800_run.py [--epochs 3] [--views 8]
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
    p.add_argument("--out", type=str, default="/tmp/vdn_wavelet800")
    p.add_argument("--views", type=int, default=8)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--bs", type=int, default=4)
    p.add_argument("--image-size", type=int, default=800)
    p.add_argument("--encoder", type=str, default="densenet")
    args = p.parse_args(argv)

    from vdnerf_tpu.utils.platforms import apply_jax_platforms_env

    apply_jax_platforms_env()

    import cv2 as cv
    import numpy as np

    from vdnerf_tpu.data.dataset import SceneData
    from vdnerf_tpu.data.synthetic import (
        GEOMETRIES,
        _sphere_trace,
        make_compound_scene,
    )
    from vdnerf_tpu.utils.hocon import Config
    from vdnerf_tpu.wavelet.finetune import finetune

    case = "compound800"
    scene_dir = os.path.join(args.out, case)
    report = {"config": vars(args), "stages": {}}
    os.makedirs(scene_dir, exist_ok=True)

    H = W = args.image_size
    t0 = time.time()
    if not os.path.isdir(os.path.join(scene_dir, "image")):
        make_compound_scene(scene_dir, n_images=args.views, H=H, W=W,
                            background="textured")
    report["stages"]["scene_gen_s"] = round(time.time() - t0, 1)
    print(f"scene: {args.views} views {H}^2 "
          f"({report['stages']['scene_gen_s']}s)", flush=True)

    conf = Config({"dataset": {
        "data_dir": scene_dir, "img_dir": "image", "depth_dir": "00",
        "render_cameras_name": "image/cameras_sphere.npz",
        "object_cameras_name": "image/cameras_sphere.npz",
    }})
    sd = SceneData(conf["dataset"])
    scene_sdf = GEOMETRIES["compound"][0]

    # analytic depth pseudo-GT in the getfeats-export layout (the half-res
    # level-2 export shape the real cycle writes; NeusDataset resizes)
    t1 = time.time()
    sdf_dir = os.path.join(scene_dir, "image", "depth_from_sdf")
    mask_dir = os.path.join(scene_dir, "mask")
    os.makedirs(sdf_dir, exist_ok=True)
    os.makedirs(mask_dir, exist_ok=True)
    dH, dW = H // 2, W // 2
    for i in range(sd.n_images):
        stem = os.path.splitext(os.path.basename(sd.images_lis[i]))[0]
        c2w = sd.pose_all[i].astype(np.float64)
        Kinv = np.linalg.inv(sd.intrinsics_all[i][:3, :3]).astype(np.float64)
        xs, ys = np.meshgrid(np.arange(dW), np.arange(dH))
        pix = np.stack([(xs + 0.5) * W / dW, (ys + 0.5) * H / dH,
                        np.ones_like(xs)], axis=-1).astype(np.float64)
        d = pix @ Kinv.T
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        d = d @ c2w[:3, :3].T
        o = np.broadcast_to(c2w[:3, 3], d.shape)
        cam_dist = float(np.linalg.norm(c2w[:3, 3]))
        t, hit = _sphere_trace(o, d, cam_dist - 1.0, cam_dist + 1.0,
                               sdf=scene_sdf)
        depth = np.where(hit, t, 4.0).astype(np.float32)
        np.save(os.path.join(sdf_dir, f"sdf_{stem}.npy"), depth)
        m = cv.imread(os.path.join(scene_dir, "image", "eval_mask",
                                   f"{stem}.png"), 0)
        cv.imwrite(os.path.join(mask_dir, f"{stem}.png"),
                   np.repeat(m[..., None], 3, axis=-1))
    report["stages"]["depth_gt_s"] = round(time.time() - t1, 1)
    print(f"analytic depth GT: {sd.n_images} maps {dH}x{dW} "
          f"({report['stages']['depth_gt_s']}s)", flush=True)

    # the REAL finetune CLI at the reference's shapes
    t2 = time.time()
    logdir = os.path.join(args.out, "wavelet_log800")
    logpath = finetune([
        "-r", args.out, "--case", case,
        "--epochs", str(args.epochs),
        "-bs", str(args.bs),
        "--image_size", str(args.image_size),
        "--encoder_type", args.encoder,
        "--logdir", logdir,
        "--val_freq", "4", "--save_freq", str(args.epochs),
        "--log_every", "1",
    ])
    report["stages"]["finetune_s"] = round(time.time() - t2, 1)

    # pull the loss trajectory out of the finetune's TRAIN metrics log
    # (the log dir also holds val/metrics.jsonl — a single end-of-run
    # record; keep the per-step train stream)
    metrics_path = None
    for root, _dirs, files in os.walk(logpath):
        for f in files:
            if f == "metrics.jsonl" and os.path.basename(root) == "train":
                metrics_path = os.path.join(root, f)
    losses = []
    if metrics_path:
        with open(metrics_path) as f:
            for line in f:
                rec = json.loads(line)
                if "loss" in rec:
                    losses.append(rec["loss"])
    report["loss_first"] = round(losses[0], 5) if losses else None
    report["loss_last"] = round(losses[-1], 5) if losses else None
    report["n_loss_records"] = len(losses)
    report["losses_finite"] = bool(np.isfinite(losses).all()) if losses else None
    # per-batch losses are noisy at ceil(views/bs) iters per epoch —
    # compare epoch MEANS, first vs last
    ipe = max(1, -(-args.views // args.bs))
    report["iters_per_epoch"] = ipe
    if len(losses) >= 2 * ipe:
        first_m = float(np.mean(losses[:ipe]))
        last_m = float(np.mean(losses[-ipe:]))
        report["first_epoch_mean_loss"] = round(first_m, 5)
        report["last_epoch_mean_loss"] = round(last_m, 5)
        report["loss_descended"] = bool(last_m < first_m)
    else:
        report["loss_descended"] = (
            bool(losses[-1] < losses[0]) if len(losses) >= 2 else None
        )
    ckpts = []
    for root, _dirs, files in os.walk(logpath):
        ckpts += [os.path.join(root, f) for f in files if f == "model.npz"]
    report["checkpoint_saved"] = bool(ckpts)

    out_path = os.path.join(args.out, "wavelet_800_report.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({
        "epochs": args.epochs, "bs": args.bs,
        "image_size": args.image_size,
        "finetune_wall_s": report["stages"]["finetune_s"],
        "loss_first": report["loss_first"],
        "loss_last": report["loss_last"],
        "first_epoch_mean_loss": report.get("first_epoch_mean_loss"),
        "last_epoch_mean_loss": report.get("last_epoch_mean_loss"),
        "loss_descended": report["loss_descended"],
    }), flush=True)
    return report


if __name__ == "__main__":
    main()
