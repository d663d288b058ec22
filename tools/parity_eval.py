"""Parity evaluation harness over the reference's bundled pretrained cases.

For every ``pretrained-models/<case>/<variant>/`` directory:
1. parse its ``config.conf`` (raw-text template substitution is already
   baked into these run-recorded configs),
2. import ``ckpt_300000.pth`` through the torch converter (the bundled NeuS
   checkpoints are stripped from this mirror — ``.MISSING_LARGE_BLOBS`` —
   in which case the case is reported SKIPPED),
3. import ``pnf_300000.pth`` when the variant uses learned cameras,
4. if the scene's image data is available, render all validation images and
   report masked/unmasked PSNR + L1, plus a 512^3 mesh.

Usage:
    python tools/parity_eval.py --pretrained_root /root/reference/pretrained-models \
        [--data_root ./depth_data] [--cases pixiu,boat]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def eval_case(variant_dir: str, data_root: str | None) -> dict:
    from vdnerf_tpu.io import (
        import_torch_checkpoint,
        import_torch_pnf_checkpoint,
    )
    from vdnerf_tpu.train import TrainConfig, build_networks
    from vdnerf_tpu.utils.hocon import load_conf

    result = {"variant": variant_dir}
    conf_path = os.path.join(variant_dir, "config.conf")
    if not os.path.exists(conf_path):
        result["status"] = "no config.conf"
        return result
    case = os.path.basename(os.path.dirname(variant_dir))
    conf = load_conf(conf_path, case=case)
    tcfg = TrainConfig.from_conf(conf)
    nets = build_networks(conf, tcfg.extract_depth)
    result["extract_depth"] = tcfg.extract_depth
    result["learnable"] = tcfg.learnable

    ckpt = os.path.join(variant_dir, "ckpt_300000.pth")
    if os.path.exists(ckpt):
        params, it = import_torch_checkpoint(ckpt, nets, tcfg.extract_depth)
        result["ckpt_imported"] = True
        result["iter_step"] = it
    else:
        result["ckpt_imported"] = False
        result["status"] = "ckpt_300000.pth missing (stripped blob)"

    pnf = os.path.join(variant_dir, "pnf_300000.pth")
    if os.path.exists(pnf):
        cams, poses_it = import_torch_pnf_checkpoint(pnf)
        result["pnf_imported"] = True
        result["n_cameras"] = int(cams["pose"]["r"].shape[0])
        result["fx_coef"] = float(cams["focal"]["fx"])
        result["max_pose_delta"] = float(
            np.abs(np.asarray(cams["pose"]["r"])).max()
        )

    if not result.get("ckpt_imported"):
        return result

    # full rendering parity needs the scene images
    data_dir = conf.get_string("dataset.data_dir")
    if data_root:
        data_dir = os.path.join(data_root, case)
    if not os.path.isdir(data_dir):
        result["status"] = f"scene data missing ({data_dir})"
        return result

    from vdnerf_tpu.runner import Runner

    runner = Runner(conf_path, mode="valimg_300000", case=case)
    runner.load_checkpoint_iter(300000)
    summary = runner.val_all_imgs(resolution_level=2, both_mask=True)
    result.update(summary)
    result["status"] = "evaluated"
    return result


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pretrained_root", type=str,
                   default="/root/reference/pretrained-models")
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--cases", type=str, default="")
    p.add_argument("--out", type=str, default="parity_report.json")
    args = p.parse_args(argv)

    from vdnerf_tpu.utils.platforms import apply_jax_platforms_env

    apply_jax_platforms_env()

    wanted = set(args.cases.split(",")) if args.cases else None
    results = []
    for case in sorted(os.listdir(args.pretrained_root)):
        case_dir = os.path.join(args.pretrained_root, case)
        if not os.path.isdir(case_dir) or (wanted and case not in wanted):
            continue
        for variant in sorted(os.listdir(case_dir)):
            vd = os.path.join(case_dir, variant)
            if not os.path.isdir(vd):
                continue
            try:
                r = eval_case(vd, args.data_root)
            except Exception as e:  # noqa: BLE001
                r = {"variant": vd, "status": f"ERROR: {e}"}
            print(json.dumps(r))
            results.append(r)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    n_ok = sum(1 for r in results if r.get("pnf_imported") or r.get("ckpt_imported"))
    print(f"\n{len(results)} variants, {n_ok} with importable checkpoints "
          f"-> {args.out}")


if __name__ == "__main__":
    main()
