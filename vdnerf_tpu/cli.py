"""Command-line interface, flag- and mode-compatible with the reference
runner (dpt_runner.py:741-786).

Usage:
    python -m vdnerf_tpu.cli --conf confs/womsk_white.conf --case boat \
        --mode train [-d image] [-psfx _colmap] [-c]

Modes: train | validate_mesh_<iter> | interpolate_<i>_<j> |
       getfeats_<iter> | valimg_<iter> | showcam_<iter>
"""

from __future__ import annotations

import argparse
import logging
import os


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--conf", type=str, default="./confs/base.conf")
    parser.add_argument("-m", "--mode", type=str, default="train")
    parser.add_argument("--mcube_threshold", type=float, default=0.0)
    parser.add_argument("-c", "--is_continue", default=False, action="store_true")
    parser.add_argument(
        "--gpu", type=int, default=0,
        help="accepted for reference-CLI compatibility; device selection on "
        "TPU is via the JAX runtime",
    )
    parser.add_argument("--case", type=str, default="")
    parser.add_argument("-d", "--img_dir", type=str, default="image")
    parser.add_argument("-psfx", "--npz_postfix", type=str, default="")
    parser.add_argument("--seed", type=int, default=0)
    return parser


def main(argv=None) -> None:
    logging.basicConfig(
        level=logging.INFO,
        format="[%(filename)s:%(lineno)s - %(funcName)20s() ] %(message)s",
    )
    args = build_parser().parse_args(argv)

    from vdnerf_tpu.utils.platforms import apply_jax_platforms_env

    apply_jax_platforms_env()

    from vdnerf_tpu.runner import Runner

    runner = Runner(
        args.conf, args.mode, args.case,
        img_dir=args.img_dir, npz_postfix=args.npz_postfix,
        is_continue=args.is_continue, seed=args.seed,
    )

    if args.mode == "train":
        runner.train()
    elif args.mode.startswith("validate_mesh"):
        # `validate_mesh_<iter>` loads that checkpoint; plain `validate_mesh`
        # with -c uses the resumed latest checkpoint (the reference README
        # documents this form but its code crashes on it — int('mesh'))
        suffix = args.mode.split("_")[-1]
        if suffix.isdigit():
            runner.load_checkpoint_iter(int(suffix))
        elif not args.is_continue:
            raise SystemExit(
                "validate_mesh needs an iteration suffix or --is_continue"
            )
        runner.validate_mesh(
            world_space=True, resolution=512, threshold=args.mcube_threshold
        )
    elif args.mode.startswith("interpolate"):
        _, i0, i1 = args.mode.split("_")
        runner.interpolate_view(int(i0), int(i1))
    elif args.mode.startswith("getfeats"):
        _, iter_show = args.mode.split("_")
        runner.load_checkpoint_iter(int(iter_show))
        runner.val_all_imgs(
            resolution_level=1, gen_depth_for_finetune=True, both_mask=False
        )
    elif args.mode.startswith("valimg"):
        _, iter_show = args.mode.split("_")
        runner.load_checkpoint_iter(int(iter_show))
        runner.val_all_imgs(
            resolution_level=2, gen_depth_for_finetune=False, both_mask=True
        )
    elif args.mode.startswith("showcam"):
        # `showcam_<iter>` loads that checkpoint (incl. the pnf pose/focal
        # state, io/checkpoints.py) so the exported poses are the LEARNED
        # ones — the reference loads pnf_<iter>.pth here
        # (dpt_runner.py:783-786)
        suffix = args.mode.split("_")[-1]
        if suffix.isdigit():
            runner.load_checkpoint_iter(int(suffix))
        runner.show_cam_pose()
    else:
        raise SystemExit(f"unknown mode: {args.mode}")


if __name__ == "__main__":
    main()
