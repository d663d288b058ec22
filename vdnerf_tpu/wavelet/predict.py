"""Feature-extraction CLI: export 96-channel encoder features per image.

Parity with ``wavelet/predict.py:96-202``: for each ``.png`` in the input
folder, optionally mask-composite (``--type msk``) or 2x upscale
(``-full``), flatten RGBA to white, run the encoder, and save the FIRST
feature tap (96 channels at H/2) as ``wavelet_feats[_msk][_full]/0/<stem>.npy``
in NCHW layout — the exact interface the NeuS ``depth_dir`` consumes
(confs/*wdepth*.conf + reference poses.py:133-146).

Also provides :func:`feat_to_img`, the PCA-to-RGB visualization
(reference predict.py:68-93).

Usage:
    python -m vdnerf_tpu.wavelet.predict -ckpt <folder> -d <image folder>
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

try:
    import cv2 as cv
except ImportError:  # pragma: no cover
    cv = None


def feat_to_img(featmap: np.ndarray, max_value=None) -> np.ndarray:
    """[C, H, W] features -> [H, W, 3] PCA-projected RGB in [0, 1]."""
    c, h, w = featmap.shape
    vecs = featmap.reshape(c, -1)
    cov = np.cov(vecs)
    _, vect = np.linalg.eigh(cov)
    proj = vect[:, -3:].T @ vecs  # top-3 principal components
    fm = proj.reshape(3, h, w)
    if max_value is None:
        lo, hi = fm.min(), fm.max()
        rgb = 0.5 + (fm - lo) / max(hi - lo, 1e-9) * 0.5
    else:
        rgb = (fm / max_value).clip(-1, 1) * 0.5 + 0.5
    return np.transpose(rgb, (1, 2, 0))


def build_parser():
    p = argparse.ArgumentParser(description="96-ch feature extraction")
    p.add_argument("--gpu", type=int, default=0)
    p.add_argument("--logdir", type=str, default="log")
    p.add_argument("--model_name", type=str, default="DenseNetWaveLet")
    p.add_argument("-ckpt", "--ckpt_folder", type=str, required=True)
    p.add_argument("--ckpt_name", type=str, default="model.npz")
    p.add_argument("--normalize_input", action="store_true")
    p.add_argument("--encoder_type", type=str, default="densenet")
    p.add_argument("--use_wavelets", action="store_true", default=True)
    p.add_argument("--no_pretrained", action="store_true", default=False)
    p.add_argument("--dw_waveconv", action="store_true")
    p.add_argument("--dw_upconv", action="store_true")
    p.add_argument("-full", "--is_full", action="store_true")
    p.add_argument("--use_224", action="store_true", default=False)
    p.add_argument("-d", "--pic_routine", default="./predict_data/")
    p.add_argument("--type", type=str, default="")
    p.add_argument("--save_vis", action="store_true",
                   help="also save the PCA-RGB visualization PNG")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    from vdnerf_tpu.wavelet.io import load_model_from_folder
    from vdnerf_tpu.wavelet.model import WaveletOpts, create_model

    opts = WaveletOpts(
        encoder_type=args.encoder_type,
        normalize_input=args.normalize_input,
        use_wavelets=args.use_wavelets,
        use_224=args.use_224,
    )

    depth_folder = os.path.join(args.pic_routine, "wavelet_feats")
    if args.type == "msk":
        depth_folder += "_msk"
    if args.is_full:
        depth_folder += "_full"
    out_dir = os.path.join(depth_folder, "0")
    os.makedirs(out_dir, exist_ok=True)

    files = sorted(
        f for f in os.listdir(args.pic_routine) if f.endswith(".png")
    )
    print(f"[Info] {len(files)} images in {args.pic_routine}")

    model = variables = encode = None
    for fname in files:
        pic = cv.imread(os.path.join(args.pic_routine, fname), -1)
        if args.type == "msk":
            mask = cv.imread(os.path.join(args.pic_routine, "mask", fname)) / 255
            pic = pic * mask + (1 - mask) * 255
        if args.is_full:
            pic = cv.resize(pic, (0, 0), fx=2, fy=2)
        if pic.shape[-1] == 4:
            rgb, a = pic[..., :3], pic[..., 3:] / 255.0
            pic = rgb * a + (1.0 - a) * 255
        x = (pic.astype(np.float32) / 255.0)[None]  # [1, H, W, 3] NHWC

        if model is None:
            model, variables = create_model(
                jax.random.PRNGKey(0), opts, x.shape[1:3]
            )
            variables = load_model_from_folder(
                variables, args.ckpt_folder, args.ckpt_name
            )
            encode = jax.jit(
                lambda v, x: model.apply(v, x, train=False,
                                         method=model.encode)[0]
            )

        feat = np.asarray(encode(variables, jnp.asarray(x)))  # [1, H/2, W/2, 96]
        feat_nchw = np.transpose(feat, (0, 3, 1, 2))  # parity: NCHW npy
        np.save(os.path.join(out_dir, fname[:-4] + ".npy"), feat_nchw)
        if args.save_vis:
            vis = feat_to_img(feat_nchw[0], max_value=8)
            cv.imwrite(
                os.path.join(depth_folder, fname[:-4] + "_vis.png"),
                np.uint8(vis * 255),
            )
        print(f"{fname} Saved")


if __name__ == "__main__":
    main()
