"""Checkpoint/opts I/O for the monodepth side-car.

Parity with ``wavelet/load_save_utils.py:11-56``: per-epoch model folders
(``models/weights_<epoch>/model.npz``), tolerant partial loading (keys
present in both checkpoint and model are restored, the rest keep their
values), and an ``opts.json`` dump.

Also provides :func:`import_torchvision_densenet`, converting a torchvision
``densenet161`` (or 121/169/201) state_dict into this framework's flax
parameter tree — the path for loading the reference's pretrained encoder.
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: dict) -> dict:
    tree: dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


def save_model(variables: dict, logpath: str, epoch: int) -> str:
    folder = os.path.join(logpath, "models", f"weights_{epoch}")
    os.makedirs(folder, exist_ok=True)
    path = os.path.join(folder, "model.npz")
    np.savez(path, **_flatten(variables))
    return path


def load_model(variables: dict, ckpt_path: str) -> dict:
    """Tolerant partial restore (reference load_save_utils.py:37-44)."""
    with np.load(ckpt_path) as data:
        flat_ckpt = {k: data[k] for k in data.files}
    flat_model = _flatten(variables)
    n_hit = 0
    for k in flat_model:
        if k in flat_ckpt and flat_ckpt[k].shape == flat_model[k].shape:
            flat_model[k] = flat_ckpt[k]
            n_hit += 1
    restored = _unflatten(flat_model)
    import jax.numpy as jnp

    return jax.tree_util.tree_map(jnp.asarray, restored)


def load_model_from_folder(variables: dict, folder: str,
                           name: str = "model.npz") -> dict:
    return load_model(variables, os.path.join(folder, name))


def save_opts(logpath: str, opts) -> None:
    os.makedirs(logpath, exist_ok=True)
    if dataclasses.is_dataclass(opts):
        opts = dataclasses.asdict(opts)
    elif not isinstance(opts, dict):
        opts = vars(opts)
    with open(os.path.join(logpath, "opts.json"), "w") as f:
        json.dump({k: str(v) for k, v in opts.items()}, f, indent=2)


# ---------------------------------------------------------------------------
# torchvision densenet -> flax conversion
# ---------------------------------------------------------------------------


def _conv_w(t) -> np.ndarray:
    # torch conv weight [out, in, kh, kw] -> flax [kh, kw, in, out]
    return np.transpose(np.asarray(t.detach().cpu().numpy()), (2, 3, 1, 0))


def _bn(sd, prefix):
    g = lambda k: np.asarray(sd[f"{prefix}.{k}"].detach().cpu().numpy())
    return (
        {"scale": g("weight"), "bias": g("bias")},
        {"mean": g("running_mean"), "var": g("running_var")},
    )


def import_torchvision_densenet(state_dict, num_layers: int = 161) -> dict:
    """torchvision densenet state_dict -> {'params': ..., 'batch_stats': ...}
    for :class:`vdnerf_tpu.wavelet.encoders.DenseEncoder`.

    Flax module naming inside DenseEncoder:
      conv0, norm0 (stem); denseblock{i}/DenseLayer_{j}/{BatchNorm_0, Conv_0,
      BatchNorm_1, Conv_1}; transition{i}/{BatchNorm_0, Conv_0}.
    """
    from vdnerf_tpu.wavelet.encoders import DENSENET_CONFIGS

    cfg = DENSENET_CONFIGS[num_layers]
    params: dict = {}
    stats: dict = {}

    params["conv0"] = {"kernel": _conv_w(state_dict["features.conv0.weight"])}
    p, s = _bn(state_dict, "features.norm0")
    params["norm0"] = p
    stats["norm0"] = s

    for bi, n_layers in enumerate(cfg["blocks"]):
        bname = f"denseblock{bi+1}"
        bp: dict = {}
        bs: dict = {}
        for li in range(n_layers):
            t_pref = f"features.denseblock{bi+1}.denselayer{li+1}"
            lp: dict = {}
            ls: dict = {}
            p, s = _bn(state_dict, f"{t_pref}.norm1")
            lp["BatchNorm_0"] = p
            ls["BatchNorm_0"] = s
            lp["Conv_0"] = {"kernel": _conv_w(state_dict[f"{t_pref}.conv1.weight"])}
            p, s = _bn(state_dict, f"{t_pref}.norm2")
            lp["BatchNorm_1"] = p
            ls["BatchNorm_1"] = s
            lp["Conv_1"] = {"kernel": _conv_w(state_dict[f"{t_pref}.conv2.weight"])}
            bp[f"DenseLayer_{li}"] = lp
            bs[f"DenseLayer_{li}"] = ls
        params[bname] = bp
        stats[bname] = bs
        if bi < len(cfg["blocks"]) - 1:
            t_pref = f"features.transition{bi+1}"
            p, s = _bn(state_dict, f"{t_pref}.norm")
            params[f"transition{bi+1}"] = {
                "BatchNorm_0": p,
                "Conv_0": {"kernel": _conv_w(state_dict[f"{t_pref}.conv.weight"])},
            }
            stats[f"transition{bi+1}"] = {"BatchNorm_0": s}

    return {"params": params, "batch_stats": stats}
