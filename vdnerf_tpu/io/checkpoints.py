"""Checkpoint I/O: save/resume + torch-checkpoint import.

Parity with the reference's two-file scheme (dpt_runner.py:350-401):

- ``checkpoints/ckpt_<iter:06d>.npz`` — all field-network params,
  optimizer state, and iter_step (reference keys: nerf / sdf_network_fine /
  variance_network_fine / color_network_fine / depth_network_fine /
  optimizer / iter_step).
- ``pnf_checkpoints/pnf_<iter:06d>.npz`` — learned pose/focal params and
  their optimizer states (reference dpt_runner.py:383-401).
- latest-checkpoint discovery by lexicographic name sort
  (reference dpt_runner.py:148-155).

Serialization: the state pytree (params + optax states, which contain
NamedTuples) is flattened to leaves and written as a single ``.npz`` with
atomic-rename — single-file, preemption-safe, and restorable against any
template with the same tree structure.

:func:`import_torch_checkpoint` converts a reference ``ckpt_*.pth`` into this
framework's parameter pytree (weight_v/weight_g/bias -> v/g/b with the
[out,in] -> [in,out] transpose), enabling PSNR/Chamfer parity evaluation
against the bundled pretrained cases.
"""

from __future__ import annotations

import os
import re
from typing import Any

import io as _io

import jax
import jax.numpy as jnp
import numpy as np


def _path_key(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p)))) for p in path)


def save_state(path: str, state: dict) -> None:
    """Write a pytree as a flattened-leaf npz with atomic rename."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    leaves_with_path = jax.tree_util.tree_flatten_with_path(state)[0]
    arrays = {}
    for i, (p, leaf) in enumerate(leaves_with_path):
        arrays[f"{i:05d}|{_path_key(p)}"] = np.asarray(leaf)
    buf = _io.BytesIO()
    np.savez(buf, **arrays)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)


def restore_state(path: str, template: dict) -> dict:
    """Restore into the structure of ``template`` (leaf order must match)."""
    leaves, treedef = jax.tree_util.tree_flatten(template)
    with np.load(path) as data:
        keys = sorted(data.files, key=lambda k: int(k.split("|")[0]))
        if len(keys) != len(leaves):
            raise ValueError(
                f"checkpoint has {len(keys)} leaves, template has {len(leaves)}"
            )
        new_leaves = [
            jnp.asarray(data[k]).astype(np.asarray(l).dtype)
            for k, l in zip(keys, leaves)
        ]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def checkpoint_path(base_exp_dir: str, iter_step: int, prefix: str = "ckpt") -> str:
    sub = "pnf_checkpoints" if prefix == "pnf" else "checkpoints"
    return os.path.join(base_exp_dir, sub, f"{prefix}_{iter_step:06d}.npz")


def latest_checkpoint(base_exp_dir: str, prefix: str = "ckpt") -> str | None:
    """Lexicographically-latest checkpoint (reference dpt_runner.py:148-155)."""
    sub = "pnf_checkpoints" if prefix == "pnf" else "checkpoints"
    d = os.path.join(base_exp_dir, sub)
    if not os.path.isdir(d):
        return None
    names = [
        n
        for n in os.listdir(d)
        if n.startswith(prefix) and n.endswith((".msgpack", ".npz"))
    ]
    if not names:
        return None
    names.sort()
    return os.path.join(d, names[-1])


def iter_from_name(path: str) -> int:
    m = re.search(r"_(\d+)\.", os.path.basename(path))
    return int(m.group(1)) if m else 0


# ---------------------------------------------------------------------------
# torch -> jax parameter conversion
# ---------------------------------------------------------------------------


def _t2np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy(), dtype=np.float32)


def _convert_linear(sd: dict, torch_prefix: str) -> dict:
    """One (possibly weight-normed) torch Linear -> {v,g,b} or {w,b}."""
    if f"{torch_prefix}.weight_v" in sd:
        return {
            "v": _t2np(sd[f"{torch_prefix}.weight_v"]).T,
            "g": _t2np(sd[f"{torch_prefix}.weight_g"]).reshape(-1),
            "b": _t2np(sd[f"{torch_prefix}.bias"]),
        }
    return {
        "w": _t2np(sd[f"{torch_prefix}.weight"]).T,
        "b": _t2np(sd[f"{torch_prefix}.bias"]),
    }


def _convert_layered(sd: dict, n_layers: int, name: str = "lin") -> dict:
    return {
        "layers": [_convert_linear(sd, f"{name}{l}") for l in range(n_layers)]
    }


def _convert_param_tree(sd_of, nets, extract_depth, ckpt) -> dict:
    """Convert one full set of per-network tensor dicts to our pytree.

    ``sd_of(net_key)`` returns a mapping torch-param-name -> tensor for that
    network; used for the weights themselves AND (with the same names and
    shapes) for the Adam ``exp_avg`` / ``exp_avg_sq`` moment tensors, which
    transform equivariantly under the transpose/reshape layout conversion.
    """
    params: dict[str, Any] = {}
    params["sdf"] = _convert_layered(
        sd_of("sdf_network_fine"), len(nets.sdf.dims) - 1
    )
    params["color"] = _convert_layered(
        sd_of("color_network_fine"), len(nets.color.dims) - 1
    )
    params["variance"] = {
        "variance": _t2np(sd_of("variance_network_fine")["variance"]).reshape(())
    }
    sd = sd_of("nerf")
    nerf_p: dict[str, Any] = {
        "pts_linears": [
            _convert_linear(sd, f"pts_linears.{i}") for i in range(nets.nerf.D)
        ],
        "views_linears": [_convert_linear(sd, "views_linears.0")],
        "feature_linear": _convert_linear(sd, "feature_linear"),
        "alpha_linear": _convert_linear(sd, "alpha_linear"),
        "rgb_linear": _convert_linear(sd, "rgb_linear"),
    }
    if nets.nerf.gen_depth_feats and "dpt_linear.weight" in ckpt["nerf"]:
        nerf_p["dpt_linear"] = _convert_linear(sd, "dpt_linear")
    params["nerf"] = nerf_p

    if extract_depth and ckpt.get("depth_network_fine") is not None:
        params["depth"] = _convert_layered(
            sd_of("depth_network_fine"), len(nets.depth.dims) - 1
        )
    return jax.tree_util.tree_map(jnp.asarray, params)


def _torch_param_index(ckpt, extract_depth) -> dict[tuple[str, str], int]:
    """(net_key, param_name) -> flat torch-optimizer param index.

    Replicates the reference's ``params_to_train`` ordering
    (dpt_runner.py:116-130: nerf, sdf, variance, color[, depth]); within a
    network, ``state_dict()`` key order equals ``parameters()`` registration
    order (these models have no buffers), so the optimizer state's integer
    keys enumerate exactly these names.
    """
    order = ["nerf", "sdf_network_fine", "variance_network_fine",
             "color_network_fine"]
    if extract_depth and ckpt.get("depth_network_fine") is not None:
        order.append("depth_network_fine")
    index: dict[tuple[str, str], int] = {}
    i = 0
    for net in order:
        for name in ckpt[net].keys():
            index[(net, name)] = i
            i += 1
    return index


def import_torch_adam_moments(
    ckpt, nets, extract_depth: bool
) -> tuple[dict, dict, int] | None:
    """Reference ``ckpt['optimizer']`` -> (mu, nu, count) in our layout.

    The torch Adam state dict (dpt_runner.py:355,373) keys parameters by
    their flat position in ``params_to_train``; ``exp_avg``/``exp_avg_sq``
    map 1:1 onto optax ``scale_by_adam``'s ``mu``/``nu`` (identical EMA
    semantics, identical bias-correction convention), converted through the
    same [out,in]->[in,out] layout transforms as the weights. Returns None
    when the checkpoint carries no (or incomplete) optimizer state.
    """
    opt_sd = ckpt.get("optimizer")
    if not opt_sd or not opt_sd.get("state"):
        return None
    state = opt_sd["state"]
    index = _torch_param_index(ckpt, extract_depth)
    if any(i not in state for i in index.values()):
        return None  # partially-stepped optimizer (e.g. frozen nets)

    def sd_of_moment(moment: str):
        def sd_of(net_key: str):
            return {
                name: state[idx][moment]
                for (nk, name), idx in index.items()
                if nk == net_key
            }

        return sd_of

    mu = _convert_param_tree(sd_of_moment("exp_avg"), nets, extract_depth, ckpt)
    nu = _convert_param_tree(
        sd_of_moment("exp_avg_sq"), nets, extract_depth, ckpt
    )
    step = state[next(iter(state))]["step"]
    count = int(step.item() if hasattr(step, "item") else step)
    return mu, nu, count


def import_torch_checkpoint(
    path: str, nets, extract_depth: bool, with_optimizer: bool = False
):
    """Load a reference ``ckpt_*.pth`` -> (params pytree, iter_step).

    ``nets`` is the NeuSNetworks bundle describing layer counts. With
    ``with_optimizer=True`` returns (params, iter_step, moments) where
    ``moments`` is :func:`import_torch_adam_moments`'s result (or None).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    params = _convert_param_tree(lambda k: ckpt[k], nets, extract_depth, ckpt)
    step = int(ckpt.get("iter_step", 0))
    if with_optimizer:
        return params, step, import_torch_adam_moments(ckpt, nets, extract_depth)
    return params, step


def import_torch_pnf_checkpoint(path: str) -> tuple[dict, int]:
    """Load a reference ``pnf_*.pth`` -> (cams pytree pieces, poses_iter)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    pose_sd = ckpt["pose_param_net"]
    intrin_sd = ckpt["intrin_net"]
    cams = {
        "pose": {"r": _t2np(pose_sd["r"]), "t": _t2np(pose_sd["t"])},
        "focal": {"fx": _t2np(intrin_sd["fx"]).reshape(())},
    }
    if "init_c2w" in pose_sd:
        cams["init_c2w"] = _t2np(pose_sd["init_c2w"])
    cams = jax.tree_util.tree_map(jnp.asarray, cams)
    return cams, int(ckpt.get("poses_iter_step", 0))
