"""Build network configs + params from a HOCON model config.

Maps the reference's conf blocks (``model.{nerf,sdf_network,
variance_network,rendering_network,depth_extract_network,neus_renderer}``,
consumed at dpt_runner.py:115-142) onto the frozen config dataclasses and
parameter pytrees of this framework.
"""

from __future__ import annotations

from typing import Any

import jax

from vdnerf_tpu.models.fields import (
    NeRFConfig,
    RenderConfig,
    SDFConfig,
    nerf_init,
    render_net_init,
    sdf_init,
    variance_init,
)
from vdnerf_tpu.ops.renderer import NeuSNetworks, RendererConfig
from vdnerf_tpu.utils.hocon import Config


def _kwargs(block: Config, allowed: set[str]) -> dict[str, Any]:
    out = {}
    for k in block.keys():
        if k in allowed:
            v = block[k]
            if isinstance(v, list):
                v = tuple(v)
            out[k] = v
    return out


def build_networks(conf: Config, extract_depth: bool) -> NeuSNetworks:
    sdf_cfg = SDFConfig(
        **_kwargs(
            conf["model.sdf_network"],
            {
                "d_in", "d_out", "d_hidden", "n_layers", "skip_in", "multires",
                "bias", "scale", "geometric_init", "weight_norm",
                "inside_outside",
            },
        )
    )
    color_cfg = RenderConfig(
        **_kwargs(
            conf["model.rendering_network"],
            {
                "d_feature", "mode", "d_in", "d_out", "d_hidden", "n_layers",
                "weight_norm", "multires_view", "squeeze_out",
            },
        )
    )
    nerf_cfg = NeRFConfig(
        **_kwargs(
            conf["model.nerf"],
            {
                "D", "W", "d_in", "d_in_view", "multires", "multires_view",
                "output_ch", "skips", "rgb_dims", "use_viewdirs",
                "gen_depth_feats", "dpt_dim",
            },
        )
    )
    renderer_cfg = RendererConfig(
        **_kwargs(
            conf["model.neus_renderer"],
            {"n_samples", "n_importance", "n_outside", "up_sample_steps",
             "perturb", "skip_bg_inside", "n_render_samples",
             "resample_uniform_frac"},
        )
    )
    depth_cfg = None
    if extract_depth:
        depth_cfg = RenderConfig(
            **_kwargs(
                conf["model.depth_extract_network"],
                {
                    "d_feature", "mode", "d_in", "d_out", "d_hidden",
                    "n_layers", "weight_norm", "multires_view", "squeeze_out",
                },
            )
        )
    return NeuSNetworks(
        sdf=sdf_cfg, color=color_cfg, nerf=nerf_cfg, renderer=renderer_cfg,
        depth=depth_cfg,
    )


def init_params(key: jax.Array, nets: NeuSNetworks, variance_init_val: float):
    ks = jax.random.split(key, 4)
    params = {
        "nerf": nerf_init(ks[0], nets.nerf),
        "sdf": sdf_init(ks[1], nets.sdf),
        "color": render_net_init(ks[2], nets.color),
        "variance": variance_init(variance_init_val),
    }
    if nets.depth is not None:
        params["depth"] = render_net_init(ks[3], nets.depth)
    return params
