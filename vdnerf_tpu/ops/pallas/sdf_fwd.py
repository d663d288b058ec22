"""Fused SDF-MLP forward as a Pallas TPU kernel.

One kernel evaluates the entire SDF trunk — positional embedding, all
weight-norm linears (pre-normalized to effective weights on entry), the
softplus(beta=100) activations, and the skip concat — on a tile of points
held in VMEM, writing only the final sdf value back to HBM. Between-layer
activations never touch HBM, which is the point: the dense-grid mesh
extraction (512^3 = 134M queries, reference renderer.py:10-41) is a pure
bandwidth workload for the unfused XLA path.

Gradient-free by design (the callers are the stop-gradient up-sampling
ladder and mesh extraction); training-path gradients keep using the
jnp/VJP implementation.

Measured on the v5e (262k-point chunks, full womsk_white SDF): 11.4 ms/chunk
vs 7.4 ms/chunk for the jitted jnp path — XLA's own fusion wins here because
the chain is MXU-matmul-dominated and the narrow (3/39-wide) embedding ops
waste VPU lanes inside the kernel. Kept as a correctness-tested alternative
backend — select it for mesh extraction with ``VDNERF_MESH_PALLAS=1`` in the
environment (see ``runner.Runner.validate_mesh``) or call
``sdf_value_pallas`` directly; the jnp path stays the default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vdnerf_tpu.models.fields import SDFConfig


def _effective_weights(params) -> tuple[list[jax.Array], list[jax.Array]]:
    ws, bs = [], []
    for p in params["layers"]:
        if "v" in p:
            norm = jnp.linalg.norm(p["v"], axis=0, keepdims=True)
            ws.append(p["v"] * (p["g"][None, :] / norm))
        else:
            ws.append(p["w"])
        bs.append(p["b"])
    return ws, bs


def _make_kernel(cfg: SDFConfig, n_layers: int, tile: int):
    freqs = 2.0 ** np.linspace(0.0, cfg.multires - 1, cfg.multires).astype(
        np.float32
    )

    def kernel(pts_ref, *refs):
        # refs = [w0, b0, w1, b1, ..., out_ref]
        out_ref = refs[-1]
        wbs = refs[:-1]
        pts = pts_ref[:, :3] * cfg.scale  # [T, 3]

        if cfg.multires > 0:
            # frequencies unrolled as python scalars (no captured consts)
            parts = [pts]
            for f in freqs.tolist():
                parts.append(jnp.sin(pts * f))
                parts.append(jnp.cos(pts * f))
            emb = jnp.concatenate(parts, axis=-1)
        else:
            emb = pts

        x = emb
        inv_sqrt2 = np.float32(1.0 / np.sqrt(2.0))
        for l in range(n_layers):
            if l in cfg.skip_in:
                x = jnp.concatenate([x, emb], axis=-1) * inv_sqrt2
            w = wbs[2 * l][:, :]
            b = wbs[2 * l + 1][:, :]
            x = jnp.dot(x, w, preferred_element_type=jnp.float32) + b
            if l < n_layers - 1:
                x = jax.nn.softplus(100.0 * x) * 0.01
        out_ref[:, :] = x[:, :1] / cfg.scale

    return kernel


@functools.partial(jax.jit, static_argnames=("cfg", "tile", "interpret"))
def sdf_value_pallas(
    cfg: SDFConfig, params, pts: jax.Array, tile: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """[N, 3] -> [N, 1] sdf via the fused kernel. N is padded to the tile."""
    ws, bs = _effective_weights(params)
    # value-only: slice the final layer to the sdf column
    ws[-1] = ws[-1][:, :1]
    bs[-1] = bs[-1][:1]
    bs = [b[None, :] for b in bs]  # 2-D for VMEM layout

    n = pts.shape[0]
    n_pad = -(-n // tile) * tile
    if n_pad != n:
        pts = jnp.concatenate(
            [pts, jnp.zeros((n_pad - n, 3), pts.dtype)], axis=0
        )

    n_layers = len(ws)
    kernel = _make_kernel(cfg, n_layers, tile)

    wb_specs = []
    for w, b in zip(ws, bs):
        wb_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        wb_specs.append(pl.BlockSpec(b.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        kernel,
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *wb_specs,
        ],
        out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        interpret=interpret,
    )(pts.astype(jnp.float32), *[x for pair in zip(ws, bs) for x in pair])
    return out[:n]
