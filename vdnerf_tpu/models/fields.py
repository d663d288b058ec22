"""Neural fields: SDF MLP, rendering heads, background NeRF, variance scalar.

Pure-functional JAX rebuilds with capability parity to the reference's
``dpt_models/fields.py``:

- :class:`SDFConfig` / ``sdf_init`` / ``sdf_apply``:
  8x256 softplus(beta=100) MLP, skip connection at layer 4 (concat with the
  embedded input, / sqrt(2)), geometric (sphere) initialization, weight norm
  on every linear, d_out = 257 = sdf + 256-d geometry feature, input/output
  ``scale`` (reference fields.py:9-108).
- ``sdf_value_grad_feat``: fused value + spatial gradient + feature in one
  batched forward + one batched VJP (replaces torch's per-call
  ``autograd.grad(create_graph=True)``, reference fields.py:97-108). The VJP
  composes under an outer ``jax.grad`` for the second-order eikonal term.
- :class:`RenderConfig` / ``render_net_init`` / ``render_net_apply``:
  IDR-style color MLP over [pts, embedded view dirs, normals, features];
  the same module doubles as the 96-channel depth-feature head
  (reference fields.py:112-176, instantiated at dpt_runner.py:120,129).
- :class:`NeRFConfig` / ``nerf_init`` / ``nerf_apply``: background NeRF over
  inverted-sphere coordinates with optional depth-feature output head
  (reference fields.py:264-355).
- ``variance_init`` / ``variance_apply``: the single learnable logistic-CDF
  sharpness parameter, inv_s = exp(10 * variance) (reference fields.py:358-364).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from vdnerf_tpu.models.embedder import get_embedder
from vdnerf_tpu.models.layers import init_linear, linear, softplus_beta

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# SDF network
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SDFConfig:
    d_in: int = 3
    d_out: int = 257
    d_hidden: int = 256
    n_layers: int = 8
    skip_in: tuple[int, ...] = (4,)
    multires: int = 6
    bias: float = 0.5
    scale: float = 1.0
    geometric_init: bool = True
    weight_norm: bool = True
    inside_outside: bool = False

    @property
    def dims(self) -> tuple[int, ...]:
        _, input_ch = get_embedder(self.multires, self.d_in)
        d0 = input_ch if self.multires > 0 else self.d_in
        return (d0,) + (self.d_hidden,) * self.n_layers + (self.d_out,)


def sdf_init(key: jax.Array, cfg: SDFConfig) -> Params:
    dims = cfg.dims
    n_linear = len(dims) - 1
    keys = jax.random.split(key, n_linear)
    layers = []
    for l in range(n_linear):
        d_in_l = dims[l]
        out_dim = dims[l + 1] - dims[0] if (l + 1) in cfg.skip_in else dims[l + 1]
        w = b = None
        if cfg.geometric_init:
            kw = keys[l]
            if l == n_linear - 1:
                # final layer: SDF of a sphere of radius `bias` at init
                mean = np.sqrt(np.pi) / np.sqrt(dims[l])
                if cfg.inside_outside:
                    mean = -mean
                w = mean + 1e-4 * jax.random.normal(kw, (d_in_l, out_dim))
                b = jnp.full((out_dim,), cfg.bias if cfg.inside_outside else -cfg.bias)
            elif cfg.multires > 0 and l == 0:
                std = np.sqrt(2) / np.sqrt(out_dim)
                w_xyz = std * jax.random.normal(kw, (3, out_dim))
                w = jnp.concatenate(
                    [w_xyz, jnp.zeros((d_in_l - 3, out_dim))], axis=0
                )
                b = jnp.zeros((out_dim,))
            elif cfg.multires > 0 and l in cfg.skip_in:
                std = np.sqrt(2) / np.sqrt(out_dim)
                w = std * jax.random.normal(kw, (d_in_l, out_dim))
                # zero the columns consuming the skip-appended PE features
                n_pe = dims[0] - 3
                w = w.at[-n_pe:, :].set(0.0)
                b = jnp.zeros((out_dim,))
            else:
                std = np.sqrt(2) / np.sqrt(out_dim)
                w = std * jax.random.normal(kw, (d_in_l, out_dim))
                b = jnp.zeros((out_dim,))
            w = w.astype(jnp.float32)
            b = b.astype(jnp.float32)
        layers.append(
            init_linear(
                keys[l], d_in_l, out_dim,
                weight_norm=cfg.weight_norm, w_init=w, b_init=b,
            )
        )
    return {"layers": layers}


def sdf_apply_split(
    cfg: SDFConfig, params: Params, pts: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """[N, 3] -> (sdf [N, 1] fp32, feature [N, d_out-1] compute dtype).

    The sdf channel drives compositing math, so it is always fp32; the
    geometry feature stays in the matmul compute dtype (bf16 under the
    mixed-precision policy) — its consumer is another matmul.
    """
    embed_fn, _ = get_embedder(cfg.multires, cfg.d_in)
    inputs = embed_fn(pts * cfg.scale)
    x = inputs
    n_linear = len(cfg.dims) - 1
    inv_sqrt2 = 1.0 / np.sqrt(2)
    for l in range(n_linear):
        if l in cfg.skip_in:
            x = jnp.concatenate(
                [x, inputs.astype(x.dtype)], axis=-1
            ) * jnp.asarray(inv_sqrt2, x.dtype)
        x = linear(params["layers"][l], x)
        if l < n_linear - 1:
            x = softplus_beta(x, beta=100.0)
    sdf = x[..., :1].astype(jnp.float32) / cfg.scale
    return sdf, x[..., 1:]


def sdf_apply(cfg: SDFConfig, params: Params, pts: jax.Array) -> jax.Array:
    """[N, 3] -> [N, d_out] = [sdf | geometry feature], fp32."""
    sdf, feat = sdf_apply_split(cfg, params, pts)
    return jnp.concatenate([sdf, feat.astype(jnp.float32)], axis=-1)


def sdf_value(cfg: SDFConfig, params: Params, pts: jax.Array) -> jax.Array:
    """[N, 3] -> [N, 1] signed distance, skipping the feature head.

    The final layer's weight-norm scale is per-output-column, so slicing the
    last linear to its first column is exact — the up-sampling ladder and
    mesh grid queries never pay for the 256-wide feature output.
    """
    layers = params["layers"]
    last = layers[-1]
    if "v" in last:
        sliced = {"v": last["v"][:, :1], "g": last["g"][:1], "b": last["b"][:1]}
    else:
        sliced = {"w": last["w"][:, :1], "b": last["b"][:1]}
    params_value = dict(params, layers=list(layers[:-1]) + [sliced])
    return sdf_apply_split(cfg, params_value, pts)[0]


def sdf_value_grad_feat(
    cfg: SDFConfig, params: Params, pts: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fused (sdf [N,1], grad [N,3], feature [N,256]) in fwd + one VJP.

    The whole batch goes through one forward matmul chain; the spatial
    gradient is one batched reverse pass with a cotangent selecting the sdf
    channel. Differentiable (the VJP is itself traced), so the eikonal loss's
    second-order term works under the outer ``jax.grad``. The feature tensor
    keeps the matmul compute dtype (bf16 under the mixed-precision policy).
    """
    (sdf, feat), pullback = jax.vjp(
        lambda p: sdf_apply_split(cfg, params, p), pts
    )
    (grad,) = pullback((jnp.ones_like(sdf), jnp.zeros_like(feat)))
    return sdf, grad, feat


def sdf_grad(cfg: SDFConfig, params: Params, pts: jax.Array) -> jax.Array:
    _, grad, _ = sdf_value_grad_feat(cfg, params, pts)
    return grad


# ---------------------------------------------------------------------------
# Rendering network (color head / depth-feature head)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    d_feature: int = 256
    mode: str = "idr"  # 'idr' | 'no_view_dir' | 'no_normal'
    d_in: int = 9
    d_out: int = 3
    d_hidden: int = 256
    n_layers: int = 4
    weight_norm: bool = True
    multires_view: int = 4
    squeeze_out: bool = True

    @property
    def dims(self) -> tuple[int, ...]:
        d0 = self.d_in + self.d_feature
        if self.multires_view > 0:
            _, view_ch = get_embedder(self.multires_view, 3)
            d0 += view_ch - 3
        return (d0,) + (self.d_hidden,) * self.n_layers + (self.d_out,)


def render_net_init(key: jax.Array, cfg: RenderConfig) -> Params:
    dims = cfg.dims
    keys = jax.random.split(key, len(dims) - 1)
    layers = [
        init_linear(keys[l], dims[l], dims[l + 1], weight_norm=cfg.weight_norm)
        for l in range(len(dims) - 1)
    ]
    return {"layers": layers}


def render_net_apply(
    cfg: RenderConfig,
    params: Params,
    points: jax.Array,
    normals: jax.Array,
    view_dirs: jax.Array,
    feature_vectors: jax.Array,
) -> jax.Array:
    from vdnerf_tpu.models.precision import use_fused_mlp

    if use_fused_mlp():
        from vdnerf_tpu.models.layers import effective_weight
        from vdnerf_tpu.ops.pallas.fused_mlp import _freqs, render_net_fused

        plan = (
            cfg.mode, _freqs(cfg.multires_view), cfg.squeeze_out,
            len(cfg.dims) - 1,
        )
        ws = [effective_weight(p) for p in params["layers"]]
        bs = [p["b"] for p in params["layers"]]
        return render_net_fused(
            plan, 512, points.astype(jnp.float32),
            normals.astype(jnp.float32), view_dirs.astype(jnp.float32),
            feature_vectors, ws, bs,
        )
    if cfg.multires_view > 0:
        embed_fn, _ = get_embedder(cfg.multires_view, 3)
        view_dirs = embed_fn(view_dirs)
    from vdnerf_tpu.models.precision import get_matmul_dtype

    dt = get_matmul_dtype()
    if dt is not None:
        # cast before concat so the wide input tensor materializes at the
        # compute dtype (this input is a matmul operand anyway)
        points, view_dirs, normals, feature_vectors = (
            t.astype(dt) for t in (points, view_dirs, normals, feature_vectors)
        )
    if cfg.mode == "idr":
        x = jnp.concatenate([points, view_dirs, normals, feature_vectors], axis=-1)
    elif cfg.mode == "no_view_dir":
        x = jnp.concatenate([points, normals, feature_vectors], axis=-1)
    elif cfg.mode == "no_normal":
        x = jnp.concatenate([points, view_dirs, feature_vectors], axis=-1)
    else:
        raise ValueError(f"unknown rendering mode {cfg.mode!r}")

    n_linear = len(cfg.dims) - 1
    for l in range(n_linear):
        x = linear(params["layers"][l], x)
        if l < n_linear - 1:
            x = jax.nn.relu(x)
    x = x.astype(jnp.float32)
    if cfg.squeeze_out:
        return jax.nn.sigmoid(x)
    return jax.nn.relu(x)


# ---------------------------------------------------------------------------
# Background NeRF (inverted-sphere parameterization, NeRF++-style)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class NeRFConfig:
    D: int = 8
    W: int = 256
    d_in: int = 4
    d_in_view: int = 3
    multires: int = 10
    multires_view: int = 4
    output_ch: int = 4
    skips: tuple[int, ...] = (4,)
    rgb_dims: int = 3
    use_viewdirs: bool = True
    gen_depth_feats: bool = False
    dpt_dim: int = 1

    @property
    def input_ch(self) -> int:
        if self.multires > 0:
            return get_embedder(self.multires, self.d_in)[1]
        return 3

    @property
    def input_ch_view(self) -> int:
        if self.multires_view > 0:
            return get_embedder(self.multires_view, self.d_in_view)[1]
        return 3


def nerf_init(key: jax.Array, cfg: NeRFConfig) -> Params:
    keys = iter(jax.random.split(key, cfg.D + 8))
    pts_layers = [init_linear(next(keys), cfg.input_ch, cfg.W)]
    for i in range(cfg.D - 1):
        d_in = cfg.W + cfg.input_ch if i in cfg.skips else cfg.W
        pts_layers.append(init_linear(next(keys), d_in, cfg.W))
    params: Params = {
        "pts_linears": pts_layers,
        "views_linears": [
            init_linear(next(keys), cfg.input_ch_view + cfg.W, cfg.W // 2)
        ],
    }
    if cfg.use_viewdirs:
        params["feature_linear"] = init_linear(next(keys), cfg.W, cfg.W)
        params["alpha_linear"] = init_linear(next(keys), cfg.W, 1)
        params["rgb_linear"] = init_linear(next(keys), cfg.W // 2, cfg.rgb_dims)
        if cfg.gen_depth_feats:
            params["dpt_linear"] = init_linear(next(keys), cfg.W // 2, cfg.dpt_dim)
    else:
        params["output_linear"] = init_linear(next(keys), cfg.W, cfg.output_ch)
    return params


def nerf_apply(
    cfg: NeRFConfig, params: Params, input_pts: jax.Array, input_views: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array | None]:
    """-> (density [N,1], rgb [N,rgb_dims], depth_feat [N,dpt_dim] | None)."""
    from vdnerf_tpu.models.precision import use_fused_mlp

    if use_fused_mlp() and cfg.use_viewdirs:
        from vdnerf_tpu.models.layers import effective_weight
        from vdnerf_tpu.ops.pallas.fused_mlp import _freqs, nerf_fused

        plan = (
            _freqs(cfg.multires), _freqs(cfg.multires_view), cfg.skips,
            cfg.D, cfg.gen_depth_feats,
        )
        trunk = params["pts_linears"]
        heads = [params["alpha_linear"], params["feature_linear"],
                 params["views_linears"][0], params["rgb_linear"]]
        if cfg.gen_depth_feats:
            heads.append(params["dpt_linear"])
        # tile 256: the backward kernel's resident state (weights + weight
        # grads + stored activations) plus a 512-row tile exceeds the 16 MB
        # VMEM scoped limit (measured 19.1 MB)
        alpha, rgb, dpt = nerf_fused(
            plan, 256, input_pts.astype(jnp.float32),
            input_views.astype(jnp.float32),
            [effective_weight(p) for p in trunk], [p["b"] for p in trunk],
            [effective_weight(p) for p in heads], [p["b"] for p in heads],
        )
        return alpha, rgb, dpt
    if cfg.multires > 0:
        embed_fn, _ = get_embedder(cfg.multires, cfg.d_in)
        input_pts = embed_fn(input_pts)
    if cfg.multires_view > 0:
        embed_view, _ = get_embedder(cfg.multires_view, cfg.d_in_view)
        input_views = embed_view(input_views)

    h = input_pts
    for i, layer in enumerate(params["pts_linears"]):
        h = jax.nn.relu(linear(layer, h))
        if i in cfg.skips:
            h = jnp.concatenate([input_pts.astype(h.dtype), h], axis=-1)

    if not cfg.use_viewdirs:
        raise NotImplementedError(
            "reference NeRF asserts use_viewdirs=True (fields.py:355)"
        )
    alpha = linear(params["alpha_linear"], h).astype(jnp.float32)
    feature = linear(params["feature_linear"], h)
    h = jnp.concatenate([feature, input_views.astype(feature.dtype)], axis=-1)
    for layer in params["views_linears"]:
        h = jax.nn.relu(linear(layer, h))
    rgb = linear(params["rgb_linear"], h).astype(jnp.float32)
    depth_feat = (
        linear(params["dpt_linear"], h).astype(jnp.float32)
        if cfg.gen_depth_feats
        else None
    )
    return alpha, rgb, depth_feat


# ---------------------------------------------------------------------------
# Single-variance (logistic-CDF sharpness)
# ---------------------------------------------------------------------------


def variance_init(init_val: float = 0.3) -> Params:
    return {"variance": jnp.asarray(init_val, dtype=jnp.float32)}


def variance_apply(params: Params) -> jax.Array:
    """inv_s scalar = exp(10 * variance) (reference fields.py:358-364)."""
    return jnp.exp(params["variance"] * 10.0)
