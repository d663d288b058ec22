"""Fused MLP Pallas kernels: whole network in VMEM, one HBM round-trip.

Status (round-2 floor-corrected measurements, docs/PERF_r02.md): these
kernels are an ALTERNATIVE backend that measured 3-4x SLOWER than XLA at
flagship dims (color 0.54 -> 1.85 ms, bg NeRF 0.98 -> 5.39 ms at batch
512) and are OFF by default. The round-1 hypothesis that motivated them —
that the MLP chains were HBM-bandwidth-bound — was an artifact of a
~27 ms dispatch floor polluting per-component timings; with the floor
subtracted, plain XLA already runs the dominant fused SDF query at the
~160 TF/s sustained matmul roofline and a bare 8x256 relu chain at
~150 TF/s (activations of a 65k-row chain stay cache/VMEM-resident under
XLA's fusion on this backend), leaving no bandwidth gap for a hand-fused
kernel to close. The in-kernel narrow embedding ops waste VPU lanes and
Mosaic schedules the per-tile layer chain worse than XLA's global fusion.
Kept because they are correctness-tested (tests/test_fused_mlp.py), exert
the Pallas fwd+bwd custom-VJP machinery, and may win on backends with
different fusion behavior: enable with ``VDNERF_FUSED=1`` /
``precision.set_fused_mlp(True)``.

Kernels (each = forward + custom-VJP backward, both Pallas):

- :func:`render_net_fused` — the IDR color head / 96-ch depth head
  (reference dpt_models/fields.py:112-176): in-kernel view-dir positional
  embedding, mode-dependent concat, 4x256 relu trunk, sigmoid/relu output.
- :func:`nerf_fused` — the background NeRF (reference fields.py:264-355):
  in-kernel embeddings for pts and views, 8x256 trunk with the skip concat,
  alpha/feature/rgb(/dpt) heads.

Weight-norm stays OUTSIDE the kernels: callers pass *effective* weights
(w = v * g / ||v||, computed in XLA, differentiable), and the backward
kernels return cotangents w.r.t. those effective weights — XLA chains them
to (v, g). Backward recomputes the forward per tile (activations never
hit HBM) and accumulates weight gradients in f32 across the sequential
TPU grid via the block-revisiting pattern.

Numerics match the jnp path's mixed-precision policy (bf16 matmul inputs,
f32 accumulation) except that intermediate activations here stay f32 in
VMEM between layers (strictly more precise than the jnp path, which
round-trips them through bf16 HBM buffers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BF16 = jnp.bfloat16
_F32 = jnp.float32


def _interpret() -> bool:
    """Run the kernels through the Pallas interpreter off-TPU (tests,
    CPU-mesh dryruns). Trace-time decision; force with VDNERF_PALLAS_INTERPRET."""
    import os

    env = os.environ.get("VDNERF_PALLAS_INTERPRET", "")
    if env in ("0", "1"):
        return env == "1"
    return jax.default_backend() == "cpu"


def _freqs(multires: int) -> tuple[float, ...]:
    if multires <= 0:
        return ()
    return tuple(
        float(f)
        for f in 2.0 ** np.linspace(0.0, multires - 1, multires)
    )


def _embed(x, freqs):
    """In-kernel positional encoding, ordering [x|sin(f0 x)|cos(f0 x)|...]
    per vdnerf_tpu.models.embedder (reference dpt_models/embedder.py:6-51)."""
    parts = [x]
    for f in freqs:
        parts.append(jnp.sin(x * f))
        parts.append(jnp.cos(x * f))
    return jnp.concatenate(parts, axis=-1)


def _d_embed(d_emb, x, freqs):
    """VJP of :func:`_embed` w.r.t. x. d_emb: [T, d*(1+2L)] -> [T, d]."""
    d = x.shape[-1]
    dx = d_emb[:, :d]
    for i, f in enumerate(freqs):
        ds = d_emb[:, d * (1 + 2 * i): d * (2 + 2 * i)]
        dc = d_emb[:, d * (2 + 2 * i): d * (3 + 2 * i)]
        dx = dx + f * (ds * jnp.cos(x * f) - dc * jnp.sin(x * f))
    return dx


def _mm(a, b):
    """[T, K] @ [K, N] on the MXU, bf16 inputs, f32 accumulation."""
    return jnp.dot(a.astype(_BF16), b.astype(_BF16),
                   preferred_element_type=_F32)


def _mm_dx(d, w):
    """d @ w^T without materializing the transpose: [T, N] x [K, N] -> [T, K]."""
    return jax.lax.dot_general(
        d.astype(_BF16), w.astype(_BF16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=_F32,
    )


def _mm_dw(a, d):
    """a^T @ d: [T, K] x [T, N] -> [K, N] weight-grad contraction."""
    return jax.lax.dot_general(
        a.astype(_BF16), d.astype(_BF16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=_F32,
    )


def _pad_rows(x, n_pad):
    if n_pad == x.shape[0]:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((n_pad - x.shape[0],) + x.shape[1:], x.dtype)], axis=0
    )


def _row_spec(tile, width):
    return pl.BlockSpec((tile, width), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _full_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)


def _accumulate(ref, value):
    """Accumulate into a grid-constant output block (TPU grids run
    sequentially; the block stays resident in VMEM between steps)."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        ref[...] = jnp.zeros_like(ref)

    ref[...] += value


# ---------------------------------------------------------------------------
# Rendering network (color head / depth-feature head)
# ---------------------------------------------------------------------------


def _render_concat(pts, emb_view, normals, feat, mode):
    if mode == "idr":
        return jnp.concatenate([pts, emb_view, normals, feat], axis=-1)
    if mode == "no_view_dir":
        return jnp.concatenate([pts, normals, feat], axis=-1)
    if mode == "no_normal":
        return jnp.concatenate([pts, emb_view, feat], axis=-1)
    raise ValueError(f"unknown rendering mode {mode!r}")


def _render_fwd_tile(plan, pts, normals, dirs, feat, ws, bs,
                     keep_acts: bool):
    """Shared fwd: returns (output f32, [acts] bf16 per matmul input)."""
    mode, freqs, squeeze_out, n_linear = plan
    emb_view = _embed(dirs, freqs) if freqs else dirs
    x = _render_concat(pts, emb_view, normals, feat, mode).astype(_F32)
    acts = []
    for l in range(n_linear):
        if keep_acts:
            acts.append(x.astype(_BF16))
        x = _mm(x, ws[l]) + bs[l][None, :].astype(_F32)
        if l < n_linear - 1:
            x = jnp.maximum(x, 0.0)
    y = jax.nn.sigmoid(x) if squeeze_out else jnp.maximum(x, 0.0)
    return y, acts, emb_view


def _render_kernel_fwd(plan, refs):
    pts_ref, nrm_ref, dirs_ref, feat_ref = refs[:4]
    n_linear = plan[3]
    ws = [refs[4 + i] for i in range(n_linear)]
    bs = [refs[4 + n_linear + i] for i in range(n_linear)]
    out_ref = refs[4 + 2 * n_linear]
    y, _, _ = _render_fwd_tile(
        plan, pts_ref[...].astype(_F32), nrm_ref[...].astype(_F32),
        dirs_ref[...].astype(_F32), feat_ref[...].astype(_F32),
        [w[...] for w in ws], [b[...] for b in bs], keep_acts=False,
    )
    out_ref[...] = y


def _render_kernel_bwd(plan, refs):
    mode, freqs, squeeze_out, n_linear = plan
    (pts_ref, nrm_ref, dirs_ref, feat_ref) = refs[:4]
    ws = [refs[4 + i][...] for i in range(n_linear)]
    g_ref = refs[4 + n_linear]
    bs_start = 5 + n_linear
    bs = [refs[bs_start + i][...] for i in range(n_linear)]
    outs = refs[bs_start + n_linear:]
    (d_pts_ref, d_nrm_ref, d_dirs_ref, d_feat_ref) = outs[:4]
    dw_refs = outs[4: 4 + n_linear]
    db_refs = outs[4 + n_linear: 4 + 2 * n_linear]

    pts = pts_ref[...].astype(_F32)
    normals = nrm_ref[...].astype(_F32)
    dirs = dirs_ref[...].astype(_F32)
    feat = feat_ref[...].astype(_F32)

    y, acts, emb_view = _render_fwd_tile(
        plan, pts, normals, dirs, feat, ws, bs, keep_acts=True
    )

    g = g_ref[...].astype(_F32)
    d = g * y * (1.0 - y) if squeeze_out else g * (y > 0.0).astype(_F32)
    for l in range(n_linear - 1, -1, -1):
        _accumulate(dw_refs[l], _mm_dw(acts[l], d))
        _accumulate(db_refs[l], jnp.sum(d, axis=0, keepdims=True))
        d = _mm_dx(d, ws[l])
        if l > 0:
            d = d * (acts[l].astype(_F32) > 0).astype(_F32)

    # split the input cotangent back into the concat components
    n_pts, n_emb = pts.shape[-1], emb_view.shape[-1]
    if mode == "idr":
        d_pts = d[:, :n_pts]
        d_emb = d[:, n_pts:n_pts + n_emb]
        d_nrm = d[:, n_pts + n_emb:n_pts + n_emb + 3]
        d_feat = d[:, n_pts + n_emb + 3:]
    elif mode == "no_view_dir":
        d_pts = d[:, :n_pts]
        d_emb = jnp.zeros_like(emb_view)
        d_nrm = d[:, n_pts:n_pts + 3]
        d_feat = d[:, n_pts + 3:]
    else:  # no_normal
        d_pts = d[:, :n_pts]
        d_emb = d[:, n_pts:n_pts + n_emb]
        d_nrm = jnp.zeros((pts.shape[0], 3), _F32)
        d_feat = d[:, n_pts + n_emb:]
    d_dirs = _d_embed(d_emb, dirs, freqs) if freqs else d_emb
    d_pts_ref[...] = d_pts
    d_nrm_ref[...] = d_nrm
    d_dirs_ref[...] = d_dirs
    d_feat_ref[...] = d_feat


def _render_dims(plan, d_feature):
    mode, freqs, _, _ = plan
    n_emb = 3 * (1 + 2 * len(freqs)) if freqs else 3
    if mode == "idr":
        return 3 + n_emb + 3 + d_feature
    if mode == "no_view_dir":
        return 3 + 3 + d_feature
    return 3 + n_emb + d_feature


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def render_net_fused(plan, tile, pts, normals, dirs, feat, ws, bs):
    """Fused rendering-network forward. plan = (mode, freqs, squeeze_out,
    n_linear); ws/bs are EFFECTIVE weights [in, out] (weight norm applied)."""
    return _render_call_fwd(plan, tile, pts, normals, dirs, feat, ws, bs)


def _render_call_fwd(plan, tile, pts, normals, dirs, feat, ws, bs):
    n = pts.shape[0]
    n_pad = -(-n // tile) * tile
    d_out = ws[-1].shape[1]
    args = [_pad_rows(x, n_pad) for x in (pts, normals, dirs, feat)]
    out = pl.pallas_call(
        functools.partial(lambda plan, *refs: _render_kernel_fwd(plan, refs),
                          plan),
        grid=(n_pad // tile,),
        in_specs=[
            _row_spec(tile, 3), _row_spec(tile, 3), _row_spec(tile, 3),
            _row_spec(tile, feat.shape[1]),
            *[_full_spec(w.shape) for w in ws],
            *[_full_spec(b.shape) for b in bs],
        ],
        out_specs=_row_spec(tile, d_out),
        out_shape=jax.ShapeDtypeStruct((n_pad, d_out), _F32),
        interpret=_interpret(),
    )(*args, *[w.astype(_BF16) for w in ws], *bs)
    return out[:n]


def _render_fused_fwd(plan, tile, pts, normals, dirs, feat, ws, bs):
    out = _render_call_fwd(plan, tile, pts, normals, dirs, feat, ws, bs)
    return out, (pts, normals, dirs, feat, ws, bs)


def _render_fused_bwd(plan, tile, res, g):
    pts, normals, dirs, feat, ws, bs = res
    n = pts.shape[0]
    n_pad = -(-n // tile) * tile
    n_linear = plan[3]
    d_feature = feat.shape[1]
    args = [_pad_rows(x, n_pad) for x in (pts, normals, dirs, feat)]
    g_pad = _pad_rows(g, n_pad)  # zero cotangent rows -> no dW pollution

    out_shapes = (
        [jax.ShapeDtypeStruct((n_pad, 3), _F32)] * 3
        + [jax.ShapeDtypeStruct((n_pad, d_feature), _F32)]
        + [jax.ShapeDtypeStruct(w.shape, _F32) for w in ws]
        + [jax.ShapeDtypeStruct((1, b.shape[0]), _F32) for b in bs]
    )
    out_specs = (
        [_row_spec(tile, 3)] * 3 + [_row_spec(tile, d_feature)]
        + [_full_spec(w.shape) for w in ws]
        + [_full_spec((1, b.shape[0])) for b in bs]
    )
    outs = pl.pallas_call(
        functools.partial(lambda plan, *refs: _render_kernel_bwd(plan, refs),
                          plan),
        grid=(n_pad // tile,),
        in_specs=[
            _row_spec(tile, 3), _row_spec(tile, 3), _row_spec(tile, 3),
            _row_spec(tile, d_feature),
            *[_full_spec(w.shape) for w in ws],
            _row_spec(tile, ws[-1].shape[1]),
            *[_full_spec(b.shape) for b in bs],
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=_interpret(),
    )(*args, *[w.astype(_BF16) for w in ws], g_pad, *bs)
    # cotangent dtypes must match the primals' (e.g. feat arrives bf16 from
    # the SDF feature head under the mixed-precision policy)
    d_pts, d_nrm, d_dirs, d_feat = (
        o[:n].astype(x.dtype)
        for o, x in zip(outs[:4], (pts, normals, dirs, feat))
    )
    dws = [o.astype(w.dtype) for o, w in zip(outs[4:4 + n_linear], ws)]
    dbs = [
        o[0].astype(b.dtype)
        for o, b in zip(outs[4 + n_linear:], bs)
    ]
    return d_pts, d_nrm, d_dirs, d_feat, dws, dbs


render_net_fused.defvjp(_render_fused_fwd, _render_fused_bwd)


# ---------------------------------------------------------------------------
# Background NeRF
# ---------------------------------------------------------------------------


def _nerf_fwd_tile(plan, pts, views, trunk_w, trunk_b, head_w, head_b,
                   keep_acts: bool):
    """Shared fwd. plan = (freqs_pts, freqs_view, skips, D, has_dpt).

    head_w/head_b order: alpha, feature, views0, rgb[, dpt].
    Returns (alpha, rgb, dpt|None, residuals dict).
    """
    freqs_pts, freqs_view, skips, D, has_dpt = plan
    emb_pts = _embed(pts, freqs_pts) if freqs_pts else pts
    emb_view = _embed(views, freqs_view) if freqs_view else views

    h = emb_pts.astype(_F32)
    acts = []
    for i in range(D):
        if keep_acts:
            acts.append(h.astype(_BF16))
        h = _mm(h, trunk_w[i]) + trunk_b[i][None, :].astype(_F32)
        h = jnp.maximum(h, 0.0)
        if i in skips:
            h = jnp.concatenate([emb_pts.astype(_F32), h], axis=-1)

    alpha = _mm(h, head_w[0]) + head_b[0][None, :].astype(_F32)
    feature = _mm(h, head_w[1]) + head_b[1][None, :].astype(_F32)
    h2_in = jnp.concatenate([feature, emb_view.astype(_F32)], axis=-1)
    h2 = jnp.maximum(
        _mm(h2_in, head_w[2]) + head_b[2][None, :].astype(_F32), 0.0
    )
    rgb = _mm(h2, head_w[3]) + head_b[3][None, :].astype(_F32)
    dpt = None
    if has_dpt:
        dpt = _mm(h2, head_w[4]) + head_b[4][None, :].astype(_F32)
    res = {"acts": acts, "h": h, "h2_in": h2_in, "h2": h2,
           "emb_pts": emb_pts, "emb_view": emb_view}
    return alpha, rgb, dpt, res


def _nerf_kernel_fwd(plan, refs):
    D, has_dpt = plan[3], plan[4]
    n_head = 5 if has_dpt else 4
    pts_ref, views_ref = refs[:2]
    tw = [refs[2 + i][...] for i in range(D)]
    hw = [refs[2 + D + i][...] for i in range(n_head)]
    tb = [refs[2 + D + n_head + i][...] for i in range(D)]
    hb = [refs[2 + 2 * D + n_head + i][...] for i in range(n_head)]
    outs = refs[2 + 2 * D + 2 * n_head:]
    alpha, rgb, dpt, _ = _nerf_fwd_tile(
        plan, pts_ref[...].astype(_F32), views_ref[...].astype(_F32),
        tw, tb, hw, hb, keep_acts=False,
    )
    outs[0][...] = alpha
    outs[1][...] = rgb
    if has_dpt:
        outs[2][...] = dpt


def _nerf_kernel_bwd(plan, refs):
    freqs_pts, freqs_view, skips, D, has_dpt = plan
    n_head = 5 if has_dpt else 4
    pts_ref, views_ref = refs[:2]
    tw = [refs[2 + i][...] for i in range(D)]
    hw = [refs[2 + D + i][...] for i in range(n_head)]
    tb = [refs[2 + D + n_head + i][...] for i in range(D)]
    hb = [refs[2 + 2 * D + n_head + i][...] for i in range(n_head)]
    k = 2 + 2 * D + 2 * n_head
    g_alpha_ref, g_rgb_ref = refs[k], refs[k + 1]
    k += 2
    g_dpt_ref = None
    if has_dpt:
        g_dpt_ref = refs[k]
        k += 1
    outs = refs[k:]
    d_pts_ref, d_views_ref = outs[0], outs[1]
    dtw_refs = outs[2:2 + D]
    dhw_refs = outs[2 + D:2 + D + n_head]
    dtb_refs = outs[2 + D + n_head:2 + 2 * D + n_head]
    dhb_refs = outs[2 + 2 * D + n_head:]

    pts = pts_ref[...].astype(_F32)
    views = views_ref[...].astype(_F32)
    alpha, rgb, dpt, res = _nerf_fwd_tile(
        plan, pts, views, tw, tb, hw, hb, keep_acts=True
    )
    acts, h, h2_in, h2 = res["acts"], res["h"], res["h2_in"], res["h2"]
    emb_pts, emb_view = res["emb_pts"], res["emb_view"]
    w_dim = hw[1].shape[1]  # feature width == trunk width

    def acc_head(idx, a_in, d):
        _accumulate(dhw_refs[idx], _mm_dw(a_in.astype(_BF16), d))
        _accumulate(dhb_refs[idx], jnp.sum(d, axis=0, keepdims=True))

    # heads
    d_h2 = _mm_dx(g_rgb_ref[...].astype(_F32), hw[3])
    acc_head(3, h2, g_rgb_ref[...].astype(_F32))
    if has_dpt:
        g_dpt = g_dpt_ref[...].astype(_F32)
        d_h2 = d_h2 + _mm_dx(g_dpt, hw[4])
        acc_head(4, h2, g_dpt)
    d_h2 = d_h2 * (h2 > 0).astype(_F32)
    acc_head(2, h2_in, d_h2)
    d_h2_in = _mm_dx(d_h2, hw[2])
    d_feature = d_h2_in[:, :w_dim]
    d_emb_view = d_h2_in[:, w_dim:]

    g_alpha = g_alpha_ref[...].astype(_F32)
    acc_head(0, h, g_alpha)
    acc_head(1, h, d_feature)
    d_h = _mm_dx(g_alpha, hw[0]) + _mm_dx(d_feature, hw[1])

    # trunk (reverse), unstitching the skip concats. The relu mask comes from
    # the stored next-layer inputs (acts[i+1] = layer i's post-relu output,
    # minus the skip-concat prefix): relu(x) > 0 <=> x > 0.
    n_emb = emb_pts.shape[-1]
    d_emb_pts = jnp.zeros_like(emb_pts)
    for i in range(D - 1, -1, -1):
        if i in skips:
            d_emb_pts = d_emb_pts + d_h[:, :n_emb]
            d_h = d_h[:, n_emb:]
        if i == D - 1:
            relu_out = h
        elif i in skips:
            relu_out = acts[i + 1][:, n_emb:]
        else:
            relu_out = acts[i + 1]
        d_h = d_h * (relu_out.astype(_F32) > 0).astype(_F32)
        _accumulate(dtw_refs[i], _mm_dw(acts[i], d_h))
        _accumulate(dtb_refs[i], jnp.sum(d_h, axis=0, keepdims=True))
        d_h = _mm_dx(d_h, tw[i])

    d_emb_pts = d_emb_pts + d_h
    d_pts = _d_embed(d_emb_pts, pts, freqs_pts) if freqs_pts else d_emb_pts
    d_views = (
        _d_embed(d_emb_view, views, freqs_view) if freqs_view else d_emb_view
    )
    d_pts_ref[...] = d_pts
    d_views_ref[...] = d_views


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def nerf_fused(plan, tile, pts, views, trunk_w, trunk_b, head_w, head_b):
    """Fused background-NeRF forward.

    plan = (freqs_pts, freqs_view, skips, D, has_dpt); weights are EFFECTIVE
    [in, out] matrices; head order alpha, feature, views0, rgb[, dpt].
    Returns (alpha [N,1], rgb [N,rgb_dims], dpt [N,dpt_dim] | None).
    """
    return _nerf_call_fwd(plan, tile, pts, views, trunk_w, trunk_b,
                          head_w, head_b)


def _nerf_call_fwd(plan, tile, pts, views, trunk_w, trunk_b, head_w, head_b):
    has_dpt = plan[4]
    n = pts.shape[0]
    n_pad = -(-n // tile) * tile
    args = [_pad_rows(pts, n_pad), _pad_rows(views, n_pad)]
    out_shapes = [
        jax.ShapeDtypeStruct((n_pad, head_w[0].shape[1]), _F32),
        jax.ShapeDtypeStruct((n_pad, head_w[3].shape[1]), _F32),
    ]
    out_specs = [
        _row_spec(tile, head_w[0].shape[1]),
        _row_spec(tile, head_w[3].shape[1]),
    ]
    if has_dpt:
        out_shapes.append(
            jax.ShapeDtypeStruct((n_pad, head_w[4].shape[1]), _F32)
        )
        out_specs.append(_row_spec(tile, head_w[4].shape[1]))
    outs = pl.pallas_call(
        functools.partial(lambda plan, *refs: _nerf_kernel_fwd(plan, refs),
                          plan),
        grid=(n_pad // tile,),
        in_specs=[
            _row_spec(tile, pts.shape[1]), _row_spec(tile, 3),
            *[_full_spec(w.shape) for w in trunk_w],
            *[_full_spec(w.shape) for w in head_w],
            *[_full_spec(b.shape) for b in trunk_b],
            *[_full_spec(b.shape) for b in head_b],
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=_interpret(),
    )(*args, *[w.astype(_BF16) for w in trunk_w],
      *[w.astype(_BF16) for w in head_w], *trunk_b, *head_b)
    alpha, rgb = outs[0][:n], outs[1][:n]
    dpt = outs[2][:n] if has_dpt else None
    return alpha, rgb, dpt


def _nerf_fused_fwd(plan, tile, pts, views, trunk_w, trunk_b, head_w, head_b):
    out = _nerf_call_fwd(plan, tile, pts, views, trunk_w, trunk_b,
                         head_w, head_b)
    return out, (pts, views, trunk_w, trunk_b, head_w, head_b)


def _nerf_fused_bwd(plan, tile, res, g):
    pts, views, trunk_w, trunk_b, head_w, head_b = res
    has_dpt = plan[4]
    D = plan[3]
    n_head = 5 if has_dpt else 4
    g_alpha, g_rgb, g_dpt = g
    n = pts.shape[0]
    n_pad = -(-n // tile) * tile
    args = [_pad_rows(pts, n_pad), _pad_rows(views, n_pad)]
    gs = [_pad_rows(g_alpha, n_pad), _pad_rows(g_rgb, n_pad)]
    if has_dpt:
        if g_dpt is None:
            g_dpt = jnp.zeros((n, head_w[4].shape[1]), _F32)
        gs.append(_pad_rows(g_dpt, n_pad))

    out_shapes = (
        [jax.ShapeDtypeStruct((n_pad, pts.shape[1]), _F32),
         jax.ShapeDtypeStruct((n_pad, 3), _F32)]
        + [jax.ShapeDtypeStruct(w.shape, _F32) for w in trunk_w]
        + [jax.ShapeDtypeStruct(w.shape, _F32) for w in head_w]
        + [jax.ShapeDtypeStruct((1, b.shape[0]), _F32) for b in trunk_b]
        + [jax.ShapeDtypeStruct((1, b.shape[0]), _F32) for b in head_b]
    )
    out_specs = (
        [_row_spec(tile, pts.shape[1]), _row_spec(tile, 3)]
        + [_full_spec(w.shape) for w in trunk_w]
        + [_full_spec(w.shape) for w in head_w]
        + [_full_spec((1, b.shape[0])) for b in trunk_b]
        + [_full_spec((1, b.shape[0])) for b in head_b]
    )
    outs = pl.pallas_call(
        functools.partial(lambda plan, *refs: _nerf_kernel_bwd(plan, refs),
                          plan),
        grid=(n_pad // tile,),
        in_specs=[
            _row_spec(tile, pts.shape[1]), _row_spec(tile, 3),
            *[_full_spec(w.shape) for w in trunk_w],
            *[_full_spec(w.shape) for w in head_w],
            *[_full_spec(b.shape) for b in trunk_b],
            *[_full_spec(b.shape) for b in head_b],
            *[_row_spec(tile, gp.shape[1]) for gp in gs],
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=_interpret(),
    )(*args, *[w.astype(_BF16) for w in trunk_w],
      *[w.astype(_BF16) for w in head_w], *trunk_b, *head_b, *gs)
    d_pts = outs[0][:n].astype(pts.dtype)
    d_views = outs[1][:n].astype(views.dtype)
    dtw = [o.astype(w.dtype) for o, w in zip(outs[2:2 + D], trunk_w)]
    dhw = [
        o.astype(w.dtype)
        for o, w in zip(outs[2 + D:2 + D + n_head], head_w)
    ]
    dtb = [
        o[0].astype(b.dtype)
        for o, b in zip(outs[2 + D + n_head:2 + 2 * D + n_head], trunk_b)
    ]
    dhb = [
        o[0].astype(b.dtype)
        for o, b in zip(outs[2 + 2 * D + n_head:], head_b)
    ]
    return d_pts, d_views, dtw, dtb, dhw, dhb


nerf_fused.defvjp(_nerf_fused_fwd, _nerf_fused_bwd)
