"""NeuS volume renderer: hierarchical sampling + logistic-CDF compositing.

Functional JAX rebuild of the reference's ``NeuSRenderer``
(``dpt_models/renderer.py:77-439``) with identical math (all epsilons,
perturbation rules, cos-annealing, inside/relaxed spheres, background
blending) but restructured for XLA: static shapes, a Python-unrolled
up-sampling schedule, batched network evals, and a fused
value+gradient+feature SDF query.

Everything here jits; callers wrap it in ``jax.jit`` / ``shard_map``.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from vdnerf_tpu.models.fields import (
    NeRFConfig,
    RenderConfig,
    SDFConfig,
    nerf_apply,
    render_net_apply,
    sdf_value,
    sdf_value_grad_feat,
    variance_apply,
)
from vdnerf_tpu.ops.sampling import (
    merge_z_vals,
    sample_pdf,
    section_weights,
    transmittance,
    up_sample,
)

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class RendererConfig:
    """Sampling budget (reference confs/*.conf `model.neus_renderer`)."""

    n_samples: int = 64
    n_importance: int = 64
    n_outside: int = 32
    up_sample_steps: int = 4
    perturb: float = 1.0
    # Opt-in fast path (DIVERGES from the reference, off by default): skip
    # the background-NeRF evaluation at the n_samples+n_importance INSIDE
    # samples. Their bg alpha/color enter the composite only through the
    # (1 - inside_sphere) blend (renderer.py render_core), and inside
    # samples lie within the unit sphere by the near/far construction — the
    # blend weight is ~0 except at a handful of sphere-boundary samples per
    # grazing ray, where this path substitutes alpha=0. Cuts bg-NeRF compute
    # 5x (160 -> 32 evals/ray). Semantics pinned in tests/test_fast_bg.py;
    # flagship-scale convergence report: docs/FLAGSHIP_r02_fastbg.json
    # (tools/flagship_run.py --fast-bg).
    skip_bg_inside: bool = False
    # Opt-in fast path #2 (DIVERGES from the reference, off by default):
    # importance-resampled render core. The up-sample ladder's SDF evals are
    # cheap (gradient-free, ~1.5% of the step); the expensive block is the
    # fused SDF value+grad+feat + color eval over ALL n_samples+n_importance
    # ladder positions in render_core (~60% of the step, docs/PERF_r03.md).
    # Most base samples sit in empty space with alpha ~= 0. When
    # n_render_samples > 0, the final sorted ladder set is inverse-CDF
    # resampled down to that many positions using the ladder's own
    # section-weight estimate at the final sharpness, mixed with a uniform
    # floor (resample_uniform_frac) that keeps (a) stochastic coverage of
    # empty space for the eikonal regularizer and (b) a nonzero PDF
    # everywhere so no region is unreachable. render_core then runs at the
    # reduced width. Training draws stochastic resample positions;
    # deterministic renders (perturb = 0) use the midpoint grid.
    # Regime guidance (docs/RESAMPLE_AB_CPU.json, PERF_r03.md section 4):
    # masked training and inference are validated at the default floor;
    # MASK-FREE training is floor-sensitive (the concentration prunes the
    # diffuse low-weight tails the radiance field leans on without a mask
    # loss) - use frac >= 0.5 and a gentler width (96-of-128 @ 0.5
    # measured -0.30 dB vs faithful; the default floor at 64-of-128
    # measured -2.3 dB).
    n_render_samples: int = 0
    resample_uniform_frac: float = 0.25


@dataclasses.dataclass(frozen=True)
class NeuSNetworks:
    """Static network configuration bundle (hashable -> jit-static)."""

    sdf: SDFConfig
    color: RenderConfig
    nerf: NeRFConfig
    renderer: RendererConfig
    depth: RenderConfig | None = None


def render_core_outside(
    nets: NeuSNetworks,
    params: Params,
    rays_o: jax.Array,
    rays_d: jax.Array,
    z_vals: jax.Array,
    sample_dist: float,
    background_rgb: jax.Array | None = None,
    eval_tail: int | None = None,
) -> dict[str, jax.Array | None]:
    """Background NeRF over inverted-sphere coordinates
    (reference renderer.py:100-145).

    ``eval_tail``: evaluate the NeRF only at the LAST that many samples
    (the true outside-sphere block), zero-filling density/color for the
    leading block — the ``skip_bg_inside`` fast path (see RendererConfig).
    """
    batch_size, n_samples = z_vals.shape

    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], sample_dist)], axis=-1
    )
    mid_z_vals = z_vals + dists * 0.5

    pts = rays_o[:, None, :] + rays_d[:, None, :] * mid_z_vals[..., :, None]
    dis_to_center = jnp.clip(
        jnp.linalg.norm(pts, axis=-1, keepdims=True), 1.0, 1e10
    )
    # (x/r, 1/r): the NeRF++ inverted-sphere parameterization
    pts4 = jnp.concatenate([pts / dis_to_center, 1.0 / dis_to_center], axis=-1)
    dirs = jnp.broadcast_to(rays_d[:, None, :], pts.shape)

    d_in = 3 + int(nets.renderer.n_outside > 0)
    if eval_tail is not None and eval_tail < n_samples:
        n_skip = n_samples - eval_tail
        pts_flat = pts4[:, n_skip:, :].reshape(-1, d_in)
        dirs_flat = dirs[:, n_skip:, :].reshape(-1, 3)
        density_t, color_t, feat_t = nerf_apply(
            nets.nerf, params["nerf"], pts_flat, dirs_flat
        )

        def fill(tail, width):
            tail = tail.reshape(batch_size, eval_tail, width)
            return jnp.concatenate(
                [jnp.zeros((batch_size, n_skip, width), tail.dtype), tail],
                axis=1,
            ).reshape(batch_size * n_samples, width)

        density = fill(density_t, 1)
        sampled_color = fill(color_t, color_t.shape[-1])
        sampled_feat = (
            fill(feat_t, feat_t.shape[-1]) if feat_t is not None else None
        )
        # softplus(0) > 0 would leak alpha into the zero-filled block; mask
        # the skipped samples to exactly alpha = 0
        alpha = 1.0 - jnp.exp(
            -jax.nn.softplus(density.reshape(batch_size, n_samples)) * dists
        )
        alpha = alpha.at[:, :n_skip].set(0.0)
        return _outside_composite(
            nets, batch_size, n_samples, alpha, sampled_color, sampled_feat,
            z_vals, mid_z_vals, background_rgb,
        )

    pts_flat = pts4.reshape(-1, d_in)
    dirs_flat = dirs.reshape(-1, 3)

    density, sampled_color, sampled_feat = nerf_apply(
        nets.nerf, params["nerf"], pts_flat, dirs_flat
    )
    alpha = 1.0 - jnp.exp(
        -jax.nn.softplus(density.reshape(batch_size, n_samples)) * dists
    )
    return _outside_composite(
        nets, batch_size, n_samples, alpha, sampled_color, sampled_feat,
        z_vals, mid_z_vals, background_rgb,
    )


def _outside_composite(
    nets, batch_size, n_samples, alpha, sampled_color, sampled_feat,
    z_vals, mid_z_vals, background_rgb,
):
    weights = alpha * transmittance(alpha)
    sampled_color = sampled_color.reshape(batch_size, n_samples, -1)
    color = jnp.sum(weights[:, :, None] * sampled_color, axis=1)
    if background_rgb is not None:
        color = color + background_rgb * (
            1.0 - jnp.sum(weights, axis=-1, keepdims=True)
        )
    depth_map = jnp.sum(weights * z_vals, axis=-1)

    if nets.depth is not None and sampled_feat is not None:
        sampled_feat = sampled_feat.reshape(batch_size, n_samples, -1)
    return {
        "color": color,
        "sampled_feat": sampled_feat,
        "sampled_color": sampled_color,
        "alpha": alpha,
        "weights": weights,
        "z_vals": mid_z_vals,
        "depth_map": depth_map,
    }


def render_core(
    nets: NeuSNetworks,
    params: Params,
    rays_o: jax.Array,
    rays_d: jax.Array,
    z_vals: jax.Array,
    sample_dist: float,
    depth_before_color: bool = False,
    background_alpha: jax.Array | None = None,
    background_sampled_feat: jax.Array | None = None,
    background_sampled_color: jax.Array | None = None,
    background_rgb: jax.Array | None = None,
    cos_anneal_ratio: float | jax.Array = 0.0,
    est_dist_cap: float | None = None,
) -> dict[str, jax.Array | None]:
    """SDF-based alpha compositing core (reference renderer.py:209-330).

    ``est_dist_cap`` bounds the half-width of the section-alpha estimator's
    linear SDF extrapolation (reference renderer.py:264-268 extrapolates by
    ``iter_cos * dists * 0.5`` with no bound). The faithful ladder never
    needs one — its sections are uniformly fine — but the importance-
    resampled core leaves long sections in empty space, and extrapolating a
    small-positive SDF across half such a section drives the estimated exit
    SDF negative: a phantom surface that absorbs the whole ray at the
    section midpoint. Capping only the *estimator* width (integration still
    uses the true dists) removes the phantom while leaving densely-sampled
    surface sections, whose dists are far below any sane cap, untouched.
    """
    batch_size, n_samples = z_vals.shape

    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], sample_dist)], axis=-1
    )
    mid_z_vals = z_vals + dists * 0.5

    pts = rays_o[:, None, :] + rays_d[:, None, :] * mid_z_vals[..., :, None]
    dirs = jnp.broadcast_to(rays_d[:, None, :], pts.shape)
    pts_flat = pts.reshape(-1, 3)
    dirs_flat = dirs.reshape(-1, 3)

    sdf, gradients, feature_vector = sdf_value_grad_feat(
        nets.sdf, params["sdf"], pts_flat
    )

    sampled_feat = None
    if nets.depth is not None:
        sampled_feat_flat = render_net_apply(
            nets.depth, params["depth"], pts_flat, gradients, dirs_flat,
            feature_vector,
        )
        if depth_before_color:
            feature_vector = jnp.concatenate(
                [feature_vector, sampled_feat_flat], axis=-1
            )
        sampled_feat = sampled_feat_flat.reshape(batch_size, n_samples, -1)

    sampled_color = render_net_apply(
        nets.color, params["color"], pts_flat, gradients, dirs_flat,
        feature_vector,
    ).reshape(batch_size, n_samples, -1)

    inv_s = jnp.clip(variance_apply(params["variance"]), 1e-6, 1e6)

    true_cos = jnp.sum(dirs_flat * gradients, axis=-1, keepdims=True)
    # anneal keeps the cos "not dead" early in training (non-positive always)
    iter_cos = -(
        jax.nn.relu(-true_cos * 0.5 + 0.5) * (1.0 - cos_anneal_ratio)
        + jax.nn.relu(-true_cos) * cos_anneal_ratio
    )

    est_dists = (
        dists if est_dist_cap is None else jnp.minimum(dists, est_dist_cap)
    )
    dists_flat = est_dists.reshape(-1, 1)
    estimated_next_sdf = sdf + iter_cos * dists_flat * 0.5
    estimated_prev_sdf = sdf - iter_cos * dists_flat * 0.5
    prev_cdf = jax.nn.sigmoid(estimated_prev_sdf * inv_s)
    next_cdf = jax.nn.sigmoid(estimated_next_sdf * inv_s)
    p = prev_cdf - next_cdf
    c = prev_cdf

    alpha = jnp.clip(
        ((p + 1e-5) / (c + 1e-5)).reshape(batch_size, n_samples), 0.0, 1.0
    )

    pts_norm = jnp.linalg.norm(pts_flat, axis=-1).reshape(batch_size, n_samples)
    inside_sphere = jax.lax.stop_gradient((pts_norm < 1.0).astype(alpha.dtype))
    relax_inside_sphere = jax.lax.stop_gradient(
        (pts_norm < 1.2).astype(alpha.dtype)
    )

    if background_alpha is not None:
        alpha = alpha * inside_sphere + background_alpha[:, :n_samples] * (
            1.0 - inside_sphere
        )
        alpha = jnp.concatenate([alpha, background_alpha[:, n_samples:]], axis=-1)
        sampled_color = (
            sampled_color * inside_sphere[:, :, None]
            + background_sampled_color[:, :n_samples]
            * (1.0 - inside_sphere)[:, :, None]
        )
        sampled_color = jnp.concatenate(
            [sampled_color, background_sampled_color[:, n_samples:]], axis=1
        )
        if nets.depth is not None:
            sampled_feat = (
                sampled_feat * inside_sphere[:, :, None]
                + background_sampled_feat[:, :n_samples]
                * (1.0 - inside_sphere)[:, :, None]
            )
            sampled_feat = jnp.concatenate(
                [sampled_feat, background_sampled_feat[:, n_samples:]], axis=1
            )

    weights = alpha * transmittance(alpha)
    weights_sum = jnp.sum(weights, axis=-1, keepdims=True)

    color = jnp.sum(sampled_color * weights[:, :, None], axis=1)
    d_feats = None
    if nets.depth is not None:
        d_feats = jnp.sum(sampled_feat * weights[:, :, None], axis=1)
    if background_rgb is not None:
        color = color + background_rgb * (1.0 - weights_sum)

    gradient_error_pt = (
        jnp.linalg.norm(gradients.reshape(batch_size, n_samples, 3), axis=-1)
        - 1.0
    ) ** 2
    # numerator/denominator kept separate AND per-ray so (a) data-parallel
    # shards can psum their sums and reproduce the single-chip ratio exactly,
    # and (b) chunked validation can drop padded rays before accumulating
    gradient_error_num = jnp.sum(relax_inside_sphere * gradient_error_pt, axis=-1)
    gradient_error_den = jnp.sum(relax_inside_sphere, axis=-1)
    gradient_error = jnp.sum(gradient_error_num) / (
        jnp.sum(gradient_error_den) + 1e-5
    )

    return {
        "gradient_error_num": gradient_error_num,
        "gradient_error_den": gradient_error_den,
        "d_feats": d_feats,
        "color": color,
        "sdf": sdf,
        "dists": dists,
        "gradients": gradients.reshape(batch_size, n_samples, 3),
        "s_val": 1.0 / inv_s,
        "mid_z_vals": mid_z_vals,
        "weights": weights,
        "cdf": c.reshape(batch_size, n_samples),
        "gradient_error": gradient_error,
        "inside_sphere": inside_sphere,
    }


def render(
    nets: NeuSNetworks,
    params: Params,
    rays_o: jax.Array,
    rays_d: jax.Array,
    near: jax.Array,
    far: jax.Array,
    key: jax.Array | None = None,
    perturb_overwrite: int = -1,
    background_rgb: jax.Array | None = None,
    cos_anneal_ratio: float | jax.Array = 0.0,
    depth_before_color: bool = False,
) -> dict[str, jax.Array | None]:
    """Full NeuS render of a ray batch (reference renderer.py:332-439).

    rays_o/rays_d: [N, 3]; near/far: [N, 1]. ``key`` drives the sample-jitter
    randomness (required when perturb > 0).
    """
    rcfg = nets.renderer
    batch_size = rays_o.shape[0]
    sample_dist = 2.0 / rcfg.n_samples  # region of interest: unit sphere
    z_vals = jnp.linspace(0.0, 1.0, rcfg.n_samples)
    z_vals = near + (far - near) * z_vals[None, :]

    z_vals_outside = None
    if rcfg.n_outside > 0:
        z_vals_outside = jnp.linspace(
            1e-3, 1.0 - 1.0 / (rcfg.n_outside + 1.0), rcfg.n_outside
        )

    n_samples = rcfg.n_samples
    perturb = rcfg.perturb
    if perturb_overwrite >= 0:
        perturb = perturb_overwrite
    if perturb > 0:
        assert key is not None, "perturbed rendering needs a PRNG key"
        key, k1, k2 = jax.random.split(key, 3)
        t_rand = jax.random.uniform(k1, (batch_size, 1)) - 0.5
        z_vals = z_vals + t_rand * 2.0 / rcfg.n_samples

        if rcfg.n_outside > 0:
            mids = 0.5 * (z_vals_outside[..., 1:] + z_vals_outside[..., :-1])
            upper = jnp.concatenate([mids, z_vals_outside[..., -1:]], axis=-1)
            lower = jnp.concatenate([z_vals_outside[..., :1], mids], axis=-1)
            t_rand = jax.random.uniform(k2, (batch_size, rcfg.n_outside))
            z_vals_outside = (
                lower[None, :] + (upper - lower)[None, :] * t_rand
            )

    if rcfg.n_outside > 0:
        z_vals_outside = (
            far / jnp.flip(z_vals_outside, axis=-1) + 1.0 / rcfg.n_samples
        )

    background_alpha = None
    background_sampled_color = None
    background_sampled_feat = None
    background_zvals = None

    # hierarchical, SDF-guided up-sampling (gradient-free)
    resample = (
        0 < rcfg.n_render_samples < rcfg.n_samples + rcfg.n_importance
        and rcfg.n_importance > 0
    )
    if rcfg.n_importance > 0:
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., :, None]
        sdf = jax.lax.stop_gradient(
            sdf_value(nets.sdf, params["sdf"], pts.reshape(-1, 3))
        ).reshape(batch_size, rcfg.n_samples)
        z_vals_up = jax.lax.stop_gradient(z_vals)

        per_round = rcfg.n_importance // rcfg.up_sample_steps
        for i in range(rcfg.up_sample_steps):
            new_z_vals = up_sample(
                rays_o, rays_d, z_vals_up, sdf, per_round, 64 * 2**i
            )
            # the resampled core needs SDF values over the FULL final ladder
            # set to build its weight estimate — unless that estimate is the
            # pure-uniform floor (resample_uniform_frac >= 1.0), which reads
            # no SDF at all; in both other cases the last round's SDF eval is
            # skipped (its samples go straight to render_core)
            needs_weight_est = (
                resample and rcfg.resample_uniform_frac < 1.0
            )
            last = i + 1 == rcfg.up_sample_steps and not needs_weight_est
            new_sdf = None
            if not last:
                new_pts = (
                    rays_o[:, None, :]
                    + rays_d[:, None, :] * new_z_vals[..., :, None]
                )
                new_sdf = jax.lax.stop_gradient(
                    sdf_value(nets.sdf, params["sdf"], new_pts.reshape(-1, 3))
                ).reshape(batch_size, per_round)
            z_vals_up, sdf = merge_z_vals(
                z_vals_up, new_z_vals, None if last else sdf, new_sdf
            )
        z_vals = z_vals_up
        n_samples = rcfg.n_samples + rcfg.n_importance

        if resample:
            assert rcfg.n_render_samples >= 2, (
                "n_render_samples must be >= 2 (endpoint pinning)"
            )
            # importance-resampled render core (see RendererConfig): shrink
            # the expensive with-gradient sample set to n_render_samples
            # positions drawn from a weight estimate over the full ladder
            # set, floored by a uniform component so empty space keeps
            # stochastic eikonal coverage and no section's PDF hits zero.
            # The estimate runs at the LEARNED sharpness (stop-grad), not the
            # ladder's fixed final inv_s: the sample PDF must track the
            # actual render kernel, which is broad early in training and
            # sharpens as the variance parameter anneals.
            frac = rcfg.resample_uniform_frac
            if frac >= 1.0:
                # pure stratified-uniform ladder subsampling (the mask-free
                # recommendation, PERF_r03.md section 4 floor sweep): the
                # PDF is constant over the ladder's section index (which
                # still inherits the up-sample ladder's near-surface
                # z-density), so skip the weight-estimate forward entirely.
                # A frac=1.0 mixture is mathematically identical but XLA
                # cannot DCE the 0 * w_norm term (0 * non-finite != 0).
                w_mix = jnp.full(
                    z_vals_up.shape[:-1] + (n_samples - 1,),
                    1.0 / (n_samples - 1),
                )
            else:
                inv_s_est = jax.lax.stop_gradient(
                    jnp.clip(variance_apply(params["variance"]), 1e-6, 1e6)
                )
                w = section_weights(
                    rays_o, rays_d, z_vals_up, sdf, inv_s=inv_s_est
                )
                w_norm = w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-6)
                w_mix = (1.0 - frac) * w_norm + frac / (n_samples - 1)
            if perturb > 0:
                # stratified (shared-phase) draws, NOT iid: iid inverse-CDF
                # positions carry ~2x-the-signal SDF-gradient noise and
                # random-walk a formed surface into blobs (sample_pdf
                # docstring; docs/RESAMPLE_AB_CPU.json)
                key, k3 = jax.random.split(key)
                z_core = sample_pdf(
                    z_vals_up, w_mix, rcfg.n_render_samples, key=k3,
                    stratified=True,
                )
            else:
                z_core = sample_pdf(
                    z_vals_up, w_mix, rcfg.n_render_samples, det=True
                )
            # z_core is already sorted per ray: both modes used here draw
            # monotone-increasing u (det = midpoint grid; stratified =
            # (i + xi)/n with one shared phase), and the gather-free
            # inverse-CDF interpolation is monotone non-decreasing in u —
            # no sort needed.
            # pin the core's endpoints to the ladder's first/last z (the
            # faithful path's exact endpoints: base linspace spans
            # [near, far]). The last-sample pin is load-bearing under
            # skip_bg_inside: the fast bg path's boundary sample assumes the
            # last inside z sits at `far`, so its midpoint with the first
            # outside z lies outside the unit sphere for every ray — a
            # stochastic draw short of `far` would break that invariant.
            z_core = jnp.concatenate(
                [z_vals_up[..., :1], z_core[..., 1:-1], z_vals_up[..., -1:]],
                axis=-1,
            )
            z_vals = jax.lax.stop_gradient(z_core)
            n_samples = rcfg.n_render_samples

    # background model over sorted union of inside + outside samples
    # (both are sorted per ray -> rank merge instead of a full sort)
    if rcfg.n_outside > 0:
        z_vals_feed, _ = merge_z_vals(z_vals, z_vals_outside, None, None)
        # fast path evaluates the outside block PLUS one sample: the last
        # inside sample's midpoint lies past `far` (its dist spans to the
        # first outside z), so it is outside the unit sphere for EVERY ray
        # and its bg alpha enters the composite at full weight
        ret_outside = render_core_outside(
            nets, params, rays_o, rays_d, z_vals_feed, sample_dist,
            eval_tail=rcfg.n_outside + 1 if rcfg.skip_bg_inside else None,
        )
        background_sampled_feat = ret_outside["sampled_feat"]
        background_sampled_color = ret_outside["sampled_color"]
        background_alpha = ret_outside["alpha"]
        background_zvals = ret_outside["z_vals"]

    ret_fine = render_core(
        nets,
        params,
        rays_o,
        rays_d,
        z_vals,
        sample_dist,
        depth_before_color=depth_before_color,
        background_rgb=background_rgb,
        background_alpha=background_alpha,
        background_sampled_feat=background_sampled_feat,
        background_sampled_color=background_sampled_color,
        cos_anneal_ratio=cos_anneal_ratio,
        # resampled core: bound the alpha estimator's extrapolation to the
        # faithful path's own coarsest section width (sample_dist is already
        # what the final section uses as its dist)
        est_dist_cap=sample_dist if resample else None,
    )

    weights = ret_fine["weights"]
    weights_sum = jnp.sum(weights, axis=-1, keepdims=True)
    s_val = jnp.mean(
        jnp.broadcast_to(ret_fine["s_val"], (batch_size, 1)), axis=-1,
        keepdims=True,
    )
    z_vals_out = ret_fine["mid_z_vals"]
    if background_zvals is not None:
        z_vals_out = background_zvals

    return {
        "render_feats": ret_fine["d_feats"],
        "color_fine": ret_fine["color"],
        "gradient_error_num": ret_fine["gradient_error_num"],
        "gradient_error_den": ret_fine["gradient_error_den"],
        "s_val": s_val,
        "cdf_fine": ret_fine["cdf"],
        "weight_sum": weights_sum,
        "weight_max": jnp.max(weights, axis=-1, keepdims=True),
        "gradients": ret_fine["gradients"],
        "weights": weights,
        "z_vals": z_vals_out,
        "gradient_error": ret_fine["gradient_error"],
        "inside_sphere": ret_fine["inside_sphere"],
    }
