"""Component-level TPU profile of the flagship train step.

Breaks the ~14 ms batch-512 training step into its compute components and
times each as its own jitted program (dependency-chained lax.scan loops, so
the axon backend's memoization and the ~30-45 ms host-sync tunnel RTT don't
pollute the numbers — see CLAUDE.md). Reports per-component ms, share of the
full step, and achieved TF/s against an analytic FLOP estimate, answering
"where do the remaining 2/3 of peak go?" (VERDICT round-1 weak #4).

Writes docs/PROFILE_r02.json and prints a table.

Usage: python tools/profile_step.py [--batch 512] [--iters 40]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def mlp_flops(dims) -> float:
    return float(sum(2 * a * b for a, b in zip(dims[:-1], dims[1:])))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--iters", type=int, default=40)
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--fused", action="store_true",
                   help="profile with the fused Pallas MLP kernels")
    p.add_argument("--fast-bg", action="store_true",
                   help="profile the skip_bg_inside production mode (the "
                        "analytic bg-NeRF flop count is NOT adjusted — the "
                        "per-component ms are the meaningful numbers)")
    p.add_argument("--render-samples", type=int, default=0,
                   help="importance-resampled render core width "
                   "(RendererConfig.n_render_samples; 0 = faithful)")
    p.add_argument("--resample-frac", type=float, default=0.25,
                   help="uniform-floor fraction for the resampled core")
    p.add_argument("--no-bwd", action="store_true",
                   help="skip the backward-pass component breakdown")
    p.add_argument("--batch-sweep", action="store_true",
                   help="color/NeRF chain TF/s vs row count (the batch-2048 "
                        "efficiency-cliff microbench, VERDICT r2 #5)")
    p.add_argument("--masked-compile", action="store_true",
                   help="time the XLA compile of the masked (n_outside=0) "
                        "step vs the womsk one (VERDICT r2 #3)")
    p.add_argument("--out", type=str, default="docs/PROFILE_r03.json")
    args = p.parse_args(argv)

    from vdnerf_tpu.utils.platforms import apply_jax_platforms_env

    apply_jax_platforms_env()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vdnerf_tpu.models.precision import enable_bf16, set_fused_mlp

    enable_bf16(not args.fp32)
    set_fused_mlp(args.fused)

    from __graft_entry__ import _full_size_setup
    from vdnerf_tpu.data.dataset import near_far_from_sphere
    from vdnerf_tpu.models.fields import (
        nerf_apply,
        render_net_apply,
        sdf_value,
        sdf_value_grad_feat,
    )
    from vdnerf_tpu.ops.renderer import render
    from vdnerf_tpu.ops.sampling import sample_pdf, transmittance, up_sample
    from vdnerf_tpu.train import SceneStatic, TrainConfig, init_state
    from vdnerf_tpu.train.step import make_train_step

    B = args.batch
    nets, params, (rays_o, rays_d, near, far) = _full_size_setup(batch=B)
    if args.fast_bg or args.render_samples:
        import dataclasses

        nets = dataclasses.replace(
            nets,
            renderer=dataclasses.replace(
                nets.renderer,
                skip_bg_inside=args.fast_bg,
                n_render_samples=args.render_samples,
                resample_uniform_frac=args.resample_frac,
            ),
        )
    print(f"device: {jax.devices()[0]}, batch {B}", file=sys.stderr)

    key = jax.random.PRNGKey(0)

    # Per-call floor: one host->tunnel->device->host round trip costs ~27-30
    # ms REGARDLESS of scan length (measured: a trivial-op scan of length
    # 10/40/160 all total ~27.5 ms). Every timed loop below pays it once, so
    # subtract floor/iters from per-iteration numbers or small components
    # read as ~0.7 ms of pure RTT.
    def _measure_floor() -> float:
        x0 = jnp.ones((8, 8))

        @jax.jit
        def loop(x):
            def body(c, _):
                return c * 1.000001, ()
            c, _ = jax.lax.scan(body, x, None, length=4)
            return jnp.sum(c)

        s = float(loop(x0))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            s = float(loop(x0 * (1.0 + s * 1e-12)))
            best = min(best, time.perf_counter() - t0)
        return best

    floor_s = _measure_floor()
    print(f"dispatch floor: {floor_s*1e3:.2f} ms/call", file=sys.stderr)

    def timed(name, fn, x0, iters=args.iters, consts=()):
        """Time fn(x, *consts)->(x-like) chained `iters` times inside one jit.

        Large arrays the body closes over must go in `consts`: closed-over
        arrays become literals in the serialized program, and the axon
        remote-compile tunnel rejects big request bodies (HTTP 413).
        """

        @jax.jit
        def loop(x, *cs):
            def body(c, _):
                return fn(c, *cs), ()

            c, _ = jax.lax.scan(body, x, None, length=iters)
            return c

        r = loop(x0, *consts)
        jax.block_until_ready(r)  # compile + warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            r = loop(r, *consts)  # chained on previous output -> not memoizable
            jax.block_until_ready(r)
            best = min(best, time.perf_counter() - t0)
        ms = max(best - floor_s, 1e-9) / iters * 1e3  # RTT floor excluded
        results[name] = ms
        print(f"  {name:<28s} {ms:8.3f} ms", file=sys.stderr)
        return ms

    results: dict[str, float] = {}
    compile_s: dict[str, float] = {}

    n_s = nets.renderer.n_samples            # 64
    n_imp = nets.renderer.n_importance       # 64
    n_out = nets.renderer.n_outside          # 32
    per_round = n_imp // nets.renderer.up_sample_steps

    pts64 = jax.random.normal(key, (B * n_s, 3)) * 0.5
    pts128 = jax.random.normal(key, (B * (n_s + n_imp), 3)) * 0.5
    pts160 = jnp.concatenate(
        [jax.random.normal(key, (B * (n_s + n_imp + n_out), 3)) * 0.5,
         jnp.ones((B * (n_s + n_imp + n_out), 1))], axis=-1)
    dirs128 = pts128 / jnp.linalg.norm(pts128, axis=-1, keepdims=True)

    # 1. coarse SDF (the up-sample ladder's stop-gradient evals)
    def sdf_q(x, ps):
        s = sdf_value(nets.sdf, ps, x)
        return x * 1.000001 + 1e-20 * jnp.mean(s)
    timed("sdf_fwd_64spp", sdf_q, pts64, consts=(params["sdf"],))
    # 2. fused value+grad+feature SDF (the core query)
    def core_q(x, ps):
        s, g, f = sdf_value_grad_feat(nets.sdf, ps, x)
        return x * 1.000001 + 1e-20 * (jnp.mean(s) + jnp.mean(g) + jnp.mean(f))
    timed("sdf_valgradfeat_128spp", core_q, pts128, consts=(params["sdf"],))
    # 3. color head
    feat = jax.random.normal(key, (B * (n_s + n_imp), nets.color.d_feature))
    def color_q(x, dirs, ft, ps):
        c = render_net_apply(nets.color, ps, x, dirs, dirs, ft)
        return x * 1.000001 + 1e-20 * jnp.mean(c)
    timed("color_net_128spp", color_q, pts128,
          consts=(dirs128, feat, params["color"]))
    if args.render_samples and args.render_samples != n_s + n_imp:
        # the resampled core's with-gradient widths (the program the shipped
        # TPU confs run post-onset): same queries at B*n_render_samples rows
        n_rs = args.render_samples
        pts_rs = jax.random.normal(key, (B * n_rs, 3)) * 0.5
        dirs_rs = pts_rs / jnp.linalg.norm(pts_rs, axis=-1, keepdims=True)
        feat_rs = jax.random.normal(key, (B * n_rs, nets.color.d_feature))
        timed(f"sdf_valgradfeat_{n_rs}spp", core_q, pts_rs,
              consts=(params["sdf"],))
        timed(f"color_net_{n_rs}spp", color_q, pts_rs,
              consts=(dirs_rs, feat_rs, params["color"]))
    # 4. background NeRF over 160 samples
    def nerf_q(x, ps):
        d, c, _ = nerf_apply(nets.nerf, ps, x,
                             jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]),
                                              (x.shape[0], 3)))
        return x * 1.000001 + 1e-20 * (jnp.mean(d) + jnp.mean(c))
    timed("bg_nerf_160spp", nerf_q, pts160, consts=(params["nerf"],))
    # 5. one up-sample round (alpha estimate + inverse-CDF + merge happens
    #    4x per step at growing S)
    z0 = jnp.sort(jax.random.uniform(key, (B, n_s)) * 2.0 + 2.0, axis=-1)
    sdf0 = jax.random.normal(key, (B, n_s)) * 0.1

    def ups_q(z, o, d, s):
        new_z = up_sample(o, d, z, s, per_round, 64.0)
        return z * 1.000001 + 1e-20 * jnp.mean(new_z)
    timed("up_sample_round(64spp)", ups_q, z0, consts=(rays_o, rays_d, sdf0))
    # 6. sample_pdf alone at the LAST round's shape (widest mask tensor)
    z_last = jnp.sort(jax.random.uniform(key, (B, n_s + 3 * per_round)) * 2.0
                      + 2.0, axis=-1)
    w_last = jax.random.uniform(key, (B, n_s + 3 * per_round - 1)) + 0.01

    def pdf_q(z, w):
        s = sample_pdf(z, w, per_round, det=True)
        return z * 1.000001 + 1e-20 * jnp.mean(s)
    timed(f"sample_pdf({n_s + 3 * per_round}bins)", pdf_q, z_last,
          consts=(w_last,))
    # 7. transmittance/compositing math at full width
    alpha0 = jax.random.uniform(key, (B, n_s + n_imp + n_out)) * 0.2

    def comp_q(a):
        w = a * transmittance(a)
        return a * 1.000001 + 1e-20 * jnp.mean(w)
    timed("transmittance_160", comp_q, alpha0)

    # 8. full forward render
    def fwd_q(o, d, nr, fr, ps):
        out = render(nets, ps, o, d, nr, fr,
                     perturb_overwrite=0,
                     background_rgb=jnp.ones((1, 3)),
                     cos_anneal_ratio=1.0)
        return o * 1.000001 + 1e-20 * jnp.mean(out["color_fine"])
    timed("full_render_fwd", fwd_q, rays_o, iters=max(args.iters // 2, 10),
          consts=(rays_d, near, far, params))

    # 9. full training step (render + all losses + bwd + adam)
    tcfg = TrainConfig(batch_size=B)
    scene = SceneStatic(H=64, W=64)
    cams = {
        "pose_all": jnp.tile(jnp.eye(4)[None], (2, 1, 1)).at[:, 2, 3].set(-2.2),
        "intrin_inv_all": jnp.tile(jnp.eye(4)[None], (2, 1, 1)),
    }
    state = init_state(params, tcfg, cams, key)
    rng = np.random.default_rng(0)
    batch0 = {
        "img_idx": jnp.int32(0),
        "pixels_x": jnp.asarray(rng.integers(0, 64, B), jnp.int32),
        "pixels_y": jnp.asarray(rng.integers(0, 64, B), jnp.int32),
        "color": jnp.asarray(rng.uniform(0, 1, (B, 3)), jnp.float32),
        "mask": jnp.ones((B, 1), jnp.float32),
        "feats": jnp.zeros((B, 1), jnp.float32),
    }

    def time_step(name, step, state0, loop_len=max(args.iters // 2, 10)):
        @jax.jit
        def step_loop(state, batch):
            def body(s, _):
                s2, _m = step(s, batch)  # state chains -> distinct every iter
                return s2, ()
            s, _ = jax.lax.scan(body, state, None, length=loop_len)
            return s

        s = step_loop(state0, batch0)
        jax.block_until_ready(s["step"])
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            s = step_loop(s, batch0)
            jax.block_until_ready(s["step"])
            best = min(best, time.perf_counter() - t0)
        ms = max(best - floor_s, 1e-9) / loop_len * 1e3
        results[name] = ms
        print(f"  {name:<28s} {ms:8.3f} ms", file=sys.stderr)
        return ms

    step_ms = time_step("full_train_step", make_train_step(nets, tcfg, scene),
                        state)

    import dataclasses as _dc

    extra_flops: dict[str, float] = {}

    if not args.no_bwd:
        # ---- backward breakdown (VERDICT r2 #2) --------------------------
        # Each component timed as fwd+bwd (value_and_grad wrt PARAMS, the
        # cotangent path the real step takes); the derived bwd = fwd+bwd
        # minus the forward-only number measured above.

        def leaves_sum(tree):
            return jax.tree_util.tree_reduce(
                lambda a, l: a + jnp.sum(jnp.abs(l).astype(jnp.float32)) * 1e-20,
                tree, jnp.float32(0),
            )

        def fwdbwd(scalar_fn):
            # returns body(x, *consts) -> x' that runs value_and_grad wrt the
            # FIRST const (the params pytree)
            def body(x, ps, *rest):
                val, g = jax.value_and_grad(
                    lambda p: scalar_fn(p, x, *rest)
                )(ps)
                return x * 1.000001 + 1e-20 * val + leaves_sum(g)
            return body

        # fused value+grad+feat query: backward here carries the
        # SECOND-ORDER eikonal term (grad of a function of grad-sdf)
        def sdf_vgf_scalar(ps, x):
            s, g, f = sdf_value_grad_feat(nets.sdf, ps, x)
            # touch the gradient nonlinearly, as the eikonal loss does
            return (jnp.sum(s) + jnp.sum((jnp.linalg.norm(
                g, axis=-1) - 1.0) ** 2) + jnp.sum(f)) * 1e-6
        timed("sdf_vgf_fwdbwd2nd_128spp", fwdbwd(sdf_vgf_scalar), pts128,
              consts=(params["sdf"],))

        # first-order control: value+feat WITHOUT the spatial-gradient output
        from vdnerf_tpu.models.fields import sdf_apply_split

        def sdf_val_scalar(ps, x):
            s, f = sdf_apply_split(nets.sdf, ps, x)
            return (jnp.sum(s) + jnp.sum(f)) * 1e-6
        timed("sdf_value_fwdbwd1st_128spp", fwdbwd(sdf_val_scalar), pts128,
              consts=(params["sdf"],))

        def color_scalar(ps, x, dirs, ft):
            c = render_net_apply(nets.color, ps, x, dirs, dirs, ft)
            return jnp.sum(c) * 1e-6
        timed("color_fwdbwd_128spp", fwdbwd(color_scalar), pts128,
              consts=(params["color"], dirs128, feat))

        def nerf_scalar(ps, x):
            dd, cc, _ = nerf_apply(
                nets.nerf, ps, x,
                jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]),
                                 (x.shape[0], 3)))
            return (jnp.sum(dd) + jnp.sum(cc)) * 1e-6
        timed("bg_nerf_fwdbwd_160spp", fwdbwd(nerf_scalar), pts160,
              consts=(params["nerf"],))

        if args.render_samples and args.render_samples != n_s + n_imp:
            # fwd+bwd at the resampled-core width: the with-gradient
            # program the shipped TPU confs actually run post-onset
            n_rs = args.render_samples
            timed(f"sdf_vgf_fwdbwd2nd_{n_rs}spp", fwdbwd(sdf_vgf_scalar),
                  pts_rs, consts=(params["sdf"],))
            timed(f"color_fwdbwd_{n_rs}spp", fwdbwd(color_scalar),
                  pts_rs, consts=(params["color"], dirs_rs, feat_rs))

        # full loss forward-only (render + all losses, no grad, no adam)
        from vdnerf_tpu.train.step import make_loss_fn

        loss_fn = make_loss_fn(nets, tcfg, scene)

        def loss_q(x, st, b):
            # chain the CARRY into the loss inputs — otherwise the loss is
            # loop-invariant and XLA hoists the whole render out of the scan
            # (measured 0.42 ms for a 3.7 ms forward before this fix)
            b2 = dict(b, color=b["color"] + 1e-12 * x)
            l, _m = loss_fn((st["params"], st["cams"]), b2, st["step"],
                            jax.random.PRNGKey(7))
            return x * 1.000001 + 1e-20 * l
        timed("full_loss_fwd_only", loss_q, rays_o, iters=max(args.iters // 2, 10),
              consts=(state, batch0))

        # ablation: igr_weight=0 -> the second-order eikonal term leaves the
        # BACKWARD graph (the forward still computes it for metrics)
        time_step("full_step_igr0",
                  make_train_step(nets, _dc.replace(tcfg, igr_weight=0.0),
                                  scene), state)

    if args.batch_sweep:
        # ---- batch-scaling cliff microbench (VERDICT r2 #5) --------------
        # the color/NeRF chains in ISOLATION at growing row counts; flagship
        # batch 512 -> 65k color rows; 2048 -> 262k; 8192 -> 1M
        for rows in (65536, 262144, 1048576):
            ptsN = jax.random.normal(key, (rows, 3)) * 0.5
            dirsN = ptsN / jnp.linalg.norm(ptsN, axis=-1, keepdims=True)
            featN = jax.random.normal(key, (rows, nets.color.d_feature))
            it_n = max(8, 80 * 65536 // rows)
            timed(f"color_rows{rows}", color_q, ptsN,
                  consts=(dirsN, featN, params["color"]), iters=it_n)
            pts4N = jnp.concatenate(
                [ptsN, jnp.ones((rows, 1))], axis=-1)
            timed(f"nerf_rows{rows}", nerf_q, pts4N,
                  consts=(params["nerf"],), iters=it_n)
            extra_flops[f"color_rows{rows}"] = rows * mlp_flops(nets.color.dims)
            extra_flops[f"nerf_rows{rows}"] = rows * 1.0  # patched below

    if args.masked_compile:
        # ---- masked-mode (n_outside=0) compile + steady step -------------
        # round-2 flagship masked "2.3x slowdown" hypothesis: it is a
        # one-time remote-compile cost, not steady-state throughput
        masked_nets = _dc.replace(
            nets, renderer=_dc.replace(nets.renderer, n_outside=0)
        )
        mcfg = TrainConfig(batch_size=B, use_mask=True, mask_weight=0.1)
        mstate = init_state(params, mcfg, cams, key)
        mstep = make_train_step(masked_nets, mcfg, scene)

        for label, step_i, st_i in (
            ("masked", mstep, mstate),
            ("womsk", make_train_step(nets, tcfg, scene), state),
        ):
            @jax.jit
            def one(s, b, _step=step_i):
                s2, m = _step(s, b)
                return s2["step"], m["loss"]

            t0 = time.perf_counter()
            lowered = one.lower(st_i, batch0)
            compiled = lowered.compile()
            dt = time.perf_counter() - t0
            # seconds, NOT ms — keep out of components_ms (whose every other
            # entry is ms and feeds the %step/TF/s table)
            compile_s[label] = round(dt, 1)
            print(f"  compile ({label}): {dt:.1f}s", file=sys.stderr)
        time_step("full_step_masked", mstep, mstate)

    # ---- analytic FLOP accounting (fwd only, per step)
    sdf_f = mlp_flops(nets.sdf.dims)
    color_f = mlp_flops(nets.color.dims)
    # NeRF trunk: 8 layers of W + heads; approximate with dims
    W = nets.nerf.W
    nerf_f = mlp_flops((nets.nerf.input_ch,) + (W,) * nets.nerf.D) + \
        2 * W * (W + 1) + 2 * (W + nets.nerf.input_ch_view) * (W // 2) + \
        2 * (W // 2) * 3
    n_core = B * (n_s + n_imp)
    flops = {
        "sdf_fwd_64spp": B * n_s * sdf_f,
        "sdf_valgradfeat_128spp": n_core * sdf_f * 4,  # value + 3 jvp lanes
        "color_net_128spp": n_core * color_f,
        "bg_nerf_160spp": B * (n_s + n_imp + n_out) * nerf_f,
        "full_train_step": (
            B * (n_s + 3 * per_round) * sdf_f            # ladder evals
            + n_core * sdf_f * 4 + n_core * color_f
            + B * (n_s + n_imp + n_out) * nerf_f
        ) * 3.0,  # fwd + ~2x bwd
    }
    # fwd+bwd components: analytic flops = 3x the forward's (one fwd + the
    # two backward matmuls per forward matmul); the fused v+g+f query's
    # 2nd-order backward re-traverses its internal VJP, ~3x its 4-lane fwd
    flops.update({
        "sdf_vgf_fwdbwd2nd_128spp": n_core * sdf_f * 4 * 3.0,
        "sdf_value_fwdbwd1st_128spp": n_core * sdf_f * 3.0,
        "color_fwdbwd_128spp": n_core * color_f * 3.0,
        "bg_nerf_fwdbwd_160spp": B * (n_s + n_imp + n_out) * nerf_f * 3.0,
    })
    if args.render_samples and args.render_samples != n_s + n_imp:
        n_rs_rows = B * args.render_samples
        flops[f"sdf_valgradfeat_{args.render_samples}spp"] = (
            n_rs_rows * sdf_f * 4
        )
        flops[f"color_net_{args.render_samples}spp"] = n_rs_rows * color_f
        flops[f"sdf_vgf_fwdbwd2nd_{args.render_samples}spp"] = (
            n_rs_rows * sdf_f * 4 * 3.0
        )
        flops[f"color_fwdbwd_{args.render_samples}spp"] = (
            n_rs_rows * color_f * 3.0
        )
    for k, v in extra_flops.items():
        flops[k] = v * nerf_f if k.startswith("nerf_rows") else v
    # derived backward-only numbers (fwd+bwd minus the forward component)
    derived = {}
    pairs = {
        "sdf_vgf_bwd_128spp": ("sdf_vgf_fwdbwd2nd_128spp",
                               "sdf_valgradfeat_128spp"),
        "color_bwd_128spp": ("color_fwdbwd_128spp", "color_net_128spp"),
        "bg_nerf_bwd_160spp": ("bg_nerf_fwdbwd_160spp", "bg_nerf_160spp"),
        "full_bwd_plus_adam": ("full_train_step", "full_loss_fwd_only"),
        "eikonal_2nd_order_cost": ("full_train_step", "full_step_igr0"),
    }
    if args.render_samples and args.render_samples != n_s + n_imp:
        rs = args.render_samples
        pairs[f"sdf_vgf_bwd_{rs}spp"] = (
            f"sdf_vgf_fwdbwd2nd_{rs}spp", f"sdf_valgradfeat_{rs}spp")
        pairs[f"color_bwd_{rs}spp"] = (
            f"color_fwdbwd_{rs}spp", f"color_net_{rs}spp")
    for name, (a, b) in pairs.items():
        if a in results and b in results:
            derived[name] = round(results[a] - results[b], 3)
    report = {"batch": B, "bf16": not args.fp32, "fused": args.fused,
              "fast_bg": args.fast_bg,
              "render_samples": args.render_samples,
              "dispatch_floor_ms": round(floor_s * 1e3, 2),
              "components_ms": results, "derived_bwd_ms": derived,
              "tflops_est": {}}
    if compile_s:
        report["compile_s"] = compile_s
    print(f"\n{'component':<28s} {'ms':>8s} {'% step':>7s} {'TF/s':>7s}",
          file=sys.stderr)
    for name, ms in results.items():
        share = 100.0 * ms / step_ms
        tfs = flops.get(name, 0) / (ms * 1e-3) / 1e12 if name in flops else None
        report["tflops_est"][name] = round(tfs, 1) if tfs else None
        print(f"{name:<28s} {ms:8.3f} {share:6.1f}% "
              f"{tfs:7.1f}" if tfs else f"{name:<28s} {ms:8.3f} {share:6.1f}%",
              file=sys.stderr)
    report["rays_per_sec"] = round(B / (step_ms * 1e-3), 1)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({"rays_per_sec": report["rays_per_sec"],
                      "step_ms": round(step_ms, 3)}))
    return report


if __name__ == "__main__":
    main()
