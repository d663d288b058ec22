"""Training-throughput benchmark: rays/sec/chip on the flagship NeuS model.

Runs the full womsk_white.conf-size training step on a synthetic sphere
scene, measures steady-state rays/sec on the available chip, and prints ONE
JSON line:

    {"metric": "...", "value": N, "unit": "rays/sec/chip", "vs_baseline": N}

Measurement notes (this environment's axon TPU tunnel):
- identical executions are memoized -> every step gets a distinct batch;
- per-step host sync adds ~30-45 ms tunnel RTT -> timing uses a long chain
  of dependency-linked steps with one final host read;
- losses are asserted finite (targets come from a coherent synthetic scene,
  so the loss trains rather than diverging).

Baseline: the torch reference trains 512 rays/iter at roughly 5 it/s on a
single consumer GPU (300k iters in ~14-18h), i.e. ~2.5-3k rays/sec.
vs_baseline is computed against 3000 rays/sec (the generous end). The
reference repo publishes no numbers itself (BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time

TORCH_BASELINE_RAYS_PER_SEC = 3000.0


def bench_train(batch_size: int, n_warmup: int = 3, n_steps: int = 200,
                bf16: bool = True, grad_accum: int = 1,
                fast_bg: bool = False, render_samples: int = 0,
                uniform_frac: float | None = None,
                wmask_shape: bool = False, wdepth_shape: bool = False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    if bf16:
        # convergence-validated mixed precision (identical PSNR trajectory
        # to fp32 on the synthetic-sphere run); f32 matmuls already run at
        # the bf16 MXU rate, so the win is bf16 *activations* cutting HBM
        # traffic on the non-matmul stretches (~1.4x step-level; the
        # dominant SDF kernel itself is compute-bound at the matmul
        # roofline — docs/PERF_r02.md)
        from vdnerf_tpu.models.precision import enable_bf16

        enable_bf16(True)

    from __graft_entry__ import _full_size_setup
    from vdnerf_tpu.data.synthetic import look_at_pose, render_sphere_image
    from vdnerf_tpu.train import SceneStatic, TrainConfig, init_state
    from vdnerf_tpu.train.step import make_train_scan_step

    # wdepth_shape: the confs/womsk_white_wdepth_tpu.conf step — the 96-ch
    # depth head + NeRF dpt head in the render, and the masked feature-L1
    # distillation loss (scale 10, the shipped dose-response point; L1 as
    # in the reference's F.l1_loss, dpt_runner.py:241) in the backward.
    # Combine with fast_bg=True for the conf's skip_bg_inside.
    nets, params, _ = _full_size_setup(batch=batch_size, small=False,
                                       with_depth=wdepth_shape)
    if wmask_shape:
        # the exact confs/wmask_tpu.conf model + loss shape: no background
        # NeRF (n_outside=0; the runner still builds + optimizes the nerf
        # params per the conf's nerf block, matching the shipped step) and
        # the mask BCE loss (mask_weight=0.1). Combine with
        # render_samples=64 for the conf's post-onset program.
        import dataclasses

        nets = dataclasses.replace(
            nets, renderer=dataclasses.replace(nets.renderer, n_outside=0)
        )
    if fast_bg or render_samples:
        # opt-in production fast paths (documented approximations) — NOT
        # the headline metric, which stays on the reference-faithful
        # workload. skip_bg_inside: convergence-validated at flagship scale
        # (docs/FLAGSHIP_r02_fastbg.json). Importance-resampled core:
        # convergence A/Bs in docs/RESAMPLE_AB_CPU.json (production recipe
        # phases it in via train.resample_from; this measures the
        # post-onset program, the one that runs for the bulk of training).
        import dataclasses

        renderer_kwargs = dict(skip_bg_inside=fast_bg,
                               n_render_samples=render_samples)
        if uniform_frac is not None:
            renderer_kwargs["resample_uniform_frac"] = uniform_frac
        nets = dataclasses.replace(
            nets,
            renderer=dataclasses.replace(nets.renderer, **renderer_kwargs),
        )
    depth_kwargs = dict(
        extract_depth=True, depth_start_iter=0, depth_ramp_iters=1,
        depth_weight=0.2, depth_loss_scale=10.0,
    ) if wdepth_shape else {}
    tcfg = TrainConfig(batch_size=batch_size, use_mask=wmask_shape,
                       mask_weight=0.1 if wmask_shape else 0.0,
                       **depth_kwargs)
    H = W = 256
    n_images = 4
    K = np.eye(4)
    K[0, 0] = K[1, 1] = 300.0
    K[0, 2] = W / 2.0
    K[1, 2] = H / 2.0

    poses, images, masks = [], [], []
    rng = np.random.default_rng(0)
    for i in range(n_images):
        th = 2 * np.pi * i / n_images
        eye = 3.0 * np.array([np.cos(th), np.sin(th), 0.3])
        c2w = look_at_pose(eye, np.zeros(3))
        rgba, _ = render_sphere_image(c2w, K, H, W, 0.5)
        poses.append(c2w)
        images.append(rgba[..., :3].astype(np.float32) / 255.0)
        masks.append((rgba[..., 3:] > 0).astype(np.float32))
    poses = np.stack(poses)
    images = np.stack(images)
    masks = np.stack(masks)

    cams = {
        "pose_all": jnp.asarray(poses),
        "intrin_inv_all": jnp.tile(
            jnp.asarray(np.linalg.inv(K), jnp.float32)[None], (n_images, 1, 1)
        ),
    }
    scene = SceneStatic(H=H, W=W)
    state = init_state(params, tcfg, cams, jax.random.PRNGKey(0))
    # the production multi-step path (train.steps_per_call): the whole
    # measurement window is ONE device dispatch, as in real training with
    # steps_per_call = n_steps — per-call enqueue overhead amortized away
    scan_fn = jax.jit(make_train_scan_step(nets, tcfg, scene,
                                           grad_accum=grad_accum))

    def make_batches(k):
        imgs = np.arange(k, dtype=np.int32) % n_images
        px = rng.integers(0, W, (k, batch_size)).astype(np.int32)
        py = rng.integers(0, H, (k, batch_size)).astype(np.int32)
        ii = imgs[:, None]
        return {
            "img_idx": imgs,
            "pixels_x": px,
            "pixels_y": py,
            "color": images[ii, py, px],
            "mask": masks[ii, py, px],
            "feats": rng.uniform(
                0, 1, (k, batch_size, 96 if wdepth_shape else 1)
            ).astype(np.float32),
        }

    # warm up with a full-length window so the compile is reused verbatim
    state, metrics = scan_fn(state, make_batches(n_steps))
    jax.block_until_ready(metrics["loss"])

    # two measurement windows, best taken: the first window in a process
    # can still absorb remote-compile/autotune warm-up on this backend.
    # Distinct batches per window (the backend memoizes identical calls);
    # pre-placed on device — in production the next window's upload overlaps
    # the current window's compute (async dispatch), so the transfer is not
    # part of steady-state step time.
    windows = [
        jax.tree_util.tree_map(jnp.asarray, make_batches(n_steps))
        for _ in range(2)
    ]
    jax.block_until_ready(windows)
    best_dt = float("inf")
    for w in range(2):
        t0 = time.perf_counter()
        state, metrics = scan_fn(state, windows[w])
        loss = float(np.asarray(metrics["loss"])[-1])  # host materialization
        dt = time.perf_counter() - t0
        assert np.isfinite(loss), f"loss diverged: {loss}"
        best_dt = min(best_dt, dt)
    rays_per_sec = batch_size * n_steps / best_dt
    return rays_per_sec, best_dt / n_steps


def bench_render(n_rays: int = 524288, chunk: int = 8192,
                 render_samples: int = 0):
    """Forward-only (inference/serving) throughput: the chunked image-render
    path (train/validate.py ImageRenderer) on the flagship model, bf16.

    Measures a dependency-chained sequence of ``n_rays // chunk`` render
    chunks (each chunk's origins derive from the previous chunk's output so
    successive chunks differ) with one final host read; each timed call gets
    DISTINCT starting origins (>= f32-eps apart — the backend memoizes
    value-identical executions).
    """
    n_chunks = n_rays // chunk
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vdnerf_tpu.models.precision import enable_bf16

    enable_bf16(True)

    from __graft_entry__ import _full_size_setup
    from vdnerf_tpu.data.dataset import near_far_from_sphere
    from vdnerf_tpu.ops.renderer import render

    nets, params, _ = _full_size_setup(batch=chunk, small=False)
    if render_samples:
        import dataclasses

        nets = dataclasses.replace(
            nets,
            renderer=dataclasses.replace(
                nets.renderer, n_render_samples=render_samples
            ),
        )
    rng = np.random.default_rng(0)
    o = np.tile([[0.0, 0.0, 3.0]], (chunk, 1)).astype(np.float32)
    d = rng.normal(size=(chunk, 3)).astype(np.float32)
    d[:, 2] = -3.0
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)

    @jax.jit
    def render_chunks(ps, o0, d0):
        def body(carry, _):
            oo = carry
            near, far = near_far_from_sphere(oo, d0)
            out = render(nets, ps, oo, d0, near, far,
                         perturb_overwrite=0,
                         background_rgb=jnp.ones((1, 3)),
                         cos_anneal_ratio=1.0)
            # chain: next chunk's origins nudged by this chunk's colors
            # (above f32 eps at |o|~3 so successive chunks really differ)
            oo = oo + 1e-5 * jnp.mean(out["color_fine"])
            return oo, jnp.mean(out["color_fine"])
        oo, cs = jax.lax.scan(body, o0, None, length=n_chunks)
        return jnp.sum(cs)

    jax.block_until_ready(render_chunks(params, o, d))  # compile + warm
    # distinct, pre-placed origins per timed call, well above f32 eps
    origins = [jnp.asarray(np.asarray(o) * (1.0 + 1e-5 * (w + 1)))
               for w in range(2)]
    jax.block_until_ready(origins)
    best = float("inf")
    for w in range(2):
        t0 = time.perf_counter()
        s = float(render_chunks(params, origins[w], d))
        best = min(best, time.perf_counter() - t0)
        assert np.isfinite(s)
    return chunk * n_chunks / best


def main():
    import jax

    results = {}
    # monolithic 4096 trips an axon-compiler register-allocation RET_CHECK;
    # effective 4096/8192 run as grad-accumulated microbatches instead
    # (train/step.py grad_accum) at the measured per-chip sweet spot of 512
    # (8x512 = 37.8k rays/s vs 2x2048 = 32.6k). Tolerates per-config
    # failures.
    for batch, accum in ((512, 1), (2048, 1), (4096, 8), (8192, 16)):
        label = f"{batch}" if accum == 1 else f"{batch}={accum}x{batch//accum}"
        try:
            # long windows amortize the per-window host read (~27 ms tunnel
            # RTT); small batches need more steps for the same amortization
            rps, step_time = bench_train(
                batch, n_steps=max(50, min(200, 100_000 // batch)),
                grad_accum=accum,
            )
            results[label] = (rps, step_time)
            print(
                f"[bench] batch={label}: {rps:,.0f} rays/s "
                f"({step_time*1e3:.1f} ms/step) on {jax.devices()[0]}",
                file=sys.stderr,
            )
        except Exception as e:  # noqa: BLE001
            print(f"[bench] batch={label} failed: {e}", file=sys.stderr)

    if not results:
        raise SystemExit("bench failed for all batch sizes")

    # Optional extras below share a time budget so the final JSON line is
    # guaranteed to print even when remote compiles are slow (each mode is
    # its own XLA program = its own ~1-2 min tunnel compile). Headline
    # benches above always run.
    import os

    t_extras = time.time()
    # budget sized for 5 train-shape arms + 2 render arms (~1.5-2 min of
    # remote compile each); the final JSON line prints regardless
    extras_budget = float(os.environ.get("VDNERF_BENCH_EXTRAS_S", "720"))

    def _over_budget(label):
        if time.time() - t_extras > extras_budget:
            print(f"[bench] {label} skipped (extras budget "
                  f"{extras_budget:.0f}s exhausted)", file=sys.stderr)
            return True
        return False

    # production fast paths (convergence-validated at flagship scale) —
    # reported alongside, never as the headline: skip_bg_inside, the
    # importance-resampled render core at the masked recipe's width
    # (64 of 128, confs/wmask_tpu.conf), and the tuned mask-free
    # production combo (skip_bg_inside + 96-of-128 pure-uniform core,
    # the shipped operating point in confs/womsk_white_tpu.conf —
    # -0.09 dB iso-iteration, docs/RESAMPLE_AB_CPU.json womsk_floor_sweep)
    fast_modes = {}
    for label, kwargs in (
        ("fast_bg", dict(fast_bg=True)),
        ("resample", dict(render_samples=64)),
        ("fast_bg_resample", dict(fast_bg=True, render_samples=96,
                                  uniform_frac=1.0)),
        # the true shipped wmask_tpu.conf step: n_outside=0 + mask BCE +
        # the 64-of-128 resampled core (post-onset program)
        ("wmask", dict(wmask_shape=True, render_samples=64)),
        # the true shipped womsk_white_wdepth_tpu.conf step: 96-ch depth
        # head + masked feature-L1 distillation loss (scale 10) +
        # skip_bg_inside + the 96-of-128 frac-1.0 resampled core (post-
        # onset program; shipped since the r05 distillation A/B —
        # docs/VDN_CYCLE_r05_camlight_w10_rs96.json)
        ("wdepth", dict(wdepth_shape=True, fast_bg=True, render_samples=96,
                        uniform_frac=1.0)),
    ):
        if _over_budget(label):
            continue
        try:
            rps, step = bench_train(512, n_steps=195, **kwargs)
            fast_modes[label] = rps
            print(
                f"[bench] batch=512 {label}: {rps:,.0f} rays/s "
                f"({step*1e3:.1f} ms/step)",
                file=sys.stderr,
            )
        except Exception as e:  # noqa: BLE001
            print(f"[bench] {label} failed: {e}", file=sys.stderr)

    best_batch, (best, _) = max(results.items(), key=lambda kv: kv[1][0])
    n_chips = len(jax.devices())
    per_chip = best / n_chips
    out = {
        "metric": (
            "train rays/sec/chip, full womsk_white model "
            f"(best batch={best_batch})"
        ),
        "value": round(per_chip, 1),
        "unit": "rays/sec/chip",
        "vs_baseline": round(per_chip / TORCH_BASELINE_RAYS_PER_SEC, 2),
    }
    for label, rps in fast_modes.items():
        out[f"{label}_rays_per_sec"] = round(rps / n_chips, 1)
        out[f"{label}_vs_baseline"] = round(
            rps / n_chips / TORCH_BASELINE_RAYS_PER_SEC, 2
        )
    # each arm labeled with the configuration it measures (VERDICT r3 #6)
    out["arm_confs"] = {
        "headline": "reference-faithful full-width core (womsk_white.conf "
                    "semantics; the TPU confs ship resample ON)",
        "fast_bg": "womsk_white_tpu.conf (skip_bg_inside production mode)",
        "resample": "64-of-128 core width on the womsk_white workload "
                    "(diagnostic; no shipped conf pairs resample with bg "
                    "NeRF at frac 0.25)",
        "fast_bg_resample": "womsk_white_tpu.conf as shipped "
                            "(skip_bg_inside + 96-of-128 frac=1.0)",
        "wmask": "wmask_tpu.conf as shipped (n_outside=0 + mask BCE + "
                 "64-of-128 core, post-onset program)",
        "wdepth": "womsk_white_wdepth_tpu.conf as shipped (96-ch depth "
                  "head + scale-10 distillation loss + skip_bg_inside + "
                  "96-of-128 frac=1.0 core, post-onset program)",
    }
    for label, kwargs in (("render", {}),
                          ("render_resample", dict(render_samples=64))):
        if _over_budget(label):
            continue
        try:
            # bench_render runs unsharded on one device — already a per-chip
            # number, no division by device count
            render_rps = bench_render(**kwargs)
            print(f"[bench] {label}-only: {render_rps:,.0f} rays/s",
                  file=sys.stderr)
            out[f"{label}_rays_per_sec"] = round(render_rps, 1)
        except Exception as e:  # noqa: BLE001
            print(f"[bench] {label} bench failed: {e}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
