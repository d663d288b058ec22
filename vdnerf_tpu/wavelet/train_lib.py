"""Training machinery for the monodepth side-car (shared by pretrain +
VDN finetune).

Loss parity with the reference loops (wavelet/train.py:169-378,
wavelet/finetune_for_vdn.py:64-221):

- per scale s: bilinear-upsample (align_corners=True) disp_s by 2^s, mask,
  0.1 * L1 against the masked depth target
- + L1 on the coarsest predicted LL against the 4-level Haar DWT of the
  target, divided by 2^4 (supervise_LL)
- Adam; cosine LR over epochs; finetune trains the ENCODER ONLY with the
  decoder frozen (finetune_for_vdn.py:97-100)

One jitted step; BN batch_stats updated in train mode.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import optax

from vdnerf_tpu.wavelet.haar import haar_dwt2_multi


def resize_bilinear_align_corners(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """torch F.interpolate(..., mode='bilinear', align_corners=True) for NHWC."""
    n, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    ys = jnp.linspace(0.0, h - 1.0, out_h)
    xs = jnp.linspace(0.0, w - 1.0, out_w)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
    bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
    return top * (1 - wy) + bot * wy


def multiscale_depth_loss(
    outputs: dict,
    depth_n: jax.Array,
    mask: jax.Array,
    loss_scales=(0, 1, 2, 3),
    output_scales=(0, 1, 2, 3),
    supervise_ll: bool = True,
    dwt_levels: int = 4,
):
    """-> (total_loss, per-scale metric dict). depth_n/mask: [N, H, W, 1]."""
    h, w = depth_n.shape[1:3]
    total = 0.0
    metrics = {}
    for scale in range(4):
        if scale not in output_scales or ("disp", scale) not in outputs:
            continue
        pred = resize_bilinear_align_corners(outputs[("disp", scale)], h, w)
        pred = pred * mask
        l_depth = jnp.mean(jnp.abs(pred - depth_n))
        loss = 0.1 * l_depth
        if scale in loss_scales:
            total = total + loss
        metrics[f"loss/{scale}"] = loss
        metrics[f"loss_depth/{scale}"] = l_depth

    if supervise_ll and ("wavelets", 3, "LL") in outputs:
        yl_gt, _ = haar_dwt2_multi(depth_n, dwt_levels)
        l_ll = jnp.mean(jnp.abs(outputs[("wavelets", 3, "LL")] - yl_gt)) / (
            2**dwt_levels
        )
        metrics["loss_LL3"] = l_ll
        total = total + l_ll

    metrics["loss"] = total
    return total, metrics


def cosine_epoch_lr(base_lr: float, epochs: int, alpha: float = 0.05,
                    warmup: int = 0):
    def schedule(epoch):
        e = jnp.asarray(epoch, jnp.float32)
        warm = e / max(warmup, 1)
        progress = (e - warmup) / max(epochs - warmup, 1)
        cos = (jnp.cos(jnp.pi * progress) + 1.0) * 0.5 * (1 - alpha) + alpha
        return base_lr * jnp.where(e < warmup, warm, cos) if warmup else base_lr * cos

    return schedule


def make_finetune_step(model, base_lr: float, encoder_only: bool = True):
    """Returns (init_opt_state, step_fn).

    step_fn(variables, opt_state, batch, lr) -> (variables, opt_state, metrics)
    trains the encoder params only (decoder frozen) when encoder_only.
    """
    opt = optax.adam(1.0)  # LR applied externally (epoch-based schedule)

    def trainable_filter(params):
        if not encoder_only:
            return params
        return params["encoder"]

    def loss_fn(trainable, frozen, batch_stats, batch):
        if encoder_only:
            params = dict(frozen, encoder=trainable)
        else:
            params = trainable
        variables = {"params": params, "batch_stats": batch_stats}
        outputs, mutated = model.apply(
            variables, batch["image"], train=True, mutable=["batch_stats"]
        )
        depth_n = batch["depth"] * batch["mask"]
        total, metrics = multiscale_depth_loss(outputs, depth_n, batch["mask"])
        return total, (metrics, mutated["batch_stats"])

    @jax.jit
    def step_fn(variables, opt_state, batch, lr):
        params = variables["params"]
        trainable = trainable_filter(params)
        frozen = {k: v for k, v in params.items() if k != "encoder"}

        (loss, (metrics, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(trainable, frozen, variables["batch_stats"], batch)
        updates, new_opt = opt.update(grads, opt_state)
        updates = jax.tree_util.tree_map(lambda u: lr * u, updates)
        new_trainable = optax.apply_updates(trainable, updates)
        if encoder_only:
            new_params = dict(params, encoder=new_trainable)
        else:
            new_params = new_trainable
        new_vars = {"params": new_params, "batch_stats": new_bs}
        return new_vars, new_opt, metrics

    def init_opt(variables):
        return opt.init(trainable_filter(variables["params"]))

    return init_opt, step_fn


def make_eval_fn(model):
    """eval_fn(variables, batch) -> (full outputs dict, metrics dict)."""

    @jax.jit
    def eval_fn(variables, batch):
        outputs = model.apply(variables, batch["image"], train=False)
        depth_n = batch["depth"] * batch["mask"]
        _, metrics = multiscale_depth_loss(outputs, depth_n, batch["mask"])
        return outputs, metrics

    return eval_fn


def _norm_img(x):
    """Per-image min/max normalization (reference utils normalize_image)."""
    import numpy as np

    a = np.asarray(x, dtype=np.float32)
    lo, hi = float(a.min()), float(a.max())
    return (a - lo) / max(hi - lo, 1e-9)


def log_val_batch(
    writer,
    niter: int,
    batch: dict,
    outputs: dict,
    metrics: dict,
    output_scales=(0, 1, 2, 3),
    use_wavelets: bool = True,
    log_histogram: bool = False,
    max_images: int = 4,
) -> None:
    """Mid-training validation logging with the reference's tag layout
    (wavelet/train.py:113-166): per-scale loss scalars; color / predicted +
    GT disparity images; predicted + GT LL and detail-coefficient images;
    optional histograms of every logged coefficient map."""
    import numpy as np

    writer.write(niter, {k: v for k, v in metrics.items()})

    depth_n = np.asarray(batch["depth"] * batch["mask"])
    yl_gt = yh_gt = None
    if use_wavelets:
        yl_gt, yh_gt = haar_dwt2_multi(jnp.asarray(depth_n), 4)
        yl_gt = np.asarray(yl_gt)

    n = min(depth_n.shape[0], max_images)
    for j in range(n):
        writer.write_image(niter, f"color/{j}", np.asarray(batch["image"][j]))
        writer.write_image(niter, f"disp_0_gt/{j}", _norm_img(depth_n[j]))
        for scale in output_scales:
            if ("disp", scale) in outputs:
                writer.write_image(
                    niter, f"disp_{scale}_pred/{j}",
                    _norm_img(outputs[("disp", scale)][j]),
                )
        if not use_wavelets:
            continue
        if ("wavelets", 3, "LL") in outputs:
            pred_ll = outputs[("wavelets", 3, "LL")][j]
            writer.write_image(niter, f"LL_3_pred/{j}", _norm_img(pred_ll))
            writer.write_image(niter, f"LL_3_gt/{j}", _norm_img(yl_gt[j]))
            if log_histogram:
                writer.write_histogram(niter, f"hist_LL_3_pred/{j}", pred_ll)
                writer.write_histogram(niter, f"hist_LL_3_gt/{j}", yl_gt[j])
        for scale in range(4):
            for c, coeff in enumerate(("LH", "HL", "HH")):
                if ("wavelets", scale, coeff) not in outputs:
                    continue
                pred = outputs[("wavelets", scale, coeff)][j]
                gt = np.asarray(yh_gt[scale][c][j])
                writer.write_image(
                    niter, f"{coeff}_{scale}_pred/{j}", _norm_img(pred)
                )
                writer.write_image(
                    niter, f"{coeff}_{scale}_gt/{j}", _norm_img(gt)
                )
                if log_histogram:
                    writer.write_histogram(
                        niter, f"hist_{coeff}_{scale}_pred/{j}", pred
                    )
                    writer.write_histogram(
                        niter, f"hist_{coeff}_{scale}_gt/{j}", gt
                    )
