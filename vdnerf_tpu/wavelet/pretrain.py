"""NYU pretraining CLI for the monodepth net.

Parity with ``wavelet/train.py:169-378``: multi-scale wavelet losses over the
DenseDepth NYU zip data, full-model training (encoder + decoder), per-epoch
checkpoints. The reference assumes a pretrained checkpoint exists for the
VDN pipeline; this trainer reproduces how that checkpoint is made.

Usage:
    python -m vdnerf_tpu.wavelet.pretrain --nyu_zip nyu_data.zip --epochs 20
"""

from __future__ import annotations

import argparse
import datetime
import os

import jax


def build_parser():
    p = argparse.ArgumentParser(description="NYU wavelet-monodepth pretraining")
    p.add_argument("--nyu_zip", type=str, required=True)
    p.add_argument("--epochs", default=20, type=int)
    p.add_argument("-lr", "--learning-rate", default=0.0001, type=float)
    p.add_argument("--logdir", type=str, default="log")
    p.add_argument("--model_name", type=str, default="DenseNetWaveLet")
    p.add_argument("-bs", "--batch-size", default=8, type=int)
    p.add_argument("--save_freq", default=1, type=int)
    p.add_argument("--normalize_input", action="store_true")
    p.add_argument("--encoder_type", type=str, default="densenet")
    p.add_argument("--use_224", action="store_true", default=False)
    p.add_argument("--image_size", type=int, default=448)
    p.add_argument("--max_steps_per_epoch", type=int, default=0)
    p.add_argument("--val_freq", type=int, default=300,
                   help="validate on one eval-split minibatch every N iters "
                        "(reference wavelet/train.py:334)")
    p.add_argument("--log_histogram", action="store_true")
    return p


def pretrain(argv=None):
    args = build_parser().parse_args(argv)

    from vdnerf_tpu.io.logging import MetricsWriter
    from vdnerf_tpu.wavelet.data import BatchLoader, NYUZipDataset
    from vdnerf_tpu.wavelet.io import save_model, save_opts
    from vdnerf_tpu.wavelet.model import WaveletOpts, create_model
    from vdnerf_tpu.wavelet.train_lib import (
        cosine_epoch_lr,
        log_val_batch,
        make_eval_fn,
        make_finetune_step,
    )

    logpath = os.path.join(
        args.logdir, args.model_name,
        datetime.datetime.now().strftime("%m%d_%H%M") + "-nyu",
    )
    os.makedirs(logpath, exist_ok=True)
    save_opts(logpath, args)

    opts = WaveletOpts(
        encoder_type=args.encoder_type,
        normalize_input=args.normalize_input,
        use_224=args.use_224,
    )
    model, variables = create_model(
        jax.random.PRNGKey(0), opts, (args.image_size, args.image_size)
    )

    dataset = NYUZipDataset(args.nyu_zip)
    loader = BatchLoader(
        dataset, args.batch_size, shuffle=True,
        image_size=args.image_size, depth_size=args.image_size // 2,
        augment=True,
    )
    # eval split (DenseDepth zip ships data/nyu2_test.csv); when the test
    # listing is absent, hold the last ~10% of the train pairs out of the
    # training set so the val curve still measures unseen images
    try:
        val_dataset = NYUZipDataset(args.nyu_zip, "data/nyu2_test.csv")
    except KeyError:
        val_dataset = NYUZipDataset(args.nyu_zip)
        if len(dataset.pairs) > 1:
            n_val = max(len(dataset.pairs) // 10, 1)
            val_dataset.pairs = dataset.pairs[-n_val:]
            dataset.pairs = dataset.pairs[:-n_val]
    val_loader = BatchLoader(
        val_dataset, args.batch_size, shuffle=False,
        image_size=args.image_size, depth_size=args.image_size // 2,
        augment=False,
    )

    # full-model training for pretraining (encoder_only=False)
    init_opt, step_fn = make_finetune_step(
        model, args.learning_rate, encoder_only=False
    )
    eval_fn = make_eval_fn(model)
    opt_state = init_opt(variables)
    lr_sched = cosine_epoch_lr(args.learning_rate, args.epochs)
    writer = MetricsWriter(os.path.join(logpath, "train"))
    val_writer = MetricsWriter(os.path.join(logpath, "val"))

    niter = 0
    last_saved = -1
    val_iter = iter(val_loader)
    for epoch in range(args.epochs):
        lr = float(lr_sched(epoch))
        for i, batch in enumerate(loader):
            if args.max_steps_per_epoch and i >= args.max_steps_per_epoch:
                break
            variables, opt_state, metrics = step_fn(
                variables, opt_state, batch, lr
            )
            niter += 1
            if niter % 100 == 0:
                print(f"Epoch [{epoch}][{i}] loss {float(metrics['loss']):.4f}")
                writer.write(niter, {"loss": metrics["loss"], "lr": lr})
            if niter % args.val_freq == 0:
                try:
                    vbatch = next(val_iter)
                except StopIteration:
                    val_iter = iter(val_loader)
                    vbatch = next(val_iter)
                voutputs, vmetrics = eval_fn(variables, vbatch)
                # mid-training validation with the reference's image +
                # histogram logging (wavelet/train.py:49-167)
                log_val_batch(
                    val_writer, niter, vbatch, voutputs, vmetrics,
                    log_histogram=args.log_histogram,
                )
        if epoch % args.save_freq == 0:
            save_model(variables, logpath, epoch)
            last_saved = epoch
    if last_saved != args.epochs - 1:
        save_model(variables, logpath, args.epochs - 1)
    print(logpath)
    return logpath


if __name__ == "__main__":
    pretrain()
