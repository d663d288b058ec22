"""CLI regression: every runner mode end-to-end on a tiny synthetic scene."""

import os

import numpy as np
import pytest

from vdnerf_tpu.data.synthetic import make_synthetic_scene, write_synthetic_conf


@pytest.fixture(scope="module")
def scene_conf(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cli_scene"))
    make_synthetic_scene(d, n_images=3, H=32, W=32)
    conf = os.path.join(d, "synthetic.conf")
    write_synthetic_conf(
        conf, data_dir=d, exp_dir=os.path.join(d, "exp"),
        end_iter=10, batch_size=64, save_freq=5, val_freq=5, val_mesh_freq=10,
    )
    return d, conf


def test_cli_train_then_eval_modes(scene_conf):
    d, conf = scene_conf
    from vdnerf_tpu.cli import main

    main(["--conf", conf, "--mode", "train"])
    exp = os.path.join(d, "exp")
    assert os.path.exists(os.path.join(exp, "checkpoints", "ckpt_000010.npz"))
    assert os.path.exists(os.path.join(exp, "meshes", "00000010.ply"))
    assert os.listdir(os.path.join(exp, "validations_fine"))
    assert os.path.exists(os.path.join(exp, "logs", "metrics.jsonl"))

    # resume (-c) picks the latest checkpoint and trains 0 more steps
    main(["--conf", conf, "--mode", "valimg_10"])

    main(["--conf", conf, "--mode", "getfeats_10"])
    feats_dir = os.path.join(d, "image", "depth_from_sdf")
    files = os.listdir(feats_dir)
    assert len(files) == 3
    depth = np.load(os.path.join(feats_dir, files[0]))
    assert depth.shape == (32, 32, 1)
    assert np.isfinite(depth).all()

    main(["--conf", conf, "--mode", "showcam_10"])
    cam_files = os.listdir(os.path.join(exp, "cam_poses"))
    # npz export AND the frustum PNG (learned/init/GT, reference
    # dpt_runner.py:618-697)
    assert any(f.endswith(".npz") for f in cam_files)
    pngs = [f for f in cam_files if f.endswith(".png")]
    assert pngs
    assert os.path.getsize(os.path.join(exp, "cam_poses", pngs[0])) > 5_000
    with np.load(os.path.join(
        exp, "cam_poses", [f for f in cam_files if f.endswith(".npz")][0]
    )) as npz:
        assert "init_c2w" in npz and "gt_c2w" in npz
        assert npz["gt_c2w"].shape == npz["init_c2w"].shape


def test_cli_interpolate(scene_conf):
    d, conf = scene_conf
    from vdnerf_tpu.train.validate import interpolate_frames
    from vdnerf_tpu.runner import Runner

    runner = Runner(conf, mode="interpolate_0_1", is_continue=True)
    frames = interpolate_frames(
        runner.renderer, runner.state["params"], runner.state["cams"],
        0, 1, n_frames=2, resolution_level=4,
    )
    assert len(frames) == 4
    assert frames[0].shape == (8, 8, 3)
    assert frames[0].dtype == np.uint8


def test_cli_train_steps_per_call_cadence(tmp_path):
    """The multi-step-dispatch runner path (train.steps_per_call > 1) must
    preserve every observable cadence: per-iteration metric steps, the
    save_freq checkpoints, and the val_freq validation renders land on the
    same iterations as steps_per_call = 1."""
    import json
    import re

    d = str(tmp_path)
    make_synthetic_scene(d, n_images=3, H=32, W=32)
    conf = os.path.join(d, "synthetic.conf")
    write_synthetic_conf(
        conf, data_dir=d, exp_dir=os.path.join(d, "exp"),
        end_iter=20, batch_size=64, save_freq=10, val_freq=20,
        val_mesh_freq=20,
    )
    txt = open(conf).read()
    txt, n_sub = re.subn(r"(end_iter = 20)", r"\1\n    steps_per_call = 5",
                         txt)
    assert n_sub == 1, "conf template changed; steps_per_call not injected"
    with open(conf, "w") as f:
        f.write(txt)

    from vdnerf_tpu.cli import main

    main(["--conf", conf, "--mode", "train"])
    exp = os.path.join(d, "exp")
    ckpts = sorted(os.listdir(os.path.join(exp, "checkpoints")))
    assert "ckpt_000010.npz" in ckpts and "ckpt_000020.npz" in ckpts
    lines = [
        json.loads(line)
        for line in open(os.path.join(exp, "logs", "metrics.jsonl"))
    ]
    steps = [line["step"] for line in lines]
    # write cadence: step 1 and every multiple of 10
    assert steps == [1, 10, 20]
    assert all(np.isfinite(line["loss"]) for line in lines)
    assert os.listdir(os.path.join(exp, "validations_fine"))
    assert os.listdir(os.path.join(exp, "meshes"))


def test_cli_resume_continues_training(tmp_path):
    """Failure-recovery e2e: interrupt training after a mid-run checkpoint,
    resume with -c, and verify the resumed run (a) starts from the saved
    optimizer state (Adam moments restored, not re-initialized), (b) trains
    exactly the remaining iterations, and (c) the full run's artifacts all
    exist."""
    import numpy as np

    d = str(tmp_path)
    make_synthetic_scene(d, n_images=3, H=32, W=32)
    conf = os.path.join(d, "synthetic.conf")
    write_synthetic_conf(
        conf, data_dir=d, exp_dir=os.path.join(d, "exp"),
        end_iter=6, batch_size=64, save_freq=3, val_freq=100000,
        val_mesh_freq=100000,
    )
    from vdnerf_tpu.cli import main
    from vdnerf_tpu.runner import Runner

    # phase 1: train to 6 but pretend the process died right after the
    # iter-3 checkpoint by truncating end_iter via a second conf
    conf3 = os.path.join(d, "syn3.conf")
    write_synthetic_conf(
        conf3, data_dir=d, exp_dir=os.path.join(d, "exp"),
        end_iter=3, batch_size=64, save_freq=3, val_freq=100000,
        val_mesh_freq=100000,
    )
    main(["--conf", conf3, "--mode", "train"])
    assert os.path.exists(os.path.join(d, "exp/checkpoints/ckpt_000003.npz"))

    # phase 2: resume with the full conf; must pick up ckpt_000003
    r = Runner(conf, mode="train", is_continue=True)
    assert r.iter_step == 3
    # Adam moments restored from disk, not zeros (the step ran, so the
    # first moment of at least one leaf is nonzero)
    import jax

    mus = jax.tree_util.tree_leaves(r.state["opt_state"])
    assert any(float(np.abs(np.asarray(m)).max()) > 0 for m in mus
               if hasattr(m, "shape") and getattr(m, "size", 0) > 1)
    r.train()
    assert r.iter_step == 6
    assert os.path.exists(os.path.join(d, "exp/checkpoints/ckpt_000006.npz"))


def test_resume_from_unaligned_iteration_keeps_events(tmp_path):
    """Resuming from a checkpoint at an iteration that does not divide
    steps_per_call (e.g. an imported reference ckpt_000007) must still fire
    every save/val event: the runner drops the window size so window-end
    steps stay aligned to the event cadences."""
    import re

    import jax.numpy as jnp
    import numpy as np

    d = str(tmp_path)
    make_synthetic_scene(d, n_images=3, H=32, W=32)
    conf = os.path.join(d, "synthetic.conf")
    write_synthetic_conf(
        conf, data_dir=d, exp_dir=os.path.join(d, "exp"),
        end_iter=17, batch_size=64, save_freq=10, val_freq=100000,
        val_mesh_freq=100000,
    )
    txt = open(conf).read()
    txt, n_sub = re.subn(r"(end_iter = 17)", r"\1\n    steps_per_call = 10",
                         txt)
    assert n_sub == 1, "conf template changed; steps_per_call not injected"
    with open(conf, "w") as f:
        f.write(txt)

    from vdnerf_tpu.io import checkpoint_path, save_state
    from vdnerf_tpu.runner import Runner

    # plant a checkpoint at the unaligned iteration 7
    r0 = Runner(conf, mode="train")
    state = dict(r0.state)
    state["step"] = jnp.asarray(7, jnp.int32)
    os.makedirs(os.path.join(d, "exp", "checkpoints"), exist_ok=True)
    save_state(checkpoint_path(os.path.join(d, "exp"), 7), state)
    del r0

    r = Runner(conf, mode="train", is_continue=True)
    assert r.iter_step == 7
    r.train()
    assert r.iter_step == 17
    # the iter-10 save event landed despite 10 not being a window end of
    # any k>1 window starting at 7
    assert os.path.exists(os.path.join(d, "exp/checkpoints/ckpt_000010.npz"))
