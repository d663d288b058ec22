"""The full VDN side-car cycle on synthetic data:
getfeats export -> NeusDataset -> finetune (encoder-only) -> predict feats
-> RayStore consumption. Uses the mobilenet encoder for CPU speed."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdnerf_tpu.data.synthetic import make_synthetic_scene, render_sphere_image


@pytest.fixture(scope="module")
def scene_with_depth(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("vdn_cycle"))
    meta = make_synthetic_scene(d, n_images=3, H=64, W=64)
    # synthesize the getfeats export (depth_from_sdf) analytically
    sdf_dir = os.path.join(d, "image", "depth_from_sdf")
    os.makedirs(sdf_dir, exist_ok=True)
    for i in range(3):
        _, depth = render_sphere_image(
            meta["poses"][i], meta["K"], 64, 64, meta["radius"]
        )
        np.save(os.path.join(sdf_dir, f"sdf_{i:03d}.npy"), depth[..., None])
    return d, meta


def test_neus_dataset(scene_with_depth):
    from vdnerf_tpu.wavelet.data import NeusDataset, to_tensor_pair

    d, meta = scene_with_depth
    ds = NeusDataset(d, dpt_max=4.0, image_size=64)
    assert len(ds) == 3
    s = ds[0]
    assert s["image"].shape == (64, 64, 3)
    # background forced to 200 where mask < 100 (reference data.py:342)
    bg = ds.depths_np[0][ds.masks[0] < 100]
    assert (bg == 200.0).all()
    t = to_tensor_pair(s, image_size=64, depth_size=32)
    assert t["image"].shape == (64, 64, 3)
    assert t["depth"].shape == (32, 32, 1)


@pytest.mark.slow
def test_finetune_cycle(scene_with_depth, tmp_path):
    d, meta = scene_with_depth
    from vdnerf_tpu.wavelet.data import BatchLoader, NeusDataset
    from vdnerf_tpu.wavelet.io import load_model, save_model
    from vdnerf_tpu.wavelet.model import WaveletOpts, create_model
    from vdnerf_tpu.wavelet.train_lib import make_eval_fn, make_finetune_step

    opts = WaveletOpts(encoder_type="mobilenet_light")
    model, variables = create_model(jax.random.PRNGKey(0), opts, (64, 64))

    ds = NeusDataset(d, dpt_max=4.0, image_size=64)
    loader = BatchLoader(ds, batch_size=2, image_size=64, depth_size=32)

    init_opt, step_fn = make_finetune_step(model, 1e-4, encoder_only=True)
    opt_state = init_opt(variables)

    enc_before = jax.tree_util.tree_leaves(variables["params"]["encoder"])
    dec_before = jax.tree_util.tree_leaves(variables["params"]["decoder"])

    losses = []
    for epoch in range(2):
        for batch in loader:
            variables, opt_state, metrics = step_fn(
                variables, opt_state, batch, 1e-4
            )
            losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()

    enc_after = jax.tree_util.tree_leaves(variables["params"]["encoder"])
    dec_after = jax.tree_util.tree_leaves(variables["params"]["decoder"])
    assert any(
        np.abs(np.asarray(a) - np.asarray(b)).max() > 0
        for a, b in zip(enc_before, enc_after)
    ), "encoder must train"
    for a, b in zip(dec_before, dec_after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # checkpoint roundtrip (partial-load tolerant)
    path = save_model(variables, str(tmp_path), 0)
    _, fresh = create_model(jax.random.PRNGKey(7), opts, (64, 64))
    restored = load_model(fresh, path)
    for a, b in zip(
        jax.tree_util.tree_leaves(variables["params"]),
        jax.tree_util.tree_leaves(restored["params"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # eval path + mid-training validation logging (reference train.py:49-167)
    from vdnerf_tpu.io.logging import MetricsWriter
    from vdnerf_tpu.wavelet.train_lib import log_val_batch

    eval_fn = make_eval_fn(model)
    batch = next(iter(loader))
    voutputs, vmetrics = eval_fn(variables, batch)
    disp0 = voutputs[("disp", 0)]
    assert disp0.shape[0] == 2 and np.isfinite(float(vmetrics["loss"]))

    val_dir = os.path.join(str(tmp_path), "val")
    vw = MetricsWriter(val_dir)
    log_val_batch(vw, 300, batch, voutputs, vmetrics, log_histogram=True)
    vw.flush()
    vw.close()
    import json

    with open(os.path.join(val_dir, "metrics.jsonl")) as f:
        recs = [json.loads(line) for line in f]
    assert recs and "loss" in recs[-1] and "loss/0" in recs[-1]
    # DecoderWave never emits ("wavelets", 3, "LL"), so LL supervision is
    # silently skipped — exactly the reference's try/except KeyError at
    # finetune_for_vdn.py:187-193 (only the 224 decoders emit it)
    assert "loss_LL3" not in recs[-1]
    # images + histograms landed in the tensorboard event file
    evs = [f for f in os.listdir(val_dir) if f.startswith("events")]
    assert evs
    assert os.path.getsize(os.path.join(val_dir, evs[0])) > 10_000


@pytest.mark.slow
def test_predict_exports_consumable_feats(scene_with_depth, tmp_path):
    """predict CLI writes NCHW feature npys that RayStore can consume."""
    d, meta = scene_with_depth
    from vdnerf_tpu.wavelet.io import save_model
    from vdnerf_tpu.wavelet.model import WaveletOpts, create_model
    from vdnerf_tpu.wavelet.predict import main as predict_main

    opts = WaveletOpts(encoder_type="mobilenet_light")
    _, variables = create_model(jax.random.PRNGKey(0), opts, (64, 64))
    ckpt_folder = os.path.dirname(save_model(variables, str(tmp_path), 0))

    img_dir = os.path.join(d, "image")
    predict_main(
        ["-ckpt", ckpt_folder, "--ckpt_name", "model.npz",
         "-d", img_dir, "--encoder_type", "mobilenet_light"]
    )
    feat_dir = os.path.join(img_dir, "wavelet_feats", "0")
    files = sorted(os.listdir(feat_dir))
    assert len(files) == 3
    feat = np.load(os.path.join(feat_dir, files[0]))
    assert feat.shape == (1, 32, 32, 32)  # NCHW: 32ch mobilenet tap at H/2

    # the NeuS side consumes these via RayStore(with_depth=True)
    from vdnerf_tpu.data.rays import RayStore

    imgs = [os.path.join(img_dir, f"{i:03d}.png") for i in range(3)]
    feats = [os.path.join(feat_dir, f"{i:03d}.npy") for i in range(3)]
    store = RayStore(imgs, None, feats, with_depth=True)
    assert store.feat_dim == 32
    batch = store.sample_pixels(0, 16, np.random.default_rng(0))
    assert batch["feats"].shape == (16, 32)
    assert np.isfinite(batch["feats"]).all()


def test_torchvision_densenet_converter_shapes():
    """Converter output must slot into the flax DenseEncoder exactly."""
    torch = pytest.importorskip("torch")
    from vdnerf_tpu.wavelet.encoders import DENSENET_CONFIGS, DenseEncoder
    from vdnerf_tpu.wavelet.io import import_torchvision_densenet

    cfg = DENSENET_CONFIGS[121]
    sd = {}

    def add_bn(prefix, ch):
        sd[f"{prefix}.weight"] = torch.randn(ch)
        sd[f"{prefix}.bias"] = torch.randn(ch)
        sd[f"{prefix}.running_mean"] = torch.randn(ch)
        sd[f"{prefix}.running_var"] = torch.rand(ch) + 0.5

    sd["features.conv0.weight"] = torch.randn(cfg["init_features"], 3, 7, 7)
    add_bn("features.norm0", cfg["init_features"])
    ch = cfg["init_features"]
    for bi, n in enumerate(cfg["blocks"]):
        cin = ch
        for li in range(n):
            pref = f"features.denseblock{bi+1}.denselayer{li+1}"
            add_bn(f"{pref}.norm1", cin)
            sd[f"{pref}.conv1.weight"] = torch.randn(4 * cfg["growth"], cin, 1, 1)
            add_bn(f"{pref}.norm2", 4 * cfg["growth"])
            sd[f"{pref}.conv2.weight"] = torch.randn(
                cfg["growth"], 4 * cfg["growth"], 3, 3
            )
            cin += cfg["growth"]
        ch = cin
        if bi < len(cfg["blocks"]) - 1:
            pref = f"features.transition{bi+1}"
            add_bn(f"{pref}.norm", ch)
            sd[f"{pref}.conv.weight"] = torch.randn(ch // 2, ch, 1, 1)
            ch = ch // 2

    converted = import_torchvision_densenet(sd, num_layers=121)

    enc = DenseEncoder(num_layers=121)
    x = jnp.zeros((1, 32, 32, 3))
    ref_vars = enc.init(jax.random.PRNGKey(0), x, train=False)

    # structural equality: same flattened key set and shapes
    def flat(tree, pre=""):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out.update(flat(v, pre + k + "/"))
            else:
                out[pre + k] = np.asarray(v).shape
        return out

    ref_p = flat(ref_vars["params"])
    conv_p = flat(converted["params"])
    assert ref_p == conv_p
    ref_s = flat(ref_vars["batch_stats"])
    conv_s = flat(converted["batch_stats"])
    assert ref_s == conv_s

    # and it actually runs
    feats = enc.apply(
        {"params": converted["params"], "batch_stats": converted["batch_stats"]},
        x, train=False,
    )
    assert feats[0].shape == (1, 16, 16, cfg["init_features"])
