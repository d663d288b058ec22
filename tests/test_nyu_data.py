"""NYU zip dataset loader (the pretrainer's data source)."""

import io
import os
import zipfile

import numpy as np
import pytest

from vdnerf_tpu.wavelet.data import BatchLoader, NYUZipDataset


@pytest.fixture
def nyu_zip(tmp_path):
    from PIL import Image

    path = str(tmp_path / "nyu_data.zip")
    rng = np.random.default_rng(0)
    with zipfile.ZipFile(path, "w") as zf:
        rows = []
        for i in range(4):
            img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
            depth = rng.integers(0, 255, (24, 32), dtype=np.uint8)
            ib, db = io.BytesIO(), io.BytesIO()
            Image.fromarray(img).save(ib, format="PNG")
            Image.fromarray(depth).save(db, format="PNG")
            zf.writestr(f"data/img_{i}.png", ib.getvalue())
            zf.writestr(f"data/depth_{i}.png", db.getvalue())
            rows.append(f"data/img_{i}.png,data/depth_{i}.png")
        zf.writestr("data/nyu2_train.csv", "\n".join(rows))
    return path


def test_nyu_zip_dataset(nyu_zip):
    ds = NYUZipDataset(nyu_zip)
    assert len(ds) == 4
    s = ds[0]
    assert s["image"].shape == (48, 64, 3)
    assert 0 <= s["image"].min() and s["image"].max() <= 1
    assert s["depth"].shape == (24, 32)


def test_nyu_batch_loader(nyu_zip):
    ds = NYUZipDataset(nyu_zip)
    loader = BatchLoader(ds, batch_size=2, image_size=32, depth_size=16,
                         augment=True)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["image"].shape == (2, 32, 32, 3)
    assert b["depth"].shape == (2, 16, 16, 1)
    assert b["mask"].shape == (2, 16, 16, 1)


def test_pretrain_val_fallback_holds_out_pairs(nyu_zip):
    """When data/nyu2_test.csv is absent, the pretrainer's fallback must
    carve a DISJOINT val slice out of the train pairs (not validate on the
    training images) — mirrors the split logic in wavelet/pretrain.py."""
    train = NYUZipDataset(nyu_zip)
    with pytest.raises(KeyError):
        NYUZipDataset(nyu_zip, "data/nyu2_test.csv")
    # replicate pretrain.py's fallback
    val = NYUZipDataset(nyu_zip)
    n_val = max(len(train.pairs) // 10, 1)
    val.pairs = train.pairs[-n_val:]
    train.pairs = train.pairs[:-n_val]
    assert len(val.pairs) == 1 and len(train.pairs) == 3
    assert not set(val.pairs) & set(train.pairs)


def test_perturb_poses_noise_stats():
    """Shared COLMAP-noise helper: ~2 deg mean geodesic rotation at the
    default scale, rotations stay orthonormal, translations jittered."""
    from vdnerf_tpu.data.cameras import perturb_poses

    rng = np.random.default_rng(0)
    poses = np.tile(np.eye(4, dtype=np.float32)[None], (200, 1, 1))
    out = perturb_poses(poses, rng)
    R = out[:, :3, :3]
    # orthonormality preserved
    eye = np.matmul(R, np.swapaxes(R, 1, 2))
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (200, 1, 1)),
                               atol=1e-5)
    tr = np.clip((np.trace(R, axis1=1, axis2=2) - 1) / 2, -1, 1)
    mean_deg = np.degrees(np.arccos(tr)).mean()
    assert 1.5 < mean_deg < 3.5, mean_deg  # chi(3) mean ~2.3 deg at 0.025
    assert np.abs(out[:, :3, 3]).mean() > 0.005  # translations moved
    np.testing.assert_array_equal(poses, np.tile(np.eye(4)[None], (200, 1, 1)))  # input untouched
