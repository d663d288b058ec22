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
