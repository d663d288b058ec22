"""RayStore composites: RGBA alpha path and mask-file path."""

import os

import numpy as np
import pytest

cv = pytest.importorskip("cv2")

from vdnerf_tpu.data.rays import RayStore


@pytest.fixture
def rgb_with_masks(tmp_path):
    """3-channel images + separate mask files (reference poses.py:123-126)."""
    rng = np.random.default_rng(0)
    img_paths, mask_paths = [], []
    os.makedirs(tmp_path / "mask", exist_ok=True)
    for i in range(2):
        img = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
        mask = np.zeros((16, 16, 3), np.uint8)
        mask[4:12, 4:12] = 255
        ip = str(tmp_path / f"{i:03d}.png")
        mp = str(tmp_path / "mask" / f"{i:03d}.png")
        cv.imwrite(ip, img)
        cv.imwrite(mp, mask)
        img_paths.append(ip)
        mask_paths.append(mp)
    return img_paths, mask_paths


def test_mask_file_composite(rgb_with_masks):
    img_paths, mask_paths = rgb_with_masks
    store = RayStore(img_paths, mask_paths)
    assert store.images.shape == (2, 16, 16, 3)
    # outside the mask the composite must be white
    np.testing.assert_allclose(store.images[0, 0, 0], 1.0)
    np.testing.assert_allclose(store.masks[0, 0, 0], 0.0)
    np.testing.assert_allclose(store.masks[0, 8, 8], 1.0)

    batch = store.sample_pixels(0, 32, np.random.default_rng(1))
    assert batch["color"].shape == (32, 3)
    assert batch["mask"].shape == (32, 1)
    assert set(np.unique(batch["mask"])) <= {0.0, 1.0}


def test_image_and_mask_at(rgb_with_masks):
    img_paths, mask_paths = rgb_with_masks
    store = RayStore(img_paths, mask_paths)
    img = store.image_at(0, resolution_level=2)
    assert img.shape == (8, 8, 3)
    msk = store.mask_at(0, resolution_level=2)
    assert msk.shape == (8, 8, 1)
