"""Host-side image/mask/feature store and pixel batch sampling.

Capability parity with the reference ``RaysGenerator`` (poses.py:96-261),
re-factored for TPU: the store only gathers per-batch pixel data (rgb, mask,
96-ch distillation features) on the host; the pixel->ray math runs in-graph
(``vdnerf_tpu.data.cameras``) so learned poses/intrinsics get gradients and
the train step stays one fused XLA program.

Image semantics (poses.py:114-126):
- RGBA inputs: white composite rgb*a + (1-a); mask = alpha.
- RGB inputs + mask files: composite img*mask + (1-mask).
- Images stay in BGR order exactly like the reference (cv.imread / cv.imwrite
  round-trip without conversion).

Depth-feature semantics (poses.py:133-146): per-image ``.npy`` stacks,
globally standardized ((x - mean) / std), squashed by sigmoid, bilinearly
upsampled to image resolution. Stored float16 on the host to halve the
footprint of full-res 96-channel stacks.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2 as cv
except ImportError:  # pragma: no cover
    cv = None


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


class RayStore:
    """Host store for per-pixel training data of one scene."""

    def __init__(
        self,
        images_lis: list[str],
        masks_lis: list[str] | None,
        depth_lis: list[str] | None = None,
        with_depth: bool = False,
    ):
        self.images_lis = images_lis
        self.n_images = len(images_lis)
        self.with_depth = with_depth

        imgs = np.stack([cv.imread(p, -1) for p in images_lis]) / 255.0
        if imgs.shape[-1] == 4:
            rgb, a = imgs[..., :3], imgs[..., 3:]
            self.images_np = rgb * a + (1.0 - a)  # white composite
            self.masks_np = np.repeat(a, 3, axis=-1)
        else:
            self.masks_lis = masks_lis
            masks = np.stack([cv.imread(p) for p in masks_lis]) / 255.0
            self.masks_np = masks
            self.images_np = imgs * masks + (1.0 - masks)
        self.images = self.images_np.astype(np.float32)
        self.masks = self.masks_np.astype(np.float32)
        self.H, self.W = self.images.shape[1], self.images.shape[2]
        self.image_pixels = self.H * self.W

        self.feat_dim = 1
        if with_depth:
            feats = np.stack([np.squeeze(np.load(p)) for p in depth_lis])
            m, s = float(np.mean(feats)), float(np.std(feats))
            feats = _sigmoid((feats - m) / s)
            if feats.ndim == 3:  # [n, h, w] -> [n, 1, h, w]
                feats = feats[:, None]
            # bilinear upsample each channel to image resolution
            n, c, fh, fw = feats.shape
            if (fh, fw) != (self.H, self.W):
                up = np.empty((n, c, self.H, self.W), dtype=np.float32)
                for i in range(n):
                    for ch in range(c):
                        up[i, ch] = cv.resize(
                            feats[i, ch].astype(np.float32),
                            (self.W, self.H),
                            interpolation=cv.INTER_LINEAR,
                        )
                feats = up
            self.depth_feats = np.transpose(feats, (0, 2, 3, 1)).astype(
                np.float16
            )  # [n, H, W, c]
            self.feat_dim = self.depth_feats.shape[-1]
            assert self.depth_feats.shape[:3] == self.images.shape[:3], (
                self.depth_feats.shape,
                self.images.shape,
            )

    def sample_pixels(
        self, img_idx: int, batch_size: int, rng: np.random.Generator
    ) -> dict[str, np.ndarray]:
        """Uniform random pixels of one image -> host numpy batch.

        Returns pixels_x/y int32 [B], color [B,3], mask [B,1], feats [B,F].
        """
        px = rng.integers(0, self.W, size=batch_size).astype(np.int32)
        py = rng.integers(0, self.H, size=batch_size).astype(np.int32)
        color = self.images[img_idx, py, px]
        mask = self.masks[img_idx, py, px, :1]
        if self.with_depth:
            feats = self.depth_feats[img_idx, py, px].astype(np.float32)
        else:
            feats = np.zeros((batch_size, 1), dtype=np.float32)
        return {
            "img_idx": np.int32(img_idx),
            "pixels_x": px,
            "pixels_y": py,
            "color": color,
            "mask": mask,
            "feats": feats,
        }

    def sample_pixel_steps(
        self,
        img_idxs: list[int] | np.ndarray,
        batch_size: int,
        rng: np.random.Generator,
    ) -> dict[str, np.ndarray]:
        """K per-image pixel batches stacked on a leading step axis.

        Feed to ``make_train_scan_step`` (K steps per device dispatch);
        identical sampling statistics to K ``sample_pixels`` calls.
        """
        steps = [
            self.sample_pixels(int(i), batch_size, rng) for i in img_idxs
        ]
        return {
            k: np.stack([s[k] for s in steps]) for k in steps[0]
        }

    def image_at(self, idx: int, resolution_level: int = 1) -> np.ndarray:
        img = self.images_np[idx]
        out = cv.resize(
            img, (self.W // resolution_level, self.H // resolution_level)
        )
        return (out * 255).clip(0, 255)

    def mask_at(self, idx: int, resolution_level: int = 1) -> np.ndarray:
        msk = cv.resize(
            self.masks_np[idx],
            (self.W // resolution_level, self.H // resolution_level),
        )
        return np.expand_dims(msk, axis=-1) if msk.ndim == 2 else msk[..., :1]
