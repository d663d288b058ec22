"""Depth decoders: wavelet-coefficient prediction + Haar reconstruction.

Capability parity with ``wavelet/networks/decoders/densedepth_decoder.py``:

- :class:`DecoderWave` (:92-148): DenseDepth-style decoder that predicts, per
  scale, a 1-channel LL map (coarsest only) and 3-channel (LH, HL, HH)
  wavelet details, reconstructing ``("disp", s)`` for s = 3..0 by iterated
  inverse Haar transforms. The 2^s scale ladder matches the reference
  exactly (:122-146).
- :class:`PlainDecoder` / :class:`PlainDecoder224` (:15-89): direct
  upsampling decoders without wavelets.
- :class:`DecoderWave224` (:151-221): the 224-input variant with an extra
  upsample+conv head.
- :class:`SparseDecoderWave` (:224-409): the reference evaluates scale-1/0
  detail convolutions only where parent-scale coefficients exceed a relative
  threshold, to count FLOPs for a sparse-inference study. On TPU dense
  evaluation is the fast path, so this variant computes densely and then
  applies the reference's masks (parent threshold, nearest-upsampled,
  maxpool-dilated); see the class docstring for the exact rule.

All modules are NHWC flax; ``("disp", s)`` outputs are [N, h, w, 1].
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from vdnerf_tpu.wavelet.haar import haar_idwt2


class Conv3x3(nn.Module):
    """Pad (reflect/replicate/zero) + 3x3 conv (reference layers.py:11-32)."""

    out_channels: int
    padding: str = "zero"

    @nn.compact
    def __call__(self, x):
        mode = {
            "reflection": "reflect",
            "replicate": "edge",
            "zero": "constant",
        }[self.padding]
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode=mode)
        return nn.Conv(self.out_channels, (3, 3), padding="VALID")(x)


def upsample_nearest(x: jax.Array, factor: int = 2) -> jax.Array:
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, h * factor, w * factor, c), "nearest")


class UpSampleBlock(nn.Module):
    """nearest-2x upsample -> concat skip -> conv -> LeakyReLU(0.2)
    (reference layers.py:57-67)."""

    out_channels: int
    padding: str = "zero"

    @nn.compact
    def __call__(self, x, skip):
        up = upsample_nearest(x)
        h = jnp.concatenate([up, skip], axis=-1)
        h = Conv3x3(self.out_channels, self.padding)(h)
        return nn.leaky_relu(h, 0.2)


class DecoderWave(nn.Module):
    enc_features: Sequence[int] = (96, 96, 192, 384, 2208)
    decoder_width: float = 0.5

    @nn.compact
    def __call__(self, x_blocks):
        features = int(self.enc_features[-1] * self.decoder_width)
        outputs = {}

        x_d0 = Conv3x3(features, "replicate", name="conv2")(x_blocks[-1])

        x_d1 = UpSampleBlock(features // 2, "reflection", name="up1")(
            x_d0, x_blocks[-2]
        )
        ll = (2**3) * Conv3x3(1, "replicate", name="wave1_ll")(x_d1)
        outputs[("disp", 3)] = ll / (2**3)
        h = (2**2) * Conv3x3(3, "zero", name="wave1")(x_d1)
        outputs[("wavelets", 2, "LL")] = ll
        outputs[("wavelets", 2, "LH")] = h[..., 0:1]
        outputs[("wavelets", 2, "HL")] = h[..., 1:2]
        outputs[("wavelets", 2, "HH")] = h[..., 2:3]
        ll = haar_idwt2(ll, (h[..., 0:1], h[..., 1:2], h[..., 2:3]))
        outputs[("disp", 2)] = ll / (2**2)

        x_d2 = UpSampleBlock(features // 4, "reflection", name="up2")(
            x_d1, x_blocks[-3]
        )
        h = (2**1) * Conv3x3(3, "zero", name="wave2")(x_d2)
        outputs[("wavelets", 1, "LH")] = h[..., 0:1]
        outputs[("wavelets", 1, "HL")] = h[..., 1:2]
        outputs[("wavelets", 1, "HH")] = h[..., 2:3]
        ll = haar_idwt2(ll, (h[..., 0:1], h[..., 1:2], h[..., 2:3]))
        outputs[("disp", 1)] = ll / (2**1)

        x_d3 = UpSampleBlock(features // 8, "reflection", name="up3")(
            x_d2, x_blocks[-4]
        )
        h = Conv3x3(3, "zero", name="wave3")(x_d3)
        outputs[("wavelets", 0, "LH")] = h[..., 0:1]
        outputs[("wavelets", 0, "HL")] = h[..., 1:2]
        outputs[("wavelets", 0, "HH")] = h[..., 2:3]
        ll = haar_idwt2(ll, (h[..., 0:1], h[..., 1:2], h[..., 2:3]))
        outputs[("disp", 0)] = ll

        return outputs


class DecoderWave224(nn.Module):
    """224-input wavelet decoder (reference :151-221): four up blocks, each
    followed by a detail prediction, running the inverse-wavelet ladder to
    full input resolution.

    Note: the reference computes ``("disp", 1)`` with floor division
    (``ll // 2`` at :214) — an evident typo corrupting only that diagnostic
    output, not the reconstruction ladder; true division is used here.
    """

    enc_features: Sequence[int] = (96, 96, 192, 384, 2208)
    decoder_width: float = 0.5

    @nn.compact
    def __call__(self, x_blocks):
        features = int(self.enc_features[-1] * self.decoder_width)
        outputs = {}
        x_d0 = Conv3x3(features, "replicate", name="conv2")(x_blocks[-1])

        x_d1 = UpSampleBlock(features // 2, "reflection", name="up1")(
            x_d0, x_blocks[-2]
        )
        ll = (2**4) * Conv3x3(1, "replicate", name="wave1_ll")(x_d1)
        h = (2**3) * Conv3x3(3, "zero", name="wave1")(x_d1)
        outputs[("wavelets", 3, "LL")] = ll
        outputs[("wavelets", 3, "LH")] = h[..., 0:1]
        outputs[("wavelets", 3, "HL")] = h[..., 1:2]
        outputs[("wavelets", 3, "HH")] = h[..., 2:3]
        ll = haar_idwt2(ll, (h[..., 0:1], h[..., 1:2], h[..., 2:3]))
        outputs[("disp", 3)] = ll / (2**3)

        x_d2 = UpSampleBlock(features // 4, "reflection", name="up2")(
            x_d1, x_blocks[-3]
        )
        h = (2**2) * Conv3x3(3, "zero", name="wave2")(x_d2)
        outputs[("wavelets", 2, "LH")] = h[..., 0:1]
        outputs[("wavelets", 2, "HL")] = h[..., 1:2]
        outputs[("wavelets", 2, "HH")] = h[..., 2:3]
        ll = haar_idwt2(ll, (h[..., 0:1], h[..., 1:2], h[..., 2:3]))
        outputs[("disp", 2)] = ll / (2**2)

        x_d3 = UpSampleBlock(features // 8, "reflection", name="up3")(
            x_d2, x_blocks[-4]
        )
        h = (2**1) * Conv3x3(3, "zero", name="wave3")(x_d3)
        outputs[("wavelets", 1, "LH")] = h[..., 0:1]
        outputs[("wavelets", 1, "HL")] = h[..., 1:2]
        outputs[("wavelets", 1, "HH")] = h[..., 2:3]
        ll = haar_idwt2(ll, (h[..., 0:1], h[..., 1:2], h[..., 2:3]))
        outputs[("disp", 1)] = ll / (2**1)

        x_d4 = UpSampleBlock(features // 16, "reflection", name="up4")(
            x_d3, x_blocks[-5]
        )
        h = Conv3x3(3, "zero", name="wave4")(x_d4)
        outputs[("wavelets", 0, "LH")] = h[..., 0:1]
        outputs[("wavelets", 0, "HL")] = h[..., 1:2]
        outputs[("wavelets", 0, "HH")] = h[..., 2:3]
        ll = haar_idwt2(ll, (h[..., 0:1], h[..., 1:2], h[..., 2:3]))
        outputs[("disp", 0)] = ll
        return outputs


class PlainDecoder(nn.Module):
    """Non-wavelet DenseDepth decoder (reference :15-47)."""

    enc_features: Sequence[int] = (96, 96, 192, 384, 2208)
    decoder_width: float = 0.5

    @nn.compact
    def __call__(self, x_blocks):
        features = int(self.enc_features[-1] * self.decoder_width)
        x = Conv3x3(features, "zero", name="conv2")(x_blocks[-1])
        for i, div in enumerate((2, 4, 8, 16)):
            x = UpSampleBlock(features // div, "zero", name=f"up{i+1}")(
                x, x_blocks[-2 - i]
            )
        disp = Conv3x3(1, "zero", name="conv3")(x)
        return {("disp", 0): disp}


class PlainDecoder224(nn.Module):
    """Non-wavelet decoder with extra upsample head (reference :50-89)."""

    enc_features: Sequence[int] = (96, 96, 192, 384, 2208)
    decoder_width: float = 0.5

    @nn.compact
    def __call__(self, x_blocks):
        features = int(self.enc_features[-1] * self.decoder_width)
        x = Conv3x3(features, "zero", name="conv2")(x_blocks[-1])
        for i, div in enumerate((2, 4, 8, 16)):
            x = UpSampleBlock(features // div, "zero", name=f"up{i+1}")(
                x, x_blocks[-2 - i]
            )
        x = upsample_nearest(x)
        x = nn.leaky_relu(Conv3x3(features // 32, "zero", name="conv5")(x), 0.2)
        disp = Conv3x3(1, "zero", name="conv3")(x)
        return {("disp", 0): disp}


class SparseDecoderWave(nn.Module):
    """Threshold-sparsified wavelet decoder (reference :224-409).

    The reference evaluates the scale-1/0 detail convolutions only where the
    *parent-scale* detail coefficients exceed a relative threshold
    ``(ll.max - ll.min) * thresh_ratio`` (``thresh`` at :318/:365), with the
    binary mask nearest-upsampled to the child scale and maxpool-dilated to
    cover the sparse convs' receptive fields; scale-2 details are dense and
    unmasked (``mask = ones`` at :305). On TPU dense evaluation is the fast
    path, so this variant computes the convolutions densely and applies the
    same masks afterwards — the masked reconstruction ladder matches the
    reference's sparse outputs (the dilation radii guarantee every position
    the reference computes is covered by a dense value). The mask occupancy
    per scale is returned as the FLOPs-proxy the reference's op counter
    (:273-407 ``total_ops``) measures.
    """

    enc_features: Sequence[int] = (96, 96, 192, 384, 2208)
    decoder_width: float = 0.5

    @nn.compact
    def __call__(self, x_blocks, thresh_ratio: float = -1.0):
        dense = DecoderWave(self.enc_features, self.decoder_width, name="dense")
        outputs = dense(x_blocks)
        if thresh_ratio < 0:
            outputs["sparsity"] = {}
            return outputs

        def stack_h(scale):
            return jnp.concatenate(
                [
                    outputs[("wavelets", scale, b)]
                    for b in ("LH", "HL", "HH")
                ],
                axis=-1,
            )

        # scale 2: dense and unmasked (reference :305-313)
        ll = outputs[("wavelets", 2, "LL")]
        h = stack_h(2)
        outputs[("wavelet_mask", 2)] = jnp.ones_like(h[..., :1])
        ll = haar_idwt2(ll, (h[..., 0:1], h[..., 1:2], h[..., 2:3]))
        sparsity = {2: jnp.asarray(1.0, ll.dtype)}

        # scales 1 and 0: parent-relative threshold (reference :317-407)
        parent_h = h
        for scale in (1, 0):
            thresh = (jnp.max(ll) - jnp.min(ll)) * thresh_ratio
            mask = (
                jnp.max(jnp.abs(parent_h), axis=-1, keepdims=True) > thresh
            ).astype(ll.dtype)
            wavelet_mask = upsample_nearest(mask)
            # sparse convs are evaluated on the 3x3-dilated mask; dense h is
            # exact there, zero elsewhere in the reference
            wave_mask = nn.max_pool(
                wavelet_mask, (3, 3), strides=(1, 1), padding="SAME"
            )
            h = stack_h(scale) * wave_mask
            for i, b in enumerate(("LH", "HL", "HH")):
                outputs[("wavelets", scale, b)] = h[..., i : i + 1]
            outputs[("wavelet_mask", scale)] = wavelet_mask
            hm = h * wavelet_mask  # the IDWT uses wavelet_mask * h (:359,:404)
            ll = haar_idwt2(ll, (hm[..., 0:1], hm[..., 1:2], hm[..., 2:3]))
            outputs[("disp", scale)] = ll / (2**scale)
            sparsity[scale] = jnp.mean(wavelet_mask)
            parent_h = h
        outputs["sparsity"] = sparsity
        return outputs
