"""Monodepth model wrapper: encoder + decoder selection.

Capability parity with reference ``wavelet/model.py:73-134`` (Model) —
encoder_type in {densenet, resnet, mobilenet, mobilenet_light}, wavelet /
plain / 224 / sparse decoder variants — as one flax module with a config
dataclass playing the role of the reference's argparse `opts`.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from vdnerf_tpu.wavelet.decoders import (
    DecoderWave,
    DecoderWave224,
    PlainDecoder,
    PlainDecoder224,
    SparseDecoderWave,
)
from vdnerf_tpu.wavelet.encoders import (
    DenseEncoder,
    MobileNetV2Encoder,
    ResnetEncoder,
)


@dataclasses.dataclass(frozen=True)
class WaveletOpts:
    """Mirror of the reference CLIs' model flags (finetune_for_vdn.py:22-59)."""

    encoder_type: str = "densenet"
    num_layers: int = 161  # densenet variant (or resnet depth)
    normalize_input: bool = False
    use_wavelets: bool = True
    use_224: bool = False
    use_sparse: bool = False
    dw_waveconv: bool = False
    dw_upconv: bool = False
    decoder_width: float = 0.5


class MonodepthModel(nn.Module):
    opts: WaveletOpts = WaveletOpts()

    def setup(self):
        o = self.opts
        if o.encoder_type == "densenet":
            self.encoder = DenseEncoder(
                num_layers=o.num_layers, normalize_input=o.normalize_input
            )
        elif o.encoder_type == "resnet":
            self.encoder = ResnetEncoder(
                num_layers=o.num_layers if o.num_layers in (18, 34, 50) else 18,
                normalize_input=o.normalize_input,
            )
        elif o.encoder_type in ("mobilenet", "mobilenet_light"):
            self.encoder = MobileNetV2Encoder(
                normalize_input=o.normalize_input,
                use_last_layer=o.encoder_type == "mobilenet",
            )
        else:
            raise NotImplementedError(o.encoder_type)

        enc_ch = tuple(self.encoder.num_ch_enc)
        if o.use_wavelets:
            if o.use_sparse:
                self.decoder = SparseDecoderWave(enc_ch, o.decoder_width)
            elif o.use_224:
                self.decoder = DecoderWave224(enc_ch, o.decoder_width)
            else:
                self.decoder = DecoderWave(enc_ch, o.decoder_width)
        else:
            self.decoder = (
                PlainDecoder224(enc_ch, o.decoder_width)
                if o.use_224
                else PlainDecoder(enc_ch, o.decoder_width)
            )

    def __call__(self, x, train: bool = False, thresh_ratio: float = -1.0):
        feats = self.encoder(x, train=train)
        if self.opts.use_sparse:
            return self.decoder(feats, thresh_ratio)
        return self.decoder(feats)

    def encode(self, x, train: bool = False):
        """Encoder features only — feats[0] is the exported 96-ch VDN map."""
        return self.encoder(x, train=train)


def create_model(
    key: jax.Array, opts: WaveletOpts, input_hw: tuple[int, int] = (224, 224)
):
    """-> (model, variables) with params + batch_stats initialized."""
    model = MonodepthModel(opts)
    x = jnp.zeros((1, input_hw[0], input_hw[1], 3), jnp.float32)
    variables = model.init(key, x, train=False)
    return model, variables
