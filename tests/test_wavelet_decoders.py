"""Decoder-variant coverage: plain, 224, sparse."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdnerf_tpu.wavelet.decoders import (
    DecoderWave224,
    PlainDecoder,
    PlainDecoder224,
    SparseDecoderWave,
)


def fake_taps(hw=64, chans=(16, 16, 24, 32, 48)):
    """Encoder-like feature pyramid at /2../32 of a hw input."""
    key = jax.random.PRNGKey(0)
    taps = []
    for i, c in enumerate(chans):
        s = hw // (2 ** (i + 1))
        taps.append(jax.random.normal(jax.random.fold_in(key, i), (1, s, s, c)))
    return tuple(taps)


def test_plain_decoder():
    taps = fake_taps()
    dec = PlainDecoder(enc_features=(16, 16, 24, 32, 48))
    vs = dec.init(jax.random.PRNGKey(1), taps)
    out = dec.apply(vs, taps)
    assert out[("disp", 0)].shape == (1, 32, 32, 1)


def test_plain_decoder_224():
    # decoder_width 0.5 of 128 -> 64; //32 head stays non-empty
    chans = (16, 16, 24, 32, 128)
    taps = fake_taps(chans=chans)
    dec = PlainDecoder224(enc_features=chans)
    vs = dec.init(jax.random.PRNGKey(1), taps)
    out = dec.apply(vs, taps)
    assert out[("disp", 0)].shape == (1, 64, 64, 1)  # extra upsample head


def test_decoder_wave_224():
    taps = fake_taps()
    dec = DecoderWave224(enc_features=(16, 16, 24, 32, 48))
    vs = dec.init(jax.random.PRNGKey(1), taps)
    out = dec.apply(vs, taps)
    # the 224 ladder reconstructs to full input resolution; disp3 is already
    # one IDWT above the coarsest prediction
    assert out[("disp", 0)].shape == (1, 64, 64, 1)
    assert out[("disp", 3)].shape == (1, 8, 8, 1)


def test_sparse_decoder_threshold():
    taps = fake_taps()
    dec = SparseDecoderWave(enc_features=(16, 16, 24, 32, 48))
    vs = dec.init(jax.random.PRNGKey(1), taps, threshold=-1.0)

    dense = dec.apply(vs, taps, threshold=-1.0)
    sparse = dec.apply(vs, taps, threshold=1e9)  # everything masked
    assert dense[("disp", 0)].shape == sparse[("disp", 0)].shape
    # with all details zeroed, occupancy is 0 and the finest disp reduces to
    # the upsampled LL band
    for s in (2, 1, 0):
        assert float(sparse["sparsity"][s]) == 0.0
        np.testing.assert_allclose(
            np.asarray(sparse[("wavelets", s, "LH")]), 0.0
        )
    # a permissive threshold keeps everything -> matches the dense output
    loose = dec.apply(vs, taps, threshold=0.0)
    np.testing.assert_allclose(
        np.asarray(loose[("disp", 0)]),
        np.asarray(dense[("disp", 0)]),
        atol=1e-5,
    )
