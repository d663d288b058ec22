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
    vs = dec.init(jax.random.PRNGKey(1), taps, thresh_ratio=-1.0)

    dense = dec.apply(vs, taps, thresh_ratio=-1.0)
    sparse = dec.apply(vs, taps, thresh_ratio=1e9)  # everything masked
    assert dense[("disp", 0)].shape == sparse[("disp", 0)].shape
    # scale 2 is always dense/unmasked (reference :305-313)
    assert float(sparse["sparsity"][2]) == 1.0
    np.testing.assert_allclose(
        np.asarray(sparse[("disp", 2)]), np.asarray(dense[("disp", 2)])
    )
    # scales 1/0: with an impossible threshold every detail is masked out,
    # so occupancy is 0 and each disp is the pure-LL upsample of its parent
    for s in (1, 0):
        assert float(sparse["sparsity"][s]) == 0.0
        np.testing.assert_allclose(
            np.asarray(sparse[("wavelets", s, "LH")]), 0.0
        )
    # a permissive (0) threshold keeps every detail -> matches dense exactly
    loose = dec.apply(vs, taps, thresh_ratio=0.0)
    for s in (1, 0):
        assert float(loose["sparsity"][s]) == 1.0
        np.testing.assert_allclose(
            np.asarray(loose[("disp", s)]),
            np.asarray(dense[("disp", s)]),
            atol=1e-5,
        )


def test_sparse_decoder_disp_normalization_and_masks():
    """The masked reconstructions land on the right disp keys with the right
    1/2^s normalization, and the mask keys mirror the reference's."""
    taps = fake_taps()
    dec = SparseDecoderWave(enc_features=(16, 16, 24, 32, 48))
    vs = dec.init(jax.random.PRNGKey(1), taps, thresh_ratio=-1.0)
    out = dec.apply(vs, taps, thresh_ratio=0.1)

    # disp resolutions double down the ladder: s=3 coarsest .. s=0 finest
    hs = {s: out[("disp", s)].shape[1] for s in (3, 2, 1, 0)}
    assert hs[2] == 2 * hs[3] and hs[1] == 2 * hs[2] and hs[0] == 2 * hs[1]
    # wavelet_mask keys exist at scales 2 (ones), 1, 0; scale-s details (and
    # their mask) live at the parent disp resolution hs[s+1], as in the
    # reference (mask upsampled from the parent-scale detail grid)
    for s in (2, 1, 0):
        m = np.asarray(out[("wavelet_mask", s)])
        assert m.shape[1] == hs[s + 1]
        assert set(np.unique(m)).issubset({0.0, 1.0})
    assert np.all(np.asarray(out[("wavelet_mask", 2)]) == 1.0)
    # reconstruction consistency: disp_s == idwt(parent ll, masked details)/2^s
    # is what the decoder claims; verify the pure-LL relationship where all
    # details are zeroed out
    dense = dec.apply(vs, taps, thresh_ratio=-1.0)
    np.testing.assert_allclose(
        np.asarray(out[("disp", 3)]), np.asarray(dense[("disp", 3)])
    )
