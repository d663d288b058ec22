import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdnerf_tpu.wavelet.haar import (
    haar_dwt2,
    haar_dwt2_multi,
    haar_idwt2,
    haar_idwt2_multi,
)


def test_haar_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 3)).astype(np.float32))
    ll, highs = haar_dwt2(x)
    assert ll.shape == (2, 8, 8, 3)
    rec = haar_idwt2(ll, highs)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-6)


def test_haar_orthonormal(rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 1)).astype(np.float32))
    ll, (lh, hl, hh) = haar_dwt2(x)
    e_in = float(jnp.sum(x**2))
    e_out = float(sum(jnp.sum(c**2) for c in (ll, lh, hl, hh)))
    np.testing.assert_allclose(e_in, e_out, rtol=1e-5)


def test_haar_constant_signal():
    x = jnp.full((1, 4, 4, 1), 3.0)
    ll, (lh, hl, hh) = haar_dwt2(x)
    np.testing.assert_allclose(np.asarray(ll), 6.0)  # 2x per level
    np.testing.assert_allclose(np.asarray(lh), 0.0)
    np.testing.assert_allclose(np.asarray(hl), 0.0)
    np.testing.assert_allclose(np.asarray(hh), 0.0)


def test_haar_direction_convention():
    """LH responds to horizontal variation, HL to vertical."""
    n = 8
    horiz = jnp.tile(jnp.arange(n, dtype=jnp.float32)[None, None, :, None] % 2,
                     (1, n, 1, 1))
    ll, (lh, hl, hh) = haar_dwt2(horiz)
    assert float(jnp.abs(lh).sum()) > 0.1
    np.testing.assert_allclose(np.asarray(hl), 0.0, atol=1e-6)

    vert = jnp.transpose(horiz, (0, 2, 1, 3))
    ll, (lh, hl, hh) = haar_dwt2(vert)
    np.testing.assert_allclose(np.asarray(lh), 0.0, atol=1e-6)
    assert float(jnp.abs(hl).sum()) > 0.1


def test_haar_multilevel_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 1)).astype(np.float32))
    yl, highs = haar_dwt2_multi(x, 4)
    assert yl.shape == (1, 2, 2, 1)
    assert len(highs) == 4
    assert highs[0][0].shape == (1, 16, 16, 1)  # finest first
    rec = haar_idwt2_multi(yl, highs)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-5)


def test_haar_matches_pytorch_wavelets_scaling():
    """Constant 1.0 image: LL after J levels must equal 2^J (the reference
    divides the LL loss by 2^4 relying on this scaling,
    finetune_for_vdn.py:188)."""
    x = jnp.ones((1, 16, 16, 1))
    yl, _ = haar_dwt2_multi(x, 4)
    np.testing.assert_allclose(np.asarray(yl), 2.0**4, rtol=1e-6)


# ---------------------------------------------------------------------------
# model stack
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_densenet_wavelet_model_shapes():
    from vdnerf_tpu.wavelet.model import WaveletOpts, create_model

    opts = WaveletOpts(encoder_type="densenet", num_layers=161)
    model, variables = create_model(jax.random.PRNGKey(0), opts, (64, 64))

    x = jnp.zeros((1, 64, 64, 3))
    feats = model.apply(variables, x, train=False, method=model.encode)
    chans = [f.shape[-1] for f in feats]
    assert chans == [96, 96, 192, 384, 2208]
    assert feats[0].shape == (1, 32, 32, 96)  # the VDN feature map (H/2)

    out = model.apply(variables, x, train=False)
    assert out[("disp", 0)].shape == (1, 32, 32, 1)
    assert out[("disp", 3)].shape == (1, 4, 4, 1)
    # disp_s are consistent: idwt ladder halves the scale factor each step
    for s in range(4):
        assert out[("disp", s)].shape[1] == 32 // 2**s


def test_resnet_and_mobilenet_encoders():
    from vdnerf_tpu.wavelet.encoders import MobileNetV2Encoder, ResnetEncoder

    enc = ResnetEncoder(num_layers=18)
    x = jnp.zeros((1, 64, 64, 3))
    vs = enc.init(jax.random.PRNGKey(0), x, train=False)
    feats = enc.apply(vs, x, train=False)
    assert [f.shape[-1] for f in feats] == enc.num_ch_enc

    enc = MobileNetV2Encoder()
    vs = enc.init(jax.random.PRNGKey(0), x, train=False)
    feats = enc.apply(vs, x, train=False)
    assert [f.shape[-1] for f in feats] == enc.num_ch_enc
