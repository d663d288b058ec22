"""Orthonormal 2-D Haar DWT / IDWT in pure jnp.

Replaces the reference's ``pytorch_wavelets`` dependency (DWT at
finetune_for_vdn.py:127, IDWT inside DecoderWave,
densedepth_decoder.py:99-101). Haar with even input sizes needs no boundary
handling, so the transform is exact 2x2 butterflies — reshapes + adds that
XLA fuses into neighboring ops (ideal on TPU; no gather/conv needed).

Conventions (matching pytorch_wavelets' 'haar'):
- arrays are NHWC (TPU-native); channel count is preserved
- one level: x[N, H, W, C] -> (LL [N, H/2, W/2, C], (LH, HL, HH) same shape)
- LH = horizontal-detail (vertical lowpass, horizontal highpass),
  HL = vertical-detail, HH = diagonal
- orthonormal scaling: each level scales by 1/2 forward, 2x inverse,
  so dwt->idwt is the identity and ||coeffs|| == ||signal||
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def haar_dwt2(x: jax.Array) -> tuple[jax.Array, tuple[jax.Array, jax.Array, jax.Array]]:
    """One-level 2D Haar DWT of NHWC ``x`` (H, W must be even)."""
    n, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    a = x[:, 0::2, 0::2, :]
    b = x[:, 0::2, 1::2, :]
    cc = x[:, 1::2, 0::2, :]
    d = x[:, 1::2, 1::2, :]
    ll = (a + b + cc + d) * 0.5
    lh = (a - b + cc - d) * 0.5  # horizontal highpass
    hl = (a + b - cc - d) * 0.5  # vertical highpass
    hh = (a - b - cc + d) * 0.5
    return ll, (lh, hl, hh)


def haar_idwt2(
    ll: jax.Array, highs: tuple[jax.Array, jax.Array, jax.Array]
) -> jax.Array:
    """Inverse of :func:`haar_dwt2`."""
    lh, hl, hh = highs
    a = (ll + lh + hl + hh) * 0.5
    b = (ll - lh + hl - hh) * 0.5
    cc = (ll + lh - hl - hh) * 0.5
    d = (ll - lh - hl + hh) * 0.5
    n, h2, w2, c = ll.shape
    out = jnp.zeros((n, h2 * 2, w2 * 2, c), dtype=ll.dtype)
    out = out.at[:, 0::2, 0::2, :].set(a)
    out = out.at[:, 0::2, 1::2, :].set(b)
    out = out.at[:, 1::2, 0::2, :].set(cc)
    out = out.at[:, 1::2, 1::2, :].set(d)
    return out


def haar_dwt2_multi(x: jax.Array, levels: int):
    """J-level decomposition -> (yl, [level0 highs, level1 highs, ...]).

    Level 0 is the finest scale (like pytorch_wavelets DWTForward's yh[0]).
    Each element of the list is an (LH, HL, HH) triple.
    """
    highs = []
    ll = x
    for _ in range(levels):
        ll, h = haar_dwt2(ll)
        highs.append(h)
    return ll, highs


def haar_idwt2_multi(yl: jax.Array, highs) -> jax.Array:
    ll = yl
    for h in reversed(highs):
        ll = haar_idwt2(ll, h)
    return ll
