"""NeRF positional encoding, vectorized for TPU.

Parity target: reference ``dpt_models/embedder.py:6-51`` — include_input=True,
log-spaced frequency bands 2^0 .. 2^(multires-1), and the exact output
ordering ``[x, sin(x*f0), cos(x*f0), sin(x*f1), cos(x*f1), ...]`` (each block
of width d). The ordering is load-bearing: the SDF network's geometric init
zeroes the weight columns that consume the non-raw-xyz part of the embedding
(reference fields.py:53-60).

Instead of a list of per-frequency lambdas, a single fused broadcast +
concatenate — XLA folds this into the consuming matmul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def embed(x: jax.Array, freqs: jax.Array, include_input: bool = True) -> jax.Array:
    """Positional-encode the last axis of ``x``.

    x: [..., d]; freqs: [L] -> [..., d * (1 + 2L)] ordered
    [x | sin(f0 x) | cos(f0 x) | sin(f1 x) | cos(f1 x) | ...].
    """
    scaled = x[..., None, :] * freqs[:, None]          # [..., L, d]
    enc = jnp.stack([jnp.sin(scaled), jnp.cos(scaled)], axis=-2)  # [..., L, 2, d]
    enc = enc.reshape(*x.shape[:-1], -1)               # [..., L*2*d]
    if include_input:
        return jnp.concatenate([x, enc], axis=-1)
    return enc


@functools.lru_cache(maxsize=None)
def get_embedder(multires: int, input_dims: int = 3):
    """Return (embed_fn, out_dim) matching reference embedder.py:39-51."""
    if multires <= 0:
        return (lambda x: x), input_dims
    # host numpy constant: backend- and trace-agnostic under the lru_cache
    freqs = 2.0 ** np.linspace(0.0, multires - 1, multires).astype(np.float32)
    out_dim = input_dims * (1 + 2 * multires)

    def embed_fn(x: jax.Array) -> jax.Array:
        return embed(x, freqs, include_input=True)

    return embed_fn, out_dim
