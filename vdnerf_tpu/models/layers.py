"""Pure-functional dense layers (weight-normalized and plain).

Parameters live in plain dicts of jnp arrays (pytrees) so they compose
directly with optax, shard_map, and checkpointing. Weights are stored
[in, out] so the forward pass is a single ``x @ w`` that XLA tiles onto the
MXU.

Weight norm follows torch's ``nn.utils.weight_norm`` semantics on Linear
(reference fields.py:65-66,141-142): effective W = g * v / ||v|| with the
norm taken over the input dimension, one scale per output unit. ``g`` is
initialized to ``||v||`` so the effective weight at init equals the raw init.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]

_EPS = 0.0  # torch weight_norm uses no epsilon


def init_linear(
    key: jax.Array,
    d_in: int,
    d_out: int,
    weight_norm: bool = False,
    w_init: jax.Array | None = None,
    b_init: jax.Array | None = None,
) -> Params:
    """Create a dense layer's params.

    With no explicit inits, uses torch's Linear default: Kaiming-uniform with
    a=sqrt(5), i.e. U(-1/sqrt(d_in), 1/sqrt(d_in)) for both weight and bias —
    so randomly-initialized nets match the reference's statistics.
    """
    kw, kb = jax.random.split(key)
    if w_init is None:
        bound = 1.0 / np.sqrt(d_in)
        w_init = jax.random.uniform(
            kw, (d_in, d_out), minval=-bound, maxval=bound, dtype=jnp.float32
        )
    if b_init is None:
        bound = 1.0 / np.sqrt(d_in)
        b_init = jax.random.uniform(
            kb, (d_out,), minval=-bound, maxval=bound, dtype=jnp.float32
        )
    if weight_norm:
        g = jnp.linalg.norm(w_init, axis=0)  # per-output-unit norm over inputs
        return {"v": w_init, "g": g, "b": b_init}
    return {"w": w_init, "b": b_init}


def linear(p: Params, x: jax.Array) -> jax.Array:
    w = effective_weight(p)
    from vdnerf_tpu.models.precision import get_matmul_dtype

    mm_dtype = get_matmul_dtype()
    if mm_dtype is not None:
        # bf16 activations: halves HBM traffic on the non-matmul stretches
        # (f32 matmuls already run at the bf16 MXU rate, so the matmul cast
        # is rate-neutral — the ~1.4x step win is activation bandwidth; see
        # docs/PERF_r02.md roofline). Accumulation stays fp32; the
        # out-facing head values are cast back by the callers.
        x = x.astype(mm_dtype)
        w = w.astype(mm_dtype)
        y = jnp.dot(x, w, preferred_element_type=jnp.float32) + p["b"]
        return y.astype(mm_dtype)
    return jnp.dot(x, w, preferred_element_type=jnp.float32) + p["b"]


def effective_weight(p: Params) -> jax.Array:
    """The layer's effective [in, out] weight with weight norm applied.

    Differentiable in (v, g), so fused kernels that consume effective
    weights and return d(effective) compose with the chain back to (v, g).
    """
    if "v" in p:
        norm = jnp.linalg.norm(p["v"], axis=0, keepdims=True)
        return p["v"] * (p["g"][None, :] / norm)
    return p["w"]


def softplus_beta(x: jax.Array, beta: float = 100.0) -> jax.Array:
    """torch.nn.Softplus(beta): (1/beta) * softplus(beta * x), numerically
    stable via jax.nn.softplus. Torch additionally short-circuits to identity
    when beta*x > 20; jax.nn.softplus is already exact there to fp32."""
    return jax.nn.softplus(beta * x) / beta
