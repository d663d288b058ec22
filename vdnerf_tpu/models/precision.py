"""Global matmul precision policy.

TPU MXUs run bf16 matmuls at a multiple of the fp32 rate. Setting the policy
to bfloat16 casts matmul INPUTS only; accumulation stays fp32
(``preferred_element_type``), parameters stay fp32 master copies, and all
non-matmul math (embedder trig, compositing, losses) stays fp32. This is the
standard mixed-precision recipe — activations lose at most bf16 mantissa on
the way into each matmul.

The policy is read at trace time: set it before jitting a step (the runner
wires it to the ``train.bf16`` conf key / ``VDNERF_BF16`` env var).
"""

from __future__ import annotations

import os

import jax.numpy as jnp

_MATMUL_DTYPE = None


def set_matmul_dtype(dtype) -> None:
    """dtype: jnp.bfloat16, or None to restore full fp32."""
    global _MATMUL_DTYPE
    _MATMUL_DTYPE = dtype


def get_matmul_dtype():
    return _MATMUL_DTYPE


def enable_bf16(enable: bool = True) -> None:
    set_matmul_dtype(jnp.bfloat16 if enable else None)


# --- fused Pallas MLP kernels (ops/pallas/fused_mlp.py) -------------------
# Orthogonal to the matmul dtype: the fused kernels always compute with bf16
# MXU inputs + f32 accumulation and keep activations in VMEM. Read at trace
# time, like the matmul policy.

_FUSED_MLP = False


def set_fused_mlp(enable: bool) -> None:
    global _FUSED_MLP
    _FUSED_MLP = bool(enable)


def use_fused_mlp() -> bool:
    if _FUSED_MLP and _MATMUL_DTYPE is None:
        # the fused kernels compute with bf16 MXU inputs unconditionally;
        # surface the silent downgrade when the caller asked for full fp32
        # (e.g. enable_bf16(False) / --fp32) so parity debugging isn't
        # chasing phantom bf16 noise
        import warnings

        warnings.warn(
            "fused Pallas MLP kernels are enabled while the matmul policy is "
            "full fp32: the kernels still use bf16 MXU inputs (f32 "
            "accumulation), so results will NOT be bit-fp32. Disable "
            "set_fused_mlp / VDNERF_FUSED for true fp32.",
            stacklevel=2,
        )
    return _FUSED_MLP


if os.environ.get("VDNERF_BF16", "") in ("1", "true", "True"):
    enable_bf16(True)
if os.environ.get("VDNERF_FUSED", "") in ("1", "true", "True"):
    set_fused_mlp(True)
