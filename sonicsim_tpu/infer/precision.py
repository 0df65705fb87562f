"""Reduced-precision inference helpers.

The reference serves fp32 torch models; on TPU the MXU natively computes
bf16 matmuls at 2× the fp32-emulation rate and HBM traffic halves, so
bf16 inference is the deployment default here. ``bf16_forward`` casts
params and input to bfloat16 and returns fp32 outputs; FFTs inside
STFT-domain models auto-promote to complex64 so spectral models keep
fp32 transform precision while their matmul/LSTM cores run bf16.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp


def cast_floating(tree: Any, dtype=jnp.bfloat16) -> Any:
    """Cast every floating-point leaf (params or activations) to ``dtype``."""
    def _cast(a):
        a = jnp.asarray(a)
        return a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a
    return jax.tree.map(_cast, tree)


def bf16_forward(model) -> Callable:
    """``fwd(params_f32, x_f32) -> f32 output`` computing in bfloat16.

    Params are cast inside the traced function so the stored checkpoint
    stays fp32 (XLA folds the casts into the first use; no double storage
    at runtime).
    """
    def fwd(params, x, *args, **kwargs):
        p16 = cast_floating(params)
        x16 = jnp.asarray(x).astype(jnp.bfloat16)
        out = model.apply(p16, x16, *args, **kwargs)
        return jax.tree.map(
            lambda a: a.astype(jnp.float32)
            if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a,
            out,
        )
    return fwd
