"""Shared neural layers (norms, activations) for the model zoos.

TPU-native layout convention: activations are channel-last (B, T, C) so
flax convs map straight onto XLA's preferred conv layouts; the reference's
(B, C, T) torch convention only survives at the checkpoint-import boundary.

Parity targets: separation ConvTasnet.py:10-87 (cLN/gLN), and the shared
normalizations in look2hear/layers/normalizations.py.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp


class GlobalLayerNorm(nn.Module):
    """gLN: normalize over (T, C) jointly, per sample (ConvTasnet.py:34-67)."""

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, T, C)
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,))
        beta = self.param("beta", nn.initializers.zeros, (self.dim,))
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=(1, 2), keepdims=True)
        return gamma * (x - mean) * jax.lax.rsqrt(var + self.eps) + beta


class ChannelLayerNorm(nn.Module):
    """cLN: per-frame LayerNorm over channels (ConvTasnet.py:10-31)."""

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, T, C)
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,))
        beta = self.param("beta", nn.initializers.zeros, (self.dim,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
        return gamma * (x - mean) * jax.lax.rsqrt(var + self.eps) + beta


def select_norm(norm: str, dim: int) -> nn.Module:
    if norm == "gLN":
        return GlobalLayerNorm(dim)
    if norm == "cLN":
        return ChannelLayerNorm(dim)
    raise ValueError(f"unsupported norm {norm!r} (gLN/cLN)")


class PReLU(nn.Module):
    """torch.nn.PReLU parity: one shared learnable slope, init 0.25."""

    init: float = 0.25

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        alpha = self.param(
            "alpha", lambda _key, shape: jnp.full(shape, self.init), (1,)
        )
        return jnp.where(x >= 0, x, alpha * x)


def get_layer(name: str) -> Callable[[jax.Array], jax.Array]:
    """String → activation lookup (reference utils get_layer)."""
    return get_activation(name)


def get_activation(name: str) -> Callable[[jax.Array], jax.Array]:
    table = {
        "relu": jax.nn.relu,
        "sigmoid": jax.nn.sigmoid,
        "tanh": jnp.tanh,
        "gelu": jax.nn.gelu,
        "softmax": jax.nn.softmax,
        "linear": lambda x: x,
    }
    try:
        return table[name]
    except KeyError:
        raise ValueError(f"unsupported activation {name!r}") from None
