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


class GroupedConv1D(nn.Module):
    """``nn.Conv``-compatible 1-D grouped/depthwise convolution, TPU-fast.

    XLA lowers ``feature_group_count == channels`` (pure depthwise) 1-D
    convs on TPU ~8x slower than the equivalent k dilation-shifted
    elementwise multiply-adds (measured on (4, 4000, 512), 24 blocks of
    k=3: 179 ms grouped lowering vs 22 ms shifted; inside a full
    ConvTasNet forward, where norms dominate, the end-to-end gain is
    ~1.2x). This module computes
    pure-depthwise instances with the shifted form and falls back to
    ``lax.conv_general_dilated`` otherwise. Parameter names and shapes
    match ``nn.Conv`` exactly — kernel (k, in//groups, features), bias
    (features,) — so existing pytrees and imported torch checkpoints are
    unaffected; swap call sites keeping the same ``name=``.
    """

    features: int
    kernel_size: tuple[int, ...]
    strides: tuple[int, ...] = (1,)
    padding: str | list[tuple[int, int]] = "SAME"
    kernel_dilation: tuple[int, ...] = (1,)
    feature_group_count: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, T, Cin)
        k = self.kernel_size[0]
        d = self.kernel_dilation[0]
        s = self.strides[0]
        in_ch = x.shape[-1]
        g = self.feature_group_count
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, in_ch // g, self.features),
        )
        eff = d * (k - 1)
        if isinstance(self.padding, str):
            if self.padding not in ("SAME", "VALID"):
                raise ValueError(
                    f"GroupedConv1D supports 'SAME'/'VALID'/explicit "
                    f"padding, got {self.padding!r}"
                )
            pad_spec = self.padding
            explicit = (0, 0) if self.padding == "VALID" else None
            if self.padding == "SAME" and s == 1:
                explicit = (eff // 2, eff - eff // 2)
        else:
            explicit = tuple(self.padding[0])
            pad_spec = [explicit]
        depthwise = g == self.features == in_ch and explicit is not None
        if depthwise:
            xp = jnp.pad(x, ((0, 0), explicit, (0, 0)))
            t_out = (xp.shape[1] - eff - 1) // s + 1
            if t_out <= 0:
                raise ValueError(
                    f"input length {x.shape[1]} (+padding {explicit}) is "
                    f"shorter than the receptive field "
                    f"{eff + 1} of this depthwise conv"
                )
            span = (t_out - 1) * s + 1
            out = xp[:, :span:s, :] * kernel[0, 0]
            for i in range(1, k):
                out = out + xp[:, i * d : i * d + span : s, :] * kernel[i, 0]
        else:
            out = jax.lax.conv_general_dilated(
                x,
                kernel,
                window_strides=(s,),
                padding=pad_spec,
                rhs_dilation=(d,),
                dimension_numbers=("NWC", "WIO", "NWC"),
                feature_group_count=g,
            )
        if self.use_bias:
            out = out + self.param(
                "bias", nn.initializers.zeros, (self.features,)
            )
        return out
