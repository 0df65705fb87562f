"""Shared blocks for the separation model zoo.

Covers the layer vocabulary repeated across the reference zoo
(separation/look2hear/models/{sudormrf,afrcnn,TDANet}.py:7-160 GlobLN /
ConvNormAct / DilatedConvNorm; dprnn.py:70-165 dual-path chunking + RNN
blocks; bsrnn.py:6-48 ResRNN). Channel-last (B, T, C) layout throughout.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import GlobalLayerNorm, GroupedConv1D, PReLU


class GroupNorm1(nn.Module):
    """torch nn.GroupNorm(1, C) parity: stats over channels + all spatial
    dims per sample, per-channel affine."""

    eps: float = 1.1920929e-7  # torch.finfo(float32).eps

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.GroupNorm(num_groups=1, epsilon=self.eps)(x)


class StatelessBatchNorm(nn.Module):
    """Batch-statistics normalization with per-channel affine, no running
    stats (functional stand-in for torch BatchNorm2d; stats over all
    non-channel dims of a channel-last tensor)."""

    dim: int
    eps: float = 1e-5
    use_running_stats: bool = False  # frozen eval-mode stats as params
    # (filled by checkpoint import; torch BatchNorm eval semantics)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        gamma = self.param("scale", nn.initializers.ones, (self.dim,))
        beta = self.param("bias", nn.initializers.zeros, (self.dim,))
        if self.use_running_stats:
            mu = self.param("mean", nn.initializers.zeros, (self.dim,))
            var = self.param("var", nn.initializers.ones, (self.dim,))
        else:
            axes = tuple(range(x.ndim - 1))
            mu = x.mean(axis=axes, keepdims=True)
            var = x.var(axis=axes, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + self.eps) * gamma + beta


class ConvNormAct(nn.Module):
    """Conv1d + gLN + PReLU (sudormrf.py:47-71)."""

    out_channels: int
    kernel_size: int
    stride: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, T, C)
        k, s = self.kernel_size, self.stride
        pad = (k - 1) // 2  # torch symmetric-pad convention (sudormrf.py:62)
        x = GroupedConv1D(
            self.out_channels,
            (k,),
            strides=(s,),
            padding=[(pad, pad)],
            feature_group_count=self.groups,
            name="Conv_0",
        )(x)
        x = GlobalLayerNorm(self.out_channels, eps=1e-8)(x)
        return PReLU()(x)


class ConvNorm(nn.Module):
    """Conv1d + gLN, no activation (sudormrf.py:73-94)."""

    out_channels: int
    kernel_size: int
    stride: int = 1
    groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k, s = self.kernel_size, self.stride
        pad = (k - 1) // 2
        x = GroupedConv1D(
            self.out_channels,
            (k,),
            strides=(s,),
            padding=[(pad, pad)],
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            name="Conv_0",
        )(x)
        return GlobalLayerNorm(self.out_channels, eps=1e-8)(x)


class NormAct(nn.Module):
    """gLN + PReLU (sudormrf.py:96-112)."""

    dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return PReLU()(GlobalLayerNorm(self.dim, eps=1e-8)(x))


class DilatedConvNorm(nn.Module):
    """Dilated depthwise conv + gLN (sudormrf.py:135-156)."""

    out_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k, s, d = self.kernel_size, self.stride, self.dilation
        pad = ((k - 1) // 2) * d  # torch convention (sudormrf.py:129)
        x = GroupedConv1D(
            self.out_channels,
            (k,),
            strides=(s,),
            padding=[(pad, pad)],
            kernel_dilation=(d,),
            feature_group_count=self.groups,
            name="Conv_0",
        )(x)
        return GlobalLayerNorm(self.out_channels, eps=1e-8)(x)


class LSTMLayer(nn.Module):
    """Uni/bidirectional single-layer LSTM over axis 1 of (B, T, C)."""

    hidden: int
    bidirectional: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.bidirectional:
            return nn.Bidirectional(
                nn.RNN(nn.OptimizedLSTMCell(self.hidden)),
                nn.RNN(nn.OptimizedLSTMCell(self.hidden)),
            )(x)
        return nn.RNN(nn.OptimizedLSTMCell(self.hidden))(x)


class ResRNN(nn.Module):
    """Residual norm→BLSTM→proj block (bsrnn.py:6-26). (B, T, C) → same."""

    input_size: int
    hidden_size: int
    bidirectional: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = GroupNorm1()(x)
        y = LSTMLayer(self.hidden_size, self.bidirectional)(y)
        y = nn.Dense(self.input_size)(y)
        return x + y


# --- dual-path chunking (dprnn.py:260-318 semantics, channel-last) ---------


def segment_sequence(x: jax.Array, chunk: int) -> tuple[jax.Array, int]:
    """(B, T, N) → (B, S, K, N) 50%-overlap chunks; returns (chunks, gap)."""
    b, t, n = x.shape
    p = chunk // 2
    gap = chunk - (p + t % chunk) % chunk
    if gap > 0:
        x = jnp.concatenate([x, jnp.zeros((b, gap, n), x.dtype)], axis=1)
    x = jnp.concatenate(
        [jnp.zeros((b, p, n), x.dtype), x, jnp.zeros((b, p, n), x.dtype)], axis=1
    )
    t_pad = x.shape[1]
    seg1 = x[:, : t_pad - p].reshape(b, -1, chunk, n)
    seg2 = x[:, p:].reshape(b, -1, chunk, n)
    out = jnp.stack([seg1, seg2], axis=2).reshape(b, -1, chunk, n)
    return out, gap


def overlap_add_sequence(x: jax.Array, gap: int) -> jax.Array:
    """(B, S, K, N) → (B, T, N): inverse of ``segment_sequence``."""
    b, s, k, n = x.shape
    p = k // 2
    x = x.reshape(b, -1, 2 * k, n)
    x1 = x[:, :, :k].reshape(b, -1, n)[:, p:]
    x2 = x[:, :, k:].reshape(b, -1, n)[:, :-p]
    out = x1 + x2
    if gap > 0:
        out = out[:, :-gap]
    return out


class DualRNNBlock(nn.Module):
    """Intra + inter RNN with projections, norms and residuals
    (dprnn.py:70-165). (B, S, K, N) → same."""

    out_channels: int
    hidden_channels: int
    bidirectional: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, s, k, n = x.shape
        # intra: RNN along K within each chunk
        intra = x.reshape(b * s, k, n)
        intra = LSTMLayer(self.hidden_channels, self.bidirectional)(intra)
        intra = nn.Dense(self.out_channels)(intra).reshape(b, s, k, n)
        intra = GroupNorm1()(intra)
        x = x + intra
        # inter: RNN along S across chunks
        inter = jnp.swapaxes(x, 1, 2).reshape(b * k, s, n)
        inter = LSTMLayer(self.hidden_channels, self.bidirectional)(inter)
        inter = nn.Dense(self.out_channels)(inter).reshape(b, k, s, n)
        inter = jnp.swapaxes(inter, 1, 2)
        inter = GroupNorm1()(inter)
        return x + inter
