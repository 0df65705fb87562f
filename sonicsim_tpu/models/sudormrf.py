"""SuDORMRF (successive down/up-sampling separation), flax/TPU-native.

Parity: separation/look2hear/models/sudormrf.py:159-330 — conv encoder
(k=21, stride k/2, pad k/2) → gLN + bottleneck → stack of U-ConvBlocks
(progressive stride-2 depthwise downsampling, nearest-×2 upsample-and-add)
→ PReLU+mask conv → ReLU masks × encoder features → one shared transposed
conv decoding all sources.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from .base import BaseModel, register_model
from .layers import GlobalLayerNorm, PReLU
from .zoo_layers import ConvNormAct, DilatedConvNorm, NormAct


def nearest_upsample_2x(x: jax.Array) -> jax.Array:
    """torch nn.Upsample(scale_factor=2, mode='nearest') on (B, T, C)."""
    return jnp.repeat(x, 2, axis=1)


def nearest_resize(x: jax.Array, size: int) -> jax.Array:
    """F.interpolate(mode='nearest') to a target length on (B, T, C)."""
    t = x.shape[1]
    idx = (jnp.arange(size) * t // size).astype(jnp.int32)
    return x[:, idx]


class UConvBlock(nn.Module):
    """sudormrf.py:159-217."""

    out_channels: int
    in_channels: int
    upsampling_depth: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, T, out_ch)
        residual = x
        y = ConvNormAct(self.in_channels, 1, name="proj_1x1")(x)
        levels = [
            DilatedConvNorm(
                self.in_channels, 5, stride=1, groups=self.in_channels, name="spp_0"
            )(y)
        ]
        for k in range(1, self.upsampling_depth):
            levels.append(
                DilatedConvNorm(
                    self.in_channels,
                    5,
                    stride=2,
                    groups=self.in_channels,
                    name=f"spp_{k}",
                )(levels[-1])
            )
        for _ in range(self.upsampling_depth - 1):
            up = nearest_upsample_2x(levels.pop(-1))
            levels[-1] = levels[-1] + up[:, : levels[-1].shape[1]]
        expanded = NormAct(self.in_channels, name="final_norm")(levels[-1])
        return nn.Conv(self.out_channels, (1,), name="res_conv")(expanded) + residual


@register_model
class SuDORMRF(BaseModel):
    out_channels: int = 128
    in_channels: int = 512
    num_blocks: int = 16
    upsampling_depth: int = 4
    enc_kernel_size: int = 21
    enc_num_basis: int = 512
    num_sources: int = 2
    sample_rate: int = 16000

    def _lcm(self) -> int:
        a = self.enc_kernel_size // 2
        b = 2**self.upsampling_depth
        return abs(a * b) // math.gcd(a, b)

    @nn.compact
    def __call__(self, wav: jax.Array) -> jax.Array:
        if wav.ndim == 1:
            wav = wav[None, :]
        nsample = wav.shape[-1]
        lcm = self._lcm()
        pad_to = (-nsample) % lcm
        x = jnp.pad(wav, ((0, 0), (0, pad_to)))[..., None]

        k = self.enc_kernel_size
        enc = nn.Conv(
            self.enc_num_basis,
            (k,),
            strides=(k // 2,),
            padding=[(k // 2, k // 2)],
            use_bias=False,
            name="encoder",
        )(x)  # (B, T', N)

        y = GlobalLayerNorm(self.enc_num_basis, name="ln")(enc)
        y = nn.Conv(self.out_channels, (1,), name="bottleneck")(y)
        for i in range(self.num_blocks):
            y = UConvBlock(
                self.out_channels, self.in_channels, self.upsampling_depth,
                name=f"sm_{i}",
            )(y)
        y = PReLU(name="mask_prelu")(y)
        m = nn.Conv(
            self.num_sources * self.enc_num_basis, (1,), name="mask_conv"
        )(y)
        bsz, t_enc, _ = m.shape
        m = jax.nn.relu(
            m.reshape(bsz, t_enc, self.num_sources, self.enc_num_basis)
        )
        masked = m * enc[:, :, None, :]  # (B, T', S, N)

        # Shared decoder over all sources (sudormrf.py:272-279): torch
        # ConvTranspose(in=S*N, out=S, stride=k/2, pad=k/2, outpad=k/2-1)
        # == VALID transpose then crop [pad : end-pad+outpad].
        flat = masked.reshape(bsz, t_enc, self.num_sources * self.enc_num_basis)
        dec = nn.ConvTranspose(
            self.num_sources,
            (k,),
            strides=(k // 2,),
            padding="VALID",
            use_bias=False,
            name="decoder",
        )(flat)  # (B, T'', S)
        full = dec.shape[1]
        dec = dec[:, k // 2 : full - k // 2 + (k // 2 - 1)]
        dec = jnp.swapaxes(dec, 1, 2)  # (B, S, T)
        dec = dec[..., :nsample]
        return jnp.pad(dec, ((0, 0), (0, 0), (0, nsample - dec.shape[-1])))
