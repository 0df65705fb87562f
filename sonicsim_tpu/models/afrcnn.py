"""AFRCNN (asynchronous fully-recurrent convolutional network), flax.

Parity: separation/look2hear/models/afrcnn.py:157-366 — same front/back end
as SuDORMRF; the separator is one shared multi-scale fusion block applied
recurrently ``num_blocks`` times with a gated re-injection of the bottleneck
features (Recurrent, afrcnn.py:238-262).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from .base import BaseModel, register_model
from .layers import GlobalLayerNorm, GroupedConv1D, PReLU
from .sudormrf import nearest_resize
from .zoo_layers import ConvNormAct, DilatedConvNorm


class FusionBlock(nn.Module):
    """Multi-scale downsample + neighbor fusion block (afrcnn.py:157-237)."""

    out_channels: int
    in_channels: int
    upsampling_depth: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
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
                    self.in_channels, 5, stride=2, groups=self.in_channels,
                    name=f"spp_{k}",
                )(levels[-1])
            )
        fused = []
        for i in range(self.upsampling_depth):
            parts = []
            if i - 1 >= 0:
                parts.append(
                    DilatedConvNorm(
                        self.in_channels, 5, stride=2, groups=self.in_channels,
                        name=f"fuse_{i}_down",
                    )(levels[i - 1])[:, : levels[i].shape[1]]
                )
            parts.append(levels[i])
            if i + 1 < self.upsampling_depth:
                parts.append(nearest_resize(levels[i + 1], levels[i].shape[1]))
            cat = jnp.concatenate(parts, axis=-1)
            fused.append(
                ConvNormAct(self.in_channels, 1, name=f"concat_{i}")(cat)
            )
        top_len = levels[0].shape[1]
        fused = [fused[0]] + [nearest_resize(f, top_len) for f in fused[1:]]
        concat = ConvNormAct(self.in_channels, 1, name="last_layer")(
            jnp.concatenate(fused, axis=-1)
        )
        return nn.Conv(self.out_channels, (1,), name="res_conv")(concat) + residual


@register_model
class AFRCNN(BaseModel):
    out_channels: int = 128
    in_channels: int = 512
    num_blocks: int = 16
    upsampling_depth: int = 4
    enc_kernel_size: int = 21
    enc_num_basis: int = 512
    num_sources: int = 2
    sample_rate: int = 16000

    @nn.compact
    def __call__(self, wav: jax.Array) -> jax.Array:
        if wav.ndim == 1:
            wav = wav[None, :]
        nsample = wav.shape[-1]
        a = self.enc_kernel_size // 2
        b = 2**self.upsampling_depth
        lcm = abs(a * b) // math.gcd(a, b)
        x = jnp.pad(wav, ((0, 0), (0, (-nsample) % lcm)))[..., None]

        k = self.enc_kernel_size
        enc = nn.Conv(
            self.enc_num_basis, (k,), strides=(k // 2,),
            padding=[(k // 2, k // 2)], use_bias=False, name="encoder",
        )(x)
        y0 = nn.Conv(self.out_channels, (1,), name="bottleneck")(
            GlobalLayerNorm(self.enc_num_basis, name="ln")(enc)
        )

        # Shared recurrent fusion block (afrcnn.py:238-262): one set of
        # parameters applied num_blocks times.
        block = FusionBlock(
            self.out_channels, self.in_channels, self.upsampling_depth, name="blocks"
        )
        concat_conv = GroupedConv1D(
            self.out_channels, (1,), feature_group_count=self.out_channels,
            padding=[(0, 0)], name="concat_conv",
        )
        concat_prelu = PReLU(name="concat_prelu")
        y = block(y0)
        for _ in range(1, self.num_blocks):
            y = block(concat_prelu(concat_conv(y0 + y)))

        m = nn.Conv(
            self.num_sources * self.enc_num_basis, (1,), name="mask_conv"
        )(PReLU(name="mask_prelu")(y))
        bsz, t_enc, _ = m.shape
        m = jax.nn.relu(m.reshape(bsz, t_enc, self.num_sources, self.enc_num_basis))
        masked = (m * enc[:, :, None, :]).reshape(
            bsz, t_enc, self.num_sources * self.enc_num_basis
        )
        dec = nn.ConvTranspose(
            self.num_sources, (k,), strides=(k // 2,), padding="VALID",
            use_bias=False, name="decoder",
        )(masked)
        full = dec.shape[1]
        dec = dec[:, k // 2 : full - k // 2 + (k // 2 - 1)]
        dec = jnp.swapaxes(dec, 1, 2)[..., :nsample]
        return jnp.pad(dec, ((0, 0), (0, 0), (0, nsample - dec.shape[-1])))
