"""TaylorSENet (Taylor-expansion speech enhancement), flax/TPU-native.

Parity: enhancement/look2hear/models/taylorsenet.py:220-850 (config
enhancement/config/taylorsenet.yaml: U2 encoder/decoder, 64ch, d_feat 256,
dilations [1,2,5,9], p=2, 3 orders, causal, IN): the enhanced spectrum is
modeled as a Taylor series — a zero-order magnitude gain from a gated
U²-UNet with decoder, plus ``order_num`` complex high-order residual terms
(TCM stacks over fused features) accumulated as
out += (H(feat, pre) + k*pre) / (k+1)!.

Output: (B, 2, T, F) compressed-domain spectrum for
losses.taylorsenet.TaylorSENetLoss / taylor_wav.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.stft import hann_window, stft
from .base import BaseModel, register_model
from .g2net import GatedTCNList
from .gagnet import ChannelPReLU, GateConv2d, InstanceNorm


class Conv2dUnitT(nn.Module):
    """taylorsenet.py:731-757: conv unit with CAUSAL time padding when
    k_t > 1 (k2=(2,3) in the released config) — unlike GaGNet's unit."""

    dim: int
    kernel: tuple[int, int]

    @nn.compact
    def __call__(self, x):  # (B, T, F, C)
        kt = self.kernel[0]
        if kt > 1:
            x = jnp.pad(x, ((0, 0), (kt - 1, 0), (0, 0), (0, 0)))
        x = nn.Conv(
            self.dim, self.kernel, strides=(1, 2), padding="VALID", name="conv"
        )(x)
        x = InstanceNorm(self.dim, eps=1.0, affine=False, name="norm")(x)
        return ChannelPReLU(self.dim, name="prelu")(x)


class Deconv2dUnitT(nn.Module):
    """taylorsenet.py:760-793: transposed conv unit, trailing-time chomp."""

    dim: int
    kernel: tuple[int, int]

    @nn.compact
    def __call__(self, x):
        kt = self.kernel[0]
        x = nn.ConvTranspose(
            self.dim, self.kernel, strides=(1, 2), padding="VALID",
            name="deconv",
        )(x)
        if kt > 1:
            x = x[:, : x.shape[1] - (kt - 1)]
        x = InstanceNorm(self.dim, eps=1.0, affine=False, name="norm")(x)
        return ChannelPReLU(self.dim, name="prelu")(x)


class GateConvTranspose2d(nn.Module):
    """taylorsenet.py:823-850: gated transposed conv, trailing-time chomp."""

    out_channels: int
    kernel: tuple[int, int]
    stride: tuple[int, int] = (1, 2)

    @nn.compact
    def __call__(self, x):
        kt = self.kernel[0]
        y = nn.ConvTranspose(
            self.out_channels * 2, self.kernel, strides=self.stride,
            padding="VALID", name="conv",
        )(x)
        if kt > 1:
            y = y[:, : y.shape[1] - (kt - 1)]
        out, gate = jnp.split(y, 2, axis=-1)
        return out * jax.nn.sigmoid(gate)


class EnUnetModuleT(nn.Module):
    """taylorsenet.py:672-729: En_unet_module with encoder/decoder in-conv."""

    cout: int
    k1: tuple[int, int]
    k2: tuple[int, int]
    scale: int
    intra_connect: str = "cat"
    de_flag: bool = False

    @nn.compact
    def __call__(self, x):
        if self.de_flag:
            x_resi = GateConvTranspose2d(self.cout, self.k1, name="in_conv_gate")(x)
        else:
            x_resi = GateConv2d(self.cout, self.k1, (1, 2), name="in_conv_gate")(x)
        x_resi = InstanceNorm(self.cout, eps=1.0, affine=False,
                              name="in_conv_norm")(x_resi)
        x_resi = ChannelPReLU(self.cout, name="in_conv_prelu")(x_resi)
        h = x_resi
        skips = []
        for i in range(self.scale):
            h = Conv2dUnitT(self.cout, self.k2, name=f"enco_{i}")(h)
            skips.append(h)
        for i in range(self.scale):
            if i == 0:
                h = Deconv2dUnitT(self.cout, self.k2, name=f"deco_{i}")(h)
            else:
                skip = skips[-(i + 1)]
                h = h[:, :, : skip.shape[2]]
                cat = (
                    h + skip
                    if self.intra_connect == "add"
                    else jnp.concatenate([h, skip], axis=-1)
                )
                h = Deconv2dUnitT(self.cout, self.k2, name=f"deco_{i}")(cat)
        h = h[:, :, : x_resi.shape[2]]
        return x_resi + h


class U2NetEncoderT(nn.Module):
    """taylorsenet.py:564-607: returns (bottom features, per-stage skips)."""

    c: int
    k1: tuple[int, int]
    k2: tuple[int, int]
    intra_connect: str = "cat"

    @nn.compact
    def __call__(self, x):
        skips = []
        for i, (k, scale) in enumerate(
            [((1, 5), 4), (self.k1, 3), (self.k1, 2), (self.k1, 1)]
        ):  # kernel_begin (1,5): taylorsenet.py:581
            x = EnUnetModuleT(
                self.c, k, self.k2, scale, self.intra_connect, name=f"unet_{i}"
            )(x)
            skips.append(x)
        x = GateConv2d(64, self.k1, (1, 2), name="last_gate")(x)
        x = InstanceNorm(64, eps=1.0, affine=False, name="last_norm")(x)
        x = ChannelPReLU(64, name="last_prelu")(x)
        skips.append(x)
        return x, skips


class U2NetDecoderT(nn.Module):
    """taylorsenet.py:609-670 ('cat' inter-connect): mirror decoder → gain."""

    c: int
    k1: tuple[int, int]
    k2: tuple[int, int]
    intra_connect: str = "cat"

    @nn.compact
    def __call__(self, x, skips):
        # skips = [stage0 … stage3, bottom]; first cat pairs the processed
        # bottom with the raw bottom (taylorsenet.py:656-668, 'cat' path).
        for i, scale in enumerate([1, 2, 3, 4]):
            skip = skips[-(i + 1)]
            x = x[:, :, : skip.shape[2]]
            tmp = jnp.concatenate([x, skip], axis=-1)
            x = EnUnetModuleT(
                self.c, self.k1, self.k2, scale, self.intra_connect,
                de_flag=True, name=f"unet_{i}",
            )(tmp)
        x = x[:, :, : skips[0].shape[2]]
        x = jnp.concatenate([x, skips[0]], axis=-1)
        x = GateConvTranspose2d(16, (1, 5), name="last_gate")(x)
        x = InstanceNorm(16, eps=1.0, affine=False, name="last_norm")(x)
        x = ChannelPReLU(16, name="last_prelu")(x)
        x = nn.Conv(1, (1, 1), name="last_conv")(x)
        return jax.nn.sigmoid(x)[..., 0]  # (B, T, F')


@register_model
class TaylorSENet(BaseModel):
    cin: int = 2
    k1: tuple[int, int] = (1, 3)
    k2: tuple[int, int] = (2, 3)
    c: int = 64
    kd1: int = 5
    cd1: int = 64
    d_feat: int = 256
    dilations: tuple[int, ...] = (1, 2, 5, 9)
    p: int = 2
    fft_num: int = 320
    order_num: int = 3
    n_fft: int = 320
    hop_length: int = 160
    win_length: int = 320
    intra_connect: str = "cat"
    inter_connect: str = "cat"
    norm_type: str = "IN"
    is_causal: bool = True
    is_u2: bool = True
    is_param_share: bool = False
    is_encoder_share: bool = False
    sample_rate: int = 16000

    @nn.compact
    def __call__(self, wav: jax.Array) -> jax.Array:
        if wav.ndim == 1:
            wav = wav[None, :]
        t_len = wav.shape[-1]
        c_norm = jnp.sqrt(t_len / jnp.sum(wav**2, axis=-1, keepdims=True))
        wav = wav * c_norm

        spec = stft(wav, self.fft_num, self.hop_length, hann_window(self.fft_num))
        spec = jnp.swapaxes(spec, 1, 2)  # (B, T, F)
        mag = jnp.sqrt(jnp.abs(spec))
        phase = jnp.arctan2(spec.imag, spec.real)
        x_ri = jnp.stack([mag * jnp.cos(phase), mag * jnp.sin(phase)], axis=-1)

        # Zero-order: magnitude gain via U2 encoder+decoder with TCM middle.
        en_x, en_skips = U2NetEncoderT(
            self.c, self.k1, self.k2, self.intra_connect, name="zero_en"
        )(mag[..., None])
        b, t_fr, f_dn, c_enc = en_x.shape
        # torch flattens (C, F) channel-major (taylorsenet.py:394-396)
        feat = jnp.swapaxes(en_x, 2, 3).reshape(b, t_fr, c_enc * f_dn)
        for i in range(self.p):
            feat = GatedTCNList(
                self.kd1, self.cd1, self.d_feat, self.dilations, self.is_causal,
                norm_eps=1.0, norm_affine=False, name=f"zero_tcm_{i}",
            )(feat)
        mid = jnp.swapaxes(feat.reshape(b, t_fr, c_enc, f_dn), 2, 3)
        gain = U2NetDecoderT(
            self.c, self.k1, self.k2, self.intra_connect, name="zero_de"
        )(mid, en_skips)  # skips include the bottom (taylorsenet.py:599-606)
        gain = gain[:, :, : mag.shape[2]]
        if gain.shape[2] < mag.shape[2]:
            gain = jnp.pad(gain, ((0, 0), (0, 0), (0, mag.shape[2] - gain.shape[2])))
        zero_mag = gain * mag
        zero_term = jnp.stack(
            [zero_mag * jnp.cos(phase), zero_mag * jnp.sin(phase)], axis=1
        )  # (B, 2, T, F)

        # Separate encoder over RI input feeds the high-order blocks.
        en2, _ = U2NetEncoderT(
            self.c, self.k1, self.k2, self.intra_connect, name="separate_en"
        )(x_ri)
        feat_head = jnp.swapaxes(en2, 2, 3).reshape(b, t_fr, -1)
        if feat_head.shape[-1] != self.d_feat:
            raise ValueError("encoder feature dim mismatch with d_feat")

        n_freq = mag.shape[2]
        out_term, pre_term = zero_term, zero_term
        for order in range(self.order_num):
            # (B,2,T,F) → (B,T,2F) with the 2 (RI) axis outer, F inner —
            # matches torch's view(B, 2F, T) channel order.
            pre_flat = jnp.transpose(pre_term, (0, 2, 1, 3)).reshape(b, t_fr, 2 * n_freq)
            h = jnp.concatenate([feat_head, pre_flat], axis=-1)
            h = nn.Conv(self.d_feat, (1,), name=f"ho_{order}_in")(h)
            for i in range(self.p):
                h = GatedTCNList(
                    self.kd1, self.cd1, self.d_feat, self.dilations,
                    self.is_causal, norm_eps=1.0, norm_affine=False,
                    name=f"ho_{order}_tcm_{i}",
                )(h)
            xr = nn.Conv(n_freq, (1,), name=f"ho_{order}_r")(h)  # (B, T, F)
            xi = nn.Conv(n_freq, (1,), name=f"ho_{order}_i")(h)
            update = jnp.stack([xr, xi], axis=1) + order * pre_term
            pre_term = update
            out_term = out_term + update / math.factorial(order + 1)
        return out_term  # (B, 2, T, F)
