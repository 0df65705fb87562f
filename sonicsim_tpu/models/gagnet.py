"""GaGNet (glance-and-gaze speech enhancement), flax/TPU-native.

Parity: enhancement/look2hear/models/gagnet.py:6-640 (config
enhancement/config/gagnet.yaml: U2 encoder, 64ch, d_feat 256, dilations
[1,2,5,9], p=2, q=3, causal, IN norm, fft 320/hop 160): RMS-normalized
input → magnitude-compressed (√mag) STFT → causal gated U²-encoder over
(time, freq) → q stacked Glance (real gain) + Gaze (complex residual)
modules refining the spectrum stage by stage. Returns the stage list
[(B, 2, F, T), ...] consumed by losses.gagnet.GaGNetLoss / gagnet_wav.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.stft import hann_window, stft
from .base import BaseModel, register_model


class ChannelPReLU(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", lambda k, s: jnp.full(s, 0.25), (self.dim,))
        return jnp.where(x >= 0, x, alpha * x)


class InstanceNorm(nn.Module):
    """torch InstanceNorm1d/2d: per-(B, C) stats over spatial dims;
    channel-last input (B, *spatial, C).

    ``affine=False`` carries no parameters — needed for TaylorSENet,
    whose NormSwitch passes ``affine`` positionally into torch's ``eps``
    slot (taylorsenet.py:29-33: ``nn.InstanceNorm2d(num_features,
    affine)``), leaving eps=1.0 and affine at its False default."""

    dim: int
    eps: float = 1e-5
    affine: bool = True

    @nn.compact
    def __call__(self, x):
        axes = tuple(range(1, x.ndim - 1))
        mu = x.mean(axis=axes, keepdims=True)
        var = x.var(axis=axes, keepdims=True)
        y = (x - mu) * jax.lax.rsqrt(var + self.eps)
        if not self.affine:
            return y
        gamma = self.param("scale", nn.initializers.ones, (self.dim,))
        beta = self.param("bias", nn.initializers.zeros, (self.dim,))
        return y * gamma + beta


class GateConv2d(nn.Module):
    """Causal-time gated conv (gagnet.py:545-571); (B, T, F, C)."""

    out_channels: int
    kernel: tuple[int, int]
    stride: tuple[int, int]

    @nn.compact
    def __call__(self, x):
        kt = self.kernel[0]
        if kt > 1:
            x = jnp.pad(x, ((0, 0), (kt - 1, 0), (0, 0), (0, 0)))
        y = nn.Conv(
            self.out_channels * 2, self.kernel, strides=self.stride,
            padding="VALID", name="conv",
        )(x)
        out, gate = jnp.split(y, 2, axis=-1)
        return out * jax.nn.sigmoid(gate)


class Conv2dUnit(nn.Module):
    """gagnet.py:501-517 / taylorsenet.py:731-757: freq-stride-2 conv with
    causal time padding when the time kernel > 1, + IN + PReLU."""

    dim: int
    kernel: tuple[int, int] = (1, 3)

    @nn.compact
    def __call__(self, x):
        kt = self.kernel[0]
        if kt > 1:
            x = jnp.pad(x, ((0, 0), (kt - 1, 0), (0, 0), (0, 0)))
        x = nn.Conv(
            self.dim, self.kernel, strides=(1, 2), padding="VALID", name="conv"
        )(x)
        x = InstanceNorm(self.dim, name="norm")(x)
        return ChannelPReLU(self.dim, name="prelu")(x)


class Deconv2dUnit(nn.Module):
    """gagnet.py:520-542 / taylorsenet.py:760-788: freq-stride-2 transposed
    conv, trailing-time chomp when the time kernel > 1, + IN + PReLU."""

    dim: int
    kernel: tuple[int, int] = (1, 3)

    @nn.compact
    def __call__(self, x):
        kt = self.kernel[0]
        x = nn.ConvTranspose(
            self.dim, self.kernel, strides=(1, 2), padding="VALID", name="deconv"
        )(x)
        if kt > 1:
            x = x[:, : x.shape[1] - (kt - 1)]
        x = InstanceNorm(self.dim, name="norm")(x)
        return ChannelPReLU(self.dim, name="prelu")(x)


class EnUnetModule(nn.Module):
    """gagnet.py:445-498: gated in-conv + small freq UNet with residual."""

    cout: int
    k1: tuple[int, int]
    k2: tuple[int, int]
    scale: int
    intra_connect: str = "cat"

    @nn.compact
    def __call__(self, x):
        x_resi = GateConv2d(self.cout, self.k1, (1, 2), name="in_conv_gate")(x)
        x_resi = InstanceNorm(self.cout, name="in_conv_norm")(x_resi)
        x_resi = ChannelPReLU(self.cout, name="in_conv_prelu")(x_resi)
        h = x_resi
        skips = []
        for i in range(self.scale):
            h = Conv2dUnit(self.cout, self.k2, name=f"enco_{i}")(h)
            skips.append(h)
        for i in range(self.scale):
            if i == 0:
                h = Deconv2dUnit(self.cout, self.k2, name=f"deco_{i}")(h)
            else:
                skip = skips[-(i + 1)]
                h = h[:, :, : skip.shape[2]]
                cat = (
                    h + skip
                    if self.intra_connect == "add"
                    else jnp.concatenate([h, skip], axis=-1)
                )
                h = Deconv2dUnit(self.cout, self.k2, name=f"deco_{i}")(cat)
        h = h[:, :, : x_resi.shape[2]]
        return x_resi + h


class SqueezedTCM(nn.Module):
    """gagnet.py:320-360: bottleneck dilated causal 1-D conv with residual."""

    kd1: int
    cd1: int
    d_feat: int
    dilation: int
    is_causal: bool = True

    @nn.compact
    def __call__(self, x):  # (B, T, d_feat)
        resi = x
        h = nn.Conv(self.cd1, (1,), use_bias=False, name="in_conv")(x)
        h = ChannelPReLU(self.cd1, name="d_prelu")(h)
        h = InstanceNorm(self.cd1, name="d_norm")(h)
        pad = (self.kd1 - 1) * self.dilation
        padding = [(pad, 0)] if self.is_causal else [(pad // 2, pad - pad // 2)]
        h = nn.Conv(
            self.cd1, (self.kd1,), kernel_dilation=(self.dilation,),
            padding=padding, use_bias=False, name="d_conv",
        )(h)
        h = ChannelPReLU(self.cd1, name="out_prelu")(h)
        h = InstanceNorm(self.cd1, name="out_norm")(h)
        h = nn.Conv(self.d_feat, (1,), use_bias=False, name="out_conv")(h)
        return h + resi


class TCNGroup(nn.Module):
    kd1: int
    cd1: int
    d_feat: int
    dilas: tuple[int, ...]
    is_causal: bool = True

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilas):
            x = SqueezedTCM(
                self.kd1, self.cd1, self.d_feat, d, self.is_causal, name=f"tcm_{i}"
            )(x)
        return x


class U2Encoder(nn.Module):
    """Shared causal gated U²-encoder (gagnet.py:362-399; also used by
    G2Net with 1- or 2-channel heads). (B, T, F, cin) → (B, T, F', 64)."""

    c: int = 64
    k1: tuple[int, int] = (2, 3)
    k2: tuple[int, int] = (1, 3)
    intra_connect: str = "cat"

    @nn.compact
    def __call__(self, x):
        for i, (k, scale) in enumerate(
            [((2, 5), 4), (self.k1, 3), (self.k1, 2), (self.k1, 1)]
        ):
            x = EnUnetModule(
                self.c, k, self.k2, scale, self.intra_connect, name=f"unet_{i}"
            )(x)
        x = GateConv2d(64, self.k1, (1, 2), name="last_gate")(x)
        x = InstanceNorm(64, name="last_norm")(x)
        return ChannelPReLU(64, name="last_prelu")(x)


class GlanceGazeModule(nn.Module):
    """gagnet.py:125-166 + Glance/Gaze blocks (:169-292)."""

    kd1: int
    cd1: int
    d_feat: int
    p: int
    dilas: tuple[int, ...]
    n_freq: int
    is_causal: bool
    acti_type: str

    @nn.compact
    def __call__(self, feat_x, pre_x):
        # feat_x: (B, T, d_feat); pre_x: (B, T, F, 2)
        b, t, f, _ = pre_x.shape
        pre_flat = jnp.swapaxes(pre_x, 2, 3).reshape(b, t, 2 * f)
        inpt = jnp.concatenate([feat_x, pre_flat], axis=-1)

        # Glance: real-valued gain.
        g = nn.Conv(self.d_feat, (1,), name="glance_main")(inpt) * jax.nn.sigmoid(
            nn.Conv(self.d_feat, (1,), name="glance_gate")(inpt)
        )
        for i in range(self.p):
            g = TCNGroup(
                self.kd1, self.cd1, self.d_feat, self.dilas, self.is_causal,
                name=f"glance_tcn_{i}",
            )(g)
        acti = {"sigmoid": jax.nn.sigmoid, "tanh": jnp.tanh, "relu": jax.nn.relu}[
            self.acti_type
        ]
        gain = acti(nn.Conv(self.n_freq, (1,), name="glance_linear")(g))  # (B,T,F)

        # Gaze: complex residual.
        z = nn.Conv(self.d_feat, (1,), name="gaze_main")(inpt) * jax.nn.sigmoid(
            nn.Conv(self.d_feat, (1,), name="gaze_gate")(inpt)
        )
        zr, zi = z, z
        for i in range(self.p):
            zr = TCNGroup(
                self.kd1, self.cd1, self.d_feat, self.dilas, self.is_causal,
                name=f"gaze_tcn_r_{i}",
            )(zr)
            zi = TCNGroup(
                self.kd1, self.cd1, self.d_feat, self.dilas, self.is_causal,
                name=f"gaze_tcn_i_{i}",
            )(zi)
        res_r = nn.Conv(self.n_freq, (1,), name="gaze_linear_r")(zr)
        res_i = nn.Conv(self.n_freq, (1,), name="gaze_linear_i")(zi)

        pre_mag = jnp.linalg.norm(pre_x, axis=-1)  # (B,T,F)
        pre_phase = jnp.arctan2(pre_x[..., 1], pre_x[..., 0])
        filtered = pre_mag * gain
        coarse = jnp.stack(
            [filtered * jnp.cos(pre_phase), filtered * jnp.sin(pre_phase)], axis=-1
        )
        return coarse + jnp.stack([res_r, res_i], axis=-1)  # (B,T,F,2)


@register_model
class GaGNet(BaseModel):
    cin: int = 2
    k1: tuple[int, int] = (2, 3)
    k2: tuple[int, int] = (1, 3)
    c: int = 64
    kd1: int = 3
    cd1: int = 64
    d_feat: int = 256
    p: int = 2
    q: int = 3
    dilas: tuple[int, ...] = (1, 2, 5, 9)
    fft_num: int = 320
    is_u2: bool = True
    is_causal: bool = True
    is_squeezed: bool = False
    acti_type: str = "sigmoid"
    intra_connect: str = "cat"
    norm_type: str = "IN"
    n_fft: int = 320
    hop_length: int = 160
    win_length: int = 320
    sample_rate: int = 16000

    @nn.compact
    def __call__(self, wav: jax.Array) -> list:
        if wav.ndim == 1:
            wav = wav[None, :]
        t_len = wav.shape[-1]
        # RMS normalization (gagnet.py:88-89).
        c_norm = jnp.sqrt(t_len / jnp.sum(wav**2, axis=-1, keepdims=True))
        wav = wav * c_norm

        spec = stft(wav, self.fft_num, self.hop_length, hann_window(self.fft_num))
        spec = jnp.swapaxes(spec, 1, 2)  # (B, T, F)
        mag = jnp.sqrt(jnp.abs(spec))  # magnitude compression ^0.5
        phase = jnp.arctan2(spec.imag, spec.real)
        x = jnp.stack([mag * jnp.cos(phase), mag * jnp.sin(phase)], axis=-1)
        n_freq = x.shape[2]

        # U2 / UNet encoder (gagnet.py:362-442).
        h = x
        if self.is_u2:
            h = U2Encoder(self.c, self.k1, self.k2, self.intra_connect, name="en")(h)
        else:
            for i, k in enumerate([(2, 5)] + [self.k1] * 4):
                h = GateConv2d(
                    64 if i == 4 else self.c, k, (1, 2), name=f"unet_{i}_gate"
                )(h)
                h = InstanceNorm(64 if i == 4 else self.c, name=f"unet_{i}_norm")(h)
                h = ChannelPReLU(64 if i == 4 else self.c, name=f"unet_{i}_prelu")(h)

        b, t_frames, f_down, c_enc = h.shape
        # torch flattens (C, F) channel-major (gagnet.py:112-113).
        feat_x = jnp.swapaxes(h, 2, 3).reshape(b, t_frames, c_enc * f_down)
        if feat_x.shape[-1] != self.d_feat:
            raise ValueError(
                f"encoder feature dim {feat_x.shape[-1]} != d_feat {self.d_feat}"
            )

        pre_x = x  # (B, T, F, 2)
        outs = []
        for i in range(self.q):
            pre_x = GlanceGazeModule(
                self.kd1, self.cd1, self.d_feat, self.p, self.dilas, n_freq,
                self.is_causal, self.acti_type, name=f"gag_{i}",
            )(feat_x, pre_x)
            # Emit reference layout (B, 2, F, T) for loss parity.
            outs.append(jnp.transpose(pre_x, (0, 3, 2, 1)))
            pre_x = jnp.transpose(outs[-1], (0, 3, 2, 1))
        return outs
