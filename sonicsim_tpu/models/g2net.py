"""G2Net (glance-and-gaze v2 enhancement), flax/TPU-native.

Parity: enhancement/look2hear/models/g2net.py:7-520 (config
enhancement/config/g2net.yaml: RI+MAG dual U² heads, d_feat 256, 2 TCN
lists per branch, dilations [1,2,5,9], 3 stages, crm1, causal, fft 320/
hop 160): compressed STFT → separate U² encoders over RI and magnitude →
stages of Glance (magnitude gain from TCN accumulation) + Gaze (complex
residual) refinement. Returns the stage list [(B, 2, F, T), ...] — same
contract as GaGNet, scored by losses.gagnet.GaGNetLoss/Eval.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.stft import hann_window, stft
from .base import BaseModel, register_model
from .gagnet import ChannelPReLU, InstanceNorm, U2Encoder


class GatedSqueezedTCM(nn.Module):
    """g2net.py:356-402: squeezed TCM whose dilated conv is GATED
    (dd_conv_main * sigmoid(dd_conv_gate)) — distinct from GaGNet's
    ungated SqueezedTCM."""

    kd1: int
    cd1: int
    d_feat: int
    dilation: int
    is_causal: bool = True
    # TaylorSENet reuses this block but its NormSwitch INs are paramless
    # with eps=1.0 (taylorsenet.py:29-33 passes affine into torch's eps)
    norm_eps: float = 1e-5
    norm_affine: bool = True

    @nn.compact
    def __call__(self, x):  # (B, T, d_feat)
        h = nn.Conv(self.cd1, (1,), use_bias=False, name="in_conv")(x)
        d = (self.kd1 - 1) * self.dilation
        padding = [(d, 0)] if self.is_causal else [(d // 2, d - d // 2)]

        def norm(z, tag):
            return InstanceNorm(self.cd1, eps=self.norm_eps,
                                affine=self.norm_affine, name=tag)(z)

        def branch(z, tag):
            z = ChannelPReLU(self.cd1, name=f"{tag}_prelu")(z)
            z = norm(z, f"{tag}_norm")
            return nn.Conv(
                self.cd1, (self.kd1,), kernel_dilation=(self.dilation,),
                padding=padding, use_bias=False, name=f"{tag}_conv",
            )(z)

        h = branch(h, "main") * jax.nn.sigmoid(branch(h, "gate"))
        h = ChannelPReLU(self.cd1, name="out_prelu")(h)
        h = norm(h, "out_norm")
        h = nn.Conv(self.d_feat, (1,), use_bias=False, name="out_conv")(h)
        return x + h


class GatedTCNList(nn.Module):
    """SqueezedTCNList (g2net.py:336-354)."""

    kd1: int
    cd1: int
    d_feat: int
    dilas: tuple[int, ...]
    is_causal: bool = True
    norm_eps: float = 1e-5
    norm_affine: bool = True

    @nn.compact
    def __call__(self, x):
        for j, d in enumerate(self.dilas):
            x = GatedSqueezedTCM(
                self.kd1, self.cd1, self.d_feat, d, self.is_causal,
                norm_eps=self.norm_eps, norm_affine=self.norm_affine,
                name=f"tcm_{j}",
            )(x)
        return x


class G2GGModule(nn.Module):
    """g2net.py:152-208 + branches (:210-333), crm1 combination."""

    d_feat: int
    kd1: int
    cd1: int
    tcn_num: int
    dilas: tuple[int, ...]
    n_freq: int
    is_causal: bool
    acti_type: str
    head_feat: int  # d_feat or 2*d_feat depending on head_type

    @nn.compact
    def __call__(self, feat_x, pre_x):
        # feat_x: (B, T, head_feat); pre_x: (B, T, F, 2)
        b, t, f, _ = pre_x.shape
        pre_mag = jnp.linalg.norm(pre_x, axis=-1)  # (B, T, F)
        pre_phase = jnp.arctan2(pre_x[..., 1], pre_x[..., 0])
        pre_com = jnp.transpose(pre_x, (0, 1, 3, 2)).reshape(b, t, 2 * f)

        # Glance: magnitude gain with accumulated TCN outputs.
        g = nn.Conv(self.d_feat, (1,), name="glance_in")(
            jnp.concatenate([feat_x, pre_mag], axis=-1)
        )
        acc = jnp.zeros_like(g)
        for i in range(self.tcn_num):
            g = GatedTCNList(
                self.kd1, self.cd1, self.d_feat, self.dilas, self.is_causal,
                name=f"glance_tcn_{i}",
            )(g)
            acc = acc + g
        acti = {"sigmoid": jax.nn.sigmoid, "tanh": jnp.tanh, "relu": jax.nn.relu}[
            self.acti_type
        ]
        gain = acti(nn.Conv(self.n_freq, (1,), name="glance_linear")(acc))

        # Gaze: complex residual with accumulated dual TCNs.
        z_in = jnp.concatenate([feat_x, pre_com], axis=-1)
        zr = nn.Conv(self.d_feat, (1,), name="gaze_in_r")(z_in)
        zi = nn.Conv(self.d_feat, (1,), name="gaze_in_i")(z_in)
        acc_r = jnp.zeros_like(zr)
        acc_i = jnp.zeros_like(zi)
        for i in range(self.tcn_num):
            zr = GatedTCNList(
                self.kd1, self.cd1, self.d_feat, self.dilas, self.is_causal,
                name=f"gaze_tcn_r_{i}",
            )(zr)
            zi = GatedTCNList(
                self.kd1, self.cd1, self.d_feat, self.dilas, self.is_causal,
                name=f"gaze_tcn_i_{i}",
            )(zi)
            acc_r = acc_r + zr
            acc_i = acc_i + zi
        res_r = nn.Dense(self.n_freq, name="gaze_linear_r")(acc_r)
        res_i = nn.Dense(self.n_freq, name="gaze_linear_i")(acc_i)

        x_mag = pre_mag * gain  # crm1 (g2net.py:197-200)
        out_r = x_mag * jnp.cos(pre_phase) + res_r
        out_i = x_mag * jnp.sin(pre_phase) + res_i
        return jnp.stack([out_r, out_i], axis=-1)  # (B, T, F, 2)


@register_model
class G2Net(BaseModel):
    k1: tuple[int, int] = (2, 3)
    k2: tuple[int, int] = (1, 3)
    c: int = 64
    intra_connect: str = "cat"
    d_feat: int = 256
    kd1: int = 3
    cd1: int = 64
    tcn_num: int = 2
    dilas: tuple[int, ...] = (1, 2, 5, 9)
    fft_num: int = 320
    is_causal: bool = True
    acti_type: str = "sigmoid"
    crm_type: str = "crm1"
    stage_num: int = 3
    u_type: str = "u2"
    head_type: str = "RI+MAG"
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
        c_norm = jnp.sqrt(t_len / jnp.sum(wav**2, axis=-1, keepdims=True))
        wav = wav * c_norm

        spec = stft(wav, self.fft_num, self.hop_length, hann_window(self.fft_num))
        spec = jnp.swapaxes(spec, 1, 2)  # (B, T, F)
        mag = jnp.sqrt(jnp.abs(spec))
        phase = jnp.arctan2(spec.imag, spec.real)
        x_ri = jnp.stack([mag * jnp.cos(phase), mag * jnp.sin(phase)], axis=-1)
        n_freq = x_ri.shape[2]

        heads = []
        if "RI" in self.head_type:
            ri = U2Encoder(self.c, self.k1, self.k2, self.intra_connect, name="ri_en")(
                x_ri
            )
            # torch flattens (C, F) channel-major (g2net.py:121-131).
            heads.append(
                jnp.swapaxes(ri, 2, 3).reshape(ri.shape[0], ri.shape[1], -1)
            )
        if "MAG" in self.head_type:
            mg = U2Encoder(self.c, self.k1, self.k2, self.intra_connect, name="mag_en")(
                mag[..., None]
            )
            heads.append(
                jnp.swapaxes(mg, 2, 3).reshape(mg.shape[0], mg.shape[1], -1)
            )
        feat_x = jnp.concatenate(heads, axis=-1)

        pre_x = x_ri
        outs = []
        for i in range(self.stage_num):
            pre_x = G2GGModule(
                self.d_feat, self.kd1, self.cd1, self.tcn_num, self.dilas,
                n_freq, self.is_causal, self.acti_type, feat_x.shape[-1],
                name=f"ggm_{i}",
            )(feat_x, pre_x)
            outs.append(jnp.transpose(pre_x, (0, 3, 2, 1)))  # (B, 2, F, T)
        return outs
