"""FRCRN (frequency-recurrent CRN with complex FSMNs), flax/TPU-native.

Parity: enhancement/look2hear/models/frcrn.py:12-540 + complex_nn.py
(config enhancement/config/frcrn.yaml: complex, complexity 45, depth 14,
win 640 / hop 320 / fft 640): conv-STFT → two cascaded complex UNets
(7 freq-stride-2 complex conv layers with SE attention and per-stage
frequency-direction complex FSMNs, complex FSMN bottleneck over time) →
two tanh complex masks (the second refines the first) → masked spectra +
waveforms. Returns the reference tuple
``(inputs, [est_spec1, est_wav1, est_mask1, est_spec2, est_wav2, est_mask2])``
consumed by losses.frcrn.FRCRNLoss/Eval.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .base import BaseModel, register_model
from .dccrn import conv_istft, conv_stft
from .layers import GroupedConv1D
from .zoo_layers import StatelessBatchNorm

# model_depth=14 layer tables (frcrn.py:323-346).
ENC_KERNELS = [(5, 2)] * 6 + [(2, 2)]
DEC_KERNELS = [(2, 2), (5, 2), (5, 2), (5, 2), (6, 2), (5, 2), (5, 2)]
PADDINGS = [(0, 1)] * 7  # (freq, time), symmetric


class UniDeepFsmn(nn.Module):
    """complex_nn.py:57-95: residual causal depthwise memory over the
    sequence axis; (N, T, in_dim) → same."""

    input_dim: int
    output_dim: int
    lorder: int = 20
    hidden_size: int = 128

    @nn.compact
    def __call__(self, x):
        f1 = jax.nn.relu(nn.Dense(self.hidden_size, name="linear")(x))
        p1 = nn.Dense(self.output_dim, use_bias=False, name="project")(f1)
        y = jnp.pad(p1, ((0, 0), (self.lorder - 1, 0), (0, 0)))
        mem = GroupedConv1D(
            self.output_dim, (self.lorder,), padding="VALID",
            feature_group_count=self.output_dim, use_bias=False, name="conv1",
        )(y)
        return x + (p1 + mem)


class ComplexFSMN(nn.Module):
    """ComplexUniDeepFsmn (complex_nn.py:202-241): two complex FSMN layers
    over the time axis. Input (re, im) each (B, F, T, C)."""

    dim: int = 128

    @nn.compact
    def __call__(self, re, im):
        b, f, t, c = re.shape
        rr = jnp.swapaxes(re, 1, 2).reshape(b, t, f * c)
        ii = jnp.swapaxes(im, 1, 2).reshape(b, t, f * c)
        l1_r = UniDeepFsmn(self.dim, self.dim, name="re_L1")
        l1_i = UniDeepFsmn(self.dim, self.dim, name="im_L1")
        real1 = l1_r(rr) - l1_i(ii)
        imag1 = l1_r(ii) + l1_i(rr)
        l2_r = UniDeepFsmn(self.dim, self.dim, name="re_L2")
        l2_i = UniDeepFsmn(self.dim, self.dim, name="im_L2")
        real = l2_r(real1) - l2_i(imag1)
        imag = l2_r(imag1) + l2_i(real1)
        real = jnp.swapaxes(real.reshape(b, t, f, c), 1, 2)
        imag = jnp.swapaxes(imag.reshape(b, t, f, c), 1, 2)
        return real, imag


class ComplexFSMNFreq(nn.Module):
    """ComplexUniDeepFsmn_L1 (complex_nn.py:243-268): one complex FSMN layer
    along the *frequency* axis per frame. Input (re, im) each (B, F, T, C)."""

    dim: int = 128

    @nn.compact
    def __call__(self, re, im):
        b, f, t, c = re.shape
        rr = jnp.swapaxes(re, 1, 2).reshape(b * t, f, c)
        ii = jnp.swapaxes(im, 1, 2).reshape(b * t, f, c)
        l_r = UniDeepFsmn(self.dim, self.dim, name="re_L1")
        l_i = UniDeepFsmn(self.dim, self.dim, name="im_L1")
        real = l_r(rr) - l_i(ii)
        imag = l_r(ii) + l_i(rr)
        real = jnp.swapaxes(real.reshape(b, t, f, c), 1, 2)
        imag = jnp.swapaxes(imag.reshape(b, t, f, c), 1, 2)
        return real, imag


class SELayer(nn.Module):
    """Complex squeeze-excitation (frcrn.py:12-33)."""

    channel: int
    reduction: int = 8

    @nn.compact
    def __call__(self, re, im):
        fr1 = nn.Dense(self.channel // self.reduction, name="fc_r_1")
        fr2 = nn.Dense(self.channel, name="fc_r_2")
        fi1 = nn.Dense(self.channel // self.reduction, name="fc_i_1")
        fi2 = nn.Dense(self.channel, name="fc_i_2")

        def fr(v):
            return jax.nn.sigmoid(fr2(jax.nn.relu(fr1(v))))

        def fi(v):
            return jax.nn.sigmoid(fi2(jax.nn.relu(fi1(v))))

        xr = re.mean(axis=(1, 2))  # (B, C)
        xi = im.mean(axis=(1, 2))
        yr = fr(xr) - fi(xi)
        yi = fr(xi) + fi(xr)
        return re * yr[:, None, None, :], im * yi[:, None, None, :]


class ComplexEncoderLayer(nn.Module):
    out_channels: int
    kernel: tuple[int, int]
    pad: tuple[int, int]
    torch_compat: bool = False

    @nn.compact
    def __call__(self, re, im):
        def p(z):
            return jnp.pad(
                z,
                ((0, 0), (self.pad[0], self.pad[0]), (self.pad[1], self.pad[1]),
                 (0, 0)),
            )

        cr = nn.Conv(self.out_channels, self.kernel, strides=(2, 1),
                     padding="VALID", name="conv_re")
        ci = nn.Conv(self.out_channels, self.kernel, strides=(2, 1),
                     padding="VALID", name="conv_im")
        rr = cr(p(re)) - ci(p(im))
        ii = cr(p(im)) + ci(p(re))
        rr = StatelessBatchNorm(
            self.out_channels, use_running_stats=self.torch_compat,
            name="bn_re")(rr)
        ii = StatelessBatchNorm(
            self.out_channels, use_running_stats=self.torch_compat,
            name="bn_im")(ii)
        return jax.nn.leaky_relu(rr, 0.01), jax.nn.leaky_relu(ii, 0.01)


class ComplexDecoderLayer(nn.Module):
    out_channels: int
    kernel: tuple[int, int]
    pad: tuple[int, int]
    torch_compat: bool = False

    @nn.compact
    def __call__(self, re, im):
        cr = nn.ConvTranspose(self.out_channels, self.kernel, strides=(2, 1),
                              padding="VALID", name="conv_re")
        ci = nn.ConvTranspose(self.out_channels, self.kernel, strides=(2, 1),
                              padding="VALID", name="conv_im")

        def crop(z):
            pf, pt = self.pad
            f_end = z.shape[1] - pf if pf else None
            t_end = z.shape[2] - pt if pt else None
            return z[:, pf:f_end, pt:t_end]

        rr = crop(cr(re) - ci(im))
        ii = crop(cr(im) + ci(re))
        rr = StatelessBatchNorm(
            self.out_channels, use_running_stats=self.torch_compat,
            name="bn_re")(rr)
        ii = StatelessBatchNorm(
            self.out_channels, use_running_stats=self.torch_compat,
            name="bn_im")(ii)
        return jax.nn.leaky_relu(rr, 0.01), jax.nn.leaky_relu(ii, 0.01)


class FRCRNUNet(nn.Module):
    """frcrn.py:216-321 (model_depth 14, all-128-channel variant)."""

    torch_compat: bool = False

    @nn.compact
    def __call__(self, re, im):
        n = 7
        skips = [(re, im)]
        x = (re, im)
        for i in range(n):
            if i > 0:
                x = ComplexFSMNFreq(128, name=f"fsmn_enc_{i}")(*x)
            x = ComplexEncoderLayer(
                128, ENC_KERNELS[i], PADDINGS[i], self.torch_compat,
                name=f"encoder_{i}"
            )(*x)
            skips.append(SELayer(128, name=f"se_enc_{i}")(*x))
        x = ComplexFSMN(128, name="fsmn")(*x)
        p = x
        for i in range(n):
            out_ch = 1 if i == n - 1 else 128
            p = ComplexDecoderLayer(
                out_ch, DEC_KERNELS[i], PADDINGS[i], self.torch_compat,
                name=f"decoder_{i}"
            )(*p)
            if i < n - 1:
                p = ComplexFSMNFreq(128, name=f"fsmn_dec_{i}")(*p)
            if i == n - 1:
                break
            if i < n - 2:
                p = SELayer(128, name=f"se_dec_{i}")(*p)
            skip = skips[n - 1 - i]
            p = (
                jnp.concatenate([p[0][:, : skip[0].shape[1], : skip[0].shape[2]], skip[0]], axis=-1),
                jnp.concatenate([p[1][:, : skip[1].shape[1], : skip[1].shape[2]], skip[1]], axis=-1),
            )
        lr = nn.Conv(1, (1, 1), name="linear_re")
        li = nn.Conv(1, (1, 1), name="linear_im")
        out_r = lr(p[0]) - li(p[1])
        out_i = lr(p[1]) + li(p[0])
        return out_r, out_i


@register_model
class FRCRN(BaseModel):
    complex: bool = True
    model_complexity: int = 45
    model_depth: int = 14
    log_amp: bool = False
    padding_mode: str = "zeros"
    win_len: int = 640
    win_inc: int = 320
    fft_len: int = 640
    win_type: str = "hann"
    sample_rate: int = 16000
    torch_compat: bool = False  # frozen BatchNorm running stats for import

    @nn.compact
    def __call__(self, wav: jax.Array):
        if wav.ndim == 1:
            wav = wav[None, :]
        length = wav.shape[-1]
        # FRCRN's in-file ConvSTFT: sqrt-Hann window, NO signal padding
        # (frcrn.py:56-84 runs the strided analysis conv without pad —
        # unlike DCCRN's conv_stft.py, which pads win-hop).
        real, imag = conv_stft(wav, self.win_len, self.win_inc, self.fft_len,
                               sqrt_window=True, pad_signal=False)
        re = real[..., None]  # (B, F, T, 1)
        im = imag[..., None]

        u1_r, u1_i = FRCRNUNet(self.torch_compat, name="unet")(re, im)
        mask1 = (jnp.tanh(u1_r), jnp.tanh(u1_i))
        u2_r, u2_i = FRCRNUNet(self.torch_compat, name="unet2")(u1_r, u1_i)
        mask2 = (jnp.tanh(u2_r) + mask1[0], jnp.tanh(u2_i) + mask1[1])

        def apply_mask(m):
            mr, mi = m[0][..., 0], m[1][..., 0]  # (B, F, T)
            mr = mr[:, : real.shape[1]]
            mi = mi[:, : real.shape[1]]
            est_r = real * mr - imag * mi
            est_i = real * mi + imag * mr
            est_spec = jnp.concatenate([est_r, est_i], axis=1)  # (B, 2F, T)
            est_wav = conv_istft(
                est_r, est_i, self.win_len, self.win_inc, self.fft_len, length,
                sqrt_window=True, crop_pad=False,
            )
            est_mask = jnp.concatenate([mr, mi], axis=1)
            return est_spec, est_wav, est_mask

        s1 = apply_mask(mask1)
        s2 = apply_mask(mask2)
        return wav, [s1[0], s1[1], s1[2], s2[0], s2[1], s2[2]]
