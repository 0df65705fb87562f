"""DCCRN (deep complex convolution recurrent network), flax/TPU-native.

Parity: enhancement/look2hear/models/dccrn.py:11-226 + complexnn.py
(ComplexConv2d :344-413, ComplexConvTranspose2d :415-470, NavieComplexLSTM
:292-330) + conv_stft.py (config enhancement/config/dccrn.yaml: rnn 256,
masking E, complex LSTM, kernels [32,64,128,256,256,256]): complex conv
encoder over (freq, time) with causal time padding, complex LSTM bottleneck,
skip-connected complex transposed-conv decoder, polar (E) masking, conv-STFT
framing (win 400 / hop 100 / fft 512, both-side pad win-hop).

torch BatchNorm runs in batch-stat mode here (flax functional style);
running-average eval stats are a checkpoint-import concern only.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .base import BaseModel, register_model


def _hann(win_len: int) -> np.ndarray:
    from scipy.signal import get_window

    return get_window("hann", win_len, fftbins=True).astype(np.float32)


def conv_stft(x: jax.Array, win_len: int, hop: int, fft_len: int,
              sqrt_window: bool = False, pad_signal: bool = True):
    """ConvSTFT 'complex' parity: (B, T) → (real, imag) each (B, F, frames).

    DCCRN's conv_stft.py:46-50 pads win-hop on both sides and windows
    with full Hann; FRCRN's in-file variant (frcrn.py:56-84) runs the
    strided conv with NO padding and a sqrt-Hann window — callers pick
    via ``pad_signal``/``sqrt_window``."""
    win = _hann(win_len) ** 0.5 if sqrt_window else _hann(win_len)
    pad = (win_len - hop) if pad_signal else 0
    xp = jnp.pad(x, ((0, 0), (pad, pad))) if pad else x
    n_frames = (xp.shape[-1] - win_len) // hop + 1
    idx = np.arange(n_frames)[:, None] * hop + np.arange(win_len)[None, :]
    frames = xp[:, idx] * jnp.asarray(win)  # (B, frames, win)
    spec = jnp.fft.rfft(frames, fft_len)  # (B, frames, F); rfft imag == the
    # reference kernel's -sin rows (conv_stft.py:15-23)
    return jnp.swapaxes(spec.real, 1, 2), jnp.swapaxes(spec.imag, 1, 2)


def _istft_pinv(win_len: int, fft_len: int) -> np.ndarray:
    """Least-squares synthesis matrix (2F, win): the reference inverts the
    un-windowed real-DFT analysis matrix with pinv (conv_stft.py:20-22),
    which differs from truncated irfft whenever win_len < fft_len
    (inconsistent masked spectra; ~3% rel on random input)."""
    basis = np.fft.rfft(np.eye(fft_len))[:win_len]
    analysis = np.concatenate([basis.real, basis.imag], 1).T  # (2F, win)
    return np.linalg.pinv(analysis).astype(np.float32).T  # (2F, win)


def conv_istft(real, imag, win_len: int, hop: int, fft_len: int, length: int,
               sqrt_window: bool = False, crop_pad: bool = True):
    """ConviSTFT parity: pinv synthesis + OLA with window^2 normalization.

    ``crop_pad=True`` removes the win-hop analysis padding (DCCRN
    semantics); FRCRN's unpadded analysis keeps the full reconstruction
    (frcrn.py:126-143: conv_transpose / window-overlap, no crop) and the
    output is sliced/zero-padded to ``length``."""
    window = jnp.asarray(
        _hann(win_len) ** 0.5 if sqrt_window else _hann(win_len)
    )
    spec_ri = jnp.concatenate([real, imag], axis=1)  # (B, 2F, fr)
    frames = jnp.einsum(
        "bft,fw->btw", spec_ri, jnp.asarray(_istft_pinv(win_len, fft_len))
    ) * window
    b, n_frames, _ = frames.shape
    total = (n_frames - 1) * hop + win_len
    idx = (np.arange(n_frames)[:, None] * hop + np.arange(win_len)[None, :]).reshape(-1)
    out = jnp.zeros((b, total)).at[:, idx].add(frames.reshape(b, -1))
    wsum = (
        jnp.zeros((total,))
        .at[jnp.asarray(idx)]
        .add(jnp.tile(window * window, n_frames))
    )
    out = out / (wsum + 1e-8)
    pad = (win_len - hop) if crop_pad else 0
    out = out[:, pad : pad + length]
    if out.shape[-1] < length:
        out = jnp.pad(out, ((0, 0), (0, length - out.shape[-1])))
    return out


class ComplexConv2d(nn.Module):
    """(real, imag) (B, F, T, C) pairs; kernel (kf, kt), stride (sf, 1),
    freq padding symmetric, time padding causal (complexnn.py:344-413)."""

    out_channels: int  # per part
    kernel: tuple[int, int] = (5, 2)
    stride: tuple[int, int] = (2, 1)
    freq_pad: int = 2
    causal_time_pad: int = 1

    @nn.compact
    def __call__(self, real, imag):
        def pad(z):
            return jnp.pad(
                z,
                ((0, 0), (self.freq_pad, self.freq_pad),
                 (self.causal_time_pad, 0), (0, 0)),
            )

        conv_r = nn.Conv(
            self.out_channels, self.kernel, strides=self.stride, padding="VALID",
            name="real_conv",
        )
        conv_i = nn.Conv(
            self.out_channels, self.kernel, strides=self.stride, padding="VALID",
            name="imag_conv",
        )
        pr, pi = pad(real), pad(imag)
        return conv_r(pr) - conv_i(pi), conv_r(pi) + conv_i(pr)


class ComplexConvTranspose2d(nn.Module):
    """Stride-(2,1) complex transposed conv with torch pad/output_padding
    emulation (complexnn.py:415-470; dccrn.py decoder: padding (2,0),
    output_padding (1,0))."""

    out_channels: int
    kernel: tuple[int, int] = (5, 2)

    @nn.compact
    def __call__(self, real, imag):
        conv_r = nn.ConvTranspose(
            self.out_channels, self.kernel, strides=(2, 1), padding="VALID",
            name="real_conv",
        )
        conv_i = nn.ConvTranspose(
            self.out_channels, self.kernel, strides=(2, 1), padding="VALID",
            name="imag_conv",
        )

        def crop(z, f_in):
            # torch: F_out = (F_in-1)*2 - 2*2 + 5 + 1 = 2*F_in; crop pad=2.
            return z[:, 2 : 2 + 2 * f_in]

        f_in = real.shape[1]
        rr = crop(conv_r(real) - conv_i(imag), f_in)
        ii = crop(conv_r(imag) + conv_i(real), f_in)
        return rr, ii


class ComplexLSTM(nn.Module):
    """NavieComplexLSTM (complexnn.py:292-330), batch-first."""

    rnn_units: int  # per part
    projection_dim: int | None = None

    @nn.compact
    def __call__(self, real, imag):
        real_lstm = nn.RNN(nn.OptimizedLSTMCell(self.rnn_units), name="real_lstm")
        imag_lstm = nn.RNN(nn.OptimizedLSTMCell(self.rnn_units), name="imag_lstm")
        r2r, r2i = real_lstm(real), imag_lstm(real)
        i2r, i2i = real_lstm(imag), imag_lstm(imag)
        out_r, out_i = r2r - i2i, i2r + r2i
        if self.projection_dim is not None:
            out_r = nn.Dense(self.projection_dim, name="r_trans")(out_r)
            out_i = nn.Dense(self.projection_dim, name="i_trans")(out_i)
        return out_r, out_i


@register_model
class DCCRN(BaseModel):
    rnn_layers: int = 2
    rnn_units: int = 256
    win_len: int = 400
    win_inc: int = 100
    fft_len: int = 512
    win_type: str = "hann"
    masking_mode: str = "E"
    use_clstm: bool = True
    use_cbn: bool = False
    kernel_size: int = 5
    kernel_num: tuple[int, ...] = (32, 64, 128, 256, 256, 256)
    sample_rate: int = 16000
    torch_compat: bool = False  # frozen BatchNorm running stats (eval-mode
    # torch semantics, filled by checkpoint import)

    @nn.compact
    def __call__(self, wav: jax.Array) -> jax.Array:
        if wav.ndim == 1:
            wav = wav[None, :]
        length = wav.shape[-1]
        real_s, imag_s = conv_stft(wav, self.win_len, self.win_inc, self.fft_len)
        mags = jnp.sqrt(real_s**2 + imag_s**2 + 1e-8)
        phase = jnp.arctan2(imag_s, real_s)

        # Drop DC bin, move to (B, F, T, C=1) per part (dccrn.py:155-157).
        real = real_s[:, 1:, :, None]
        imag = imag_s[:, 1:, :, None]

        # kernel_num entries are TOTAL (real+imag) channels like the
        # reference's ComplexConv2d contract (complexnn.py:359-369); each
        # part carries half.
        kernels = (2,) + tuple(self.kernel_num)
        halves = [k // 2 for k in kernels]
        skips = []
        for i in range(len(kernels) - 1):
            real, imag = ComplexConv2d(halves[i + 1], name=f"enc_{i}")(real, imag)
            from .zoo_layers import StatelessBatchNorm

            real = StatelessBatchNorm(
                halves[i + 1], use_running_stats=self.torch_compat,
                name=f"enc_bn_{i}")(real)
            imag = StatelessBatchNorm(
                halves[i + 1], use_running_stats=self.torch_compat,
                name=f"enc_bni_{i}")(imag)
            alpha = self.param(f"enc_prelu_{i}", lambda k, s: jnp.full(s, 0.25), (1,))
            real = jnp.where(real >= 0, real, alpha * real)
            imag = jnp.where(imag >= 0, imag, alpha * imag)
            skips.append((real, imag))

        b, f_b, t_b, c_b = real.shape
        # torch flattens (C, D) channel-major (dccrn.py:171-175).
        r_in = jnp.transpose(real, (0, 2, 3, 1)).reshape(b, t_b, c_b * f_b)
        i_in = jnp.transpose(imag, (0, 2, 3, 1)).reshape(b, t_b, c_b * f_b)
        if self.use_clstm:
            for li in range(self.rnn_layers):
                proj = f_b * c_b if li == self.rnn_layers - 1 else None
                r_in, i_in = ComplexLSTM(
                    self.rnn_units // 2, projection_dim=proj, name=f"clstm_{li}"
                )(r_in, i_in)
        else:
            x = jnp.concatenate([r_in, i_in], axis=-1)
            for li in range(2):
                x = nn.RNN(nn.OptimizedLSTMCell(self.rnn_units), name=f"lstm_{li}")(x)
            x = nn.Dense(2 * f_b * c_b, name="tranform")(x)
            r_in, i_in = jnp.split(x, 2, axis=-1)
        real = jnp.transpose(r_in.reshape(b, t_b, c_b, f_b), (0, 3, 1, 2))
        imag = jnp.transpose(i_in.reshape(b, t_b, c_b, f_b), (0, 3, 1, 2))

        for i in range(len(kernels) - 1):
            skip_r, skip_i = skips[-1 - i]
            real = jnp.concatenate([real, skip_r], axis=-1)
            imag = jnp.concatenate([imag, skip_i], axis=-1)
            out_ch = halves[-2 - i] if i < len(kernels) - 2 else 1
            real, imag = ComplexConvTranspose2d(out_ch, name=f"dec_{i}")(real, imag)
            real, imag = real[:, :, 1:], imag[:, :, 1:]  # causal trim (dccrn.py:193)
            if i < len(kernels) - 2:
                from .zoo_layers import StatelessBatchNorm

                real = StatelessBatchNorm(
                    out_ch, use_running_stats=self.torch_compat,
                    name=f"dec_bn_{i}")(real)
                imag = StatelessBatchNorm(
                    out_ch, use_running_stats=self.torch_compat,
                    name=f"dec_bni_{i}")(imag)
                alpha = self.param(
                    f"dec_prelu_{i}", lambda k, s: jnp.full(s, 0.25), (1,)
                )
                real = jnp.where(real >= 0, real, alpha * real)
                imag = jnp.where(imag >= 0, imag, alpha * imag)

        mask_real = jnp.pad(real[..., 0], ((0, 0), (1, 0), (0, 0)))  # re-add DC
        mask_imag = jnp.pad(imag[..., 0], ((0, 0), (1, 0), (0, 0)))

        if self.masking_mode == "E":
            mask_mags = jnp.sqrt(mask_real**2 + mask_imag**2)
            mask_phase = jnp.arctan2(
                mask_imag / (mask_mags + 1e-8), mask_real / (mask_mags + 1e-8)
            )
            est_mags = jnp.tanh(mask_mags) * mags
            est_phase = phase + mask_phase
            out_r = est_mags * jnp.cos(est_phase)
            out_i = est_mags * jnp.sin(est_phase)
        elif self.masking_mode == "C":
            out_r = real_s * mask_real - imag_s * mask_imag
            out_i = real_s * mask_imag + imag_s * mask_real
        else:  # "R"
            out_r = real_s * mask_real
            out_i = imag_s * mask_imag

        wav_out = conv_istft(out_r, out_i, self.win_len, self.win_inc, self.fft_len, length)
        return jnp.clip(wav_out, -1.0, 1.0)
