"""Fullband + FullSubNet enhancement models (cIRM masking), flax/TPU-native.

Parity: enhancement/look2hear/models/fullband.py:53-658 and
fullsubnet.py:154-719 (configs enhancement/config/{fullband,fullsubnet}.yaml):
magnitude STFT → offline-Laplace norm → stacked unidirectional LSTM/GRU
(fullband) and per-frequency subband LSTM over unfolded neighbor bands
(FullSubNet) → compressed cIRM prediction. Output is the reference's tuple
``(cRM [B, 2, F, T], noisy_real, noisy_imag)`` consumed by
sonicsim_tpu.losses.cirm.FullbandLoss / inference.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.stft import hann_window, stft
from .base import BaseModel, register_model


class SequenceModel(nn.Module):
    """Stacked uni/bidirectional LSTM/GRU + linear head
    (fullband.py:53-152). (B, T, F) → (B, T, out)."""

    output_size: int
    hidden_size: int
    num_layers: int
    bidirectional: bool = False
    sequence_model: str = "LSTM"
    output_activate_function: str | bool = "Tanh"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cell_cls = (
            nn.OptimizedLSTMCell if self.sequence_model == "LSTM" else nn.GRUCell
        )
        for i in range(self.num_layers):
            if self.bidirectional:
                x = nn.Bidirectional(
                    nn.RNN(cell_cls(self.hidden_size)),
                    nn.RNN(cell_cls(self.hidden_size)),
                    name=f"rnn_{i}",
                )(x)
            else:
                x = nn.RNN(cell_cls(self.hidden_size), name=f"rnn_{i}")(x)
        if self.output_size:
            x = nn.Dense(self.output_size, name="fc_output")(x)
        act = self.output_activate_function
        if act:
            table = {
                "Tanh": jnp.tanh,
                "ReLU": jax.nn.relu,
                "ReLU6": lambda v: jnp.clip(v, 0.0, 6.0),
                "LeakyReLU": jax.nn.leaky_relu,
            }
            x = table[act](x)
        return x


def offline_laplace_norm(x: jax.Array) -> jax.Array:
    """input / (utterance mean + 1e-5) (fullband.py:393-408)."""
    axes = tuple(range(1, x.ndim))
    mu = jnp.mean(x, axis=axes, keepdims=True)
    return x / (mu + 1e-5)


def offline_gaussian_norm(x: jax.Array) -> jax.Array:
    axes = tuple(range(1, x.ndim))
    mu = jnp.mean(x, axis=axes, keepdims=True)
    std = jnp.std(x, axis=axes, keepdims=True)
    return (x - mu) / (std + 1e-5)


def freq_unfold(x: jax.Array, num_neighbors: int) -> jax.Array:
    """(B, F, T) → (B, F, 2n+1, T): per-frequency neighbor bands with
    reflect padding (fullband.py:203-236)."""
    if num_neighbors <= 0:
        return x[:, :, None, :]
    b, f, t = x.shape
    pad = num_neighbors
    xp = jnp.concatenate(
        [x[:, 1 : pad + 1][:, ::-1], x, x[:, -pad - 1 : -1][:, ::-1]], axis=1
    )
    idx = jnp.arange(f)[:, None] + jnp.arange(2 * pad + 1)[None, :]
    return xp[:, idx]  # (B, F, 2n+1, T)


def _stft_features(wav, n_fft, hop_length):
    spec = stft(wav, n_fft, hop_length, hann_window(n_fft))  # (B, F, T)
    return jnp.abs(spec), spec.real, spec.imag


@register_model
class Fullband(BaseModel):
    num_freqs: int = 257
    hidden_size: int = 512
    sequence_model: str = "LSTM"
    output_activate_function: str | bool = False
    look_ahead: int = 2
    n_fft: int = 512
    hop_length: int = 256
    win_length: int = 512
    norm_type: str = "offline_laplace_norm"
    weight_init: bool = True
    sample_rate: int = 16000

    @nn.compact
    def __call__(self, wav: jax.Array):
        if wav.ndim == 1:
            wav = wav[None, :]
        mag, real, imag = _stft_features(wav, self.n_fft, self.hop_length)
        x = jnp.pad(mag, ((0, 0), (0, 0), (0, self.look_ahead)))
        x = offline_laplace_norm(x)
        out = SequenceModel(
            output_size=self.num_freqs * 2,
            hidden_size=self.hidden_size,
            num_layers=3,
            sequence_model=self.sequence_model,
            output_activate_function=self.output_activate_function,
            name="fullband_model",
        )(jnp.swapaxes(x, 1, 2))  # (B, T, 2F)
        b, t, _ = out.shape
        crm = jnp.swapaxes(out, 1, 2).reshape(b, 2, self.num_freqs, t)
        return crm[:, :, :, self.look_ahead :], real, imag


@register_model
class FullSubnet(BaseModel):
    num_freqs: int = 257
    look_ahead: int = 2
    sequence_model: str = "LSTM"
    fb_num_neighbors: int = 0
    sb_num_neighbors: int = 15
    fb_output_activate_function: str | bool = "ReLU"
    sb_output_activate_function: str | bool = False
    fb_model_hidden_size: int = 512
    sb_model_hidden_size: int = 384
    n_fft: int = 512
    hop_length: int = 256
    win_length: int = 512
    norm_type: str = "offline_laplace_norm"
    num_groups_in_drop_band: int = 1
    weight_init: bool = False
    sample_rate: int = 16000

    @nn.compact
    def __call__(self, wav: jax.Array):
        if wav.ndim == 1:
            wav = wav[None, :]
        mag, real, imag = _stft_features(wav, self.n_fft, self.hop_length)
        noisy_mag = jnp.pad(mag, ((0, 0), (0, 0), (0, self.look_ahead)))
        b, f, t = noisy_mag.shape

        fb_in = offline_laplace_norm(noisy_mag)  # (B, F, T)
        fb_out = SequenceModel(
            output_size=self.num_freqs,
            hidden_size=self.fb_model_hidden_size,
            num_layers=2,
            sequence_model=self.sequence_model,
            output_activate_function=self.fb_output_activate_function,
            name="fb_model",
        )(jnp.swapaxes(fb_in, 1, 2))
        fb_out = jnp.swapaxes(fb_out, 1, 2)  # (B, F, T)

        fb_unf = freq_unfold(fb_out, self.fb_num_neighbors)  # (B,F,Ff,T)
        mag_unf = freq_unfold(noisy_mag, self.sb_num_neighbors)  # (B,F,Fs,T)
        sb_in = jnp.concatenate([mag_unf, fb_unf], axis=2)  # (B,F,Fs+Ff,T)
        sb_in = offline_laplace_norm(sb_in)
        # drop_band is a training-throughput trick (fullsubnet.py:695-701);
        # num_groups_in_drop_band=1 in the config → no-op here.
        n_feat = sb_in.shape[2]
        sb_in = jnp.swapaxes(sb_in.reshape(b * f, n_feat, t), 1, 2)  # (B*F, T, n)
        sb_mask = SequenceModel(
            output_size=2,
            hidden_size=self.sb_model_hidden_size,
            num_layers=2,
            sequence_model=self.sequence_model,
            output_activate_function=self.sb_output_activate_function,
            name="sb_model",
        )(sb_in)  # (B*F, T, 2)
        crm = jnp.swapaxes(sb_mask.reshape(b, f, t, 2), 1, 3).swapaxes(2, 3)
        # (B, 2, F, T)
        return crm[:, :, :, self.look_ahead :], real, imag
