"""BSRNN-ESPnet (high-fidelity band-split RNN enhancement), flax/TPU-native.

Parity: enhancement/look2hear/models/bsrnn_espnet.py:517-881 (defaults:
n_fft 960 / hop 480, 256-dim bins, 12 layers, non-causal, 48 kHz band
layout applied to the 481-bin spectrum): band-split complex STFT →
alternating time-BLSTM / freq-BLSTM residual layers → per-band GLU mask +
residual decoders → m·x + r → iSTFT. Waveform-to-waveform (B, T) → (B, T).
"""

from __future__ import annotations

from itertools import accumulate

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.stft import hann_window, istft, stft
from .base import BaseModel, register_model
from .zoo_layers import GroupNorm1, LSTMLayer


def subband_layout(input_dim: int, target_fs: int) -> tuple[int, ...]:
    """bsrnn_espnet.py:623-637."""
    if input_dim == 481 and target_fs == 48000:
        return tuple([5] + [4] * 19 + [10] * 6 + [40] * 7 + [60])
    if input_dim == 161 and target_fs == 16000:
        return tuple([2] * 20 + [5] * 6 + [20] * 3 + [31])
    raise NotImplementedError(f"no subband layout for {input_dim}@{target_fs}")


class BandSplit(nn.Module):
    """(B, T, F, 2) → (B, T, K, N) (bsrnn_espnet.py:617-686)."""

    subbands: tuple[int, ...]
    channels: int

    @nn.compact
    def __call__(self, x):
        outs = []
        hz = 0
        for i, sub in enumerate(self.subbands):
            band = x[:, :, hz : hz + sub, :]  # (B, T, sub, 2)
            band = band.reshape(band.shape[0], band.shape[1], sub * 2)
            band = GroupNorm1(eps=1e-5, name=f"norm_{i}")(band)
            outs.append(nn.Conv(self.channels, (1,), name=f"fc_{i}")(band))
            hz += sub
        return jnp.stack(outs, axis=2)  # (B, T, K, N)


class MaskDecoder(nn.Module):
    """(B, T, K, N) → (mask, residual) each (B, T, F, 2)
    (bsrnn_espnet.py:689-744)."""

    subbands: tuple[int, ...]
    channels: int

    @nn.compact
    def __call__(self, x):
        def mlp(band, sub, name):
            h = GroupNorm1(eps=1e-5, name=f"{name}_norm")(band)
            h = jnp.tanh(nn.Conv(4 * self.channels, (1,), name=f"{name}_c1")(h))
            h = nn.Conv(sub * 4, (1,), name=f"{name}_c2")(h)
            a, g = jnp.split(h, 2, axis=-1)  # GLU over channels
            out = a * jax.nn.sigmoid(g)  # (B, T, sub*2)
            return out.reshape(out.shape[0], out.shape[1], sub, 2)

        masks, resis = [], []
        for i, sub in enumerate(self.subbands):
            band = x[:, :, i]  # (B, T, N)
            masks.append(mlp(band, sub, f"mask_{i}"))
            resis.append(mlp(band, sub, f"residual_{i}"))
        return jnp.concatenate(masks, axis=2), jnp.concatenate(resis, axis=2)


@register_model
class BSRNNESPNet(BaseModel):
    n_fft: int = 960
    hop_length: int = 480
    use_builtin_complex: bool = True
    num_spk: int = 1
    num_channels: int = 256
    num_layers: int = 12
    target_fs: int = 48000
    ref_channel: int = 0
    causal: bool = False
    sample_rate: int = 16000

    @nn.compact
    def __call__(self, wav: jax.Array) -> jax.Array:
        if wav.ndim == 1:
            wav = wav[None, :]
        nsample = wav.shape[-1]
        win = hann_window(self.n_fft)
        spec = stft(wav, self.n_fft, self.hop_length, win)  # (B, F, T)
        spec = jnp.swapaxes(spec, 1, 2)  # (B, T, F)
        x = jnp.stack([spec.real, spec.imag], axis=-1)  # (B, T, F, 2)
        f_dim = x.shape[2]
        subbands = subband_layout(f_dim, self.target_fs)

        z = BandSplit(subbands, self.num_channels, name="band_split")(x)
        b, t, k, n = z.shape
        skip = z
        for i in range(self.num_layers):
            # time modeling (per band)
            h = GroupNorm1(eps=1e-5, name=f"norm_time_{i}")(skip)
            h = jnp.swapaxes(h, 1, 2).reshape(b * k, t, n)
            h = LSTMLayer(2 * n, bidirectional=not self.causal, name=f"rnn_time_{i}")(h)
            h = nn.Dense(n, name=f"fc_time_{i}")(h)
            skip = skip + jnp.swapaxes(h.reshape(b, k, t, n), 1, 2)
            # frequency modeling (per frame, across bands)
            h = GroupNorm1(eps=1e-5, name=f"norm_freq_{i}")(skip)
            h = h.reshape(b * t, k, n)
            h = LSTMLayer(2 * n, bidirectional=True, name=f"rnn_freq_{i}")(h)
            h = nn.Dense(n, name=f"fc_freq_{i}")(h)
            skip = skip + h.reshape(b, t, k, n)

        m, r = MaskDecoder(subbands, self.num_channels, name="mask_decoder")(skip)
        m = (m[..., 0] + 1j * m[..., 1])[:, :, :f_dim]
        r = (r[..., 0] + 1j * r[..., 1])[:, :, :f_dim]
        est = m * spec + r  # (B, T, F)
        out = istft(jnp.swapaxes(est, 1, 2), self.n_fft, self.hop_length, win,
                    length=nsample)
        return out
