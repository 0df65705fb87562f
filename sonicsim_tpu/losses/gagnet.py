"""GaGNet / TaylorSENet-style stagewise spectral losses.

Parity: enhancement/look2hear/losses/gagnet_loss.py — stagewise complex +
magnitude Euclidean loss on √mag-compressed spectra (stage weights 0.1 …
1.0 on the last), SI-SDR eval after mag² decompression, and the
``gagnet_wav`` reconstruction used by the eval scripts
(enhancement/test.py:41-58).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.stft import hann_window, istft, stft
from .sdr import singlesrc_neg_sdr


def _compressed_target_stft(refs, n_fft, hop_length):
    """RMS-normalize refs, STFT, √mag compression → (B, 2, F, T)."""
    t_len = refs.shape[-1]
    c = jnp.sqrt(t_len / jnp.sum(refs**2, axis=-1, keepdims=True))
    refs = refs * c
    spec = stft(refs, n_fft, hop_length, hann_window(n_fft))  # (B, F, T)
    mag = jnp.sqrt(jnp.abs(spec))
    phase = jnp.arctan2(spec.imag, spec.real)
    return jnp.stack([mag * jnp.cos(phase), mag * jnp.sin(phase)], axis=1)


class GaGNetLoss:
    """Stagewise 0.5*(complex MSE + magnitude MSE) (gagnet_loss.py:60-124)."""

    def __init__(self, n_fft: int = 320, hop_length: int = 160, win_length: int = 320):
        self.n_fft, self.hop_length = n_fft, hop_length

    def __call__(self, est_list, refs):
        if refs.ndim == 3:
            refs = refs[:, 0]
        label = _compressed_target_stft(refs, self.n_fft, self.hop_length)
        mag_label = jnp.linalg.norm(label, axis=1)
        alphas = [0.1] * len(est_list)
        alphas[-1] = 1.0
        loss1 = 0.0
        loss2 = 0.0
        for alpha, est in zip(alphas, est_list):
            mag_est = jnp.linalg.norm(est, axis=1)
            loss1 = loss1 + alpha * jnp.mean((est - label) ** 2)
            loss2 = loss2 + alpha * jnp.mean((mag_est - mag_label) ** 2)
        return 0.5 * (loss1 + loss2)


def gagnet_wav(est_list, n_fft: int, hop_length: int, length: int) -> jax.Array:
    """Last-stage spectrum → waveform with mag² decompression
    (enhancement/test.py:41-58)."""
    est = est_list[-1]  # (B, 2, F, T)
    mag = jnp.linalg.norm(jnp.moveaxis(est, 1, -1), axis=-1) ** 2.0  # (B, F, T)
    phase = jnp.arctan2(est[:, 1], est[:, 0])
    spec = mag * jnp.cos(phase) + 1j * mag * jnp.sin(phase)
    return istft(spec, n_fft, hop_length, hann_window(n_fft), length=length)


class GaGNetEval:
    def __init__(self, n_fft: int = 320, hop_length: int = 160, win_length: int = 320):
        self.n_fft, self.hop_length = n_fft, hop_length

    def __call__(self, est_list, refs):
        if refs.ndim == 3:
            refs = refs[:, 0]
        wav = gagnet_wav(est_list, self.n_fft, self.hop_length, refs.shape[-1])
        return jnp.mean(singlesrc_neg_sdr(wav, refs, "sisdr"))
