"""TaylorSENet losses (enhancement/look2hear/losses/taylorsenet_loss.py).

Same compressed-spectrum complex+magnitude MSE as GaGNet but on a single
(B, 2, T, F) output, plus SI-SDR eval after mag² decompression
(enhancement/test.py:60-77 TaylorWav)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.stft import hann_window, istft
from .gagnet import _compressed_target_stft
from .sdr import singlesrc_neg_sdr


class TaylorSENetLoss:
    def __init__(self, n_fft: int = 320, hop_length: int = 160, win_length: int = 320):
        self.n_fft, self.hop_length = n_fft, hop_length

    def __call__(self, est, refs):
        if refs.ndim == 3:
            refs = refs[:, 0]
        label = _compressed_target_stft(refs, self.n_fft, self.hop_length)
        label = jnp.swapaxes(label, 2, 3)  # (B, 2, T, F)
        mag_est = jnp.linalg.norm(est, axis=1)
        mag_label = jnp.linalg.norm(label, axis=1)
        loss1 = jnp.mean((est - label) ** 2)
        loss2 = jnp.mean((mag_est - mag_label) ** 2)
        return 0.5 * (loss1 + loss2)


def taylor_wav(est: jax.Array, n_fft: int, hop_length: int, length: int) -> jax.Array:
    """(B, 2, T, F) compressed spectrum → waveform (TaylorWav parity)."""
    mag = jnp.linalg.norm(jnp.moveaxis(est, 1, -1), axis=-1) ** 2.0  # (B, T, F)
    phase = jnp.arctan2(est[:, 1], est[:, 0])
    spec = mag * jnp.cos(phase) + 1j * mag * jnp.sin(phase)
    spec = jnp.swapaxes(spec, 1, 2)  # (B, F, T)
    return istft(spec, n_fft, hop_length, hann_window(n_fft), length=length)


class TaylorSENetEval:
    def __init__(self, n_fft: int = 320, hop_length: int = 160, win_length: int = 320):
        self.n_fft, self.hop_length = n_fft, hop_length

    def __call__(self, est, refs):
        if refs.ndim == 3:
            refs = refs[:, 0]
        wav = taylor_wav(est, self.n_fft, self.hop_length, refs.shape[-1])
        return jnp.mean(singlesrc_neg_sdr(wav, refs, "sisdr"))
