"""Complex ideal ratio mask (cIRM) losses for the FullSubNet family.

Parity: enhancement/look2hear/losses/fullband_loss.py:100-221 —
tanh-compressed cIRM targets (K=10, C=0.1), MSE training loss, SI-SDR eval
after mask decompression + iSTFT, and the ``inference`` helper the eval
scripts use to convert model outputs to waveforms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.stft import hann_window, istft, stft
from .sdr import singlesrc_neg_sdr

EPS = 1.1920929e-7


def compress_cirm(mask: jax.Array, k: float = 10.0, c: float = 0.1) -> jax.Array:
    mask = jnp.where(mask <= -100.0, -100.0, mask)
    return k * (1.0 - jnp.exp(-c * mask)) / (1.0 + jnp.exp(-c * mask))


def decompress_cirm(mask: jax.Array, k: float = 10.0, limit: float = 9.9) -> jax.Array:
    mask = jnp.clip(mask, -limit, limit)
    return -k * jnp.log((k - mask) / (k + mask))


def build_cirm(noisy_real, noisy_imag, clean_real, clean_imag) -> jax.Array:
    """Compressed complex ratio mask target (fullband_loss.py:132-154):
    (B, F, T, 2)."""
    denom = noisy_real**2 + noisy_imag**2 + EPS
    m_re = (noisy_real * clean_real + noisy_imag * clean_imag) / denom
    m_im = (noisy_real * clean_imag - noisy_imag * clean_real) / denom
    return compress_cirm(jnp.stack([m_re, m_im], axis=-1))


def apply_cirm(crm, noisy_real, noisy_imag):
    """Decompress and apply a (B, F, T, 2) mask → (real, imag)."""
    crm = decompress_cirm(crm)
    real = crm[..., 0] * noisy_real - crm[..., 1] * noisy_imag
    imag = crm[..., 1] * noisy_real + crm[..., 0] * noisy_imag
    return real, imag


def _stft_window(n_fft: int, win_length: int):
    """torch.stft semantics: a hann window of ``win_length`` samples,
    zero-padded centered to ``n_fft`` when shorter."""
    w = hann_window(win_length)
    if win_length == n_fft:
        return w
    left = (n_fft - win_length) // 2
    import jax.numpy as _jnp

    return _jnp.pad(w, (left, n_fft - win_length - left))


class FullbandLoss:
    """MSE between predicted and ideal compressed cIRM."""

    def __init__(self, n_fft: int = 512, hop_length: int = 256, win_length: int = 512):
        self.n_fft, self.hop_length, self.win_length = n_fft, hop_length, win_length

    def __call__(self, ests, refs):
        crm, noisy_real, noisy_imag = ests
        if refs.ndim == 3:  # (B, 1, T) targets from the datamodule
            refs = refs[:, 0]
        clean = stft(refs, self.n_fft, self.hop_length,
                     _stft_window(self.n_fft, self.win_length))
        cirm = build_cirm(noisy_real, noisy_imag, clean.real, clean.imag)
        crm = jnp.transpose(crm, (0, 2, 3, 1))  # (B, F, T, 2)
        return jnp.mean((cirm - crm) ** 2)


class FullbandEval:
    """Negative SI-SDR of the enhanced waveform (fullband_loss.py:177-203)."""

    def __init__(self, n_fft: int = 512, hop_length: int = 256, win_length: int = 512):
        self.n_fft, self.hop_length, self.win_length = n_fft, hop_length, win_length

    def __call__(self, ests, refs):
        if refs.ndim == 3:
            refs = refs[:, 0]
        wav = cirm_inference(ests, self.n_fft, self.hop_length, refs.shape[-1],
                             win_length=self.win_length)
        return jnp.mean(singlesrc_neg_sdr(wav, refs, "sisdr"))


def cirm_inference(ests, n_fft: int, hop_length: int, length: int,
                   win_length: int | None = None) -> jax.Array:
    """Model output tuple → enhanced waveform (B, T)
    (fullband_loss.py:206-221)."""
    crm, noisy_real, noisy_imag = ests
    crm = jnp.transpose(crm, (0, 2, 3, 1))
    real, imag = apply_cirm(crm, noisy_real, noisy_imag)
    return istft(
        real + 1j * imag, n_fft, hop_length,
        _stft_window(n_fft, win_length or n_fft), length=length,
    )
