"""FRCRN losses (enhancement/look2hear/losses/frcrn_loss.py:69-156).

Mask MSE (clipped ideal complex mask) on the refined stage + SI-SNR on its
waveform; eval scores the first-stage waveform (FRCRNEval:148-156 parity).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.dccrn import conv_stft
from .sdr import singlesrc_neg_sdr


class FRCRNLoss:
    def __init__(self, win_len: int = 640, win_inc: int = 320, fft_len: int = 640):
        self.win_len, self.win_inc, self.fft_len = win_len, win_inc, fft_len
        self.feat_dim = fft_len // 2 + 1

    def __call__(self, ests, refs):
        noisy, out_list = ests
        if refs.ndim == 3:
            refs = refs[:, 0]
        # Only the refined (second) stage contributes (frcrn_loss.py:94-105).
        est_wav, est_mask = out_list[4], out_list[5]

        sisnr_loss = jnp.mean(singlesrc_neg_sdr(est_wav, refs, "sisdr"))

        # FRCRN's own ConvSTFT semantics: sqrt-Hann, no signal padding
        # (frcrn_loss.py:72-78 builds the model's ConvSTFT, frcrn.py:56-84).
        sr, si = conv_stft(refs, self.win_len, self.win_inc, self.fft_len,
                           sqrt_window=True, pad_signal=False)
        yr, yi = conv_stft(noisy, self.win_len, self.win_inc, self.fft_len,
                           sqrt_window=True, pad_signal=False)
        y_pow = yr**2 + yi**2 + 1e-8
        gth_r = (sr * yr + si * yi) / y_pow
        gth_i = (si * yr - sr * yi) / y_pow
        gth = jnp.concatenate([gth_r, gth_i], axis=1)
        gth = jnp.where(gth > 2.0, 1.0, gth)
        gth = jnp.where(gth < -2.0, -1.0, gth)
        d = est_mask.shape[1]
        amp_loss = jnp.mean(
            (gth[:, : self.feat_dim] - est_mask[:, : self.feat_dim]) ** 2
        ) * d
        phase_loss = jnp.mean(
            (gth[:, self.feat_dim :] - est_mask[:, self.feat_dim :]) ** 2
        ) * d
        return amp_loss + phase_loss + sisnr_loss


class FRCRNEval:
    def __call__(self, ests, refs):
        if refs.ndim == 3:
            refs = refs[:, 0]
        est_wav = ests[1][1]  # first-stage waveform (frcrn_loss.py:154)
        return jnp.mean(singlesrc_neg_sdr(est_wav, refs, "sisdr"))
