"""SNR / SI-SDR / SD-SDR losses, functional JAX.

Parity targets: separation/look2hear/losses/matrix.py:5-197 (PairwiseNegSDR,
SingleSrcNegSDR, MultiSrcNegSDR, freq_MAE[_WavL1]) — same zero-mean, eps and
log conventions so training dynamics match the reference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.stft import hann_window, stft

EPS = 1e-8
_SDR_TYPES = ("snr", "sisdr", "sdsdr")


def _check(sdr_type: str):
    if sdr_type not in _SDR_TYPES:
        raise ValueError(f"sdr_type must be one of {_SDR_TYPES}, got {sdr_type!r}")


def pairwise_neg_sdr(
    ests: jax.Array,
    targets: jax.Array,
    sdr_type: str = "sisdr",
    zero_mean: bool = True,
    take_log: bool = True,
) -> jax.Array:
    """(B, n_src, T) × (B, n_src, T) → (B, n_est, n_tgt) negative SDR matrix."""
    _check(sdr_type)
    if zero_mean:
        targets = targets - jnp.mean(targets, axis=2, keepdims=True)
        ests = ests - jnp.mean(ests, axis=2, keepdims=True)
    s_target = targets[:, None, :, :]  # (B, 1, n_tgt, T)
    s_est = ests[:, :, None, :]  # (B, n_est, 1, T)
    if sdr_type in ("sisdr", "sdsdr"):
        dot = jnp.sum(s_est * s_target, axis=3, keepdims=True)
        energy = jnp.sum(s_target**2, axis=3, keepdims=True) + EPS
        proj = dot * s_target / energy  # (B, n_est, n_tgt, T)
    else:
        proj = jnp.broadcast_to(
            s_target, (*targets.shape[:1], ests.shape[1], *targets.shape[1:])
        )
    e_noise = s_est - s_target if sdr_type in ("sdsdr", "snr") else s_est - proj
    sdr = jnp.sum(proj**2, axis=3) / (jnp.sum(e_noise**2, axis=3) + EPS)
    if take_log:
        sdr = 10.0 * jnp.log10(sdr + EPS)
    return -sdr


def singlesrc_neg_sdr(
    ests: jax.Array,
    targets: jax.Array,
    sdr_type: str = "sisdr",
    zero_mean: bool = True,
    take_log: bool = True,
) -> jax.Array:
    """(B, T) × (B, T) → (B,) negative SDR."""
    _check(sdr_type)
    if zero_mean:
        targets = targets - jnp.mean(targets, axis=1, keepdims=True)
        ests = ests - jnp.mean(ests, axis=1, keepdims=True)
    if sdr_type in ("sisdr", "sdsdr"):
        dot = jnp.sum(ests * targets, axis=1, keepdims=True)
        energy = jnp.sum(targets**2, axis=1, keepdims=True) + EPS
        scaled = dot * targets / energy
    else:
        scaled = targets
    e_noise = ests - targets if sdr_type in ("sdsdr", "snr") else ests - scaled
    sdr = jnp.sum(scaled**2, axis=1) / (jnp.sum(e_noise**2, axis=1) + EPS)
    if take_log:
        sdr = 10.0 * jnp.log10(sdr + EPS)
    return -sdr


def multisrc_neg_sdr(
    ests: jax.Array,
    targets: jax.Array,
    sdr_type: str = "sisdr",
    zero_mean: bool = True,
    take_log: bool = True,
) -> jax.Array:
    """(B, n_src, T) aligned pairs → (B,) mean negative SDR over sources."""
    _check(sdr_type)
    b, n_src, t = ests.shape
    per_src = singlesrc_neg_sdr(
        ests.reshape(b * n_src, t),
        targets.reshape(b * n_src, t),
        sdr_type=sdr_type,
        zero_mean=zero_mean,
        take_log=take_log,
    )
    return jnp.mean(per_src.reshape(b, n_src), axis=-1)


class PairwiseNegSDR:
    """Config-holding callable mirroring the reference class
    (losses/matrix.py:5-49); usable as a PITLossWrapper loss_func."""

    def __init__(self, sdr_type: str = "sisdr", zero_mean: bool = True, take_log: bool = True):
        _check(sdr_type)
        self.sdr_type = sdr_type
        self.zero_mean = zero_mean
        self.take_log = take_log

    def __call__(self, ests, targets):
        return pairwise_neg_sdr(
            ests, targets, self.sdr_type, self.zero_mean, self.take_log
        )


class SingleSrcNegSDR:
    def __init__(self, sdr_type: str = "sisdr", zero_mean: bool = True, take_log: bool = True):
        _check(sdr_type)
        self.sdr_type = sdr_type
        self.zero_mean = zero_mean
        self.take_log = take_log

    def __call__(self, ests, targets):
        return singlesrc_neg_sdr(
            ests, targets, self.sdr_type, self.zero_mean, self.take_log
        )


class MultiSrcNegSDR:
    def __init__(self, sdr_type: str = "sisdr", zero_mean: bool = True, take_log: bool = True):
        _check(sdr_type)
        self.sdr_type = sdr_type
        self.zero_mean = zero_mean
        self.take_log = take_log

    def __call__(self, ests, targets):
        return multisrc_neg_sdr(
            ests, targets, self.sdr_type, self.zero_mean, self.take_log
        )


@partial(jax.jit, static_argnames=("win", "stride", "with_wav_l1"))
def _freq_mae(ests, targets, win: int, stride: int, with_wav_l1: bool):
    window = hann_window(win)
    b, nsrc, t = ests.shape
    es = stft(ests.reshape(-1, t), win, stride, window)
    ts = stft(targets.reshape(-1, t), win, stride, window)
    freq_l1 = jnp.abs(es.real - ts.real).mean((1, 2)) + jnp.abs(
        es.imag - ts.imag
    ).mean((1, 2))
    loss = freq_l1.reshape(b, nsrc).mean(-1)
    if with_wav_l1:
        loss = loss + jnp.abs(ests - targets).mean(-1).reshape(b, nsrc).mean(-1)
    return loss


class FreqMAE:
    """STFT real+imag L1 (losses/matrix.py:168-185)."""

    def __init__(self, win: int = 2048, stride: int = 512):
        self.win, self.stride = win, stride

    def __call__(self, ests, targets):
        return _freq_mae(ests, targets, self.win, self.stride, False)


class FreqMAEWavL1:
    """STFT L1 + waveform L1 (losses/matrix.py:145-166)."""

    def __init__(self, win: int = 2048, stride: int = 512):
        self.win, self.stride = win, stride

    def __call__(self, ests, targets):
        return _freq_mae(ests, targets, self.win, self.stride, True)
