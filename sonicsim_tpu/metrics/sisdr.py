"""Evaluation SDR metrics: SI-SDR(i), SNR, and BSS-eval SDR(i).

Parity targets: the metric math used by MetricsTracker
(separation/look2hear/metrics/wrapper.py:62-148) — torchmetrics
ScaleInvariantSignalDistortionRatio semantics for SI-SDR and
fast_bss_eval-style time-invariant-filter SDR (512-tap projection).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

EPS = 1e-8


def si_sdr(est: jax.Array, ref: jax.Array, zero_mean: bool = True) -> jax.Array:
    """Scale-invariant SDR in dB along the last axis (batch dims broadcast)."""
    if zero_mean:
        est = est - jnp.mean(est, axis=-1, keepdims=True)
        ref = ref - jnp.mean(ref, axis=-1, keepdims=True)
    dot = jnp.sum(est * ref, axis=-1, keepdims=True)
    energy = jnp.sum(ref * ref, axis=-1, keepdims=True) + EPS
    proj = dot * ref / energy
    noise = est - proj
    ratio = jnp.sum(proj**2, axis=-1) / (jnp.sum(noise**2, axis=-1) + EPS)
    return 10.0 * jnp.log10(ratio + EPS)


def snr(est: jax.Array, ref: jax.Array) -> jax.Array:
    noise = est - ref
    ratio = jnp.sum(ref**2, axis=-1) / (jnp.sum(noise**2, axis=-1) + EPS)
    return 10.0 * jnp.log10(ratio + EPS)


@partial(jax.jit, static_argnames=("filter_length",))
def bss_sdr(est: jax.Array, ref: jax.Array, filter_length: int = 512) -> jax.Array:
    """BSS-eval SDR: the reference signal may pass through a short
    time-invariant distortion filter (fast_bss_eval convention).

    est/ref: (..., T). Solves the Toeplitz normal equations for the best
    ``filter_length``-tap projection of est onto ref's delayed span.
    """
    est = est - jnp.mean(est, axis=-1, keepdims=True)
    ref = ref - jnp.mean(ref, axis=-1, keepdims=True)
    t = ref.shape[-1]
    n = t + filter_length - 1
    nfft = 1
    while nfft < n:
        nfft *= 2
    rf = jnp.fft.rfft(ref, nfft)
    ef = jnp.fft.rfft(est, nfft)
    # Autocorrelation of ref (first filter_length lags).
    acorr = jnp.fft.irfft(rf * jnp.conj(rf), nfft)[..., :filter_length]
    # Cross-correlation est·ref at lags 0..filter_length-1.
    xcorr = jnp.fft.irfft(ef * jnp.conj(rf), nfft)[..., :filter_length]

    idx = jnp.abs(jnp.arange(filter_length)[:, None] - jnp.arange(filter_length)[None, :])
    toep = acorr[..., idx] + EPS * jnp.eye(filter_length)
    h = jnp.linalg.solve(toep, xcorr[..., None])[..., 0]  # (..., L)

    # s_target = ref filtered by h; compute energies via correlations:
    # |s|^2 = h^T R h = h · (R h) = h · xcorr is only true at optimum: h solves
    # R h = xcorr, so |s|^2 = h·xcorr and e = est - s ⇒ |e|^2 = |est|^2 - h·xcorr.
    s_energy = jnp.sum(h * xcorr, axis=-1)
    e_energy = jnp.sum(est**2, axis=-1) - s_energy
    return 10.0 * jnp.log10(jnp.maximum(s_energy, EPS) / jnp.maximum(e_energy, EPS))


def si_sdr_improvement(
    est: jax.Array, ref: jax.Array, mix: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """(SI-SDR, SI-SDRi) vs the mixture baseline (wrapper.py:72-80)."""
    val = si_sdr(est, ref)
    base = si_sdr(jnp.broadcast_to(mix, ref.shape), ref)
    return val, val - base


def sdr_improvement(
    est: jax.Array, ref: jax.Array, mix: jax.Array, filter_length: int = 512
) -> tuple[jax.Array, jax.Array]:
    val = bss_sdr(est, ref, filter_length)
    base = bss_sdr(jnp.broadcast_to(mix, ref.shape), ref, filter_length)
    return val, val - base
