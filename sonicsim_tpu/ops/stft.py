"""STFT/iSTFT with torch.stft-compatible semantics, pure JAX.

The reference's spectral losses and STFT-domain models rely on torch.stft
defaults — center=True, reflect padding, Hann window, one-sided
(separation/look2hear/losses/matrix.py:152-166, look2hear/utils/stft.py).
Checkpoint parity for BSRNN/TFGridNet/enhancement models requires matching
those frame/layout conventions exactly: output is (..., freq, frames).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(n: int, periodic: bool = True) -> jnp.ndarray:
    """torch.hann_window parity (periodic by default)."""
    m = n if periodic else n - 1
    if m <= 0:
        return jnp.ones((max(n, 0),), jnp.float32)
    k = np.arange(n)
    return jnp.asarray(0.5 - 0.5 * np.cos(2.0 * np.pi * k / m), jnp.float32)


def sqrt_hann_window(n: int, periodic: bool = True) -> jnp.ndarray:
    return jnp.sqrt(hann_window(n, periodic))


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "center", "onesided"))
def stft(
    x: jax.Array,
    n_fft: int,
    hop_length: int,
    window: jax.Array,
    center: bool = True,
    onesided: bool = True,
) -> jax.Array:
    """(..., T) → complex (..., F, frames); torch.stft(return_complex=True) parity."""
    if center:
        pad = n_fft // 2
        x = jnp.concatenate(
            [x[..., 1 : pad + 1][..., ::-1], x, x[..., -pad - 1 : -1][..., ::-1]],
            axis=-1,
        )
    t = x.shape[-1]
    n_frames = 1 + (t - n_fft) // hop_length
    idx = (
        np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
    )  # static
    frames = x[..., idx] * window  # (..., frames, n_fft)
    spec = jnp.fft.rfft(frames) if onesided else jnp.fft.fft(frames)
    return jnp.swapaxes(spec, -1, -2)  # (..., F, frames)


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "center", "length"))
def istft(
    spec: jax.Array,
    n_fft: int,
    hop_length: int,
    window: jax.Array,
    center: bool = True,
    length: int | None = None,
) -> jax.Array:
    """Inverse of ``stft`` (one-sided): (..., F, frames) → (..., T)."""
    frames = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n_fft)  # (..., frames, n_fft)
    frames = frames * window
    n_frames = frames.shape[-2]
    t_pad = n_fft + hop_length * (n_frames - 1)

    idx = np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
    flat_idx = idx.reshape(-1)
    batch = frames.shape[:-2]
    out = jnp.zeros((*batch, t_pad), frames.dtype)
    out = out.at[..., flat_idx].add(frames.reshape(*batch, -1))

    wsq = (window * window)[None, :] * np.ones((n_frames, 1), np.float32)
    denom = jnp.zeros((t_pad,), jnp.float32).at[flat_idx].add(wsq.reshape(-1))
    out = out / jnp.maximum(denom, 1e-11)

    if center:
        pad = n_fft // 2
        if length is not None:
            # Crop [pad : pad+length]: unlike torch.istft (which crops
            # [pad : t_pad-pad] then zero-pads), this recovers the true tail
            # samples when the signal length is not a hop multiple.
            out = out[..., pad : pad + length]
        else:
            out = out[..., pad : t_pad - pad]
    if length is not None:
        out = out[..., :length]
        if out.shape[-1] < length:
            out = jnp.pad(out, [(0, 0)] * (out.ndim - 1) + [(0, length - out.shape[-1])])
    return out
