"""ITU-R BS.1770-4 loudness (LUFS) measurement + normalization, pure JAX.

Replaces pyloudnorm (SonicSim-SonicSet/SonicSim_audio.py:68-86): K-weighting
(high-shelf + high-pass biquads) followed by 400 ms / 75%-overlap gated block
energy averaging with the -70 LKFS absolute and -10 LU relative gates.

TPU-native design: the biquads are *exact* IIR filters evaluated with a
parallel ``jax.lax.associative_scan`` over 2x2 state-transition matrices
(O(T) work, O(log T) depth) instead of a sequential sample loop — scipy
lfilter parity to float32 precision. Gating uses static-shape frame energies
via cumulative sums with boolean masks (no data-dependent shapes under jit).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# BS.1770 K-weighting prototype parameters (48 kHz design, re-derived per
# sample rate exactly like pyloudnorm's IIRfilter class).
_SHELF = dict(g_db=3.999843853973347, f0=1681.974450955533, q=0.7071752369554196)
_HIGHPASS = dict(f0=38.13547087602444, q=0.5003270373238773)
_ABS_GATE_LUFS = -70.0
_REL_GATE_LU = -10.0
# Channel weights: L, R, C, Ls, Rs (BS.1770-4 table 3).
_CH_WEIGHTS = np.array([1.0, 1.0, 1.0, 1.41, 1.41])


def k_weighting_coeffs(rate: int) -> list[tuple[np.ndarray, np.ndarray]]:
    """(b, a) for the two K-weighting biquads at the given sample rate."""
    coeffs = []
    # High shelf (RBJ cookbook, as used by BS.1770/pyloudnorm).
    a_gain = 10.0 ** (_SHELF["g_db"] / 40.0)
    w0 = 2.0 * math.pi * _SHELF["f0"] / rate
    alpha = math.sin(w0) / (2.0 * _SHELF["q"])
    cw = math.cos(w0)
    sq = 2.0 * math.sqrt(a_gain) * alpha
    b = np.array(
        [
            a_gain * ((a_gain + 1) + (a_gain - 1) * cw + sq),
            -2.0 * a_gain * ((a_gain - 1) + (a_gain + 1) * cw),
            a_gain * ((a_gain + 1) + (a_gain - 1) * cw - sq),
        ]
    )
    a = np.array(
        [
            (a_gain + 1) - (a_gain - 1) * cw + sq,
            2.0 * ((a_gain - 1) - (a_gain + 1) * cw),
            (a_gain + 1) - (a_gain - 1) * cw - sq,
        ]
    )
    coeffs.append((b / a[0], a / a[0]))
    # High pass.
    w0 = 2.0 * math.pi * _HIGHPASS["f0"] / rate
    alpha = math.sin(w0) / (2.0 * _HIGHPASS["q"])
    cw = math.cos(w0)
    b = np.array([(1 + cw) / 2.0, -(1 + cw), (1 + cw) / 2.0])
    a = np.array([1 + alpha, -2.0 * cw, 1 - alpha])
    coeffs.append((b / a[0], a / a[0]))
    return coeffs


def biquad(x: jax.Array, b, a) -> jax.Array:
    """Exact biquad IIR along the last axis via parallel associative scan.

    Direct-form II transposed: state s=(s1,s2) follows s[n] = A s[n-1] + B x[n]
    with constant A=[[-a1,1],[-a2,0]], and y[n] = b0 x[n] + s1[n-1].
    """
    b0, b1, b2 = (float(v) for v in b)
    _, a1, a2 = (float(v) for v in a)
    x = x.astype(jnp.float32)
    amat = jnp.array([[-a1, 1.0], [-a2, 0.0]], jnp.float32)
    bvec = jnp.array([b1 - a1 * b0, b2 - a2 * b0], jnp.float32)

    t = x.shape[-1]
    batch = x.shape[:-1]
    a_seq = jnp.broadcast_to(amat, (*batch, t, 2, 2))
    c_seq = x[..., :, None] * bvec  # (..., T, 2)

    def combine(lhs, rhs):
        a_l, c_l = lhs
        a_r, c_r = rhs
        return (
            jnp.einsum("...ij,...jk->...ik", a_r, a_l),
            jnp.einsum("...ij,...j->...i", a_r, c_l) + c_r,
        )

    _, s = jax.lax.associative_scan(combine, (a_seq, c_seq), axis=len(batch))
    s1_prev = jnp.concatenate(
        [jnp.zeros((*batch, 1), jnp.float32), s[..., :-1, 0]], axis=-1
    )
    return b0 * x + s1_prev


def _kweight_fir(rate: int, tol: float = 1e-8, max_len: int = 1 << 16) -> np.ndarray:
    """Truncated impulse response of the cascaded K-weighting biquads.

    The cascade is LTI, so filtering == convolution with its impulse
    response; truncating where |h| < tol is below float32 resolution. This
    turns the per-sample IIR into one FFT convolution — far cheaper on TPU
    than 20 associative-scan passes over the signal."""
    h = np.zeros(max_len)
    h[0] = 1.0
    from scipy.signal import lfilter

    for b, a in k_weighting_coeffs(rate):
        h = lfilter(b, a, h)
    tail = np.nonzero(np.abs(h) > tol)[0]
    n = int(tail[-1]) + 1 if len(tail) else 1
    return h[:n].astype(np.float32)


def k_weight(x: jax.Array, rate: int, exact: bool = False) -> jax.Array:
    """Apply the two-stage K-weighting filter along the last axis.

    Default: FFT convolution with the truncated (<1e-8) impulse response.
    ``exact=True`` runs the associative-scan biquads instead (bit-parity
    with sequential IIR filtering)."""
    if exact:
        for b, a in k_weighting_coeffs(rate):
            x = biquad(x, b, a)
        return x
    # Overlap-save block convolution: many small power-of-two FFTs beat one
    # signal-length FFT on TPU by a wide margin.
    h = _kweight_fir(rate)
    l = len(h)
    t = x.shape[-1]
    nfft = 8192
    step = nfft - (l - 1)
    n_blocks = -(-t // step)
    xpad = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(l - 1, n_blocks * step - t)])
    idx = np.arange(n_blocks)[:, None] * step + np.arange(nfft)[None, :]
    blocks = xpad[..., idx]  # (..., n_blocks, nfft)
    hf = jnp.asarray(np.fft.rfft(h, nfft).astype(np.complex64))
    conv = jnp.fft.irfft(jnp.fft.rfft(blocks, nfft) * hf, nfft)
    out = conv[..., l - 1 :]  # valid part of each block: (..., n_blocks, step)
    return out.reshape(*x.shape[:-1], n_blocks * step)[..., :t]


@partial(jax.jit, static_argnames=("rate", "block_size"))
def integrated_loudness(
    data: jax.Array, rate: int, block_size: float = 0.4
) -> jax.Array:
    """Gated integrated loudness in LUFS.

    data: (T,) mono or (C, T) multichannel. Returns a scalar; silent input
    yields -inf like pyloudnorm (the caller substitutes -40, matching
    SonicSim_audio.py:73-75). Channels beyond BS.1770-4's five weight
    unity (high-order ambisonics beds; pyloudnorm has no behavior there —
    it raises).
    """
    x = jnp.atleast_2d(data.astype(jnp.float32))  # (C, T)
    n_ch, t = x.shape
    xw = k_weight(x, rate)

    block = int(round(block_size * rate))
    hop = max(int(round(block * 0.25)), 1)
    n_frames = max((t - block) // hop + 1, 1)

    if block == 4 * hop and t >= block:
        # 75%-overlap fast path: per-hop chunk energies + 4-chunk rolling
        # sum — no length-T cumulative scan.
        n_chunks = t // hop
        sq = (xw[:, : n_chunks * hop] ** 2).reshape(n_ch, n_chunks, hop)
        chunk_e = sq.sum(-1)  # (C, n_chunks)
        z = (
            chunk_e[:, :-3] + chunk_e[:, 1:-2] + chunk_e[:, 2:-1] + chunk_e[:, 3:]
        )[:, :n_frames] / block
    else:
        # General path: frame energies via cumulative sums (static shapes).
        csum = jnp.concatenate(
            [jnp.zeros((n_ch, 1), jnp.float32), jnp.cumsum(xw * xw, axis=-1)],
            axis=-1,
        )
        starts = jnp.arange(n_frames) * hop
        z = (csum[:, starts + min(block, t)] - csum[:, starts]) / block

    # BS.1770-4 defines weights for 5 channels; beyond that (e.g. AmbiX
    # order 2 = 9 ch) use unity — a documented superset: the reference's
    # pyloudnorm meter simply IndexErrors past 5 channels, so >5-ch
    # generation has no reference behavior to match.
    weights = jnp.asarray(
        np.concatenate(
            [_CH_WEIGHTS[:n_ch], np.ones(max(n_ch - len(_CH_WEIGHTS), 0))]
        ),
        jnp.float32,
    )
    wz = jnp.einsum("c,cf->f", weights, z)  # (n_frames,)
    block_lufs = -0.691 + 10.0 * jnp.log10(jnp.maximum(wz, 1e-30))

    abs_mask = block_lufs > _ABS_GATE_LUFS
    n_abs = jnp.maximum(jnp.sum(abs_mask), 1)
    z_abs = jnp.sum(jnp.where(abs_mask, wz, 0.0)) / n_abs
    rel_gate = -0.691 + 10.0 * jnp.log10(jnp.maximum(z_abs, 1e-30)) + _REL_GATE_LU

    mask = abs_mask & (block_lufs > rel_gate)
    n_sel = jnp.sum(mask)
    z_avg = jnp.sum(jnp.where(mask, wz, 0.0)) / jnp.maximum(n_sel, 1)
    lufs = -0.691 + 10.0 * jnp.log10(jnp.maximum(z_avg, 1e-30))
    return jnp.where((n_sel > 0) & jnp.any(abs_mask), lufs, -jnp.inf)


def loudness_normalize(
    data: jax.Array, measured_lufs: jax.Array, target_lufs: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Scale ``data`` from measured to target LUFS. Returns (audio, gain).

    Parity: pyln.normalize.loudness + the reference's gain bookkeeping
    (SonicSim_audio.py:77-81).
    """
    gain = 10.0 ** ((target_lufs - measured_lufs) / 20.0)
    return data * gain, gain


def lufs_norm(data: jax.Array, rate: int, target: float) -> tuple[jax.Array, jax.Array]:
    """Measure-and-normalize, with the reference's -40 fallback for silence
    and reference block-size shrink for sub-400 ms audio
    (SonicSim_audio.py:68-81)."""
    t = data.shape[-1]
    block_size = 0.4 if t / rate >= 0.4 else t / rate
    measured = integrated_loudness(data, rate, block_size=block_size)
    measured = jnp.where(jnp.isfinite(measured), measured, -40.0)
    return loudness_normalize(data, measured, target)
