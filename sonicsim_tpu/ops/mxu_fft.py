"""Matmul-based FFT for TPU: 4-step Cooley-Tukey on the MXU.

XLA's TPU FFT runs on the VPU at a small fraction of peak and is extremely
radix-sensitive (measured: 5^4+ sizes ~50x slower, and even good sizes reach
only ~100-150 us per 64k rfft). The systolic array is idle during FFTs — so
for the framework's hot convolution loop we evaluate the DFT as two dense
matmul stages instead (N = N1*N2):

    X[k2 + N2*k1] = sum_{n1} W_N^{n1 k2} W_{N1}^{n1 k1}
                    * sum_{n2} x[n1 + N1*n2] W_{N2}^{n2 k2}

* inner stage: (..., n1, n2) @ F_{N2}      — one big MXU matmul
* twiddle:     elementwise complex (n1, k2) — VPU
* outer stage: contraction over n1 with F_{N1} rows k1 <= N1/2 (rfft)

Measured ~2.5-3x faster than XLA's rfft at 64k on the v5e chip, with
float32 accuracy (~1.5e-7 rel err) via Precision.HIGHEST matmuls.

Spectra live in GRID layout (..., h, N2) with h = N1//2 + 1 and
k = k2 + N2*k1 — pointwise spectrum products work unchanged in this layout,
so a conv pipeline never needs the flat ordering. Any even N1 works: there
are NO radix constraints (the DFT matrices are dense), so nfft can hug the
window length (multiple of N2) instead of rounding up to 2^k.

Grid note: the layout covers k in [0, N/2 + N2 - 1] — slightly past
Nyquist. Entries beyond N/2 are genuine DFT values (conjugates of bins just
below Nyquist), kept so products stay consistent; the inverse weights them
accordingly.

Reference hot loop being replaced: scipy oaconvolve / torch rfft
(SonicSim-SonicSet/SonicSim_moving.py:86, SonicSim_rir.py:86-90).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

_PRECISION = jax.lax.Precision.HIGHEST


@lru_cache(maxsize=None)
def _consts(n1: int, n2: int):
    """Host-side constant tables for an (n1, n2) split (float32 pairs)."""
    n = n1 * n2
    h = n1 // 2 + 1

    def cis(theta):
        return (
            np.cos(theta).astype(np.float32),
            np.sin(theta).astype(np.float32),
        )

    # Forward (negative exponent).
    f2r, f2i = cis(-2.0 * np.pi * np.outer(np.arange(n2), np.arange(n2)) / n2)
    twr, twi = cis(-2.0 * np.pi * np.outer(np.arange(n1), np.arange(n2)) / n)
    # Outer forward: rows k1 in [0, n1/2].
    e1r, e1i = cis(-2.0 * np.pi * np.outer(np.arange(n1), np.arange(h)) / n1)

    # Inverse (positive exponent).
    g1r, g1i = cis(2.0 * np.pi * np.outer(np.arange(h), np.arange(n1)) / n1)
    itr, iti = cis(2.0 * np.pi * np.outer(np.arange(n1), np.arange(n2)) / n)
    g2r, g2i = cis(2.0 * np.pi * np.outer(np.arange(n2), np.arange(n2)) / n2)

    # Inverse weights: every grid bin once, conjugate partners folded.
    w = np.full((h, n2), 2.0, np.float32)
    w[0, 0] = 1.0
    w[h - 1, 0] = 1.0  # Nyquist
    if h >= 2:
        w[h - 1, 1:] = 1.0  # bins past Nyquist (conjugate partners present)
        w[h - 2, 1:] = 1.0  # ...and the partners themselves
    return (f2r, f2i), (twr, twi), (e1r, e1i), (g1r, g1i), (itr, iti), (g2r, g2i), w


def grid_shape(n1: int, n2: int) -> tuple[int, int]:
    return n1 // 2 + 1, n2


def rfft_grid(x: jax.Array, n1: int, n2: int) -> jax.Array:
    """Real (..., T) with T <= n1*n2 → complex64 grid spectrum (..., h, n2).

    Zero-pads to n1*n2 (the overlap-save callers rely on this, matching
    jnp.fft.rfft(x, nfft) semantics).
    """
    (f2r, f2i), (twr, twi), (e1r, e1i), *_ = _consts(n1, n2)
    n = n1 * n2
    *lead, t = x.shape
    if t < n:
        x = jnp.pad(x, [(0, 0)] * len(lead) + [(0, n - t)])
    a = x.reshape(*lead, n2, n1)
    a = jnp.swapaxes(a, -1, -2).astype(jnp.float32)  # (..., n1, n2)
    br = jnp.matmul(a, jnp.asarray(f2r), precision=_PRECISION)
    bi = jnp.matmul(a, jnp.asarray(f2i), precision=_PRECISION)
    cr = br * twr - bi * twi
    ci = br * twi + bi * twr
    # outer: contract n1 → rows k1 (h); einsum keeps k2 as the lane dim.
    xr = jnp.einsum(
        "...nk,nh->...hk", cr, jnp.asarray(e1r), precision=_PRECISION
    ) - jnp.einsum("...nk,nh->...hk", ci, jnp.asarray(e1i), precision=_PRECISION)
    xi = jnp.einsum(
        "...nk,nh->...hk", cr, jnp.asarray(e1i), precision=_PRECISION
    ) + jnp.einsum("...nk,nh->...hk", ci, jnp.asarray(e1r), precision=_PRECISION)
    return jax.lax.complex(xr, xi)


def irfft_grid(y: jax.Array, n1: int, n2: int) -> jax.Array:
    """Complex grid spectrum (..., h, n2) → real (..., n1*n2)."""
    *_, (g1r, g1i), (itr, iti), (g2r, g2i), w = _consts(n1, n2)
    n = n1 * n2
    yr = jnp.real(y) * w
    yi = jnp.imag(y) * w
    # inner: contract k1 (h) → n1 rows.
    dr = jnp.einsum(
        "...hk,hn->...nk", yr, jnp.asarray(g1r), precision=_PRECISION
    ) - jnp.einsum("...hk,hn->...nk", yi, jnp.asarray(g1i), precision=_PRECISION)
    di = jnp.einsum(
        "...hk,hn->...nk", yr, jnp.asarray(g1i), precision=_PRECISION
    ) + jnp.einsum("...hk,hn->...nk", yi, jnp.asarray(g1r), precision=_PRECISION)
    cr = dr * itr - di * iti
    ci = dr * iti + di * itr
    # outer: contract k2, real part only.
    xr = jnp.matmul(cr, jnp.asarray(g2r), precision=_PRECISION) - jnp.matmul(
        ci, jnp.asarray(g2i), precision=_PRECISION
    )  # (..., n1, n2)
    x = jnp.swapaxes(xr, -1, -2).reshape(*xr.shape[:-2], n)
    return x * (1.0 / n)


def irfft_grid_lerp(
    ys: jax.Array,
    yd: jax.Array,
    alpha: jax.Array,
    beta: jax.Array,
    n1: int,
    n2: int,
) -> jax.Array:
    """Fused ``irfft(ys) + (alpha + beta·t)·irfft(yd)`` → real (..., n).

    The moving-conv crossfade epilogue as ONE final-stage matmul: in the
    grid layout, output time decomposes as t = j·n1 + i (row i, column
    j), so a linear ramp splits into a ROW term (alpha + beta·i), applied
    to the d-operand before the last contraction, and a COLUMN term
    (beta·n1·j), folded into a second constant DFT table g2·(n1·j). Both
    groups concatenate along the contraction axis into a single
    (..., n1, 4·n2) @ (4·n2, n2) matmul whose only output is the
    COMBINED render — the separate xr_s / xr_d tensors of the two-irfft
    formulation never exist. ``alpha``/``beta`` broadcast over the batch
    dims of ``ys`` (shape ys.shape[:-2] or prefix thereof).
    """
    *_, (g1r, g1i), (itr, iti), (g2r, g2i), w = _consts(n1, n2)
    n = n1 * n2

    def inner(y):
        yr = jnp.real(y) * w
        yi = jnp.imag(y) * w
        dr = jnp.einsum(
            "...hk,hn->...nk", yr, jnp.asarray(g1r), precision=_PRECISION
        ) - jnp.einsum("...hk,hn->...nk", yi, jnp.asarray(g1i), precision=_PRECISION)
        di = jnp.einsum(
            "...hk,hn->...nk", yr, jnp.asarray(g1i), precision=_PRECISION
        ) + jnp.einsum("...hk,hn->...nk", yi, jnp.asarray(g1r), precision=_PRECISION)
        return dr * itr - di * iti, dr * iti + di * itr  # cr, ci

    cr_s, ci_s = inner(ys)
    cr_d, ci_d = inner(yd)
    a = jnp.asarray(alpha, jnp.float32)[..., None, None]
    b = jnp.asarray(beta, jnp.float32)[..., None, None]
    i_ramp = a + b * jnp.arange(n1, dtype=jnp.float32)[:, None]
    P = jnp.concatenate(
        [cr_s + i_ramp * cr_d, ci_s + i_ramp * ci_d, b * cr_d, b * ci_d],
        axis=-1,
    )  # (..., n1, 4·n2)
    jcol = float(n1) * np.arange(n2, dtype=np.float32)[None, :]
    G = np.concatenate(
        [g2r, -g2i, g2r * jcol, -g2i * jcol], axis=0
    )  # (4·n2, n2) constant
    xr = jnp.matmul(P, jnp.asarray(G), precision=_PRECISION)  # (..., n1, n2)
    x = jnp.swapaxes(xr, -1, -2).reshape(*xr.shape[:-2], n)
    return x * (1.0 / n)


def pick_split(min_len: int, n2: int = 256) -> tuple[int, int]:
    """Smallest (n1, n2) with even n1 and n1*n2 >= min_len.

    No radix constraints: any even n1 works, so padding waste is < n2/len.
    """
    n1 = -(-min_len // n2)
    n1 += n1 % 2
    n1 = max(n1, 2)
    return n1, n2
