"""Batched RIR-bank rendering: all (source, receiver, channel) items at once.

This replaces the reference's process-pool fan-out (render_rir_parallel,
SonicSim_rir.py:724-791 — one habitat Simulator per task, mp.Pool(cpu_count))
with a fully device-resident pipeline:

* geometry ON DEVICE: the shoebox image-source lattice is a regular
  (2·(2·order+1))³ grid — pure arithmetic — so only the source/receiver
  positions (a few KB) cross the host→device link instead of the
  enumerated (items, images) delay/gain tables (several MB; the tunneled
  TPU link measures ~23 MB/s, so shipping geometry dominated everything);
* directional gains ON DEVICE: mono/array (unity), binaural (cardioid
  head-shadow), ambisonics (real SH, ACN/SN3D, unrolled recurrence) — the
  jnp twins of ChannelModel.directional_gain;
* tap placement as a dense blocked WEIGHTED-ONE-HOT MATMUL, not a
  scatter: TPU scatter executes ~one update row per several hundred ns
  (it dominated the old formulation at ~4 ms/item) while the MXU chews
  the (bands·blocks, N)x(N, window) contraction in tens of µs. The
  per-band amplitude ``amp[n, b] = g_n · prod_w beta[b, w]^hits[n, w]``
  (PER-WALL materials — SonicSim_rir.py:189-193 counterpart) splits into
  a per-item broadband gain ``g_n`` inside the tap values and an
  item-independent (N, bands) reflection profile riding the placement
  one-hot, so placement accumulates directly into per-band impulse
  trains;
* the bank can stay ON DEVICE (``out_device=True``) for the downstream
  moving-source convolution — no 5 MB/bank device→host download.

Output is numerically equivalent to looping ``SyntheticRirOracle.render``
over pairs (same lattice, same sinc/Hann taps, same per-pair tail RNG
streams), verified by tests/test_bank_render.py. The item axis is the
mesh-shardable axis for multi-chip generation fan-out.
"""

from __future__ import annotations

import math
import os
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from .channels import ChannelModel
from .image_source import (
    SINC_HALF,
    SPEED_OF_SOUND,
    ShoeboxRoom,
    band_masks,
    image_sources,
)

_CHUNK = 64  # item-axis padding quantum: bounds distinct compiled shapes
# Time-block quantum for the placement matmul. The dense sinc/Hann tap
# evaluation covers win = _BLOCK + 128 columns per image, so a smaller
# block shrinks the placement's transcendental work (its measured hot
# loop) toward the 81 taps that actually matter, while the extra one-hot
# matmul columns (n_blocks grows as 1/_BLOCK) stay nearly free on the MXU.
# 128 → win=256, only 2.6× the live taps. Env knob for tuning experiments.
_BLOCK = max(128, int(os.environ.get("SONICSIM_BANK_BLOCK", "128")))
# Items per placement matmul (MXU batch). Clamped to >= 1: lax.map rejects
# a non-positive batch_size at render time, long after import.
_PLACE_BATCH = max(1, int(os.environ.get("SONICSIM_PLACE_BATCH", "8")))


def _real_sh(dirs, order: int) -> jax.Array:
    """Real spherical harmonics, ACN/SN3D, y-up: unit dirs →
    (..., (order+1)^2). jnp twin of channels.real_sh_matrix (unrolled
    recurrences, no Condon-Shortley phase). ``dirs`` is either an
    (..., 3) array or a tuple of (x, y, z) component arrays."""
    if isinstance(dirs, tuple):
        x, y, z = dirs
    else:
        x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    az = jnp.arctan2(-x, -z)
    s = jnp.clip(y, -1.0, 1.0)  # sin(elevation)
    c = jnp.sqrt(jnp.maximum(1.0 - s * s, 0.0))
    # Associated Legendre P_l^m(s) (positive convention) by recurrence.
    P = {(0, 0): jnp.ones_like(s)}
    for m in range(1, order + 1):
        P[(m, m)] = P[(m - 1, m - 1)] * float(2 * m - 1) * c
    for m in range(0, order):
        P[(m + 1, m)] = s * float(2 * m + 1) * P[(m, m)]
    for m in range(0, order + 1):
        for l in range(m + 2, order + 1):
            P[(l, m)] = (
                float(2 * l - 1) * s * P[(l - 1, m)]
                - float(l + m - 1) * P[(l - 2, m)]
            ) / float(l - m)
    cols = []
    for l in range(order + 1):
        for m in range(-l, l + 1):
            am = abs(m)
            norm = math.sqrt(
                (2.0 if m != 0 else 1.0)
                * math.factorial(l - am)
                / math.factorial(l + am)
            )
            leg = P[(l, am)]
            if m > 0:
                cols.append(norm * leg * jnp.cos(am * az))
            elif m < 0:
                cols.append(norm * leg * jnp.sin(am * az))
            else:
                cols.append(norm * leg)
    return jnp.stack(cols, axis=-1)


def _lattice_wall_hits(max_order: int):
    """Per-axis, per-wall reflection counts of the image lattice.

    Returns three (h0, hL) pairs of (K,) int arrays (K = 2·(2·order+1)) in
    the SAME per-axis flattening order as _device_geometry's coordinate
    reshape — wall 0 of an axis is hit |n − p| times and wall L |n| times
    (Allen & Berkley; the native kernel's convention,
    sonicsim_native.cpp image_sources). Item-independent: the amplitude
    profile built from these is shared by every (source, receiver) pair.
    """
    m = max_order
    n = jnp.arange(-m, m + 1, dtype=jnp.float32)[:, None]  # (2m+1, 1)
    p = jnp.arange(2, dtype=jnp.float32)[None, :]  # (1, 2)
    h0 = jnp.broadcast_to(jnp.abs(n - p), (2 * m + 1, 2)).reshape(-1)
    hL = jnp.broadcast_to(jnp.abs(n), (2 * m + 1, 2)).reshape(-1)
    return h0, hL  # identical for all three axes


def _amplitude_profile(beta_walls, max_order: int):
    """(N, n_bands) per-image per-band reflection product.

    amp[n, b] = prod_w beta[b, w]^hits[n, w], evaluated as a separable
    exp-of-outer-sums over the three axes (no (N, 6) hit matrix is ever
    materialized). ``beta_walls`` is (n_bands, 6) in image_source.WALLS
    order — per-wall material curves; a uniform room tiles one curve.
    This replaces the hit-CLASS factorization (beta**total_hits), which
    only holds when all six walls share one coefficient.
    """
    h0, hL = _lattice_wall_hits(max_order)  # (K,) each
    log_b = jnp.log(jnp.maximum(beta_walls, 1e-12))  # (B, 6)
    # Per-axis exponent tables (K, B).
    ex = h0[:, None] * log_b[None, :, 0] + hL[:, None] * log_b[None, :, 1]
    ey = h0[:, None] * log_b[None, :, 2] + hL[:, None] * log_b[None, :, 3]
    ez = h0[:, None] * log_b[None, :, 4] + hL[:, None] * log_b[None, :, 5]
    k = h0.shape[0]
    amp = jnp.exp(
        ex[:, None, None, :] + ey[None, :, None, :] + ez[None, None, :, :]
    )  # (K, K, K, B) — same (i→x, j→y, k→z) order as _device_geometry
    return amp.reshape(k * k * k, -1)


def _amplitude_profile_np(beta_walls: np.ndarray, max_order: int) -> np.ndarray:
    """Host/numpy twin of :func:`_amplitude_profile` (same lattice
    flattening order) — feeds the host-side SVD factorization below."""
    m = max_order
    n = np.arange(-m, m + 1, dtype=np.float64)[:, None]
    p = np.arange(2, dtype=np.float64)[None, :]
    h0 = np.broadcast_to(np.abs(n - p), (2 * m + 1, 2)).reshape(-1)
    hL = np.broadcast_to(np.abs(n), (2 * m + 1, 2)).reshape(-1)
    log_b = np.log(np.maximum(beta_walls, 1e-12))  # (B, 6)
    ex = h0[:, None] * log_b[None, :, 0] + hL[:, None] * log_b[None, :, 1]
    ey = h0[:, None] * log_b[None, :, 2] + hL[:, None] * log_b[None, :, 3]
    ez = h0[:, None] * log_b[None, :, 4] + hL[:, None] * log_b[None, :, 5]
    k = h0.shape[0]
    amp = np.exp(
        ex[:, None, None, :] + ey[None, :, None, :] + ez[None, None, :, :]
    )
    return amp.reshape(k * k * k, -1)


def _factor_amplitude_profile(
    beta_walls: np.ndarray, max_order: int, tol: float = 1e-7
) -> tuple[np.ndarray, np.ndarray]:
    """Rank-r factorization amp ≈ U @ V of the (N, n_bands) per-image
    band-amplitude profile, on the host (it depends only on per-room
    constants, never on items).

    The early-reflection stages then run on r ≤ n_bands TRAINS instead of
    n_bands BAND trains: placement contraction rows, the (P, ·, ir_len)
    accumulator, and the early rfft batch all shrink by r/n_bands. The
    rank is tiny in practice — EXACTLY 1 for a uniform room (every band
    shares one beta ⇒ identical columns) and ≤ ~16 at 1e-7 relative for
    six distinct banded material curves (the exponent structure
    Σ_w hits·log β[b,w] lives in a 6-curve manifold). r is padded to a
    multiple of 8 (MXU sublane) so at most 4 compiled shapes exist.
    """
    A = _amplitude_profile_np(beta_walls, max_order)
    n_bands = A.shape[1]
    U, s, Vt = np.linalg.svd(A, full_matrices=False)
    rank = max(1, int(np.sum(s > s[0] * tol)))
    # Exact rank 1 keeps its own bucket: a uniform room (every wall/band
    # one beta — the common generated-scene case) then folds the whole
    # profile into the per-item gains and the placement contraction runs
    # on ONE train (r=8 padding used to cost 8x contraction FLOPs and 8x
    # w_nb HBM traffic for zero information). Ranks >1 pad to the MXU
    # sublane multiple as before.
    r = 1 if rank == 1 else min(n_bands, -(-rank // 8) * 8)
    if r >= n_bands:  # no savings — keep the exact profile
        return A.astype(np.float32), np.eye(n_bands, dtype=np.float32)
    return (U[:, :r] * s[:r]).astype(np.float32), Vt[:r].astype(np.float32)


def _factor_tail_envelopes(
    rt60_bands: np.ndarray, ir_len: int, sample_rate: int,
    tol: float = 1e-8,
) -> tuple[np.ndarray, np.ndarray]:
    """Rank-Q factorization D ≈ U @ V of the per-band Eyring decay table
    D[b, t] = exp(-6.908·t/rt60_b), on the host (per-room constants only).

    The stochastic tail is ONE broadband noise stream per item (see
    image_source.tail_noise) shaped by per-band envelopes
    level_b·exp(-k_b·max(t−td, 0))·ramp(t). Because ramp(t) is zero for
    t ≤ td, the shift by the per-item direct delay factors EXACTLY as
    exp(k_b·td)·exp(-k_b·t), leaving D item-independent — so the batched
    tail runs Q ≤ n_bands FFTs per item instead of n_bands (Q is EXACTLY
    1 for a uniform room, where every band decays at one rate, and ~4-8
    for banded materials: decaying exponentials over a bounded interval
    are numerically low-rank)."""
    t_axis = np.arange(ir_len, dtype=np.float64) / sample_rate
    k_b = 6.908 / np.maximum(np.asarray(rt60_bands, np.float64), 1e-6)
    D = np.exp(-k_b[:, None] * t_axis[None, :])  # (B, L)
    U, s, Vt = np.linalg.svd(D, full_matrices=False)
    rank = max(1, int(np.sum(s > s[0] * tol)))
    q = 1 if rank == 1 else min(len(k_b), -(-rank // 4) * 4)
    return (U[:, :q] * s[:q]).astype(np.float32), Vt[:q].astype(np.float32)


_DIFF_RANK = 6  # diffraction-basis rank: ≤5e-4 abs curve error (see below)
_DIFF_GRID = 128  # log-detour interpolation grid size
_DIFF_DMIN, _DIFF_DMAX = 1e-4, 200.0  # detour range covered, metres


@lru_cache(maxsize=4)
def _diffraction_basis(n_bands: int, sample_rate: int):
    """Fixed rank-Q basis of the Maekawa edge-diffraction curve family.

    D(Δ, f) = (3 + 40·Δ·f/c)^(−1/2) over detours Δ (image_source.
    diffraction_band_gain) is numerically low-rank: SVD over a log-Δ grid
    gives ≤5e-4 absolute curve error at rank 6, i.e. ~4e-6 of the direct
    arrival once the 1/(4π·path) geometric factor applies — far inside
    the bank-vs-serial parity floor (1.9e-4). Returns device arrays
    (coeffs (grid, Q), basis (Q, n_bands)); the device core linearly
    interpolates coeffs at log Δ per edge. Room-independent: cached per
    (n_bands, sample_rate) only."""
    from .image_source import band_centers, diffraction_band_gain

    freqs = band_centers(n_bands, sample_rate)
    dgrid = np.geomspace(_DIFF_DMIN, _DIFF_DMAX, _DIFF_GRID)
    D = diffraction_band_gain(dgrid[:, None], freqs[None, :])  # (grid, B)
    _, _, Vt = np.linalg.svd(D, full_matrices=False)
    basis = Vt[:_DIFF_RANK]  # (Q, B), orthonormal rows
    coeffs = D @ basis.T  # (grid, Q)
    # Host numpy on purpose: this is called INSIDE _render_core's trace,
    # where jnp values would be tracers — caching those leaks them.
    return coeffs.astype(np.float32), basis.astype(np.float32)


def _device_edge_geometry(dims, srcs, recvs):
    """12-edge diffraction geometry for every item, entirely in jnp.

    (P, 3) srcs/recvs → (paths (P, 12) total path lengths, detours
    (P, 12), unit directions receiver→point (ux, uy, uz) each (P, 12)).
    Twin of image_source.edge_diffraction_paths: the minimizing point on
    edge {free axis f, other axes pinned at 0/L} has the unfolded-
    reflection closed form t* = (s_f·√B + r_f·√A)/(√A+√B) clamped to
    [0, L_f], with A/B the squared perpendicular distances."""
    paths, pts = [], []
    for f in range(3):
        a, b = [ax for ax in range(3) if ax != f]
        for wa_sel in (0, 1):
            for wb_sel in (0, 1):
                wa = dims[a] * wa_sel
                wb = dims[b] * wb_sel
                A = (srcs[:, a] - wa) ** 2 + (srcs[:, b] - wb) ** 2
                Bq = (recvs[:, a] - wa) ** 2 + (recvs[:, b] - wb) ** 2
                sa, sb = jnp.sqrt(A), jnp.sqrt(Bq)
                t = (srcs[:, f] * sb + recvs[:, f] * sa) / jnp.maximum(
                    sa + sb, 1e-9
                )
                t = jnp.clip(t, 0.0, dims[f])
                paths.append(
                    jnp.sqrt(A + (t - srcs[:, f]) ** 2)
                    + jnp.sqrt(Bq + (t - recvs[:, f]) ** 2)
                )
                pt = [None, None, None]
                pt[f] = t
                pt[a] = jnp.broadcast_to(wa, t.shape)
                pt[b] = jnp.broadcast_to(wb, t.shape)
                pts.append(jnp.stack(pt, axis=1))  # (P, 3)
    paths = jnp.stack(paths, axis=1)  # (P, 12)
    points = jnp.stack(pts, axis=1)  # (P, 12, 3)
    direct = jnp.linalg.norm(srcs - recvs, axis=1, keepdims=True)  # (P, 1)
    detours = jnp.maximum(paths - direct, 0.0)
    diff = points - recvs[:, None, :]  # (P, 12, 3)
    dist = jnp.maximum(jnp.linalg.norm(diff, axis=2), 1e-9)
    ux, uy, uz = (diff[..., i] / dist for i in range(3))
    return paths, detours, (ux, uy, uz)


def _directional_gain(channel_type, channel_order, ux, uy, uz, normals,
                      chan_idx):
    """Per-arrival channel gain — shared by the image lattice and the
    edge-diffraction arrivals. ``ux/uy/uz`` are (P, N) unit direction
    components receiver→source-image (twin of channels.directional_gain);
    ``normals`` (P, 3) carries the ear normal (Binaural) or the head
    rotation as [cos, sin, 0] (Ambisonics — SH offsets are zero, so the
    slot is free)."""
    if channel_type in ("Mono", "CustomArrayIR"):
        return jnp.ones_like(ux)
    if channel_type == "Binaural":
        return 0.6 + 0.4 * (
            ux * normals[:, 0:1] + uy * normals[:, 1:2] + uz * normals[:, 2:3]
        )
    if channel_type == "Ambisonics":
        c_, s_ = normals[:, 0:1], normals[:, 1:2]
        lx = c_ * ux - s_ * uz
        lz = s_ * ux + c_ * uz
        Y = _real_sh((lx, uy, lz), channel_order)  # (P, N, C)
        return jnp.take_along_axis(
            Y, chan_idx[:, None, None].astype(jnp.int32), axis=2
        )[..., 0]
    raise ValueError(f"unknown channel type {channel_type!r}")


def _device_geometry(dims, srcs, recvs, max_order: int, max_delay: float):
    """Image-source lattice for every item, entirely in jnp.

    ``srcs``/``recvs`` (P, 3) → delays_s (P, N), hits (P, N) int32,
    unit direction components (ux, uy, uz) each (P, N), valid (P, N)
    with N = (2·(2·max_order+1))³ — the same lattice as
    image_source.image_sources (positions/hit counts identical).

    The distance is a SEPARABLE outer sum of per-axis squared offsets
    (dx²[p,i] + dy²[p,j] + dz²[p,k]), so no (P, N, 3) stack/transpose is
    ever materialized — the measured cost of the old formulation's
    layout copies was ~24 ms of the 88 ms fused kernel.
    """
    m = max_order
    n = jnp.arange(-m, m + 1, dtype=jnp.float32)  # periodic index
    p = jnp.arange(2, dtype=jnp.float32)  # parity (mirrored or not)
    coeff = (1.0 - 2.0 * p)[None, :]  # (1, 2)
    dcomp = []  # per-axis image-to-receiver offsets: (P, K)
    hits_axis = []
    for ax in range(3):
        coord = (
            coeff[None] * srcs[:, ax, None, None]
            + (2.0 * n[:, None] * dims[ax])[None]
        )  # (P, 2m+1, 2)
        hits = jnp.abs(n[:, None] - p[None, :]) + jnp.abs(n[:, None])
        dcomp.append(coord.reshape(srcs.shape[0], -1) - recvs[:, ax, None])
        hits_axis.append(hits.reshape(-1))
    K = 2 * (2 * m + 1)
    P_items = srcs.shape[0]
    dx, dy, dz = dcomp
    d2 = (
        (dx * dx)[:, :, None, None]
        + (dy * dy)[:, None, :, None]
        + (dz * dz)[:, None, None, :]
    ).reshape(P_items, K * K * K)
    dist = jnp.sqrt(d2)
    hits = (
        hits_axis[0][:, None, None]
        + hits_axis[1][None, :, None]
        + hits_axis[2][None, None, :]
    ).reshape(-1)  # (N,)
    valid = (dist / SPEED_OF_SOUND <= max_delay) & (dist >= 1e-6)
    delays_s = dist / SPEED_OF_SOUND
    inv = 1.0 / jnp.maximum(dist, 1e-9)
    shape = (P_items, K, K, K)
    ux = (jnp.broadcast_to(dx[:, :, None, None], shape).reshape(d2.shape)) * inv
    uy = (jnp.broadcast_to(dy[:, None, :, None], shape).reshape(d2.shape)) * inv
    uz = (jnp.broadcast_to(dz[:, None, None, :], shape).reshape(d2.shape)) * inv
    hits_i = jnp.broadcast_to(
        hits.astype(jnp.int32)[None], (P_items, hits.shape[0])
    )
    return delays_s, hits_i, (ux, uy, uz), valid


def _assemble_core(
    delays_s,  # (P, N) float32 seconds
    g,  # (P, N) float32 directional_gain / (4 pi d), 0 where invalid
    valid,  # (P, N) bool
    amp_nb,  # (N, n_bands) per-image per-band SPECULAR reflection product
    delta_nb,  # (N, n_bands) per-image ENERGY gap total−specular (scattering)
    amp_u,  # (N, r) left factor of amp_nb ≈ amp_u @ amp_v (host SVD)
    amp_v,  # (r, n_bands) right factor
    noise_keys,  # (P,) typed PRNG keys — tail noise generated ON DEVICE
    masks,  # (n_bands, nfft//2+1) float32 filterbank partition
    rt60_bands,  # (n_bands,) float32 damped-Eyring RT60 per band
    tail_u,  # (n_bands, q) left factor of the Eyring decay table
    tail_v,  # (q, ir_len) right factor (host SVD — _factor_tail_envelopes)
    sample_rate: int,
    ir_len: int,
    nfft: int,
    edge_delays_s=None,  # (P, 12) edge-diffraction arrival times, or None
    edge_w=None,  # (P, 12, Q) per-edge loadings in the diffraction basis
    diff_v=None,  # (Q, n_bands) diffraction band basis
):
    """(P items) → (P, ir_len) float32 RIRs. See module docstring.

    Tap placement evaluates each image's 81 windowed-sinc taps densely
    over its 1024-sample time block's window (exact same sinc/Hann
    formula as the serial renderer, masked to the original tap
    positions), then one einsum against the block one-hot weighted by
    the amplitude profile's rank-r LEFT factor — W[n, q·blocks+blk] =
    amp_u[n, q] — placing every image into r FACTOR trains at once
    (r ≤ n_bands; EXACTLY one train suffices for a uniform room — see
    _factor_amplitude_profile). Band structure is restored in the
    FREQUENCY domain: early_spec = Σ_q rfft(train_q)·(amp_v @ masks)_q,
    so the accumulator, the contraction rows, and the early rfft batch
    all scale with r instead of n_bands. Overlapping block windows are
    recombined with static slice-adds. ``lax.map(batch_size=8)`` keeps
    the live dense tap matrices at ~250 MB while giving the MXU a
    batched contraction (a per-item HIGHEST-precision matmul is ~8×
    slower).
    """
    pad = ir_len + 2 * SINC_HALF + 2
    win = _BLOCK + 128  # covers block + 2*SINC_HALF tap spill (80) aligned
    n_blocks = -(-pad // _BLOCK)
    n_bands = amp_nb.shape[1]
    r_amp = amp_u.shape[1]
    # r == 1 (uniform room): the single factor column folds into the
    # per-item gains OUTSIDE the placement map, the contraction drops to
    # a plain one-hot block placement, and no (N, r·blocks) weight matrix
    # is ever built (it was ~9.5 MB/item of pure HBM traffic).
    g_place = g * amp_u[:, 0][None, :] if r_amp == 1 else g

    has_edges = edge_delays_s is not None

    def place_one(args):
        """Impulse-train accumulation for ONE item → (r [+Q], ir_len)
        factor trains (band structure restored in the frequency domain
        below). With diffraction, the item's 12 edge arrivals are placed
        into Q extra trains carrying the diffraction-basis loadings."""
        delays_si, g_i = args[0], args[1]
        d = delays_si * sample_rate  # float samples
        base = jnp.floor(d)
        frac = d - base
        row = base.astype(jnp.int32) + SINC_HALF  # in [0, pad) when valid
        blk = row // _BLOCK
        # Window j=0..win-1 of block b covers absolute sample
        # T = b*block - 2*SINC_HALF + j; image n contributes
        # sinc(T-d_n)*hann(T-d_n)*g_n at T in [base-SINC_HALF, base+SINC_HALF]
        # (the original 2*SINC_HALF+1 tap positions — enforced by `mask`).
        j = jnp.arange(win, dtype=jnp.float32)
        off = d + 2 * SINC_HALF - (blk * _BLOCK).astype(jnp.float32)
        # The dense (N, win) sinc/Hann evaluation is the placement's hot
        # loop and per-element transcendentals dominate it (measured
        # 121 ms of the 131 ms map on chip). Both factor into per-row /
        # per-column terms via angle addition:
        #   sin(pi t)       = -(-1)^(j-ioff) sin(pi frac)
        #   cos(pi t / S1)  = cos(a_j) cos(b_n) + sin(a_j) sin(b_n)
        # leaving one divide + mul/adds per element (3x faster placement).
        # t is built as (j - ioff) - frac: the integer part is exact in
        # f32, so numerator and denominator stay consistent and, within
        # the 81-tap mask, t takes the SAME values (taps - frac) the
        # serial renderer evaluates (image_source.py:93-98). Computing
        # t = j - off instead would carry off's ~1e-4 rounding into the
        # denominator only, inflating near-peak error 10x.
        s1 = float(SINC_HALF + 1)
        # ioff must be EXACT (f32 rounding of off at ~1e3 differs from
        # frac's at d, so off - frac is not integer-valued): build it in
        # int32, where base + 2*SINC_HALF - blk*_BLOCK is exact.
        ioff_i = base.astype(jnp.int32) + 2 * SINC_HALF - blk * _BLOCK
        ioff = ioff_i.astype(jnp.float32)
        jm = j[None, :] - ioff[:, None]  # exact integer grid
        t = jm - frac[:, None]  # (N, win) = T - d
        sin_off = jnp.where(ioff_i % 2 == 0, 1.0, -1.0) * jnp.sin(
            jnp.pi * frac
        )
        sign_j = jnp.where(j % 2.0 == 0, 1.0, -1.0)
        sinc_t = jnp.where(
            jnp.abs(t) < 1e-6,
            1.0,
            (-sign_j[None, :] * sin_off[:, None]) / (jnp.pi * t),
        )
        a = jnp.pi * (j % (2.0 * s1)) / s1
        # off mod 2*s1 built from the exact integer part: ioff%82 + frac
        # stays below 82, so no large-magnitude rounding enters the Hann
        b = (
            jnp.pi
            * ((ioff_i % int(2 * s1)).astype(jnp.float32) + frac)
            / s1
        )
        window = 0.5 + 0.5 * (
            jnp.cos(a)[None, :] * jnp.cos(b)[:, None]
            + jnp.sin(a)[None, :] * jnp.sin(b)[:, None]
        )
        # jm == tap index k at the original positions (ioff == lb), so
        # the mask keeps exactly the serial renderer's 2*SINC_HALF+1 taps
        mask = jnp.abs(jm) <= SINC_HALF
        vals = jnp.where(mask, sinc_t * window, 0.0) * g_i[:, None]
        # One MXU contraction places all images into r factor trains:
        # row = q·n_blocks + blk, weighted by the image's factor loading
        # (amp_u is item-independent — same room for all items — so it
        # rides the closure, not the map).
        onehot = jax.nn.one_hot(blk, n_blocks, dtype=jnp.float32)  # (N, blocks)
        # Precision.HIGH (3-pass bf16) halves the placement cost vs
        # HIGHEST (6-pass) at identical end-to-end accuracy: both land at
        # 1.9e-4 max rel-err vs an all-f32 CPU render of the same bank —
        # the error floor comes from the f32 FFT/tail paths, not the
        # contraction passes.
        if r_amp == 1:  # amp folded into g above — plain block placement
            accw = jnp.einsum(
                "nb,nw->bw", onehot, vals, precision=jax.lax.Precision.HIGH
            )[None]
        else:
            w_nb = (amp_u[:, :, None] * onehot[:, None, :]).reshape(
                amp_u.shape[0], r_amp * n_blocks
            )
            accw = jnp.einsum(
                "nr,nw->rw", w_nb, vals, precision=jax.lax.Precision.HIGH
            ).reshape(r_amp, n_blocks, win)
        # Overlap-add the block windows (window of block b starts at padded
        # position p = T + 2*SINC_HALF = b*block). win = _BLOCK + 128 with
        # hop _BLOCK means ≤2 windows overlap anywhere, so the whole
        # stitch is TWO reshaped slice-adds — the head _BLOCK columns land
        # contiguously, the 128 spill columns land one block later —
        # instead of an n_blocks-long unrolled loop (which made XLA
        # compile time scale with 1/_BLOCK).
        spill = win - _BLOCK  # 128 ≤ _BLOCK by construction
        head = accw[:, :, :_BLOCK].reshape(r_amp, n_blocks * _BLOCK)
        tail = jnp.pad(
            accw[:, :, _BLOCK:], ((0, 0), (0, 0), (0, _BLOCK - spill))
        ).reshape(r_amp, n_blocks * _BLOCK)
        acc_pad = jnp.zeros((r_amp, n_blocks * _BLOCK + win), jnp.float32)
        acc_pad = acc_pad.at[:, : n_blocks * _BLOCK].add(head)
        acc_pad = acc_pad.at[:, _BLOCK : _BLOCK + n_blocks * _BLOCK].add(tail)
        out_i = acc_pad[:, 2 * SINC_HALF : 2 * SINC_HALF + ir_len]
        if not has_edges:
            return out_i
        # Edge-diffraction taps: the SAME blocked one-hot matmul +
        # two-slice overlap-add as the lattice above, on 12 rows — a
        # scatter here ran ~3 orders of magnitude slower on TPU (the
        # exact pathology the dense placement exists to avoid). The
        # windowed-sinc values use the serial renderer's plain formula
        # (_assemble_ir_1ch): 12×win elements are too few for the
        # angle-addition trick to matter.
        ed_i, ew_i = args[2], args[3]  # (12,), (12, Q)
        d_e = ed_i * sample_rate
        base_e = jnp.floor(d_e)
        frac_e = d_e - base_e
        row_e = base_e.astype(jnp.int32) + SINC_HALF
        blk_e = row_e // _BLOCK
        ioff_e = base_e.astype(jnp.int32) + 2 * SINC_HALF - blk_e * _BLOCK
        jm_e = (
            jnp.arange(win, dtype=jnp.float32)[None, :]
            - ioff_e.astype(jnp.float32)[:, None]
        )  # exact integer tap grid, as in the lattice path
        t_e = jm_e - frac_e[:, None]  # (12, win)
        win_fn = 0.5 + 0.5 * jnp.cos(jnp.pi * t_e / (SINC_HALF + 1))
        kern = jnp.where(
            jnp.abs(jm_e) <= SINC_HALF, jnp.sinc(t_e) * win_fn, 0.0
        )  # (12, win)
        onehot_e = jax.nn.one_hot(blk_e, n_blocks, dtype=jnp.float32)
        q_d = ew_i.shape[1]
        w_eb = (ew_i[:, :, None] * onehot_e[:, None, :]).reshape(
            12, q_d * n_blocks
        )
        eccw = jnp.einsum(
            "nr,nw->rw", w_eb, kern, precision=jax.lax.Precision.HIGH
        ).reshape(q_d, n_blocks, win)
        ehead = eccw[:, :, :_BLOCK].reshape(q_d, n_blocks * _BLOCK)
        etail = jnp.pad(
            eccw[:, :, _BLOCK:], ((0, 0), (0, 0), (0, _BLOCK - spill))
        ).reshape(q_d, n_blocks * _BLOCK)
        eacc = jnp.zeros((q_d, n_blocks * _BLOCK + win), jnp.float32)
        eacc = eacc.at[:, : n_blocks * _BLOCK].add(ehead)
        eacc = eacc.at[:, _BLOCK : _BLOCK + n_blocks * _BLOCK].add(etail)
        return jnp.concatenate(
            [out_i, eacc[:, 2 * SINC_HALF : 2 * SINC_HALF + ir_len]], axis=0
        )

    map_args = (
        (delays_s, g_place, edge_delays_s, edge_w)
        if has_edges
        else (delays_s, g_place)
    )
    accs = jax.lax.map(
        place_one, map_args, batch_size=_PLACE_BATCH
    )  # (P, r [+Q], ir_len)
    spec = jnp.fft.rfft(accs, nfft, axis=-1)  # (P, r [+Q], F)
    # Per-factor spectral mix: (amp_v @ masks)[q] is factor q's composite
    # band response — band weighting and the filterbank partition in one
    # (r [+Q], F) table; the diffraction-basis rows restore the edge
    # trains' band structure through the same einsum.
    v_all = jnp.concatenate([amp_v, diff_v], axis=0) if has_edges else amp_v
    vmask = jnp.einsum("qb,bf->qf", v_all, masks)
    early_spec = jnp.einsum("pqf,qf->pf", spec, vmask)  # (P, F)

    # Late tail: per-band Eyring decay, level matched to the mixing-zone
    # image energy (parity with render_shoebox_rir_multiband).
    big = jnp.float32(1e30)
    t_direct = jnp.min(jnp.where(valid, delays_s, big), axis=1)
    t_direct = jnp.where(jnp.any(valid, axis=1), t_direct, 0.0)  # (P,)
    mix_sel = (
        valid
        & (delays_s > t_direct[:, None] + 0.03)
        & (delays_s < t_direct[:, None] + 0.08)
    )
    # level_sel[p, b] = sqrt(mean_{n in sel} (g_pn · amp_nb)²) — the
    # serial renderer's sqrt(mean(amps[mix_sel]**2)) with amps = g·A
    # (g here is the raw gain — the r==1 placement fold lives in g_place).
    sel_sum = jnp.einsum(
        "pn,nb->pb", jnp.where(mix_sel, g * g, 0.0), amp_nb * amp_nb
    )
    k = jnp.sum(mix_sel, axis=1)  # (P,)
    level_sel = jnp.sqrt(sel_sum / jnp.maximum(k, 1)[:, None])  # (P, B)
    # Fallback when the mixing window is empty: 0.05·max_n |g·A| per band
    # (serial: np.abs(amps).max(axis=0) * 0.05). One fused reduce — XLA
    # streams the virtual (P, N, B) product without materializing it (the
    # old lax.map ran P/8 sequential launches for the same answer).
    level_fb = 0.05 * jnp.max(
        jnp.where(
            valid[:, :, None], jnp.abs(g)[:, :, None] * amp_nb[None], 0.0
        ),
        axis=1,
    )  # (P, n_bands)
    level = jnp.where((k > 0)[:, None], level_sel, level_fb)
    # Scattering's diffuse re-injection (parity with the serial renderer):
    # the energy the specular train lost per band, E_div[p,b] =
    # Σ_n g²·(∏β_total² − ∏β_spec²)^hits, returns through the tail —
    # unit-variance noise × A·exp(−k(t−td))·ramp carries A²·sr/(2k), so
    # the combined level is sqrt(level² + 2·k_b·E_div/sr).
    div_sum = jnp.einsum(
        "pn,nb->pb", jnp.where(valid, g * g, 0.0), delta_nb
    )
    k_b0 = 6.908 / jnp.maximum(rt60_bands, 1e-6)  # (B,)
    level = jnp.sqrt(
        level * level + 2.0 * k_b0[None, :] * div_sum / sample_rate
    )

    # Broadband tail noise (ONE stream per item — image_source.tail_noise)
    # shaped by rank-Q factored band envelopes: with D[b,t] = exp(-k_b t)
    # ≈ tail_u @ tail_v and the exact shift identity
    # exp(-k_b·max(t−td,0))·ramp = exp(k_b td)·exp(-k_b t)·ramp (ramp zeroes
    # t ≤ td), the per-band spectra collapse to Q FFTs per item:
    #   tail_spec = Σ_q rfft(noise·ramp·tail_v_q) · M_q,
    #   M_pq(f) = Σ_b masks[b,f]·level_pb·exp(k_b td_p)·tail_u[b,q].
    t_axis = jnp.arange(ir_len, dtype=jnp.float32) / sample_rate
    k_b = 6.908 / jnp.maximum(rt60_bands, 1e-6)  # (B,)
    lift = jnp.exp(k_b[None, :] * t_direct[:, None])  # (P, B)
    noise = jax.vmap(
        lambda key: jax.random.normal(key, (ir_len,), jnp.float32)
    )(noise_keys)  # (P, ir_len)
    ramp = (
        jnp.clip(
            (t_axis[None, :] - t_direct[:, None]) / 0.02, 0.0, 1.0
        )
        ** 2
    )  # (P, ir_len)
    sig = noise * ramp  # (P, ir_len)
    shaped_q = sig[:, None, :] * tail_v[None, :, :]  # (P, Q, ir_len)
    S = jnp.fft.rfft(shaped_q, nfft, axis=-1)  # (P, Q, F)
    cu = (level * lift)[:, :, None] * tail_u[None, :, :]  # (P, B, Q)
    M = jnp.einsum("pbq,bf->pqf", cu, masks)  # (P, Q, F)
    tail_spec = jnp.sum(S * M, axis=1)  # (P, F)
    # ONE shared irfft for early + tail (linearity: irfft(A)+irfft(B) ==
    # irfft(A+B) up to f32 rounding) — saves a full (P, nfft) inverse
    # transform per dispatch, ~10% of the fused render.
    return jnp.fft.irfft(early_spec + tail_spec, nfft, axis=-1)[:, :ir_len]


def _render_core(
    packed,  # (P, 13) f32: srcs(3)|recvs(3)|normals(3)|chan|seed_lo|seed_hi|bank
    consts,  # (3 + 13·n_bands,) f32: dims(3)|beta_spec(6B)|rt60(B)|beta_tot(6B)
    masks,  # (n_bands, nfft//2+1)
    amp_u,  # (N, r) host-SVD left factor of the amplitude profile
    amp_v,  # (r, n_bands) right factor
    tail_u,  # (n_bands, q) host-SVD left factor of the Eyring decay table
    tail_v,  # (q, ir_len) right factor
    *,
    n_bands: int,
    channel_type: str,
    channel_order: int,
    max_order: int,
    max_delay: float,
    sample_rate: int,
    ir_len: int,
    nfft: int,
    diffraction: bool = True,
):
    """Fused geometry → gains → assembly: (P, ir_len) un-normalized RIRs.

    Traceable body shared by the single-device jit and the shard_map mesh
    path (where P is the per-shard item count). Everything, tail-noise key
    derivation included, lives inside one trace so the remote link sees a
    single round trip. ALL per-item tables arrive as ONE packed f32 array
    handed to the jitted call as a host numpy operand: each separate
    host→device transfer on the tunneled link costs ~6 ms of latency
    regardless of size, while a single dispatch-carried operand measures
    ~2 ms total — the per-room constants and factor tables are cached
    device arrays and cost nothing per call. Integer columns ride as
    exact small floats (seeds split into two 16-bit halves) so no
    bitcast-on-the-wire tricks are needed."""
    from .image_source import tail_noise_key

    srcs, recvs, normals = packed[:, 0:3], packed[:, 3:6], packed[:, 6:9]
    chan_idx = packed[:, 9].astype(jnp.int32)
    seeds = (
        packed[:, 11].astype(jnp.uint32) * jnp.uint32(65536)
        + packed[:, 10].astype(jnp.uint32)
    )
    dims = consts[0:3]
    beta_walls = consts[3 : 3 + 6 * n_bands].reshape(n_bands, 6)
    rt60_bands = consts[3 + 6 * n_bands : 3 + 7 * n_bands]
    beta_total = consts[3 + 7 * n_bands : 3 + 13 * n_bands].reshape(
        n_bands, 6
    )

    delays_s, _hits, (ux, uy, uz), valid = _device_geometry(
        dims, srcs, recvs, max_order, max_delay
    )
    amp_nb = _amplitude_profile(beta_walls, max_order)  # (N, n_bands)
    # Scattering's per-image ENERGY gap: total-reflected minus specular
    # (prod β²^hits — squaring the amplitude profile squares every factor).
    amp_tot = _amplitude_profile(beta_total, max_order)
    delta_nb = amp_tot * amp_tot - amp_nb * amp_nb  # (N, n_bands)
    gain = _directional_gain(
        channel_type, channel_order, ux, uy, uz, normals, chan_idx
    )
    g = jnp.where(
        valid,
        gain / (4.0 * jnp.pi * delays_s * SPEED_OF_SOUND + 1e-30),
        0.0,
    ).astype(jnp.float32)

    edge_delays_s = edge_w = diff_v = None
    if diffraction:
        # 12-edge Maekawa/UTD arrivals (the reference tracer's
        # enableDiffraction, SonicSim_rir.py:179): per-edge band curves
        # live in a fixed rank-Q basis; the per-item loading is the
        # log-detour-interpolated coefficient times the geometric gain.
        diff_c, diff_v = _diffraction_basis(n_bands, sample_rate)
        paths, detours, (eux, euy, euz) = _device_edge_geometry(
            dims, srcs, recvs
        )
        e_gain = _directional_gain(
            channel_type, channel_order, eux, euy, euz, normals, chan_idx
        )
        e_valid = paths / SPEED_OF_SOUND <= max_delay
        e_g = jnp.where(
            e_valid, e_gain / (4.0 * jnp.pi * paths + 1e-30), 0.0
        )  # (P, 12)
        lo, hi = float(np.log(_DIFF_DMIN)), float(np.log(_DIFF_DMAX))
        pos = (
            (jnp.log(jnp.maximum(detours, _DIFF_DMIN)) - lo)
            / (hi - lo)
            * (_DIFF_GRID - 1)
        )
        pos = jnp.clip(pos, 0.0, _DIFF_GRID - 1)
        i0 = jnp.floor(pos).astype(jnp.int32)
        frac = (pos - i0.astype(jnp.float32))[..., None]  # (P, 12, 1)
        c0 = jnp.take(diff_c, i0, axis=0)  # (P, 12, Q)
        c1 = jnp.take(
            diff_c, jnp.minimum(i0 + 1, _DIFF_GRID - 1), axis=0
        )
        edge_w = (c0 * (1.0 - frac) + c1 * frac) * e_g[..., None]
        edge_delays_s = paths / SPEED_OF_SOUND

    noise_keys = jax.vmap(tail_noise_key)(seeds, chan_idx)
    return _assemble_core(
        delays_s,
        g,
        valid,
        amp_nb,
        delta_nb,
        amp_u,
        amp_v,
        noise_keys,
        masks,
        rt60_bands,
        tail_u,
        tail_v,
        sample_rate,
        ir_len,
        nfft,
        edge_delays_s=edge_delays_s,
        edge_w=edge_w,
        diff_v=diff_v,
    )


@partial(
    jax.jit,
    static_argnames=(
        "n_bands",
        "channel_type",
        "channel_order",
        "max_order",
        "max_delay",
        "sample_rate",
        "ir_len",
        "nfft",
        "n_banks",
        "peak_normalize",
        "diffraction",
    ),
)
def _render_items_device(
    packed,
    consts,
    masks,
    amp_u,
    amp_v,
    tail_u,
    tail_v,
    *,
    n_bands: int,
    channel_type: str,
    channel_order: int,
    max_order: int,
    max_delay: float,
    sample_rate: int,
    ir_len: int,
    nfft: int,
    n_banks: int,
    peak_normalize: bool,
    diffraction: bool = True,
):
    """Single-device dispatch: core render → per-bank peak norm.

    Operates on the FULL padded item axis so the compiled executable is
    keyed only by the _CHUNK-quantized bucket — the exact item count
    used to be a static arg, retracing + recompiling for every distinct
    mixture geometry. Padding rows duplicate item 0 (see
    _render_flat_items), so they can never raise a bank's max; the
    caller slices the valid prefix off the returned device array."""
    bank_ids = packed[:, 12].astype(jnp.int32)
    out = _render_core(
        packed,
        consts,
        masks,
        amp_u,
        amp_v,
        tail_u,
        tail_v,
        n_bands=n_bands,
        channel_type=channel_type,
        channel_order=channel_order,
        max_order=max_order,
        max_delay=max_delay,
        sample_rate=sample_rate,
        ir_len=ir_len,
        nfft=nfft,
        diffraction=diffraction,
    )
    if peak_normalize:
        item_peak = jnp.max(jnp.abs(out), axis=1)  # (padded,)
        peak = jax.ops.segment_max(
            item_peak, bank_ids, num_segments=n_banks
        )
        peak = jnp.where(peak > 0, peak, 1.0)
        out = out / peak[bank_ids, None]
    return out


@lru_cache(maxsize=16)
def _render_items_mesh_fn(mesh, **statics):
    """Build (and cache) the mesh-sharded renderer for one static config.

    shard_map over the padded item axis — the multi-chip fan-out that
    replaces the reference's mp.Pool over habitat Simulators
    (SonicSim_rir.py:751-791). Each device renders its item shard with the
    SAME fused core as the single-device path; per-bank peak normalization
    is a local segment_max followed by one pmax over the mesh axis (padding
    rows duplicate item 0, so they can never raise a bank's max)."""
    from jax.sharding import PartitionSpec

    n_banks = statics.pop("n_banks")
    peak_normalize = statics.pop("peak_normalize")
    axis = mesh.axis_names[0]
    spec_items = PartitionSpec(axis)
    spec_rep = PartitionSpec()

    def local(packed, consts, masks, amp_u, amp_v, tail_u, tail_v):
        out = _render_core(packed, consts, masks, amp_u, amp_v,
                           tail_u, tail_v, **statics)
        if peak_normalize:
            bank_ids = packed[:, 12].astype(jnp.int32)
            item_peak = jnp.max(jnp.abs(out), axis=1)
            peak = jax.ops.segment_max(
                item_peak, bank_ids, num_segments=n_banks
            )
            peak = jax.lax.pmax(jnp.maximum(peak, 0.0), axis)
            peak = jnp.where(peak > 0, peak, 1.0)
            out = out / peak[bank_ids, None]
        return out

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(spec_items, spec_rep, spec_rep, spec_rep,
                      spec_rep, spec_rep, spec_rep),
            out_specs=spec_items,
        )
    )


@lru_cache(maxsize=8)
def _cached_masks(n_bands: int, nfft: int, sample_rate: int) -> jax.Array:
    """Device-resident filterbank partition (2 MB — upload once)."""
    return jnp.asarray(band_masks(n_bands, nfft, sample_rate))


def _bank_params(oracle):
    """Shared scalar setup: (band_absorption, rt60_bands, ir_seconds,
    ir_len, nfft, beta_walls (n_bands, 6), factors..., consts).

    All material physics comes from ShoeboxRoom.wall_physics — the SAME
    tables the serial renderer consumes (render_shoebox_rir_multiband):
    ``beta_walls`` is the SPECULAR per-bounce amplitude
    sqrt((1−α−τ)(1−s)) and ``rt60_bands`` the damped-Eyring decay, so
    transmission, scattering, and damping stay bit-consistent across the
    serial and batched paths. The consts vector additionally carries the
    TOTAL-reflected β table — the device core rebuilds the specular vs
    total energy gap per image to feed scattering's diffuse tail boost."""
    room: ShoeboxRoom = oracle.room
    n_bands = oracle.n_bands
    phys = room.wall_physics(n_bands)
    rt60_bands = phys.rt60_bands
    ir_seconds = oracle.ir_seconds
    if ir_seconds is None:
        ir_seconds = min(max(float(rt60_bands.max()) * 1.1, 0.25), 2.0)
    ir_len = int(ir_seconds * oracle.sample_rate)
    nfft = int(2 ** np.ceil(np.log2(ir_len + 2 * SINC_HALF + 2)))
    beta_walls = phys.beta_spec  # (n_bands, 6)
    amp_u, amp_v = _cached_amp_factors(
        beta_walls.astype(np.float32).tobytes(), n_bands, oracle.max_order
    )
    tail_u, tail_v = _cached_tail_factors(
        np.asarray(rt60_bands, np.float32).tobytes(), ir_len,
        oracle.sample_rate,
    )
    consts = _cached_consts(
        np.concatenate(
            [
                np.asarray(oracle.room.dims, np.float32),
                np.asarray(beta_walls, np.float32).reshape(-1),
                np.asarray(rt60_bands, np.float32),
                np.asarray(phys.beta_total, np.float32).reshape(-1),
            ]
        ).tobytes()
    )
    return (phys.alpha_eff_mean, rt60_bands, ir_seconds, ir_len, nfft,
            beta_walls, amp_u, amp_v, tail_u, tail_v, consts)


@lru_cache(maxsize=32)
def _cached_amp_factors(beta_bytes: bytes, n_bands: int, max_order: int):
    """Per-room amplitude-profile factorization, cached by the beta table
    (the SVD costs ~15 ms on host — once per room, not per bank)."""
    beta = np.frombuffer(beta_bytes, np.float32).reshape(n_bands, 6)
    u, v = _factor_amplitude_profile(beta.astype(np.float64), max_order)
    return jnp.asarray(u), jnp.asarray(v)


@lru_cache(maxsize=32)
def _cached_tail_factors(rt60_bytes: bytes, ir_len: int, sample_rate: int):
    """Per-room tail-envelope factorization (device-resident, uploaded
    once — ~Q·ir_len floats)."""
    rt60 = np.frombuffer(rt60_bytes, np.float32)
    u, v = _factor_tail_envelopes(rt60, ir_len, sample_rate)
    return jnp.asarray(u), jnp.asarray(v)


@lru_cache(maxsize=64)
def _cached_consts(consts_bytes: bytes) -> jax.Array:
    """Per-room scalar vector as a cached device array: re-uploading it
    every call cost a full tunnel transfer latency (~6 ms)."""
    return jnp.asarray(np.frombuffer(consts_bytes, np.float32))


def _flatten_items(oracle, source_positions, receiver_positions, channel,
                   rotations):
    """Host-side item tables: per-(s, r, c) source/receiver/channel-index/
    ear-normal rows plus per-item tail-noise keys (a few KB total — the
    only per-item host→device traffic)."""
    n_src, n_recv, n_ch = (
        len(source_positions),
        len(receiver_positions),
        channel.count,
    )
    # Per-RECEIVER tables once (n_recv is small), then broadcast over the
    # source axis in one shot — the per-(s, r, c) Python loop this
    # replaces was ~40% of the healthy-link per-call wall time (the fused
    # device dispatch itself is ~17 ms; host prep ran ~10 ms of pure
    # list-append/stack overhead at 240 items).
    offs_r = np.stack(
        [channel.receiver_offsets(rot) for rot in rotations[:n_recv]]
    )  # (R, C, 3)
    if channel.channel_type == "Ambisonics":
        # SH offsets are all zero, so the normals slot is free: carry the
        # per-receiver head rotation as [cos, sin, 0] for the device-side
        # world→head dir rotation.
        rot = np.radians(np.asarray(rotations[:n_recv], np.float64))
        norms_r = np.broadcast_to(
            np.stack(
                [np.cos(rot), np.sin(rot), np.zeros_like(rot)], axis=1
            )[:, None, :],
            (n_recv, n_ch, 3),
        )
    else:
        norms_r = offs_r / np.maximum(
            np.linalg.norm(offs_r, axis=2, keepdims=True), 1e-9
        )
    recv_arr = np.asarray(receiver_positions, np.float64)  # (R, 3)
    src_arr = np.asarray(source_positions, np.float64)  # (S, 3)
    rc = (recv_arr[:, None, :] + offs_r).reshape(n_recv * n_ch, 3)
    srcs_flat = np.repeat(src_arr, n_recv * n_ch, axis=0)
    recvs_flat = np.tile(rc, (n_src, 1))
    normals = np.tile(norms_r.reshape(n_recv * n_ch, 3), (n_src, 1))
    chan_idx = np.tile(np.arange(n_ch, dtype=np.int32), n_src * n_recv)

    # Tail-noise keys: same (pair seed, channel) streams as
    # SyntheticRirOracle.render (image_source.tail_noise). hash() of the
    # rounded pair tuple must stay bit-identical to the serial oracle, so
    # this stays a (small, S·R-sized) Python loop.
    seeds_sr = np.empty((n_src, n_recv), np.int64)
    src_round = np.round(src_arr, 4)
    recv_round = np.round(recv_arr, 4)
    for s in range(n_src):
        s_part = tuple(src_round[s].tolist())
        for r in range(n_recv):
            pair = s_part + tuple(recv_round[r].tolist())
            seeds_sr[s, r] = int(
                np.uint32(oracle.seed)
                + np.uint32(abs(hash(pair)) % (2**31))
            )
    seeds = np.repeat(seeds_sr.reshape(-1), n_ch)
    return (
        srcs_flat.astype(np.float32),
        recvs_flat.astype(np.float32),
        normals.astype(np.float32),
        chan_idx,
        seeds,
    )


def _render_flat_items(oracle, srcs_flat, recvs_flat, normals, chan_idx,
                       seeds, channel, ir_params, peak_normalize: bool,
                       bank_ids: np.ndarray | None = None, mesh=None,
                       lower_only: bool = False):
    """Pad the item axis to a _CHUNK multiple and run the fused dispatch.

    With ``mesh``, the padded item axis is sharded over the mesh's first
    axis (shard_map — see _render_items_mesh_fn) instead of running on the
    default device."""
    (_, rt60_bands, ir_seconds, ir_len, nfft, beta_walls,
     amp_u, amp_v, tail_u, tail_v, consts) = ir_params
    n_items = len(srcs_flat)
    quantum = _CHUNK
    if mesh is not None:
        n_dev = int(np.prod(list(mesh.shape.values())))
        quantum = math.lcm(_CHUNK, n_dev)
    padn = (-n_items) % quantum

    if bank_ids is None:
        bank_ids = np.zeros(n_items, np.int32)
        n_banks = 1
    else:
        n_banks = int(bank_ids.max()) + 1
    # ONE packed per-item operand, handed to the jitted call as host
    # numpy (the transfer rides the dispatch): separate jnp.asarray
    # uploads cost ~6 ms of tunnel latency EACH regardless of size.
    # Integer columns travel as exact small floats — seeds split into
    # 16-bit halves so every value stays below 2^24.
    seeds_u = seeds.astype(np.uint32)
    packed = np.concatenate(
        [
            np.asarray(srcs_flat, np.float32),
            np.asarray(recvs_flat, np.float32),
            np.asarray(normals, np.float32),
            np.asarray(chan_idx, np.float32)[:, None],
            (seeds_u & np.uint32(0xFFFF)).astype(np.float32)[:, None],
            (seeds_u >> np.uint32(16)).astype(np.float32)[:, None],
            np.asarray(bank_ids, np.float32)[:, None],
        ],
        axis=1,
    )
    if padn:
        packed = np.concatenate([packed, np.repeat(packed[:1], padn, axis=0)])
    statics = dict(
        n_bands=oracle.n_bands,
        channel_type=channel.channel_type,
        channel_order=channel.channel_order,
        max_order=oracle.max_order,
        max_delay=float(ir_seconds),
        sample_rate=oracle.sample_rate,
        ir_len=ir_len,
        nfft=nfft,
        diffraction=bool(getattr(oracle.room, "diffraction", True)),
    )
    masks_dev = _cached_masks(oracle.n_bands, nfft, oracle.sample_rate)
    if lower_only:
        # Roofline hook (scripts/roofline.py): hand back the exact jitted
        # dispatch + operands without executing, for XLA cost analysis.
        import functools

        fn = functools.partial(
            _render_items_device, n_banks=n_banks,
            peak_normalize=peak_normalize, **statics,
        )
        return fn, (packed, consts, masks_dev, amp_u, amp_v, tail_u, tail_v)
    if mesh is not None:
        fn = _render_items_mesh_fn(
            mesh, n_banks=n_banks, peak_normalize=peak_normalize, **statics
        )
        return fn(packed, consts, masks_dev, amp_u, amp_v,
                  tail_u, tail_v)[:n_items]
    return _render_items_device(
        packed,
        consts,
        masks_dev,
        amp_u,
        amp_v,
        tail_u,
        tail_v,
        n_banks=n_banks,
        peak_normalize=peak_normalize,
        **statics,
    )[:n_items]


def render_bank_batched(
    oracle,
    source_positions: list[np.ndarray],
    receiver_positions: list[np.ndarray],
    channel: ChannelModel,
    receiver_rotations: list[float] | None = None,
    peak_normalize: bool = True,
    out_device: bool = False,
    mesh=None,
    lower_only: bool = False,
):
    """All-pairs bank (S, R, C, L) via the batched multiband renderer.

    Matches ``render_rir_bank``'s serial loop over
    ``SyntheticRirOracle.render`` (multiband path) numerically: identical
    image lattice, identical per-pair tail RNG streams. With
    ``out_device=True`` the bank is returned as a device-resident
    ``jax.Array`` (no device→host download) for on-device consumers.
    """
    rotations = receiver_rotations or [90.0] * len(receiver_positions)
    ir_params = _bank_params(oracle)
    srcs_flat, recvs_flat, normals, chan_idx, seeds = _flatten_items(
        oracle, source_positions, receiver_positions, channel, rotations
    )
    out = _render_flat_items(
        oracle, srcs_flat, recvs_flat, normals, chan_idx, seeds, channel,
        ir_params, peak_normalize, mesh=mesh, lower_only=lower_only,
    )
    if lower_only:
        return out  # (jitted fn, operands) — see _render_flat_items
    ir_len = ir_params[3]
    shape = (
        len(source_positions),
        len(receiver_positions),
        channel.count,
        ir_len,
    )
    if out_device:
        return out.reshape(shape)
    return np.asarray(out).reshape(shape)


def render_rir_banks(
    oracle,
    source_lists: list[list[np.ndarray]],
    receiver_positions: list[np.ndarray],
    channel: ChannelModel,
    receiver_rotations: list[float] | None = None,
    peak_normalize: bool = True,
    out_device: bool = False,
    mesh=None,
) -> list:
    """Render SEVERAL banks (e.g. one per speaker trajectory) in ONE fused
    device dispatch — the multi-speaker counterpart of the reference's
    pooled render_rir_parallel calls (SonicSim_rir.py:751-791). Each bank
    keeps its own peak normalization.

    Returns one (S_k, R, C, L) array per entry of ``source_lists``.
    """
    rotations = receiver_rotations or [90.0] * len(receiver_positions)
    ir_params = _bank_params(oracle)
    parts = [
        _flatten_items(oracle, srcs, receiver_positions, channel, rotations)
        for srcs in source_lists
    ]
    cat = [np.concatenate([p[i] for p in parts]) for i in range(5)]
    bank_ids = np.concatenate(
        [np.full(len(p[0]), k, np.int32) for k, p in enumerate(parts)]
    )
    out = _render_flat_items(
        oracle, *cat, channel, ir_params,
        peak_normalize=peak_normalize, bank_ids=bank_ids, mesh=mesh,
    )
    ir_len = ir_params[3]
    n_recv, n_ch = len(receiver_positions), channel.count
    banks = []
    start = 0
    for srcs in source_lists:
        n = len(srcs) * n_recv * n_ch
        bank = out[start : start + n].reshape(
            len(srcs), n_recv, n_ch, ir_len
        )
        start += n
        banks.append(bank if out_device else np.asarray(bank))
    return banks
