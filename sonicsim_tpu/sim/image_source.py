"""Shoebox image-source RIR synthesis (the hermetic acoustic engine).

Role (SURVEY.md §2.7, §7.3): the reference's RIRs come from habitat-sim's
RLR bidirectional path tracer (50k rays, SH 5/3 — SonicSim_rir.py:176-187),
which is an external C++ dependency. The TPU build treats RIR generation as
an oracle; this module is the built-in physically-plausible implementation:
Allen-Berkley image sources for early reflections + a Sabine-calibrated
stochastic late tail, assembled on-device with batched JAX scatter ops.

Geometry/SH stay on host NumPy (tiny, data-dependent); the impulse-train →
waveform assembly (the O(images x taps x channels) part) is jitted.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .channels import ChannelModel

SPEED_OF_SOUND = 343.0
SINC_HALF = 40  # windowed-sinc fractional-delay taps: 2*SINC_HALF+1


# Wall index order shared by every per-wall consumer (the native kernel's
# contract, sonicsim_native.cpp image_sources): x0, xL, y0, yL, z0, zL.
# y is up, so y0 is the floor and yL the ceiling.
WALLS = ("x0", "xL", "y0", "yL", "z0", "zL")


@dataclass
class ShoeboxRoom:
    """Axis-aligned room [0,Lx]x[0,Ly]x[0,Lz] (y up).

    Absorption, most to least specific (the most specific set wins):

    * ``wall_absorption_bands`` — (6, n_curve) per-wall frequency curves in
      :data:`WALLS` order, the counterpart of the reference's per-surface
      material assignment (mp3d_material_config.json applied at
      SonicSim_rir.py:189-193,307);
    * ``absorption_bands`` — one frequency curve shared by all walls;
    * ``absorption`` — a broadband scalar.
    """

    dims: tuple[float, float, float]
    absorption: float = 0.3
    scattering: float = 0.1  # reserved (diffuse split), kept for config parity
    absorption_bands: tuple[float, ...] | None = None
    wall_absorption_bands: tuple[tuple[float, ...], ...] | None = None

    @staticmethod
    def _resample(curve, n_bands: int) -> np.ndarray:
        curve = np.asarray(curve, np.float64)
        x = np.linspace(0.0, 1.0, len(curve))
        xq = np.linspace(0.0, 1.0, n_bands)
        return np.interp(xq, x, curve)

    def wall_band_absorption(self, n_bands: int) -> np.ndarray:
        """Per-wall absorption curves → (n_bands, 6) in WALLS order."""
        if self.wall_absorption_bands is not None:
            if len(self.wall_absorption_bands) != 6:
                raise ValueError(
                    "wall_absorption_bands needs 6 curves "
                    f"({', '.join(WALLS)}), got "
                    f"{len(self.wall_absorption_bands)}"
                )
            return np.stack(
                [self._resample(c, n_bands) for c in self.wall_absorption_bands],
                axis=1,
            )
        return np.tile(self.band_absorption(n_bands)[:, None], (1, 6))

    def band_absorption(self, n_bands: int) -> np.ndarray:
        """Area-weighted room-mean absorption curve (n_bands,) — the value
        scalar consumers (Sabine/Eyring RT60, tail calibration) use."""
        if self.wall_absorption_bands is not None:
            walls = self.wall_band_absorption(n_bands)  # (n_bands, 6)
            w = self.wall_areas()
            return walls @ (w / w.sum())
        if self.absorption_bands is None:
            return np.full(n_bands, self.absorption)
        return self._resample(self.absorption_bands, n_bands)

    @property
    def is_uniform(self) -> bool:
        """True when every wall shares one absorption curve — the bank
        renderer's cheap hit-class factorization applies (bank_render)."""
        if self.wall_absorption_bands is None:
            return True
        first = np.asarray(self.wall_absorption_bands[0], np.float64)
        return all(
            np.array_equal(first, np.asarray(c, np.float64))
            for c in self.wall_absorption_bands[1:]
        )

    def wall_areas(self) -> np.ndarray:
        """(6,) wall areas in WALLS order."""
        lx, ly, lz = self.dims
        return np.array(
            [ly * lz, ly * lz, lx * lz, lx * lz, lx * ly, lx * ly]
        )

    @property
    def volume(self) -> float:
        lx, ly, lz = self.dims
        return lx * ly * lz

    @property
    def surface(self) -> float:
        lx, ly, lz = self.dims
        return 2.0 * (lx * ly + ly * lz + lx * lz)

    def mean_absorption(self) -> float:
        """Area-weighted broadband mean across walls."""
        if self.wall_absorption_bands is None:
            return self.absorption
        means = np.array(
            [float(np.mean(c)) for c in self.wall_absorption_bands]
        )
        w = self.wall_areas()
        return float(means @ (w / w.sum()))

    def rt60(self) -> float:
        """Sabine reverberation time (seconds), area-weighted absorption."""
        return 0.161 * self.volume / max(
            self.surface * self.mean_absorption(), 1e-6
        )


def image_sources(
    room: ShoeboxRoom, source: np.ndarray, max_order: int
) -> tuple[np.ndarray, np.ndarray]:
    """All image positions and reflection counts up to ``max_order`` per axis.

    Returns (positions (N, 3), wall_hits (N,)).
    """
    dims = np.asarray(room.dims)
    src = np.asarray(source, np.float64)
    rng_n = np.arange(-max_order, max_order + 1)
    pos_axes, hits_axes = [], []
    for ax in range(3):
        n = rng_n[:, None]  # periodic index
        p = np.array([0, 1])[None, :]  # parity (mirrored or not)
        coord = (1 - 2 * p) * src[ax] + 2 * n * dims[ax]
        hits = np.abs(n - p) + np.abs(n)
        pos_axes.append(coord.reshape(-1))
        hits_axes.append(hits.reshape(-1))
    px, py, pz = np.meshgrid(pos_axes[0], pos_axes[1], pos_axes[2], indexing="ij")
    hx, hy, hz = np.meshgrid(hits_axes[0], hits_axes[1], hits_axes[2], indexing="ij")
    positions = np.stack([px.reshape(-1), py.reshape(-1), pz.reshape(-1)], axis=1)
    return positions, (hx + hy + hz).reshape(-1)


def image_sources_walls(
    room: ShoeboxRoom, source: np.ndarray, max_order: int
) -> tuple[np.ndarray, np.ndarray]:
    """Image positions and PER-WALL reflection counts (Allen & Berkley).

    Returns (positions (N, 3), wall_hits (N, 6)) in WALLS order — wall w0
    of an axis (the 0-coordinate plane) is hit |n - p| times and wall wL
    |n| times for lattice index (n, parity p). Same lattice ordering as
    :func:`image_sources` (summing the pairs reproduces its hit counts).
    """
    dims = np.asarray(room.dims)
    src = np.asarray(source, np.float64)
    rng_n = np.arange(-max_order, max_order + 1)
    pos_axes, h0_axes, hL_axes = [], [], []
    for ax in range(3):
        n = rng_n[:, None]
        p = np.array([0, 1])[None, :]
        coord = (1 - 2 * p) * src[ax] + 2 * n * dims[ax]
        pos_axes.append(coord.reshape(-1))
        h0_axes.append(np.broadcast_to(np.abs(n - p), coord.shape).reshape(-1))
        hL_axes.append(np.broadcast_to(np.abs(n), coord.shape).reshape(-1))
    px, py, pz = np.meshgrid(pos_axes[0], pos_axes[1], pos_axes[2], indexing="ij")
    positions = np.stack([px.reshape(-1), py.reshape(-1), pz.reshape(-1)], axis=1)
    k = len(pos_axes[0])
    grids = np.meshgrid(np.arange(k), np.arange(k), np.arange(k), indexing="ij")
    wall_hits = np.stack(
        [
            h0_axes[0][grids[0].reshape(-1)],
            hL_axes[0][grids[0].reshape(-1)],
            h0_axes[1][grids[1].reshape(-1)],
            hL_axes[1][grids[1].reshape(-1)],
            h0_axes[2][grids[2].reshape(-1)],
            hL_axes[2][grids[2].reshape(-1)],
        ],
        axis=1,
    )
    return positions, wall_hits


@partial(jax.jit, static_argnames=("ir_len",))
def _assemble_ir_1ch(delays: jax.Array, amps: jax.Array, ir_len: int) -> jax.Array:
    """(N,) fractional-sample delays + (N,) amps → (ir_len,) impulse train
    via scattered windowed-sinc kernels."""
    taps = jnp.arange(-SINC_HALF, SINC_HALF + 1, dtype=jnp.float32)
    base = jnp.floor(delays)
    frac = delays - base
    t = taps[None, :] - frac[:, None]  # (N, taps)
    window = 0.5 + 0.5 * jnp.cos(jnp.pi * t / (SINC_HALF + 1))
    kern = jnp.sinc(t) * window * amps[:, None]  # (N, taps)
    idx = base[:, None].astype(jnp.int32) + taps[None, :].astype(jnp.int32)
    pad = ir_len + 2 * SINC_HALF + 2
    out = jnp.zeros((pad,), jnp.float32)
    out = out.at[jnp.clip(idx + SINC_HALF, 0, pad - 1)].add(kern)
    return out[SINC_HALF : SINC_HALF + ir_len]


_assemble_ir_mc = jax.jit(
    jax.vmap(_assemble_ir_1ch, in_axes=(1, 1, None)), static_argnums=(2,)
)  # (N, C) delays, (N, C) amps → (C, ir_len)


DEFAULT_N_BANDS = 32  # reference acoustic config (SonicSim_rir.py:185)


def band_centers(n_bands: int, sample_rate: int) -> np.ndarray:
    """Log-spaced band centers 20 Hz → Nyquist (RLR-style 32 bands)."""
    return np.geomspace(20.0, sample_rate / 2.0, n_bands)


def band_masks(n_bands: int, nfft: int, sample_rate: int) -> np.ndarray:
    """(n_bands, nfft//2+1) triangular partition-of-unity over rfft bins."""
    freqs = np.fft.rfftfreq(nfft, 1.0 / sample_rate)
    centers = band_centers(n_bands, sample_rate)
    log_c = np.log(centers)
    log_f = np.log(np.maximum(freqs, 1e-3))
    masks = np.zeros((n_bands, len(freqs)))
    for b in range(n_bands):
        lo = log_c[b - 1] if b > 0 else -np.inf
        hi = log_c[b + 1] if b < n_bands - 1 else np.inf
        up = (log_f - lo) / max(log_c[b] - lo, 1e-9) if np.isfinite(lo) else np.ones_like(log_f)
        down = (hi - log_f) / max(hi - log_c[b], 1e-9) if np.isfinite(hi) else np.ones_like(log_f)
        masks[b] = np.clip(np.minimum(up, down), 0.0, 1.0)
    # Normalize to a partition of unity so flat spectra pass unchanged.
    total = masks.sum(axis=0)
    return (masks / np.maximum(total, 1e-9)).astype(np.float32)


def tail_noise_key(seed: int, channel_index) -> jax.Array:
    """Typed PRNG key for one (pair, channel) tail-noise stream."""
    return jax.random.fold_in(jax.random.PRNGKey(seed), channel_index)


def tail_noise(seed: int, channel_index: int, ir_len: int):
    """Unit-variance BROADBAND tail noise (ir_len,) for one (pair, channel).

    The single definition shared by the serial multiband renderer and the
    batched bank renderer — identical streams by construction. One stream
    feeds every band: the per-band signals are carved out of it by the
    disjoint filterbank masks afterwards, which leaves them mutually
    uncorrelated exactly as independent per-band draws would be, at 1/B
    the RNG cost (B=32 bands × ir_len normals used to dominate the
    batched tail stage at ~6 ms per 240-item dispatch on chip)."""
    return jax.random.normal(
        tail_noise_key(seed, channel_index), (ir_len,), jnp.float32
    )


def render_shoebox_rir_multiband(
    room: "ShoeboxRoom",
    source_position: np.ndarray,
    receiver_position: np.ndarray,
    channel: ChannelModel,
    band_absorption: np.ndarray,  # (n_bands,) uniform or (n_bands, 6) per-wall
    sample_rate: int = 16000,
    receiver_rotation: float = 90.0,
    max_order: int = 4,
    ir_seconds: float | None = None,
    seed: int = 0,
) -> np.ndarray:
    """Frequency-dependent RIR: per-band image-source amplitudes (native C++
    enumeration when available) assembled as band impulse trains, filtered
    through a log-triangular filterbank, plus per-band Eyring tails → (C, L).

    This is the 32-band counterpart of the reference's RLR frequency-band
    rendering (SonicSim_rir.py:176-187). ``band_absorption`` of shape
    (n_bands, 6) carries PER-WALL curves in :data:`WALLS` order — the
    counterpart of the reference's per-surface material assignment
    (mp3d_material_config.json, SonicSim_rir.py:189-193,307); the Eyring
    tail then uses the area-weighted room mean per band.
    """
    from ..native import image_sources_multiband

    band_absorption = np.asarray(band_absorption, np.float64)
    if band_absorption.ndim == 1:
        wall_absorption = np.tile(band_absorption[:, None], (1, 6))
    else:
        wall_absorption = band_absorption
    n_bands = wall_absorption.shape[0]
    w = room.wall_areas()
    mean_absorption = wall_absorption @ (w / w.sum())  # (n_bands,)
    rt60_bands = 0.161 * room.volume / np.maximum(
        -room.surface * np.log(np.maximum(1.0 - mean_absorption, 1e-4)), 1e-6
    )  # Eyring per band, area-weighted mean absorption
    if ir_seconds is None:
        ir_seconds = min(max(float(rt60_bands.max()) * 1.1, 0.25), 2.0)
    ir_len = int(ir_seconds * sample_rate)

    offsets = channel.receiver_offsets(receiver_rotation)
    recv = np.asarray(receiver_position, np.float64)[None, :] + offsets  # (C, 3)
    beta = np.sqrt(np.maximum(1.0 - wall_absorption, 1e-4))  # (n_bands, 6)

    n_ch = channel.count
    out = np.zeros((n_ch, ir_len), np.float32)
    nfft = int(2 ** np.ceil(np.log2(ir_len + 2 * SINC_HALF + 2)))
    masks = band_masks(n_bands, nfft, sample_rate)

    t_axis = np.arange(ir_len) / sample_rate

    for c_idx in range(n_ch):
        native_out = image_sources_multiband(
            np.asarray(room.dims, np.float64),
            np.asarray(source_position, np.float64),
            recv[c_idx],
            max_order,
            beta,
            ir_seconds,
        )
        if native_out is None:  # pure-python fallback (per-wall, per-band)
            imgs, wall_hits = image_sources_walls(
                room, source_position, max_order
            )
            diff = imgs - recv[c_idx][None, :]
            dist = np.linalg.norm(diff, axis=1)
            # Same validity window as the native kernel
            # (sonicsim_native.cpp image_sources: d <= maxd, d >= 1e-6)
            # and the batched bank renderer (bank_render._lattice) — all
            # three paths must agree on edge-case images.
            keep = (dist / SPEED_OF_SOUND <= ir_seconds) & (dist >= 1e-6)
            delays = dist[keep] / SPEED_OF_SOUND
            dirs = diff[keep] / dist[keep, None]
            # amp[n, b] = prod_w beta[b, w]^hits[n, w] / (4 pi d_n) — the
            # native kernel's per-wall product, vectorized in log domain.
            log_beta = np.log(np.maximum(beta, 1e-12))  # (n_bands, 6)
            amps = np.exp(wall_hits[keep] @ log_beta.T) / (
                4.0 * np.pi * dist[keep]
            )[:, None]
        else:
            delays, amps, dirs = native_out
        gains = channel.directional_gain(dirs, receiver_rotation)[:, c_idx]
        amps = amps * gains[:, None]  # (N, n_bands)

        # Assemble per-band impulse trains and filter through the bank.
        delays_j = jnp.asarray(delays * sample_rate, jnp.float32)
        trains = _assemble_ir_mc(
            jnp.broadcast_to(delays_j[:, None], (len(delays), n_bands)),
            jnp.asarray(amps, jnp.float32),
            ir_len,
        )  # (n_bands, ir_len)
        spec = jnp.fft.rfft(trains, nfft) * jnp.asarray(masks)
        early = np.asarray(jnp.fft.irfft(spec.sum(axis=0), nfft)[:ir_len])

        # Per-band Eyring tails, decorrelated noise filtered per band.
        # Device-side threefry keyed on (pair seed, channel): the batched
        # bank renderer generates the identical stream on device, avoiding
        # host Gaussian generation AND the host->device noise upload (the
        # remote-tunnel H2D path measures ~10 MB/s).
        t_direct = float(delays.min()) if len(delays) else 0.0
        noise = np.asarray(tail_noise(seed, c_idx, ir_len))[None, :]
        decay = np.exp(
            -6.908 * np.maximum(t_axis[None, :] - t_direct, 0.0) / rt60_bands[:, None]
        )
        ramp = np.clip((t_axis - t_direct) / 0.02, 0.0, 1.0) ** 2
        mix_sel = (delays > t_direct + 0.03) & (delays < t_direct + 0.08)
        level = (
            np.sqrt(np.mean(amps[mix_sel] ** 2, axis=0))
            if mix_sel.any()
            else np.abs(amps).max(axis=0) * 0.05
        )
        shaped = noise * (level[:, None] * decay * ramp[None, :])
        tail_spec = jnp.fft.rfft(jnp.asarray(shaped), nfft) * jnp.asarray(masks)
        tail = np.asarray(jnp.fft.irfft(tail_spec.sum(axis=0), nfft)[:ir_len])
        out[c_idx] = early + tail
    return out


def render_shoebox_rir(
    room: ShoeboxRoom,
    source_position: np.ndarray,
    receiver_position: np.ndarray,
    channel: ChannelModel,
    sample_rate: int = 16000,
    receiver_rotation: float = 90.0,
    max_order: int = 4,
    ir_seconds: float | None = None,
    seed: int = 0,
) -> np.ndarray:
    """One (source, receiver) RIR → (C, L) float32.

    Direct + image-source early reflections with per-channel directional
    gains, plus a decorrelated exponential late tail calibrated to the
    Sabine RT60 and the late image-source energy envelope.
    """
    rt60 = max(room.rt60(), 0.05)
    if ir_seconds is None:
        ir_seconds = min(max(rt60 * 1.1, 0.25), 2.0)
    ir_len = int(ir_seconds * sample_rate)
    beta = np.sqrt(max(1.0 - room.absorption, 1e-4))

    offsets = channel.receiver_offsets(receiver_rotation)  # (C, 3)
    recv = np.asarray(receiver_position, np.float64)[None, :] + offsets  # (C, 3)
    imgs, hits = image_sources(room, source_position, max_order)

    # (N, C) distances & directions per channel acoustic center.
    diff = imgs[:, None, :] - recv[None, :, :]
    dist = np.maximum(np.linalg.norm(diff, axis=2), 1e-3)
    dirs = diff / dist[..., None]
    # direction gains use the channel's own direction; CustomArray/Binaural
    # spatialization also comes from the per-channel position offsets.
    gains = np.stack(
        [
            channel.directional_gain(dirs[:, c, :], receiver_rotation)[:, c]
            for c in range(channel.count)
        ],
        axis=1,
    )  # (N, C)
    amps = (beta**hits)[:, None] / (4.0 * np.pi * dist) * gains
    delays = dist / SPEED_OF_SOUND * sample_rate  # (N, C) float samples

    # Keep only images landing inside the IR window.
    keep = delays.min(axis=1) < ir_len - 1
    delays, amps = delays[keep], amps[keep]
    if len(delays) == 0:  # degenerate: source too far for the window
        return np.zeros((channel.count, ir_len), np.float32)

    # Late tail: exponential decay at the Sabine rate, starting after the
    # direct sound, energy-matched to the tail of the image-source train.
    rng = np.random.default_rng(seed)
    t = np.arange(ir_len) / sample_rate
    t_direct = float(delays.min()) / sample_rate if len(delays) else 0.0
    decay = np.exp(-6.908 * np.maximum(t - t_direct, 0.0) / rt60)
    ramp = np.clip((t - t_direct) / max(0.02, 1e-6), 0.0, 1.0) ** 2
    # Average squared image amplitude near the mixing time sets tail level.
    mix_t = t_direct + 0.05
    near = (delays.mean(axis=1) / sample_rate > mix_t - 0.02) & (
        delays.mean(axis=1) / sample_rate < mix_t + 0.03
    )
    level = np.sqrt(np.mean(amps[near] ** 2)) if near.any() else np.abs(amps).max() * 0.05
    tail = (
        rng.standard_normal((channel.count, ir_len), dtype=np.float32)
        * (level * decay * ramp)[None, :].astype(np.float32)
    )

    early = np.asarray(
        _assemble_ir_mc(
            jnp.asarray(delays, jnp.float32), jnp.asarray(amps, jnp.float32), ir_len
        )
    )
    return early + tail
