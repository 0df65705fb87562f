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


@dataclass
class ShoeboxRoom:
    """Axis-aligned room [0,Lx]x[0,Ly]x[0,Lz] (y up), uniform absorption."""

    dims: tuple[float, float, float]
    absorption: float = 0.3
    scattering: float = 0.1  # reserved (diffuse split), kept for config parity

    @property
    def volume(self) -> float:
        lx, ly, lz = self.dims
        return lx * ly * lz

    @property
    def surface(self) -> float:
        lx, ly, lz = self.dims
        return 2.0 * (lx * ly + ly * lz + lx * lz)

    def rt60(self) -> float:
        """Sabine reverberation time (seconds)."""
        return 0.161 * self.volume / max(self.surface * self.absorption, 1e-6)


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
        rng.standard_normal((channel.count, ir_len)).astype(np.float32)
        * (level * decay * ramp)[None, :].astype(np.float32)
    )

    early = np.asarray(
        _assemble_ir_mc(
            jnp.asarray(delays, jnp.float32), jnp.asarray(amps, jnp.float32), ir_len
        )
    )
    return early + tail
