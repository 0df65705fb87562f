"""Plan executors: materialize long-audio plans and render mixtures.

Host side reads/places WAVs (I/O bound); the hot DSP — moving-source
convolution, static reverb, LUFS normalization — runs jitted on device via
``sonicsim_tpu.ops``.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..ops import (
    block_plan_sizes,
    convolve_fixed_receiver,
    convolve_moving_blocked,
    dynamic_interp_plan,
    lufs_norm,
    moving_block_plan,
    segment_plan,
)
from ..utils.wavio import read_wav, resample
from .plan import LongAudioPlan


def assemble_long_audio(
    plan: LongAudioPlan, mono_downmix: bool = True
) -> np.ndarray:
    """LongAudioPlan → (1, total_samples) float32 buffer."""
    out = np.zeros((1, plan.total_samples), np.float32)
    for p in plan.placements:
        wav, sr = read_wav(p.path)
        if sr != plan.sample_rate:
            wav = resample(wav, sr, plan.sample_rate)
        if mono_downmix and wav.shape[0] > 1:
            wav = wav.mean(axis=0, keepdims=True)
        seg = wav[:, p.src_start : p.src_start + p.length]
        out[:, p.dest_start : p.dest_start + seg.shape[-1]] += seg[0]
    return out


def render_moving_source(
    source_audio: np.ndarray,  # (T,) or (1, T)
    rir_bank: np.ndarray,  # (P, C, L) — one RIR per trajectory waypoint
    waypoints: np.ndarray,  # (P, 3)
    rng: np.random.Generator,
) -> np.ndarray:
    """Trajectory-crossfaded reverb → (C, T)
    (interpolate_moving_audio, SonicSim_moving.py:98-125)."""
    audio = np.asarray(source_audio, np.float32).reshape(-1)
    idx, w = dynamic_interp_plan(np.asarray(waypoints), audio.shape[-1], rng=rng)
    if rir_bank.shape[0] < 2:
        # Static degenerate case: plain fixed conv.
        return np.asarray(
            convolve_fixed_receiver(jnp.asarray(audio), jnp.asarray(rir_bank[0]))
        )
    offsets, lengths, max_seg = segment_plan(idx)
    # Fixed-size block plan: bounds the compiled FFT span at 16384 samples
    # whatever the segment raggedness (see fftconv.moving_block_plan).
    t = audio.shape[-1]
    block, nb = block_plan_sizes(max_seg, t, len(offsets))
    block_off, block_seg = moving_block_plan(offsets, lengths, t, block, nb)
    out = convolve_moving_blocked(
        jnp.asarray(audio),
        jnp.asarray(rir_bank),
        None,
        jnp.asarray(block_off),
        jnp.asarray(block_seg),
        block,
        # Fused crossfade epilogue (no per-sample weight array); w is a
        # plain linspace ramp here (dynamic_interp_plan), exactly what
        # the segment table reconstructs.
        seg_offsets=jnp.asarray(offsets),
        seg_lengths=jnp.asarray(lengths),
    )
    return np.asarray(out)


def render_static_source(source_audio: np.ndarray, rir: np.ndarray) -> np.ndarray:
    """(T,) ⊛ (C, L) → (C, T) (convolve_fixed_receiver path)."""
    audio = np.asarray(source_audio, np.float32).reshape(-1)
    return np.asarray(
        convolve_fixed_receiver(jnp.asarray(audio), jnp.asarray(rir))
    )


def loudness_normalize_to(
    audio: np.ndarray, sample_rate: int, target_lufs: float
) -> tuple[np.ndarray, float]:
    """(C, T) → LUFS-normalized (C, T); target already includes jitter
    (planner's job). Mirrors get_lufs_norm_audio minus the RNG."""
    out, gain = lufs_norm(jnp.asarray(audio), sample_rate, target_lufs)
    return np.asarray(out), float(gain)
