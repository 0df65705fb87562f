"""Small audio/list utilities (SonicSim_audio.py:49-151 + SonicSim_rir.py:24-41).

Host-side numpy helpers used by the generation pipeline; the jittable
level/LUFS math lives in ``ops.levels`` / ``ops.loudness``.
"""

from __future__ import annotations

from itertools import product
from typing import Any, Sequence

import numpy as np


def normalize(audio: np.ndarray, norm: str = "peak") -> np.ndarray:
    """Peak or RMS normalization (SonicSim_audio.py:49-66). The rms variant
    matches the reference's convention: RMS over the signal with trailing
    zeros trimmed, scaled by 100."""
    audio = np.asarray(audio)
    if norm == "peak":
        peak = np.abs(audio).max()
        return audio / peak if peak != 0 else audio
    if norm == "rms":
        trimmed = np.trim_zeros(audio, trim="b")
        rms = float(np.sqrt(np.mean(np.square(trimmed)))) * 100 if trimmed.size else 0.0
        return audio / rms if rms != 0 else audio
    raise NotImplementedError(f"unknown norm {norm!r}")


def clip_all(audio_list: Sequence[np.ndarray]) -> list[np.ndarray]:
    """Truncate every signal to the shortest length (SonicSim_audio.py:111)."""
    n = min(a.shape[-1] for a in audio_list)
    return [a[..., :n] for a in audio_list]


def clip_two(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Truncate the longer of two signals (SonicSim_audio.py:130-151)."""
    n = min(a.shape[-1], b.shape[-1])
    return a[..., :n], b[..., :n]


def sum_arrays_with_different_length(arrays: Sequence[np.ndarray]) -> np.ndarray:
    """Zero-pad to the longest then sum (SonicSim_rir.py ir_total combine)."""
    n = max(a.shape[-1] for a in arrays)
    out = np.zeros(arrays[0].shape[:-1] + (n,), dtype=np.result_type(*arrays))
    for a in arrays:
        out[..., : a.shape[-1]] += a
    return out


def pad_x_to_y(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Pad or crop x's last axis to y's length (torch_utils.py pad_x_to_y)."""
    diff = y.shape[-1] - x.shape[-1]
    if diff > 0:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, diff)]
        return np.pad(x, pad)
    return x[..., : y.shape[-1]]


def make_pad_mask(lengths, max_len: int | None = None) -> np.ndarray:
    """(B,) lengths → (B, T) bool mask, True at PADDED positions
    (espnet nets_utils.make_pad_mask semantics)."""
    lengths = np.asarray(lengths)
    t = int(max_len if max_len is not None else lengths.max())
    return np.arange(t)[None, :] >= lengths[:, None]


def all_pairs(list1: Sequence[Any], list2: Sequence[Any]) -> tuple[list, list]:
    """Cartesian product as two aligned lists (SonicSim_audio.py:88-109)."""
    pairs = list(product(list1, list2))
    if not pairs:
        return [], []
    a, b = zip(*pairs)
    return list(a), list(b)


def pcm16_exact(x: np.ndarray) -> np.ndarray | None:
    """int16 codes reproducing float array ``x`` EXACTLY (``q * 2^-15``
    round-trips bit-for-bit in f32), or None if any sample is off the
    PCM16 grid / at-or-over full scale. The single home of the
    "may this audio cross the link as int16?" predicate — used by both
    the assembled-track upload (dataset/generate.py) and the utterance
    cache (dataset/device_assembly.py)."""
    x = np.asarray(x)
    if x.size == 0:
        return x.astype(np.int16)
    if float(np.max(np.abs(x))) >= 32767.5 / 32768.0:
        return None
    q = np.rint(x * 32768.0)
    if np.array_equal(q.astype(np.float32) * np.float32(2.0**-15), x):
        return q.astype(np.int16)
    return None


def pcm16_quantize(x):
    """Float waveform → int16 PCM samples, ON DEVICE when given a
    ``jax.Array`` — bit-identical to utils/wavio.write_wav's host
    quantization (clip to [-1, 1-2^-15], scale, truncate toward zero),
    at half the device→host transfer size."""
    import jax.numpy as jnp

    xp = jnp if not isinstance(x, np.ndarray) else np
    return (
        xp.clip(x, -1.0, 1.0 - 1.0 / 32768.0) * 32768.0
    ).astype(xp.int16)
