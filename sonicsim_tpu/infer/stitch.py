"""Cross-segment speaker tracking (permutation-consistent stitching).

Parity: separation/inference.py:32-98 — after separating each voice-active
segment independently, speaker order may flip between segments; the
reference re-tracks by ECAPA speaker-embedding cosine similarity against the
first segment. Here the embedding function is pluggable: the default is a
lightweight spectral-envelope signature (mean log-mel-like band energies),
which resolves most flips without a neural sidecar; an ECAPA callable can be
injected when available.
"""

from __future__ import annotations

from itertools import permutations
from typing import Callable, Sequence

import numpy as np

from ..ops.stft import hann_window, stft


def _spec_mag(wav, n_fft: int):
    import jax.numpy as jnp

    return jnp.abs(stft(jnp.asarray(wav), n_fft, 128, hann_window(n_fft)))


_SPEC_MAG_JIT = None  # one shared jit wrapper: per-call jax.jit() retraces


def spectral_embedding(wav: np.ndarray, sample_rate: int = 16000) -> np.ndarray:
    """Cheap speaker signature: time-averaged log band energies (64 bands)."""
    import jax

    global _SPEC_MAG_JIT
    if _SPEC_MAG_JIT is None:
        # jit rather than eager op-by-op: remote TPU backends reject some
        # ops outside a compiled computation.
        _SPEC_MAG_JIT = jax.jit(_spec_mag, static_argnums=1)

    n_fft = 512
    spec = np.asarray(_SPEC_MAG_JIT(wav, n_fft))
    bands = spec.reshape(-1, spec.shape[-1])  # (F, frames)
    # Pool 257 bins → 64 log bands.
    f = bands.shape[0]
    edges = np.linspace(0, f, 65).astype(int)
    feat = np.array(
        [np.log1p(bands[a:b].mean()) if b > a else 0.0 for a, b in zip(edges[:-1], edges[1:])]
    )
    norm = np.linalg.norm(feat)
    return feat / norm if norm > 0 else feat


def _cos(a: np.ndarray, b: np.ndarray) -> float:
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))


def stitch_segments(
    segments: Sequence[np.ndarray],
    sample_rate: int = 16000,
    embed_fn: Callable[[np.ndarray, int], np.ndarray] | None = None,
) -> list[np.ndarray]:
    """Reorder each segment's sources for speaker consistency.

    segments: list of (n_src, T_i) arrays (est sources per VAD segment).
    Returns the same list with per-segment source order aligned to the
    first segment's speakers (maximizing summed embedding similarity).
    """
    if not segments:
        return []
    embed = embed_fn or spectral_embedding
    n_src = segments[0].shape[0]
    ref_emb = [embed(segments[0][i], sample_rate) for i in range(n_src)]
    out = [np.asarray(segments[0])]
    for seg in segments[1:]:
        embs = [embed(seg[i], sample_rate) for i in range(n_src)]
        best_perm, best_score = None, -np.inf
        for perm in permutations(range(n_src)):
            score = sum(_cos(ref_emb[i], embs[p]) for i, p in enumerate(perm))
            if score > best_score:
                best_perm, best_score = perm, score
        out.append(np.asarray(seg)[list(best_perm)])
        # Running reference update keeps tracking through drift.
        ref_emb = [
            0.8 * ref_emb[i] + 0.2 * embs[best_perm[i]] for i in range(n_src)
        ]
    return out


def concatenate_tracks(segments: Sequence[np.ndarray]) -> np.ndarray:
    """Stitched segments → full tracks (n_src, total_T)
    (inference.py:95-97)."""
    return np.concatenate([np.asarray(s) for s in segments], axis=-1)
