"""Standalone permutation-max SI-SNR-improvement loss (losses/sisnri.py:4-42).

Returns the negated best-permutation mean SI-SNRi (improvement of the
estimates over the input mixture)."""

from __future__ import annotations

from itertools import permutations

import jax
import jax.numpy as jnp


def _si_snr_vs(ref: jax.Array, x: jax.Array, eps: float = 1e-8) -> jax.Array:
    """SI-SNR of x against ref; both zero-meaned. (..., T) → (...)."""
    x = x - x.mean(axis=-1, keepdims=True)
    ref = ref - ref.mean(axis=-1, keepdims=True)
    proj = (jnp.sum(x * ref, -1, keepdims=True) * ref) / jnp.sum(
        ref * ref, -1, keepdims=True
    )
    noise = x - proj
    return 10.0 * jnp.log10(
        (jnp.sum(proj * proj, -1) + eps) / (jnp.sum(noise * noise, -1) + eps)
    )


class SISNRi:
    """loss(mix, ests, refs): mix (B, T); ests/refs (B, S, T) → scalar."""

    def __call__(self, mix, ests, refs):
        n_src = ests.shape[1]
        scores = []
        for perm in permutations(range(n_src)):
            per_src = jnp.stack(
                [
                    _si_snr_vs(refs[:, t], ests[:, s]) - _si_snr_vs(refs[:, t], mix)
                    for s, t in enumerate(perm)
                ]
            )
            scores.append(per_src.mean(axis=0))  # (B,)
        best = jnp.max(jnp.stack(scores), axis=0)
        return -jnp.mean(best)
