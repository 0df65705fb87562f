"""MixIT: mixture-invariant training wrapper.

The reference ships this only as dead code (separation/look2hear/losses/
mixit.py — fully commented out; SURVEY.md §2.5). This is a working
implementation: estimates are assigned to the two input mixtures over all
2^M binary assignment matrices (each estimated source to exactly one
mixture), taking the minimum loss [Wisdom et al., 2020].
"""

from __future__ import annotations

from itertools import product

import jax
import jax.numpy as jnp
import numpy as np


def _assignment_matrices(n_est: int, n_mix: int = 2) -> np.ndarray:
    """(n_mix^n_est, n_mix, n_est) one-hot column assignment matrices."""
    mats = []
    for assign in product(range(n_mix), repeat=n_est):
        a = np.zeros((n_mix, n_est), np.float32)
        for src, mix in enumerate(assign):
            a[mix, src] = 1.0
        mats.append(a)
    return np.stack(mats)


class MixITLossWrapper:
    """loss_func maps (est_mixes (B, n_mix, T), mixtures (B, n_mix, T)) →
    (B,) (e.g. losses.multisrc_neg_sdr); returns the assignment-minimum
    mean loss, optionally with the best remix for inspection."""

    def __init__(self, loss_func, generalized: bool = True):
        self.loss_func = loss_func
        self.generalized = generalized

    def __call__(self, ests: jax.Array, mixtures: jax.Array,
                 return_est: bool = False):
        b, n_est, t = ests.shape
        n_mix = mixtures.shape[1]
        if n_est > 10:
            raise ValueError("MixIT enumerates n_mix^n_est assignments; "
                             f"n_est={n_est} is too large")
        mats = jnp.asarray(_assignment_matrices(n_est, n_mix))  # (K, n_mix, n_est)
        if not self.generalized:
            # Strict MixIT: each mixture receives at least one source.
            keep = np.asarray(mats.sum(axis=2) > 0).all(axis=1)
            mats = mats[np.flatnonzero(keep)]

        # (K, B, n_mix, T) candidate remixes.
        remixes = jnp.einsum("kms,bst->kbmt", mats, ests)
        losses = jax.vmap(lambda r: self.loss_func(r, mixtures))(remixes)  # (K, B)
        min_loss = jnp.min(losses, axis=0)
        if not return_est:
            return jnp.mean(min_loss)
        best = jnp.argmin(losses, axis=0)  # (B,)
        best_remix = jnp.take_along_axis(
            remixes, best[None, :, None, None], axis=0
        )[0]
        return jnp.mean(min_loss), best_remix
