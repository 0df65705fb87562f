"""Permutation-invariant training (PIT) wrapper, jit-compatible.

Parity: separation/look2hear/losses/pit_wrapper.py:7-148. Differences forced
by XLA static shapes:
* the factorial path (one-hot perm einsum) is used for n_src ≤ _MAX_FACTORIAL
  (720 perms at n=6) instead of only n ≤ 3; Hungarian via scipy runs through
  ``jax.pure_callback`` only beyond that;
* ``threshold_byloss`` uses a masked mean over losses > -30 instead of
  boolean indexing (identical value, static shape).
"""

from __future__ import annotations

from itertools import permutations

import jax
import jax.numpy as jnp
import numpy as np

_MAX_FACTORIAL = 6
_THRESHOLD_DB = -30.0


def _perm_matrix(n_src: int) -> np.ndarray:
    perms = np.array(list(permutations(range(n_src))), dtype=np.int64)
    one_hot = np.zeros((len(perms), n_src, n_src), np.float32)
    for p, perm in enumerate(perms):
        one_hot[p, np.arange(n_src), perm] = 1.0
    return perms, one_hot


def find_best_perm(pair_wise_losses: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(B, n_est, n_tgt) loss matrix → (min mean loss (B,), perm indices (B, n_src)).

    ``batch_indices[b, tgt] = est`` assigned to target ``tgt`` (matching the
    reference's convention where ests are reordered as ests[perm]).
    """
    n_src = pair_wise_losses.shape[-1]
    pwl = jnp.swapaxes(pair_wise_losses, -1, -2)  # (B, n_tgt, n_est)
    if n_src <= _MAX_FACTORIAL:
        perms, one_hot = _perm_matrix(n_src)
        loss_set = jnp.einsum("bij,pij->bp", pwl, jnp.asarray(one_hot)) / n_src
        min_loss = jnp.min(loss_set, axis=1)
        idx = jnp.argmin(loss_set, axis=1)
        batch_indices = jnp.asarray(perms)[idx]
        return min_loss, batch_indices

    def _hungarian(mat):
        from scipy.optimize import linear_sum_assignment

        out = np.stack([linear_sum_assignment(m)[1] for m in np.asarray(mat)])
        return out.astype(np.int32)

    batch_indices = jax.pure_callback(
        _hungarian,
        jax.ShapeDtypeStruct((pwl.shape[0], n_src), jnp.int32),
        pwl,
        vmap_method="sequential",
    )
    min_loss = jnp.take_along_axis(pwl, batch_indices[..., None], axis=2).mean((-1, -2))
    return min_loss, batch_indices


def reorder_sources(sources: jax.Array, batch_indices: jax.Array) -> jax.Array:
    """Reorder (B, n_src, T) estimates by per-batch permutations."""
    return jnp.take_along_axis(sources, batch_indices[..., None], axis=1)


class PITLossWrapper:
    """Callable PIT wrapper. ``loss_func`` maps (ests, targets) to either a
    pairwise matrix (pit_from='pw_mtx') or per-pair losses (pit_from='pw_pt');
    'perm_avg' evaluates the full loss per permutation."""

    def __init__(self, loss_func, pit_from: str = "pw_mtx", threshold_byloss: bool = True):
        if pit_from not in ("pw_mtx", "pw_pt", "perm_avg"):
            raise ValueError(f"unsupported pit_from {pit_from!r}")
        self.loss_func = loss_func
        self.pit_from = pit_from
        self.threshold_byloss = threshold_byloss

    def __call__(self, ests, targets, return_ests: bool = False):
        n_src = targets.shape[1]
        if self.pit_from == "pw_mtx":
            pw_loss = self.loss_func(ests, targets)
        elif self.pit_from == "pw_pt":
            pw_loss = self._pw_from_pt(ests, targets)
        else:  # perm_avg
            return self._perm_avg(ests, targets, return_ests)
        if pw_loss.ndim != 3 or pw_loss.shape[0] != targets.shape[0]:
            raise ValueError("pairwise loss must be (B, n_est, n_tgt)")

        min_loss, batch_indices = find_best_perm(pw_loss)
        mean_loss = self._reduce(min_loss)
        if not return_ests:
            return mean_loss
        return mean_loss, reorder_sources(ests, batch_indices)

    def _reduce(self, min_loss):
        if self.threshold_byloss:
            # Reference: mean over losses > -30 when any exist
            # (pit_wrapper.py:52-54), else plain mean.
            mask = min_loss > _THRESHOLD_DB
            any_above = jnp.any(mask)
            masked = jnp.sum(jnp.where(mask, min_loss, 0.0)) / jnp.maximum(
                jnp.sum(mask), 1
            )
            return jnp.where(any_above, masked, jnp.mean(min_loss))
        return jnp.mean(min_loss)

    def _pw_from_pt(self, ests, targets):
        b, n_src, t = targets.shape
        est_b = jnp.repeat(ests, n_src, axis=1).reshape(b * n_src * n_src, t)
        tgt_b = jnp.tile(targets, (1, n_src, 1)).reshape(b * n_src * n_src, t)
        return self.loss_func(est_b, tgt_b).reshape(b, n_src, n_src)

    def _perm_avg(self, ests, targets, return_ests):
        n_src = targets.shape[1]
        if n_src > _MAX_FACTORIAL:
            raise ValueError("perm_avg only supported for n_src <= 6")
        perms, _ = _perm_matrix(n_src)
        loss_set = jnp.stack(
            [self.loss_func(ests[:, perm], targets) for perm in perms], axis=1
        )
        min_loss = jnp.min(loss_set, axis=1)
        idx = jnp.argmin(loss_set, axis=1)
        mean_loss = jnp.mean(min_loss)
        if not return_ests:
            return mean_loss
        return mean_loss, reorder_sources(ests, jnp.asarray(perms)[idx])
