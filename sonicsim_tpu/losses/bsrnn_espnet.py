"""BSRNN-ESPnet losses (enhancement/look2hear/losses/bsrnn_espnet_loss.py).

MultiResL1SpecLoss: scale-projected time-domain L1 + multi-resolution
magnitude L1 (rectangular-window STFTs, sum reduction), averaged; eval is
negative SI-SDR.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.stft import stft
from .sdr import singlesrc_neg_sdr


class BSRNNESPNetLoss:
    def __init__(
        self,
        window_sz: tuple[int, ...] = (512,),
        hop_sz: tuple[int, ...] | None = None,
        eps: float = 1e-8,
        time_domain_weight: float = 0.5,
        normalize_variance: bool = False,
        reduction: str = "sum",
    ):
        self.window_sz = tuple(window_sz)
        self.hop_sz = tuple(hop_sz) if hop_sz else tuple(w // 2 for w in window_sz)
        self.eps = eps
        self.time_domain_weight = time_domain_weight
        self.normalize_variance = normalize_variance
        self.reduction = reduction

    def __call__(self, ests, targets):
        if targets.ndim == 3:
            targets = targets[:, 0]
        if ests.ndim == 3:
            ests = ests[:, 0]
        target, estimate = targets, ests
        if self.normalize_variance:
            target = target / jnp.std(target, axis=1, keepdims=True)
            estimate = estimate / jnp.std(estimate, axis=1, keepdims=True)
        scale = jnp.sum(estimate * target, -1, keepdims=True) / (
            jnp.sum(estimate**2, -1, keepdims=True) + self.eps
        )
        reduce = jnp.sum if self.reduction == "sum" else jnp.mean
        td_loss = reduce(jnp.abs(estimate * scale - target), axis=-1)

        spec_loss = jnp.zeros_like(td_loss)
        for w, h in zip(self.window_sz, self.hop_sz):
            window = jnp.ones((w,), jnp.float32)  # Stft(window=None)
            t_mag = jnp.abs(stft(target, w, h, window))
            e_mag = jnp.abs(stft(estimate * scale, w, h, window))
            spec_loss = spec_loss + reduce(
                jnp.abs(e_mag - t_mag), axis=(1, 2)
            )
        loss = td_loss * self.time_domain_weight + (
            1.0 - self.time_domain_weight
        ) * spec_loss / len(self.window_sz)
        return jnp.mean(loss)


class BSRNNESPNetEval:
    def __init__(self, n_fft: int = 960, hop_length: int = 480, win_length: int = 960):
        pass

    def __call__(self, ests, targets):
        if targets.ndim == 3:
            targets = targets[:, 0]
        if ests.ndim == 3:
            ests = ests[:, 0]
        return jnp.mean(singlesrc_neg_sdr(ests, targets, "sisdr"))
