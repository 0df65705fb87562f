"""Waveform-domain enhancement losses (DCCRN family).

Parity: enhancement/look2hear/losses/dccrn_loss.py — negative SI-SNR between
the enhanced waveform and the clean target (train and eval variants share
the same math).
"""

from __future__ import annotations

import jax.numpy as jnp

from .sdr import singlesrc_neg_sdr


class DCCRNLoss:
    def __init__(self, sdr_type: str = "sisdr"):
        self.sdr_type = sdr_type

    def __call__(self, ests, refs):
        if refs.ndim == 3:  # (B, 1, T) clean targets from the datamodule
            refs = refs[:, 0]
        if ests.ndim == 3:
            ests = ests[:, 0]
        return jnp.mean(singlesrc_neg_sdr(ests, refs, self.sdr_type))


DCCRNEval = DCCRNLoss
