"""Tracker variants: no-ASR alias and the 3-source split tracker.

Parity: separation/look2hear/metrics/wrapper_noasr.py (SDR/SI-SNR-only — the
default MetricsTracker here already runs without native sidecars, so it is
an alias) and splitwrapper.py:18-115 (SPlitMetricsTracker: PIT-align 3
estimates on SNR, then score speakers {0,1} ("two") and speaker 2 ("one")
separately, with mixture baselines).
"""

from __future__ import annotations

import csv
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..losses.pit import PITLossWrapper
from ..losses.sdr import PairwiseNegSDR
from .tracker import MetricsTracker

MetricsTrackerNoASR = MetricsTracker


class SplitMetricsTracker:
    COLUMNS = [
        "snt_id",
        "one_snr", "one_snr_i", "one_si-snr", "one_si-snr_i",
        "two_snr", "two_snr_i", "two_si-snr", "two_si-snr_i",
    ]

    def __init__(self, save_file: str | Path):
        self.save_file = Path(save_file)
        self.rows: list[dict] = []
        self.pit_sisnr = PITLossWrapper(PairwiseNegSDR("sisdr"), threshold_byloss=False)
        self.pit_snr = PITLossWrapper(PairwiseNegSDR("snr"), threshold_byloss=False)

    def __call__(self, mix, clean, estimate, key: str) -> None:
        mix = jnp.asarray(np.asarray(mix, np.float32).reshape(-1))
        clean = jnp.asarray(np.atleast_2d(np.asarray(clean, np.float32)))[None]
        est = jnp.asarray(np.atleast_2d(np.asarray(estimate, np.float32)))[None]
        _, est_np = self.pit_snr(est, clean, return_ests=True)
        mixb = jnp.broadcast_to(mix, clean.shape[1:])[None]

        def score(pit, a, b):
            return float(pit(a, b))

        row = {"snt_id": key}
        for name, pit in (("si-snr", self.pit_sisnr), ("snr", self.pit_snr)):
            two = score(pit, est_np[:, 0:2], clean[:, 0:2])
            one = score(pit, est_np[:, 2:3], clean[:, 2:3])
            two_base = score(pit, mixb[:, 0:2], clean[:, 0:2])
            one_base = score(pit, mixb[:, 2:3], clean[:, 2:3])
            row[f"two_{name}"] = -two
            row[f"two_{name}_i"] = -(two - two_base)
            row[f"one_{name}"] = -one
            row[f"one_{name}_i"] = -(one - one_base)
        self.rows.append(row)

    def final(self) -> dict:
        self.save_file.parent.mkdir(parents=True, exist_ok=True)
        avg = {"snt_id": "avg"}
        for c in self.COLUMNS[1:]:
            vals = [r[c] for r in self.rows]
            avg[c] = float(np.mean(vals)) if vals else float("nan")
        with open(self.save_file, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=self.COLUMNS)
            writer.writeheader()
            for r in self.rows + [avg]:
                writer.writerow(r)
        return {c: avg[c] for c in self.COLUMNS[1:]}
