"""MetricsTracker: per-segment eval accumulation → CSV with avg+std footer.

Parity: separation/look2hear/metrics/wrapper.py:28-199 (PIT-align on SNR,
then per-source SI-SDR(i)/SDR(i), STOI; silent-reference skip; try/except
per-segment isolation; ``final()`` appends avg and std rows). PESQ and the
ONNX MOS predictors (DNSMOS/SigMOS) and Whisper ASR are native sidecars in
the reference — here they are optional pluggable callables (see sidecars.py)
so the tracker degrades gracefully when they are absent.
"""

from __future__ import annotations

import csv
import logging
from pathlib import Path
from typing import Callable

logger = logging.getLogger(__name__)

import jax.numpy as jnp
import numpy as np

from ..losses.pit import find_best_perm, reorder_sources
from ..losses.sdr import pairwise_neg_sdr
from .sisdr import bss_sdr, si_sdr
from .stoi import stoi


class MetricsTracker:
    COLUMNS = ["snt_id", "sdr", "sdr_i", "si-snr", "si-snr_i", "stoi"]

    def __init__(
        self,
        save_file: str | Path,
        sample_rate: int = 16000,
        extra_metrics: dict[str, Callable] | None = None,
        extra_text: dict[str, Callable] | None = None,
    ):
        """extra_metrics: name -> fn(ref, est, sr) -> float (averaged rows).

        extra_text: name -> fn(est, sr) -> str — recorded verbatim per
        segment and excluded from the avg/std footer; the reference's ASR
        transcript column (wrapper.py:113,125) plugs in here.
        """
        self.save_file = Path(save_file)
        self.sample_rate = sample_rate
        self.extra = extra_metrics or {}
        self.extra_text = extra_text or {}
        self.rows: list[dict] = []
        self.skipped_silent = 0
        self.columns = (
            self.COLUMNS + sorted(self.extra) + sorted(self.extra_text)
        )
        # Sidecar factories may self-describe their implementation via a
        # ``backend`` attribute (e.g. make_pesq: compiled ITU vs native
        # approximation); recorded beside the CSV so scores are
        # comparable across machines.
        self.backends = {
            name: fn.backend
            for name, fn in {**self.extra, **self.extra_text}.items()
            if getattr(fn, "backend", None)
        }

    def __call__(
        self, mix: np.ndarray, clean: np.ndarray, estimate: np.ndarray, key: str
    ) -> None:
        """mix (T,), clean (n_src, T), estimate (n_src, T)."""
        mix = np.asarray(mix, np.float32).reshape(-1)
        clean = np.atleast_2d(np.asarray(clean, np.float32))
        estimate = np.atleast_2d(np.asarray(estimate, np.float32))
        # Skip silent references (wrapper.py:25-26,66) — but count them:
        # a systematically-silent corpus otherwise surfaces only as an
        # empty all-NaN CSV with no hint why.
        if bool(np.any(np.abs(clean).max(axis=-1) < 1e-6)):
            self.skipped_silent += 1
            logger.warning(
                "segment %r skipped: silent reference source "
                "(%d skipped so far)", key, self.skipped_silent,
            )
            return
        try:
            # PIT alignment on SNR (wrapper.py:62-66 convention).
            pw = pairwise_neg_sdr(
                jnp.asarray(estimate[None]), jnp.asarray(clean[None]), "snr"
            )
            _, idx = find_best_perm(pw)
            est = np.asarray(
                reorder_sources(jnp.asarray(estimate[None]), idx)
            )[0]

            row: dict = {"snt_id": key}
            mixb = np.broadcast_to(mix, clean.shape)
            sisdr_v = np.asarray(si_sdr(jnp.asarray(est), jnp.asarray(clean)))
            sisdr_b = np.asarray(si_sdr(jnp.asarray(mixb), jnp.asarray(clean)))
            sdr_v = np.asarray(bss_sdr(jnp.asarray(est), jnp.asarray(clean)))
            sdr_b = np.asarray(bss_sdr(jnp.asarray(mixb), jnp.asarray(clean)))
            row["si-snr"] = float(sisdr_v.mean())
            row["si-snr_i"] = float((sisdr_v - sisdr_b).mean())
            row["sdr"] = float(sdr_v.mean())
            row["sdr_i"] = float((sdr_v - sdr_b).mean())
            stoi_vals = [
                stoi(clean[i], est[i], self.sample_rate) for i in range(len(clean))
            ]
            stoi_vals = [v for v in stoi_vals if np.isfinite(v)]
            row["stoi"] = float(np.mean(stoi_vals)) if stoi_vals else float("nan")
            for name, fn in self.extra.items():
                try:
                    row[name] = float(
                        np.mean([fn(clean[i], est[i], self.sample_rate)
                                 for i in range(len(clean))])
                    )
                except Exception:
                    # The reference logs per-metric exceptions
                    # (wrapper.py:69-103); a quietly-NaN column hides a
                    # systematically broken sidecar.
                    logger.warning(
                        "extra metric %r failed on segment %r", name, key,
                        exc_info=True,
                    )
                    row[name] = float("nan")
            for name, fn in self.extra_text.items():
                try:
                    row[name] = " | ".join(
                        str(fn(est[i], self.sample_rate))
                        for i in range(len(est))
                    )
                except Exception:
                    logger.warning(
                        "text metric %r failed on segment %r", name, key,
                        exc_info=True,
                    )
                    row[name] = ""
            self.rows.append(row)
        except Exception:
            # Per-segment isolation (wrapper.py:69-103).
            logger.warning("metrics failed on segment %r", key, exc_info=True)
            return

    def update(self) -> dict:
        """Running means (progress prints, wrapper.py:150-154 role)."""
        if not self.rows:
            return {}
        return {
            c: float(np.nanmean([r.get(c, np.nan) for r in self.rows]))
            for c in self.columns
            if c != "snt_id" and c not in self.extra_text
        }

    def final(self) -> dict:
        """Write CSV with avg and std footer rows (wrapper.py:156-199)."""
        if self.skipped_silent:
            logger.warning(
                "%d/%d segments skipped for silent references",
                self.skipped_silent, self.skipped_silent + len(self.rows),
            )
        self.save_file.parent.mkdir(parents=True, exist_ok=True)
        avg = {"snt_id": "avg"}
        std = {"snt_id": "std"}
        for c in self.columns:
            if c == "snt_id" or c in self.extra_text:
                continue
            vals = np.array([r.get(c, np.nan) for r in self.rows], np.float64)
            avg[c] = float(np.nanmean(vals)) if len(vals) else float("nan")
            std[c] = float(np.nanstd(vals)) if len(vals) else float("nan")
        with open(self.save_file, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=self.columns)
            writer.writeheader()
            for r in self.rows + [avg, std]:
                writer.writerow({c: r.get(c, "") for c in self.columns})
        if self.backends:
            import json

            meta_file = self.save_file.with_suffix(".meta.json")
            meta_file.write_text(
                json.dumps({"metric_backends": self.backends}, indent=2)
            )
        return {
            c: avg[c]
            for c in self.columns
            if c != "snt_id" and c not in self.extra_text
        }
