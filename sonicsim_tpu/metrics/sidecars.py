"""Optional native metric sidecars: PESQ, DNSMOS/SigMOS (ONNX), Whisper ASR.

The reference relies on compiled externals for these
(separation/look2hear/metrics/wrapper.py:7-21: pesq, onnxruntime sessions
dnsmos.py:22-95 / sigmos.py:17-84, faster-whisper asr.py:3-12). None are
installable here, so each factory probes for its dependency and raises a
clear error otherwise; the MetricsTracker accepts them as extra_metrics
callables ``fn(ref, est, sample_rate) -> float``.
"""

from __future__ import annotations

from pathlib import Path


def make_pesq(mode: str = "wb"):
    """PESQ via the `pesq` package (ITU-T P.862 reference C code)."""
    try:
        from pesq import pesq as _pesq
    except ImportError as e:
        raise ImportError(
            "PESQ requires the `pesq` package (compiled ITU reference). "
            "Install it in a sidecar environment, or drop 'pesq' from the "
            "metric list."
        ) from e

    def _fn(ref, est, sample_rate):
        return float(_pesq(sample_rate, ref, est, mode))

    return _fn


def make_dnsmos(model_dir: str | Path, key: str = "OVRL"):
    """DNSMOS MOS predictor as a tracker extra-metric.

    Runs the published .onnx weights NATIVELY through the built-in
    ONNX→JAX executor (metrics/dnsmos.py; no onnxruntime needed) —
    ``model_dir`` must hold model_v8.onnx and sig_bak_ovr.onnx, the files
    the reference commits at separation/DNSMOS/. ``key`` selects which MOS
    axis the tracker records (OVRL | SIG | BAK | P808_MOS).

    Usage:
        tracker = MetricsTracker(csv, extra_metrics={
            "dnsmos": make_dnsmos("DNSMOS/")})
    """
    from .dnsmos import DNSMOS

    scorer = DNSMOS(model_dir)

    def metric(est, ref, rate=16000):
        import numpy as np

        return float(np.mean([
            scorer(np.asarray(e), rate)[key] for e in np.atleast_2d(est)
        ]))

    return metric


def make_sigmos(model_path: str | Path):
    """SigMOS (P.804) ONNX predictor — same sidecar contract as DNSMOS."""
    try:
        import onnxruntime  # noqa: F401
    except ImportError as e:
        raise ImportError("SigMOS requires onnxruntime (CPU sidecar).") from e
    raise NotImplementedError


def make_whisper_asr(model_size: str = "medium.en"):
    """Whisper transcription for WER-proxy eval (metrics/asr.py:3-12)."""
    try:
        from faster_whisper import WhisperModel  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "ASR metrics require faster-whisper (CTranslate2); run in a "
            "sidecar environment."
        ) from e
    raise NotImplementedError
