"""Optional metric sidecars: PESQ, DNSMOS/SigMOS (ONNX), Whisper ASR.

The reference relies on compiled externals for these
(separation/look2hear/metrics/wrapper.py:7-21: pesq, onnxruntime sessions
dnsmos.py:22-95 / sigmos.py:17-84, faster-whisper asr.py:3-12). The ONNX
MOS predictors run NATIVELY here through metrics/onnx_jax.py — only the
model weights are required — and PESQ runs NATIVELY through metrics/pesq.py
(the compiled ITU binding is preferred when importable). Only Whisper
(CTranslate2) remains a dependency-gated factory; the MetricsTracker accepts
numeric sidecars as ``extra_metrics`` callables ``fn(ref, est, sr) -> float``
and text sidecars (ASR transcripts, wrapper.py:113/125) as ``extra_text``
callables ``fn(est, sr) -> str``.
"""

from __future__ import annotations

from pathlib import Path


def make_pesq(mode: str = "wb", native: bool | None = None):
    """PESQ tracker extra-metric (ITU-T P.862 / P.862.2).

    Prefers the compiled ITU reference (the `pesq` package) when it is
    importable; otherwise falls back to the native NumPy implementation
    of the P.862 pipeline (metrics/pesq.py — P.862-structured, not
    bit-exact with the ITU binary). ``native=True`` forces the native
    path, ``native=False`` requires the compiled package.
    """
    import logging

    scorer, backend = None, None
    if native is not True:
        try:
            from pesq import pesq as _pesq

            scorer = lambda r, e, sr: _pesq(sr, r, e, mode)  # noqa: E731
            backend = "itu-p862-compiled"
        except ImportError:
            if native is False:
                raise ImportError(
                    "make_pesq(native=False) requires the compiled `pesq` "
                    "package; omit native to use the built-in P.862 pipeline."
                ) from None
    if scorer is None:
        from .pesq import pesq as _native_pesq

        scorer = lambda r, e, sr: _native_pesq(r, e, sr, mode)  # noqa: E731
        backend = "native-p862-approx"
    # The two backends are NOT interchangeable numerically (the native one
    # is P.862-structured, not bit-exact); disclose which produced the
    # scores so CSVs are comparable across machines (ADVICE r2).
    logging.getLogger(__name__).info(
        "pesq_%s backend: %s", mode, backend
    )

    def _fn(ref, est, sample_rate):
        import numpy as np

        return float(np.mean([
            scorer(r, e, sample_rate)
            for r, e in zip(np.atleast_2d(ref), np.atleast_2d(est))
        ]))

    _fn.backend = backend
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
    from . import dnsmos as _dnsmos

    scorer = _dnsmos.DNSMOS(model_dir)

    # Tracker extra-metric convention is fn(ref, est, rate); DNSMOS is
    # reference-free and must score the ESTIMATE (wrapper.py:105-111).
    def metric(ref, est, rate=16000):
        import numpy as np

        return float(np.mean([
            scorer(np.asarray(e), rate)[key] for e in np.atleast_2d(est)
        ]))

    return metric


def make_sigmos(model_path: str | Path, key: str = "MOS_OVRL"):
    """SigMOS (P.804) predictor — same native-executor contract as DNSMOS.

    The P.804 feature frontend (48 kHz resample, 960-pt √Hann STFT,
    compressed mag+complex features — sigmos/sigmos.py:17-84) is pure DSP
    in metrics/sigmos.py; the graph runs through the built-in ONNX→JAX
    executor, so only the weights file is needed (not committed in the
    reference either). ``key`` picks one of the 7 MOS axes for the tracker
    column (MOS_COL | MOS_DISC | MOS_LOUD | MOS_NOISE | MOS_REVERB |
    MOS_SIG | MOS_OVRL).
    """
    from .sigmos import SigMOS

    if key not in SigMOS.AXES:
        raise ValueError(f"key must be one of {SigMOS.AXES}, got {key!r}")
    scorer = SigMOS(model_path)

    def metric(ref, est, sample_rate=16000):
        import numpy as np

        return float(np.mean([
            scorer(np.asarray(e), sample_rate)[key] for e in np.atleast_2d(est)
        ]))

    return metric


def make_sigmos_all(model_path: str | Path):
    """All 7 SigMOS axes as separate tracker columns.

    Returns a dict suitable for ``extra_metrics={**make_sigmos_all(p)}``,
    mirroring the reference's 7 MOS_* CSV columns (wrapper.py:48).
    Shares one SigMOS instance (one weights load) across the columns.
    """
    from .sigmos import SigMOS

    scorer = SigMOS(model_path)

    def _axis(key):
        def metric(ref, est, sample_rate=16000):
            import numpy as np

            return float(np.mean([
                scorer(np.asarray(e), sample_rate)[key]
                for e in np.atleast_2d(est)
            ]))

        return metric

    return {key: _axis(key) for key in SigMOS.AXES}


def make_whisper_asr(model_size: str = "medium.en", device: str = "cpu",
                     download_root: str | None = None,
                     native: bool | None = None):
    """Whisper transcription sidecar (metrics/asr.py:3-12 contract).

    Returns a text callable ``fn(audio, sample_rate) -> str`` for the
    tracker's ``extra_text`` slot — the reference records the raw estimate
    transcript per segment (wrapper.py:113,125); WER against a reference
    transcript is computed downstream with :func:`wer`.

    Dispatch: a ``model_size`` that is a local HF/OpenAI checkpoint path
    (config.json / vocab.json beside the weights, NOT a CTranslate2
    ``model.bin`` export) transcribes NATIVELY through the built-in flax
    Whisper (models/whisper.py — single-dispatch KV-cached greedy
    decode); model names and CTranslate2 exports go through
    faster-whisper (the reference's decoder) when importable.
    ``native=True`` forces the native path, ``native=False`` requires
    faster-whisper.
    """
    from pathlib import Path as _Path

    p = _Path(model_size)
    # CTranslate2 exports carry model.bin; HF/OpenAI checkpoints don't.
    native_loadable = p.exists() and not (p.is_dir() and (p / "model.bin").exists())
    if native is None and native_loadable:
        native = True
    if native is not True:
        try:
            from faster_whisper import WhisperModel
        except ImportError:
            if native is False:
                raise ImportError(
                    "make_whisper_asr(native=False) requires faster-whisper "
                    "(CTranslate2); omit native to use the built-in flax "
                    "Whisper with a local checkpoint path."
                ) from None
            raise ImportError(
                "faster-whisper is not importable and model_size is not "
                "a local checkpoint path; the native flax Whisper needs "
                "a downloaded checkpoint (HF dir or OpenAI .pt + "
                "vocab.json)."
            ) from None
    if native is True:
        from ..models.whisper import make_whisper_transcriber

        return make_whisper_transcriber(model_size)

    model = WhisperModel(model_size, device=device,
                         download_root=download_root)

    def transcribe(audio, sample_rate=16000) -> str:
        import numpy as np

        audio = np.asarray(audio, np.float32).reshape(-1)
        if sample_rate != 16000:
            from ..utils.wavio import resample

            audio = resample(audio, sample_rate, 16000)
        segments, _ = model.transcribe(audio, language="en", vad_filter=True)
        return " ".join(seg.text for seg in segments).strip()

    return transcribe


def wer(reference: str, hypothesis: str) -> float:
    """Word error rate: edit distance over reference words.

    The WER utility downstream of the ASR sidecar (the reference stores raw
    transcripts in the CSV and computes WER offline; this closes the loop
    natively). Returns (S+D+I)/N; empty reference → 0.0 if hypothesis is
    also empty else inf.
    """
    ref_words = reference.split()
    hyp_words = hypothesis.split()
    if not ref_words:
        return 0.0 if not hyp_words else float("inf")
    # Levenshtein over words, two-row DP.
    prev = list(range(len(hyp_words) + 1))
    for i, rw in enumerate(ref_words, 1):
        cur = [i] + [0] * len(hyp_words)
        for j, hw in enumerate(hyp_words, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (rw != hw))
        prev = cur
    return prev[-1] / len(ref_words)
