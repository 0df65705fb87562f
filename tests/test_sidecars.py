"""SigMOS frontend, sidecar factories, WER, tracker text columns.

The SigMOS frontend tests replicate the reference formulas
(separation/sigmos/sigmos.py:44-67) independently — explicit frame loops
instead of stride tricks — and compare against the vectorized
implementation in sonicsim_tpu.metrics.sigmos.
"""

import csv

import numpy as np
import pytest

from sonicsim_tpu.metrics import (
    MetricsTracker,
    make_sigmos,
    make_sigmos_all,
    sigmos_features,
    sigmos_stft,
    sigmos_window,
    wer,
)
from sonicsim_tpu.metrics import sigmos as sig


def _replica_stft(signal: np.ndarray) -> np.ndarray:
    """Loop-based replica of sigmos.py:44-52."""
    window = np.sqrt(np.hanning(961)[:-1]).astype(np.float32)
    last = len(signal) % 480
    if last == 0:
        last = 480
    padded = np.pad(signal, (960 - 480, 960 - last))
    frames = []
    start = 0
    while start + 960 <= len(padded):
        frames.append(padded[start : start + 960])
        start += 480
    frames = np.stack(frames)
    return np.fft.rfft(frames * window, n=960).astype(np.complex64)


def _replica_features(spec: np.ndarray, c: float = 0.3) -> np.ndarray:
    """Loop-based replica of sigmos.py:54-67."""
    frames, nbins = spec.shape
    out = np.zeros((frames, 3, nbins), np.float32)
    for t in range(frames):
        for f in range(nbins):
            re, im = float(spec[t, f].real), float(spec[t, f].imag)
            p = max(re * re + im * im, 1e-12)
            out[t, 0, f] = p ** (c / 2)
            out[t, 1, f] = p ** ((c - 1) / 2) * re
            out[t, 2, f] = p ** ((c - 1) / 2) * im
    return np.transpose(out, (1, 0, 2))[None]


@pytest.mark.parametrize("n", [480 * 7, 480 * 7 + 123, 960, 1000])
def test_sigmos_stft_matches_replica(rng, n):
    x = rng.standard_normal(n).astype(np.float32)
    got = sigmos_stft(x)
    want = _replica_stft(x)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_sigmos_features_match_replica(rng):
    spec = (
        rng.standard_normal((5, 481)) + 1j * rng.standard_normal((5, 481))
    ).astype(np.complex64)
    got = sigmos_features(spec)
    want = _replica_features(spec)
    assert got.shape == (1, 3, 5, 481)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_make_sigmos_wiring(tmp_path, monkeypatch, rng):
    """make_sigmos returns a working callable given weights (model stubbed)."""
    calls = {}

    class FakeModel:
        def __init__(self, path):
            calls["path"] = str(path)

        def __call__(self, feats):
            calls["shape"] = np.asarray(feats).shape
            return [np.arange(1, 8, dtype=np.float32)[None]]

    import sonicsim_tpu.metrics.onnx_jax as onnx_jax

    monkeypatch.setattr(onnx_jax, "OnnxJaxModel", FakeModel)
    weights = tmp_path / "model-sigmos.onnx"
    weights.write_bytes(b"\x00")

    metric = make_sigmos(weights, key="MOS_OVRL")
    audio = rng.standard_normal(16000).astype(np.float32)
    val = metric(audio, audio, 16000)
    assert val == pytest.approx(7.0)
    assert calls["path"] == str(weights)
    # 16 kHz → 48 kHz resample → 48000 samples → 101 frames of 481 bins.
    assert calls["shape"] == (1, 3, 101, 481)

    allm = make_sigmos_all(weights)
    assert set(allm) == set(sig.SigMOS.AXES)
    assert allm["MOS_COL"](audio, audio, 16000) == pytest.approx(1.0)


def test_make_sigmos_rejects_bad_key(tmp_path):
    with pytest.raises(ValueError):
        make_sigmos(tmp_path / "x.onnx", key="MOS_BOGUS")


def test_make_sigmos_missing_weights(tmp_path):
    with pytest.raises(FileNotFoundError):
        make_sigmos(tmp_path / "nope.onnx")


def test_make_whisper_asr_dispatch(tmp_path):
    """Local HF/OpenAI checkpoint paths route to the native flax decoder
    regardless of faster-whisper availability; CTranslate2 exports
    (model.bin) and bare model names do not."""
    from unittest import mock

    from sonicsim_tpu.metrics.sidecars import make_whisper_asr

    hf_dir = tmp_path / "hf"
    hf_dir.mkdir()
    (hf_dir / "config.json").write_text("{}")
    sentinel = object()
    with mock.patch(
        "sonicsim_tpu.models.whisper.make_whisper_transcriber",
        return_value=sentinel,
    ) as native_factory:
        assert make_whisper_asr(str(hf_dir)) is sentinel
        native_factory.assert_called_once_with(str(hf_dir))

    ct2_dir = tmp_path / "ct2"
    ct2_dir.mkdir()
    (ct2_dir / "model.bin").write_bytes(b"")
    # CTranslate2 export (or a bare model name) requires faster-whisper;
    # in this environment it is absent, so both raise ImportError instead
    # of hitting the native loader.
    with pytest.raises(ImportError):
        make_whisper_asr(str(ct2_dir))
    with pytest.raises(ImportError):
        make_whisper_asr("medium.en")
    with pytest.raises(ImportError):
        make_whisper_asr(str(hf_dir), native=False)


def test_wer():
    assert wer("a b c", "a b c") == 0.0
    assert wer("a b c", "a x c") == pytest.approx(1 / 3)
    assert wer("a b c", "a c") == pytest.approx(1 / 3)  # deletion
    assert wer("a b", "a x b y") == pytest.approx(1.0)  # two insertions
    assert wer("", "") == 0.0
    assert wer("", "hello") == float("inf")
    assert wer("hello world", "") == 1.0


def test_tracker_extra_text_column(tmp_path, rng):
    csv_path = tmp_path / "m.csv"
    transcripts = iter(["hello there", "general kenobi"])
    tracker = MetricsTracker(
        csv_path,
        extra_text={"asr": lambda est, sr: next(transcripts)},
    )
    clean = rng.standard_normal((1, 8000)).astype(np.float32)
    est = clean + 0.01 * rng.standard_normal((1, 8000)).astype(np.float32)
    tracker(clean[0], clean, est, "seg0")
    tracker(clean[0], clean, est, "seg1")
    final = tracker.final()
    assert "asr" not in final  # text columns excluded from numeric footer
    rows = list(csv.DictReader(open(csv_path)))
    assert rows[0]["asr"] == "hello there"
    assert rows[1]["asr"] == "general kenobi"
    assert rows[2]["snt_id"] == "avg" and rows[2]["asr"] == ""


def test_tracker_logs_broken_sidecar(tmp_path, rng, caplog):
    csv_path = tmp_path / "m.csv"

    def broken(ref, est, sr):
        raise RuntimeError("sidecar down")

    tracker = MetricsTracker(csv_path, extra_metrics={"mos": broken})
    clean = rng.standard_normal((1, 8000)).astype(np.float32)
    with caplog.at_level("WARNING", "sonicsim_tpu.metrics.tracker"):
        tracker(clean[0], clean, clean, "seg0")
    assert any("mos" in r.message for r in caplog.records)
    assert np.isnan(tracker.rows[0]["mos"])


def test_sigmos_end_to_end_if_weights_present(rng):
    """Weights-gated: runs the published SigMOS .onnx through onnx_jax."""
    from pathlib import Path

    candidates = list(Path("/root/reference/separation/sigmos").glob("*.onnx"))
    if not candidates:
        pytest.skip("SigMOS .onnx weights not available")
    scorer = sig.SigMOS(candidates[0])
    out = scorer(rng.standard_normal(48000).astype(np.float32))
    assert set(out) == set(sig.SigMOS.AXES)
    assert all(np.isfinite(v) for v in out.values())


def test_make_dnsmos_scores_the_estimate(tmp_path, monkeypatch):
    """Tracker convention is fn(ref, est, sr); DNSMOS is reference-free and
    must score the ESTIMATE (regression: it used to score the reference)."""
    scored = []

    class FakeDNSMOS:
        def __init__(self, model_dir):
            pass

        def __call__(self, audio, rate):
            scored.append(np.asarray(audio).copy())
            return {"OVRL": 3.0, "SIG": 3.0, "BAK": 3.0, "P808_MOS": 3.0}

    import sonicsim_tpu.metrics.dnsmos as dnsmos_mod

    monkeypatch.setattr(dnsmos_mod, "DNSMOS", FakeDNSMOS)
    from sonicsim_tpu.metrics import make_dnsmos

    metric = make_dnsmos(tmp_path)
    ref = np.zeros(1000, np.float32)
    est = np.ones(1000, np.float32)
    metric(ref, est, 16000)
    assert len(scored) == 1
    np.testing.assert_array_equal(scored[0], est)


def test_make_sigmos_scores_the_estimate(tmp_path, monkeypatch):
    scored = []

    class FakeModel:
        def __init__(self, path):
            pass

        def __call__(self, feats):
            scored.append(np.asarray(feats).copy())
            return [np.zeros((1, 7), np.float32)]

    import sonicsim_tpu.metrics.onnx_jax as onnx_jax

    monkeypatch.setattr(onnx_jax, "OnnxJaxModel", FakeModel)
    weights = tmp_path / "w.onnx"
    weights.write_bytes(b"\x00")
    metric = make_sigmos(weights)
    ref = np.zeros(16000, np.float32)
    est = np.random.default_rng(0).standard_normal(16000).astype(np.float32)
    metric(ref, est, 16000)
    # Features of silence are ~0; the estimate's are not.
    assert len(scored) == 1 and np.abs(scored[0]).max() > 1e-3
