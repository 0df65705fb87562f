"""Eval parity on the committed reference WAV fixtures.

Runs the metric battery on REAL reference audio
(separation/tests/noise/{mix,s1,s2}.wav, enhancement/tests/noise/* +
json_data.json — the fixtures the reference's own test drivers consume,
separation/test.py:40-52 / enhancement/test.py:119-127) and asserts the
tracker's numbers against independent float64 NumPy/SciPy replicas of the
reference formulas (torchmetrics SI-SDR, fast_bss_eval 512-tap projection
SDR, pyloudnorm BS.1770). Bit-exact mixture regeneration is not possible —
the fixtures' source audio files are not committed — so parity is asserted
on the metric/loudness math over the committed waveforms.
"""

import csv
import importlib.util
import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg
import scipy.signal as sps

from sonicsim_tpu.metrics import MetricsTracker, bss_sdr, si_sdr, stoi
from sonicsim_tpu.ops.loudness import integrated_loudness
from sonicsim_tpu.utils.wavio import read_wav
from test_levels_loudness import _np_integrated_loudness

SEP_DIR = Path("/root/reference/separation/tests/noise")
ENH_DIR = Path("/root/reference/enhancement/tests/noise")

needs_fixtures = pytest.mark.skipif(
    not (SEP_DIR / "mix.wav").exists(), reason="reference fixtures absent"
)

# 10 s slice from the middle of the 60 s fixtures (dense voice activity).
SLICE = slice(320_000, 480_000)


def _np_si_sdr(est, ref):
    est = np.asarray(est, np.float64)
    ref = np.asarray(ref, np.float64)
    est = est - est.mean()
    ref = ref - ref.mean()
    proj = (est @ ref) / (ref @ ref) * ref
    noise = est - proj
    return 10 * np.log10((proj @ proj) / (noise @ noise))


def _np_bss_sdr(est, ref, filter_length=512):
    """fast_bss_eval semantics, computed the slow direct way: solve the
    Toeplitz normal equations (Levinson), then measure the projection and
    residual energies by actually FIR-filtering the reference."""
    est = np.asarray(est, np.float64)
    ref = np.asarray(ref, np.float64)
    est = est - est.mean()
    ref = ref - ref.mean()
    n = len(ref) + filter_length - 1
    nfft = 1 << (n - 1).bit_length()
    rf = np.fft.rfft(ref, nfft)
    ef = np.fft.rfft(est, nfft)
    acf = np.fft.irfft(rf * np.conj(rf), nfft)[:filter_length]
    xcf = np.fft.irfft(ef * np.conj(rf), nfft)[:filter_length]
    h = scipy.linalg.solve_toeplitz((acf, acf), xcf)
    s_target = sps.lfilter(h, [1.0], ref)
    e = est - s_target
    return 10 * np.log10((s_target @ s_target) / (e @ e))


@needs_fixtures
def test_separation_fixture_tracker_parity(tmp_path):
    mix, sr = read_wav(SEP_DIR / "mix.wav")
    s1, _ = read_wav(SEP_DIR / "s1.wav")
    s2, _ = read_wav(SEP_DIR / "s2.wav")
    assert sr == 16000
    mix = mix[0, SLICE]
    clean = np.stack([s1[0, SLICE], s2[0, SLICE]])
    # Deterministic imperfect estimates: clean plus a little cross-bleed.
    est = np.stack(
        [clean[0] + 0.05 * clean[1], clean[1] + 0.08 * clean[0]]
    ).astype(np.float32)

    tracker = MetricsTracker(tmp_path / "m.csv", sample_rate=sr)
    tracker(mix, clean, est, "fixture")
    row = tracker.rows[0]

    want_sisdr = np.mean([_np_si_sdr(est[i], clean[i]) for i in range(2)])
    want_sisdr_b = np.mean([_np_si_sdr(mix, clean[i]) for i in range(2)])
    assert row["si-snr"] == pytest.approx(want_sisdr, abs=2e-3)
    assert row["si-snr_i"] == pytest.approx(want_sisdr - want_sisdr_b, abs=5e-3)

    want_sdr = np.mean([_np_bss_sdr(est[i], clean[i]) for i in range(2)])
    want_sdr_b = np.mean([_np_bss_sdr(mix, clean[i]) for i in range(2)])
    assert row["sdr"] == pytest.approx(want_sdr, abs=0.05)
    assert row["sdr_i"] == pytest.approx(want_sdr - want_sdr_b, abs=0.1)

    assert 0.0 < row["stoi"] <= 1.0  # real speech, near-clean estimates

    final = tracker.final()
    rows = list(csv.DictReader(open(tmp_path / "m.csv")))
    assert rows[-2]["snt_id"] == "avg"
    assert float(rows[0]["si-snr"]) == pytest.approx(row["si-snr"], abs=1e-6)
    assert final["si-snr"] == pytest.approx(row["si-snr"], abs=1e-6)


@needs_fixtures
def test_separation_fixture_pit_alignment(tmp_path):
    """Swapped estimates must be re-aligned by the tracker's PIT stage."""
    s1, sr = read_wav(SEP_DIR / "s1.wav")
    s2, _ = read_wav(SEP_DIR / "s2.wav")
    mix, _ = read_wav(SEP_DIR / "mix.wav")
    clean = np.stack([s1[0, SLICE], s2[0, SLICE]])
    est_swapped = clean[::-1].copy()
    tracker = MetricsTracker(tmp_path / "m.csv", sample_rate=sr)
    tracker(mix[0, SLICE], clean, est_swapped, "swap")
    assert tracker.rows[0]["si-snr"] > 50  # perfect after re-alignment


@needs_fixtures
@pytest.mark.parametrize("name", ["mix", "s1", "s2"])
def test_separation_fixture_lufs_parity(name):
    audio, sr = read_wav(SEP_DIR / f"{name}.wav")
    x = audio[0, SLICE]
    ours = float(integrated_loudness(jnp.asarray(x), sr))
    want = _np_integrated_loudness(x, sr)
    assert ours == pytest.approx(want, abs=5e-3)


def _load_eval_driver():
    spec = importlib.util.spec_from_file_location(
        "eval_driver", Path(__file__).parents[1] / "scripts" / "test.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@needs_fixtures
def test_enhancement_fixture_segment_driver(tmp_path):
    """metadata_segments on the REAL committed json_data.json, then the
    tracker over those spans (enhancement/test.py:119-127 strategy)."""
    driver = _load_eval_driver()
    mix, sr = read_wav(ENH_DIR / "mix.wav")
    s1, _ = read_wav(ENH_DIR / "s1.wav")
    total = mix.shape[-1]

    spans = driver.metadata_segments(str(ENH_DIR), total)
    meta = json.load(open(ENH_DIR / "json_data.json"))
    raw = [
        tuple(p)
        for k, v in meta.items()
        if k.startswith("source")
        for p in v["start_end_points"]
    ]
    assert spans, "committed metadata must yield voice-active spans"
    # Spans are sorted, merged (non-overlapping), bounded, above min length.
    assert spans == sorted(spans)
    assert all(e <= total and e - s > driver.MIN_SEGMENT for s, e in spans)
    assert all(a[1] < b[0] for a, b in zip(spans, spans[1:]))
    # Every raw metadata span is covered by the merged set.
    for s, e in raw:
        e = min(e, total)
        if e - s <= driver.MIN_SEGMENT:
            continue
        assert any(ms <= s and e <= me for ms, me in spans)

    tracker = MetricsTracker(tmp_path / "m.csv", sample_rate=sr)
    for s, e in spans[:3]:
        # Identity "enhancement" (est = mix): SI-SDRi must be ~0 by
        # construction; absolute SI-SDR must match the float64 replica.
        tracker(mix[0, s:e], s1[:, s:e], mix[:, s:e], f"noise:{s}")
    for row, (s, e) in zip(tracker.rows, spans[:3]):
        assert row["si-snr_i"] == pytest.approx(0.0, abs=1e-4)
        want = _np_si_sdr(mix[0, s:e], s1[0, s:e])
        assert row["si-snr"] == pytest.approx(want, abs=2e-3)


@needs_fixtures
def test_fixture_stoi_clean_is_one():
    s1, sr = read_wav(SEP_DIR / "s1.wav")
    x = s1[0, SLICE]
    assert stoi(x, x, sr) == pytest.approx(1.0, abs=1e-6)


@needs_fixtures
def test_energy_vad_calibration_vs_reference_spans():
    """Span IoU of the energy VAD against the generation-time ground-truth
    voice spans committed with the enhancement fixture (the neural-VAD
    validation VERDICT asked for; the separation segment JSON named in
    separation/test.py:98 comments is not committed upstream, so the
    enhancement fixture's json_data.json is the available ground truth)."""
    from sonicsim_tpu.infer.vad import energy_vad

    mix, sr = read_wav(ENH_DIR / "mix.wav")
    mix = mix[0]
    meta = json.load(open(ENH_DIR / "json_data.json"))
    truth = np.zeros(len(mix), bool)
    for k, v in meta.items():
        if k.startswith("source"):
            for s, e in v["start_end_points"]:
                truth[s : min(e, len(mix))] = True

    pred = np.zeros(len(mix), bool)
    for s, e in energy_vad(mix, sr):
        pred[s:e] = True
    inter = (truth & pred).sum()
    union = (truth | pred).sum()
    recall = inter / truth.sum()
    assert inter / union >= 0.85  # measured 0.938
    assert recall >= 0.95  # measured 0.991 — missed speech hurts eval most


@needs_fixtures
def test_separation_fixture_native_pesq_ordering():
    """Native PESQ on real fixture speech: clean-vs-clean hits the P.862.2
    cap, the mixture scores clearly lower against either source, and the
    wrong source scores no better than the mixture's own reference."""
    from sonicsim_tpu.metrics.pesq import pesq

    mix, sr = read_wav(SEP_DIR / "mix.wav")
    s1, _ = read_wav(SEP_DIR / "s1.wav")
    mix, s1 = mix[0][SLICE], s1[0][SLICE]

    identity = pesq(s1, s1, sr, "wb")
    degraded = pesq(s1, mix, sr, "wb")
    assert identity == pytest.approx(4.644, abs=5e-3)
    # the mixture adds a competing speaker + noise at comparable level
    assert degraded < identity - 1.0
    assert pesq(s1, mix, sr, "nb") < pesq(s1, s1, sr, "nb") - 1.0
