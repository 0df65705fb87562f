"""Native PESQ (metrics/pesq.py): invariants + sub-stage unit tests.

The compiled ITU reference is absent in this environment, so validation is
structural: the identity score must land on the published MOS-LQO maxima
(P.862.1 nb cap 4.549, P.862.2 wb cap 4.644 — the logistic map evaluated at
raw 4.5), scores must be level- and delay-invariant (the P.862 alignment
stages), monotone in additive-noise SNR, and the calibration must satisfy
the standard's stated anchors (1 kHz 40 dB SPL tone -> band intensity 1e4,
total loudness 1 sone).
"""

import numpy as np
import pytest

from sonicsim_tpu.metrics import MetricsTracker, make_pesq, pesq
from sonicsim_tpu.metrics.pesq import (
    CAL_POWER,
    _align_level,
    _band,
    _crude_delay,
    _fine_delay,
)

SR = 16000


@pytest.fixture(scope="module")
def speech():
    """Speech-like test signal: AM-modulated harmonic stack + breath noise."""
    rng = np.random.default_rng(7)
    t = np.arange(SR * 3) / SR
    f0 = 120.0 * (1 + 0.1 * np.sin(2 * np.pi * 2.3 * t))
    phase = np.cumsum(2 * np.pi * f0 / SR)
    x = sum(np.sin(k * phase) / k for k in range(1, 9))
    env = 0.5 * (1 + np.sin(2 * np.pi * 1.7 * t)) ** 1.5
    x = x * env + 0.01 * rng.standard_normal(len(t))
    return (x / np.abs(x).max()).astype(np.float64)


def test_identity_hits_published_caps(speech):
    # raw=4.5 through the P.862.1 / P.862.2 logistic maps
    assert pesq(speech, speech, SR, "nb") == pytest.approx(4.5486, abs=2e-3)
    assert pesq(speech, speech, SR, "wb") == pytest.approx(4.6439, abs=2e-3)


def test_monotone_in_snr(speech):
    rng = np.random.default_rng(1)
    noise = rng.standard_normal(len(speech))
    noise /= np.sqrt(np.mean(noise**2) / np.mean(speech**2))
    for mode in ("nb", "wb"):
        scores = [
            pesq(speech, speech + noise * 10 ** (-snr / 20), SR, mode)
            for snr in (40, 25, 10, 0)
        ]
        assert all(a > b for a, b in zip(scores, scores[1:])), (mode, scores)
        assert scores[0] > 4.0  # barely-audible noise stays near the cap
        assert scores[-1] < 1.6  # 0 dB SNR is clearly bad


def test_gain_invariance(speech):
    base = pesq(speech, speech, SR, "wb")
    assert pesq(speech, 0.25 * speech, SR, "wb") == pytest.approx(base, abs=1e-3)
    assert pesq(0.1 * speech, speech, SR, "wb") == pytest.approx(base, abs=1e-3)


def test_delay_invariance(speech):
    base = pesq(speech, speech, SR, "wb")
    delayed = np.concatenate([np.zeros(801), speech])[: len(speech)]
    assert pesq(speech, delayed, SR, "wb") > base - 0.08
    early = speech[640:]
    assert pesq(speech, early, SR, "wb") > base - 0.08


def test_distortion_ordering(speech):
    clipped = np.clip(speech, -0.15, 0.15)
    rng = np.random.default_rng(2)
    light = speech + 0.003 * rng.standard_normal(len(speech))
    assert pesq(speech, clipped, SR, "wb") < pesq(speech, light, SR, "wb") - 1.0


def test_bounds_and_validation(speech):
    rng = np.random.default_rng(3)
    for mode in ("nb", "wb"):
        s = pesq(speech, rng.standard_normal(len(speech)), SR, mode)
        assert 0.99 <= s <= 4.7
    with pytest.raises(ValueError):
        pesq(speech[:100], speech[:100], SR, "wb")
    with pytest.raises(ValueError):
        pesq(speech, speech, SR, "superwide")


def test_level_alignment_target():
    rng = np.random.default_rng(4)
    x = rng.standard_normal(SR) * 1e-3
    y = _align_level(x, SR)
    from sonicsim_tpu.metrics.pesq import _band_power

    assert _band_power(y, SR, 300.0, 3000.0) == pytest.approx(
        CAL_POWER, rel=1e-6
    )


def test_calibration_anchors():
    """1 kHz 40 dB SPL tone: intensity 1e4 in its band, 1 sone total."""
    band = _band(16000, 49)
    t = np.arange(8000) / 16000.0
    ms = 10.0 ** ((40.0 - 79.0) / 10.0) * CAL_POWER
    tone = np.sqrt(2.0 * ms) * np.sin(2 * np.pi * 1000.0 * t)
    bark = band.bark_spectrum(tone).mean(axis=0) * band.sp
    assert bark.max() == pytest.approx(1e4, rel=1e-6)
    loud = band.loudness(bark[None, :])
    assert float(np.sum(loud * band.widths_z)) == pytest.approx(1.0, rel=1e-6)


def test_time_alignment_recovers_known_delay():
    rng = np.random.default_rng(5)
    x = rng.standard_normal(SR * 2)
    # amplitude-modulate so the envelope carries alignment information
    x *= 0.5 * (1 + np.sin(2 * np.pi * 3.0 * np.arange(len(x)) / SR))
    for true_delay in (0, 333, 1600):
        d = np.concatenate([np.zeros(true_delay), x])
        crude = _crude_delay(x, d, SR)
        fine = _fine_delay(x, d, crude, SR)
        assert abs(fine - true_delay) <= 2, (true_delay, crude, fine)


def test_make_pesq_native_tracker_column(tmp_path, speech):
    fn = make_pesq("nb", native=True)
    est = speech + 0.01 * np.random.default_rng(6).standard_normal(len(speech))
    val = fn(speech, est, SR)
    assert 1.0 <= val <= 4.6

    tracker = MetricsTracker(
        tmp_path / "m.csv", SR, extra_metrics={"pesq_nb": fn}
    )
    tracker(speech + est, np.stack([speech, est]), np.stack([speech, est]), "seg0")
    tracker.final()
    text = (tmp_path / "m.csv").read_text()
    assert "pesq_nb" in text.splitlines()[0]


def test_make_pesq_compiled_requires_package():
    with pytest.raises(ImportError):
        make_pesq("wb", native=False)
