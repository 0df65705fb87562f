"""VCTK composite measures (metrics/composite.py): CSIG/CBAK/COVL, SSNR/LLR/WSS.

Structural validation against the reference formulas
(enhancement/look2hear/metrics/wrapper_vctk.py:44-120): identity input
maximizes each composite, additive noise degrades them monotonically, and
the PESQ term now defaults to the native wideband P.862 pipeline.
"""

import numpy as np
import pytest

from sonicsim_tpu.metrics import composite_measures, llr, ssnr, wss

SR = 16000


@pytest.fixture(scope="module")
def speech():
    rng = np.random.default_rng(11)
    t = np.arange(SR * 2) / SR
    phase = np.cumsum(2 * np.pi * 130.0 * (1 + 0.1 * np.sin(2 * np.pi * 2 * t)) / SR)
    x = sum(np.sin(k * phase) / k for k in range(1, 7))
    x = x * (0.5 * (1 + np.sin(2 * np.pi * 1.3 * t)) ** 1.2)
    x += 0.005 * rng.standard_normal(len(t))
    return (x / np.abs(x).max()).astype(np.float64)


def test_identity_near_max(speech):
    out = composite_measures(speech, speech, SR)
    assert out["llr"] == pytest.approx(0.0, abs=1e-6)
    assert out["wss"] == pytest.approx(0.0, abs=1e-6)
    assert out["csig"] > 4.9  # trimmed MOS cap is 5.0
    assert out["covl"] > 4.8
    assert out["cbak"] > 3.5  # cbak's SSNR term caps at 35 dB frames


def test_noise_degrades_composites(speech):
    rng = np.random.default_rng(1)
    noise = rng.standard_normal(len(speech))
    noise /= np.sqrt(np.mean(noise**2) / np.mean(speech**2))
    prev = composite_measures(speech, speech, SR)
    for snr in (30, 10):
        cur = composite_measures(speech, speech + noise * 10 ** (-snr / 20), SR)
        for k in ("csig", "cbak", "covl"):
            assert cur[k] < prev[k], (k, snr)
        prev = cur


def test_pesq_value_override(speech):
    rng = np.random.default_rng(3)
    deg = speech + 0.05 * rng.standard_normal(len(speech))  # keep off the 5.0 trim cap
    base = composite_measures(speech, deg, SR, pesq_value=2.0)
    # composites are affine in p with positive coefficients
    higher = composite_measures(speech, deg, SR, pesq_value=3.0)
    assert higher["csig"] >= base["csig"]
    assert higher["cbak"] > base["cbak"]
    assert higher["covl"] > base["covl"]


def test_short_segment_gives_nan_composites(speech):
    out = composite_measures(speech[:1000], speech[:1000], SR)
    assert np.isnan(out["csig"]) and np.isnan(out["cbak"]) and np.isnan(out["covl"])
    assert np.isfinite(out["llr"])


def test_raw_measures_sane(speech):
    rng = np.random.default_rng(2)
    deg = speech + 0.05 * rng.standard_normal(len(speech))
    assert llr(speech, deg, SR) > 0.0
    assert wss(speech, deg, SR) > 0.0
    overall, seg = ssnr(speech, deg, SR)
    assert -10.0 < seg < 35.0


def test_ssnr_overall_gain_invariant(speech):
    """Reference SSNR rescales deg to ref's peak before the overall-SNR
    dif (wrapper_vctk.py:73-80): a pure gain mismatch scores near-perfect
    overall SNR, not ~6 dB."""
    from sonicsim_tpu.metrics.composite import ssnr

    overall, _ = ssnr(speech, 0.5 * speech, SR)
    assert overall > 40.0
