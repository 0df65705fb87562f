"""Corpus augmentation for the trained-quality chain.

scripts/make_eval_artifact.py widens the 2-voice fixture manifold with two
per-speaker identity transforms (consumed by make_train_artifact --augment):
a pitch-only phase-vocoder shift (tempo preserved — orthogonal to the
existing speed warp) and noise-vocoded speech (band envelopes on noise
carriers). These pin the transforms' contracts: direction/magnitude of the
pitch move, duration preservation, envelope retention, determinism.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "scripts"))

from make_eval_artifact import (  # noqa: E402
    SR,
    noise_vocode,
    pitch_shift_keep_tempo,
)


def _am_tone(f0=220.0, seconds=2.0):
    t = np.arange(int(seconds * SR)) / SR
    return (
        0.5 * np.sin(2 * np.pi * f0 * t) * (1 + 0.3 * np.sin(2 * np.pi * 3 * t))
    ).astype(np.float32)


def _peak_freq(x):
    f = np.fft.rfftfreq(len(x), 1.0 / SR)
    return float(f[np.argmax(np.abs(np.fft.rfft(x)))])


@pytest.mark.parametrize("factor,lo,hi", [(1.2, 250, 280), (0.85, 175, 200)])
def test_pitch_shift_moves_f0_keeps_duration(factor, lo, hi):
    x = _am_tone()
    y = pitch_shift_keep_tempo(x, factor)
    assert y.shape == x.shape  # tempo (duration) preserved
    assert np.isfinite(y).all()
    assert lo < _peak_freq(y) < hi  # 220 Hz scaled by the factor
    # Energy in the same ballpark (the vocoder is not a gain stage).
    assert 0.25 < np.sqrt((y**2).mean()) / np.sqrt((x**2).mean()) < 4.0


def test_pitch_shift_preserves_tempo_envelope():
    """The 3 Hz AM envelope must stay at 3 Hz (a plain resample would
    scale it with the factor — that's the speed warp, not this)."""
    x = _am_tone()
    y = pitch_shift_keep_tempo(x, 1.25)
    env = np.abs(np.convolve(np.abs(y), np.hanning(801) / 400, mode="same"))
    env = env - env.mean()
    spec = np.abs(np.fft.rfft(env))
    f = np.fft.rfftfreq(len(env), 1.0 / SR)
    sel = (f > 0.5) & (f < 20)
    assert f[sel][np.argmax(spec[sel])] == pytest.approx(3.0, abs=0.5)


def test_noise_vocode_keeps_envelope_changes_carrier():
    x = _am_tone()
    z = noise_vocode(x, seed=3)
    assert z.shape == x.shape and np.isfinite(z).all()
    # Envelope correlation survives...
    k = np.ones(800) / 800
    ex = np.convolve(np.abs(x), k, mode="same")[2000:-2000]
    ez = np.convolve(np.abs(z), k, mode="same")[2000:-2000]
    assert np.corrcoef(ex, ez)[0, 1] > 0.5
    # ...but the waveform itself is a different (noise) carrier.
    assert abs(np.corrcoef(x[2000:-2000], z[2000:-2000])[0, 1]) < 0.2


def test_augment_transforms_deterministic():
    x = _am_tone()
    np.testing.assert_array_equal(
        pitch_shift_keep_tempo(x, 1.1), pitch_shift_keep_tempo(x, 1.1)
    )
    np.testing.assert_array_equal(
        noise_vocode(x, seed=7), noise_vocode(x, seed=7)
    )
    assert np.abs(noise_vocode(x, seed=7) - noise_vocode(x, seed=8)).max() > 1e-3
