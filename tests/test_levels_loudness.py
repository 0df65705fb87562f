"""Golden tests: level math and BS.1770 loudness."""

import jax.numpy as jnp
import numpy as np
from scipy import signal as sps

from sonicsim_tpu.ops import (
    biquad,
    integrated_loudness,
    k_weight,
    k_weighting_coeffs,
    lufs_norm,
    mix_sources_sir,
    peak_normalize,
    rms_db,
    scale_noise_snr,
)


def _np_rms_db(w):
    return 10 * np.log10(max(1e-20, np.mean(np.square(w))))


def test_rms_db_matches_reference(rng):
    """Parity with movingdatamodule.py:29-32."""
    x = rng.standard_normal(4096).astype(np.float32) * 0.1
    np.testing.assert_allclose(float(rms_db(jnp.asarray(x))), _np_rms_db(x), rtol=1e-5)


def test_sir_snr_mixing_matches_reference(rng):
    """Parity with movingdatamodule.py:106-124 gain rules."""
    spk = rng.standard_normal((3, 8000)).astype(np.float32) * [[1.0], [0.2], [3.0]]
    sirs = np.array([-4.0, 5.0], np.float32)
    ours = np.asarray(mix_sources_sir(jnp.asarray(spk), jnp.asarray(sirs)))
    ref = spk.copy()
    tgt = _np_rms_db(spk[0])
    for i in range(2):
        gain = min(tgt - _np_rms_db(spk[i + 1]) - sirs[i], 40)
        ref[i + 1] *= 10.0 ** (gain / 20.0)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)

    noise = rng.standard_normal(8000).astype(np.float32) * 0.5
    speech = ref.sum(0)
    snr = 12.0
    ours_n = np.asarray(
        scale_noise_snr(jnp.asarray(speech), jnp.asarray(noise), jnp.asarray(snr))
    )
    gain = min(_np_rms_db(speech) - _np_rms_db(noise) - snr, 40)
    np.testing.assert_allclose(ours_n, noise * 10 ** (gain / 20), rtol=1e-4)


def test_biquad_matches_scipy_lfilter(rng):
    # float32 state accumulation drifts slightly vs float64 lfilter on long
    # near-unity-pole IIR tails; 5e-3 absolute ≈ 1e-5 dB on block energies.
    x = rng.standard_normal(5000).astype(np.float32)
    for b, a in k_weighting_coeffs(16000):
        ours = np.asarray(biquad(jnp.asarray(x), b, a))
        ref = sps.lfilter(b, a, x)
        np.testing.assert_allclose(ours, ref, atol=5e-3)


def test_biquad_batched(rng):
    x = rng.standard_normal((2, 3, 1000)).astype(np.float32)
    b, a = k_weighting_coeffs(16000)[0]
    ours = np.asarray(biquad(jnp.asarray(x), b, a))
    ref = sps.lfilter(b, a, x, axis=-1)
    np.testing.assert_allclose(ours, ref, atol=5e-3)


def _np_integrated_loudness(data, rate, block_size=0.4):
    """Independent NumPy reimplementation of BS.1770-4 gated loudness
    (pyloudnorm.Meter semantics) used as the golden reference."""
    x = np.atleast_2d(np.asarray(data, np.float64))
    for b, a in k_weighting_coeffs(rate):
        x = sps.lfilter(b, a, x, axis=-1)
    block = int(round(block_size * rate))
    hop = max(int(round(block * 0.25)), 1)
    t = x.shape[-1]
    n_frames = max((t - block) // hop + 1, 1)
    z = np.stack(
        [
            np.mean(x[:, i * hop : i * hop + min(block, t)] ** 2, axis=-1)
            for i in range(n_frames)
        ],
        axis=1,
    )  # (C, F)
    g = np.array([1.0, 1.0, 1.0, 1.41, 1.41])[: x.shape[0]]
    wz = g @ z
    lb = -0.691 + 10 * np.log10(np.maximum(wz, 1e-30))
    mask = lb > -70
    if not mask.any():
        return -np.inf
    rel = -0.691 + 10 * np.log10(wz[mask].mean()) - 10
    mask &= lb > rel
    if not mask.any():
        return -np.inf
    return -0.691 + 10 * np.log10(wz[mask].mean())


def test_integrated_loudness_matches_numpy_bs1770(rng):
    sr = 16000
    x = (rng.standard_normal(sr * 3) * 0.1).astype(np.float32)
    x[sr : 2 * sr] *= 0.001  # quiet region exercises gating
    ours = float(integrated_loudness(jnp.asarray(x), sr))
    ref = _np_integrated_loudness(x, sr)
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_integrated_loudness_sine_level():
    """A full-scale 997 Hz sine: mean square of a unit sine = -3.01 dB;
    the 16 kHz re-derived K-weighting sits ~-0.3 dB at 1 kHz (the same value
    pyloudnorm's per-rate RBJ derivation gives), so allow a 0.5 dB window."""
    sr = 16000
    t = np.arange(sr * 2) / sr
    x = np.sin(2 * np.pi * 997 * t).astype(np.float32)
    lufs = float(integrated_loudness(jnp.asarray(x), sr))
    assert abs(lufs - (-3.01)) < 0.5


def test_lufs_norm_hits_target(rng):
    sr = 16000
    x = (rng.standard_normal(sr * 2) * 0.05).astype(np.float32)
    y, gain = lufs_norm(jnp.asarray(x), sr, -17.0)
    measured = float(integrated_loudness(jnp.asarray(y), sr))
    assert abs(measured - (-17.0)) < 0.05
    np.testing.assert_allclose(np.asarray(y), x * float(gain), rtol=1e-6)


def test_peak_normalize(rng):
    x = rng.standard_normal(100).astype(np.float32) * 3
    y = np.asarray(peak_normalize(jnp.asarray(x)))
    assert abs(np.abs(y).max() - 1.0) < 1e-6
    z = np.zeros(10, np.float32)
    np.testing.assert_array_equal(np.asarray(peak_normalize(jnp.asarray(z))), z)


def test_integrated_loudness_many_channels(rng):
    """>5 channels (e.g. AmbiX order-2 beds): BS.1770-4 weights the first
    five, channels beyond weight unity (documented superset — pyloudnorm
    raises past 5 channels, so there is no reference behavior to match).
    A 9-ch signal whose extra channels are silent must match the 5-ch
    measurement exactly; adding energy in channel 6+ must raise it."""
    sr = 16000
    x5 = (rng.standard_normal((5, sr * 2)) * 0.05).astype(np.float32)
    x9 = np.concatenate([x5, np.zeros((4, sr * 2), np.float32)])
    l5 = float(integrated_loudness(jnp.asarray(x5), sr))
    l9 = float(integrated_loudness(jnp.asarray(x9), sr))
    assert abs(l5 - l9) < 1e-5
    x9[6] = (rng.standard_normal(sr * 2) * 0.05).astype(np.float32)
    assert float(integrated_loudness(jnp.asarray(x9), sr)) > l9
