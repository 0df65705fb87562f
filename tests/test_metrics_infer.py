"""Tests: eval metrics (SI-SDR/BSS-SDR/STOI), tracker CSV, chunked inference, stitching."""

import csv

import jax.numpy as jnp
import numpy as np
import pytest

from sonicsim_tpu.infer import stitch_segments, wav_chunk_inference
from sonicsim_tpu.metrics import MetricsTracker, bss_sdr, si_sdr, stoi


def test_si_sdr_known_values(rng):
    ref = rng.standard_normal(8000).astype(np.float32)
    assert float(si_sdr(jnp.asarray(ref), jnp.asarray(ref))) > 60
    # 10 dB SNR additive noise → SI-SDR ≈ 10 dB
    noise = rng.standard_normal(8000).astype(np.float32)
    noise *= np.linalg.norm(ref) / np.linalg.norm(noise) * 10 ** (-10 / 20)
    val = float(si_sdr(jnp.asarray(ref + noise), jnp.asarray(ref)))
    assert abs(val - 10.0) < 0.6
    # scale invariance
    val2 = float(si_sdr(jnp.asarray(3.7 * (ref + noise)), jnp.asarray(ref)))
    assert abs(val - val2) < 1e-3


def test_bss_sdr_filter_invariance(rng):
    """A short FIR distortion of the reference scores high SDR but low SI-SDR."""
    ref = rng.standard_normal(8000).astype(np.float32)
    fir = np.array([0.6, 0.0, 0.3, -0.2], np.float32)
    est = np.convolve(ref, fir)[:8000].astype(np.float32)
    sdr_v = float(bss_sdr(jnp.asarray(est), jnp.asarray(ref)))
    sisdr_v = float(si_sdr(jnp.asarray(est), jnp.asarray(ref)))
    assert sdr_v > 40  # filtered version ≈ perfect for BSS-eval
    assert sisdr_v < 15  # but not scale-invariant-identical
    assert sdr_v > sisdr_v + 20


def test_stoi_sanity(rng):
    sr = 16000
    t = np.arange(sr * 3) / sr
    # Speech-like: AM-modulated multi-tone
    clean = (
        np.sin(2 * np.pi * 220 * t) + 0.5 * np.sin(2 * np.pi * 600 * t)
    ) * (0.6 + 0.4 * np.sin(2 * np.pi * 4 * t))
    clean = clean.astype(np.float32)
    perfect = stoi(clean, clean, sr)
    noisy = clean + 2.0 * rng.standard_normal(len(clean)).astype(np.float32)
    degraded = stoi(clean, noisy, sr)
    assert perfect > 0.99
    assert degraded < perfect - 0.2


def test_tracker_csv(tmp_path, rng):
    tr = MetricsTracker(tmp_path / "metrics.csv")
    ref = rng.standard_normal((2, 16000)).astype(np.float32)
    mix = ref.sum(0)
    tr(mix, ref, ref + 0.01 * rng.standard_normal(ref.shape).astype(np.float32), "a")
    tr(mix, ref, ref[::-1], "b")  # swapped order — PIT must align
    res = tr.final()
    assert res["si-snr"] > 20
    with open(tmp_path / "metrics.csv") as f:
        rows = list(csv.DictReader(f))
    assert [r["snt_id"] for r in rows] == ["a", "b", "avg", "std"]
    # silent reference skipped
    tr2 = MetricsTracker(tmp_path / "m2.csv")
    tr2(mix, np.zeros_like(ref), ref, "silent")
    assert tr2.rows == []
    assert tr2.skipped_silent == 1  # counted + warned, not silently lost


def test_wav_chunk_inference_identity(rng):
    """An identity 'separator' must reconstruct the input exactly."""
    sr = 1000
    x = rng.standard_normal(sr * 10).astype(np.float32)

    def model_fn(batch):  # (B, T) → (B, 2, T)
        return np.stack([batch, -batch], axis=1)

    out = wav_chunk_inference(
        model_fn, x, sample_rate=sr, target_length=2.0, hop_length=1.0,
        batch_size=3, n_tracks=2,
    )
    assert out.shape == (2, len(x))
    np.testing.assert_allclose(out[0], x, atol=1e-4)
    np.testing.assert_allclose(out[1], -x, atol=1e-4)


def test_wav_chunk_inference_mesh_matches_single_device(rng):
    """Sequence-parallel chunked inference (window axis sharded over an
    8-device mesh) is numerically identical to the single-device path —
    windows are independent, so partitioning cannot change the math."""
    import jax

    from sonicsim_tpu.models import ConvTasNet
    from sonicsim_tpu.parallel import make_mesh

    sr = 1000
    x = rng.standard_normal(sr * 10).astype(np.float32)
    model = ConvTasNet(N=16, L=16, B=8, H=16, P=3, X=1, R=1, num_spks=2)
    params = model.init_params(jax.random.PRNGKey(0), example_len=2 * sr)
    model_fn = jax.jit(lambda b: model.apply(params, b))

    kw = dict(
        sample_rate=sr, target_length=2.0, hop_length=1.0, n_tracks=2,
    )
    ref = wav_chunk_inference(model_fn, x, batch_size=3, **kw)
    out = wav_chunk_inference(
        model_fn, x, batch_size=2, mesh=make_mesh(8), **kw
    )
    assert out.shape == (2, len(x))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_stitch_segments_fixes_swaps(rng):
    sr = 16000
    t = np.arange(sr) / sr
    spk_a = np.sin(2 * np.pi * 200 * t).astype(np.float32)
    spk_b = (np.sign(np.sin(2 * np.pi * 95 * t)) * 0.5).astype(np.float32)
    seg1 = np.stack([spk_a, spk_b])
    seg2 = np.stack([spk_b, spk_a])  # swapped
    seg3 = np.stack([spk_a, spk_b])
    out = stitch_segments([seg1, seg2, seg3], sr)
    np.testing.assert_allclose(out[1][0], spk_b * 0 + spk_a, atol=1e-6)
    np.testing.assert_allclose(out[1][1], spk_b, atol=1e-6)
    np.testing.assert_allclose(out[2][0], spk_a, atol=1e-6)


def test_energy_vad_finds_speech_spans(rng):
    from sonicsim_tpu.infer import energy_vad, segment_mixture

    sr = 16000
    x = np.zeros(sr * 6, np.float32)
    t = np.arange(sr) / sr
    burst = (np.sin(2 * np.pi * 300 * t) * 0.3).astype(np.float32)
    x[sr : 2 * sr] = burst           # speech at 1-2 s
    x[4 * sr : 5 * sr] = burst       # speech at 4-5 s
    x += 0.001 * rng.standard_normal(len(x)).astype(np.float32)
    spans = energy_vad(x, sr)
    assert len(spans) == 2
    (s1, e1), (s2, e2) = spans
    assert abs(s1 - sr) < sr * 0.2 and abs(e1 - 2 * sr) < sr * 0.3
    assert abs(s2 - 4 * sr) < sr * 0.2 and abs(e2 - 5 * sr) < sr * 0.3
    assert segment_mixture(np.zeros(sr, np.float32), sr) == []


def test_energy_vad_quiet_recording(rng):
    """An un-normalized quiet mixture (every frame under the -35 dB static
    floor) must still adapt and find speech well above ITS noise floor."""
    from sonicsim_tpu.infer import energy_vad

    sr = 16000
    x = np.zeros(sr * 6, np.float32)
    t = np.arange(sr) / sr
    # Speech at ~-45 dB frame energy, noise floor ~-80 dB.
    x[sr : 2 * sr] = (np.sin(2 * np.pi * 300 * t) * 0.008).astype(np.float32)
    x += 1e-4 * rng.standard_normal(len(x)).astype(np.float32)
    spans = energy_vad(x, sr)
    assert len(spans) == 1
    s, e = spans[0]
    assert abs(s - sr) < sr * 0.2 and abs(e - 2 * sr) < sr * 0.3
    # True silence still yields nothing.
    assert energy_vad(np.zeros(sr * 2, np.float32), sr) == []


def test_onnx_jax_dnsmos_if_weights_present(rng):
    """Run the committed DNSMOS graphs through the ONNX→JAX executor."""
    from pathlib import Path

    import pytest

    model_dir = Path("/root/reference/separation/DNSMOS")
    if not (model_dir / "sig_bak_ovr.onnx").exists():
        pytest.skip("DNSMOS weights unavailable")
    from sonicsim_tpu.metrics import DNSMOS

    sr = 16000
    t = np.arange(sr * 10) / sr
    clean = (0.3 * np.sin(2 * np.pi * 220 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 4 * t))).astype(np.float32)
    noisy = (clean + 0.25 * rng.standard_normal(len(t))).astype(np.float32)
    d = DNSMOS(model_dir)
    r_clean, r_noisy = d(clean), d(noisy)
    for k in ("SIG", "BAK", "OVRL", "P808_MOS"):
        assert 0.5 <= r_clean[k] <= 5.0
    assert r_clean["BAK"] > r_noisy["BAK"]
    assert r_clean["OVRL"] > r_noisy["OVRL"]


def test_librosa_mel_fb_properties():
    from sonicsim_tpu.metrics import librosa_mel_fb

    fb = librosa_mel_fb(16000, 321, 120)
    assert fb.shape == (120, 161)
    assert (fb >= 0).all()
    # Narrow low-frequency bands can miss every FFT bin at this resolution
    # (librosa warns about the same); the vast majority must have support.
    assert (fb.sum(axis=1) > 0).mean() > 0.8


def test_to_waveform_dispatch():
    import jax
    import numpy as np

    from sonicsim_tpu.infer import to_waveform
    from sonicsim_tpu.models import ConvTasNet, Fullband

    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 3200)).astype(np.float32) * 0.1

    m = Fullband(num_freqs=129, hidden_size=16, n_fft=256, hop_length=128,
                 win_length=256)
    p = m.init_params(jax.random.PRNGKey(0), example_len=3200)
    wav = to_waveform(m, m.apply(p, x), 3200)
    assert wav.shape == (1, 1, 3200)

    c = ConvTasNet(N=16, L=16, B=8, H=16, X=1, R=1)
    pc = c.init_params(jax.random.PRNGKey(0), example_len=3200)
    wav = to_waveform(c, c.apply(pc, x), 3200)
    assert wav.shape == (1, 2, 3200)


def test_bf16_forward_fidelity():
    import jax
    import numpy as np

    from sonicsim_tpu.infer import bf16_forward
    from sonicsim_tpu.models import ConvTasNet

    m = ConvTasNet(N=16, L=16, B=8, H=16, X=1, R=1)
    p = m.init_params(jax.random.PRNGKey(0), example_len=3200)
    x = np.random.default_rng(5).standard_normal((2, 3200)).astype(np.float32)
    o32 = np.asarray(m.apply(p, x))
    o16 = np.asarray(jax.jit(bf16_forward(m))(p, x))
    assert o16.dtype == np.float32
    rel = np.linalg.norm(o16 - o32) / np.linalg.norm(o32)
    assert rel < 0.05  # ~>26 dB fidelity
