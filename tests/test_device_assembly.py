"""Device-side long-audio assembly must be bit-identical to the host
path (dataset/device_assembly.py vs dataset/assemble.py), across PCM16
uploads, f32 fallbacks (resample/downmix), chunked long utterances,
overlap adds, and LRU eviction — and through the whole generation
pipeline (generate_split utterance_cache=True vs False)."""

import numpy as np
import pytest

from sonicsim_tpu.dataset import assemble_long_audio, generate_split, plan_long_audio
from sonicsim_tpu.dataset.device_assembly import UtteranceCache, assemble_plans_on_device
from sonicsim_tpu.dataset.plan import LongAudioPlan, Placement, scan_audio_lengths
from sonicsim_tpu.sim import Scene
from sonicsim_tpu.utils import read_wav, write_wav

SR = 16000


def _pcm_utt(path, seconds, rng, sr=SR, channels=1):
    t = np.arange(int(seconds * sr)) / sr
    x = 0.4 * np.sin(2 * np.pi * (150 + 80 * rng.random()) * t)
    x = x.astype(np.float32) + 0.02 * rng.standard_normal(len(t)).astype(np.float32)
    if channels > 1:
        x = np.stack([x, np.roll(x, 7)])
    write_wav(path, x, sr)
    return path


def _host(plans):
    return np.stack([assemble_long_audio(p)[0] for p in plans])


def test_matches_host_exactly_pcm16(tmp_path, rng):
    paths = [_pcm_utt(tmp_path / f"u{i}.wav", 1.2 + 0.3 * i, rng) for i in range(4)]
    lengths = scan_audio_lengths(tmp_path)
    plans = [plan_long_audio(lengths, 6.0, rng, SR) for _ in range(3)]
    cache = UtteranceCache(sample_rate=SR, lmax=1 << 15)
    dev = np.asarray(assemble_plans_on_device(plans, cache))
    assert np.array_equal(dev, _host(plans))
    assert cache.misses <= len(paths)
    # Re-assembling the same plans is all cache hits, still exact.
    misses_before = cache.misses
    dev2 = np.asarray(assemble_plans_on_device(plans, cache))
    assert np.array_equal(dev2, dev)
    assert cache.misses == misses_before and cache.hits > 0


def test_f32_fallback_resample_and_downmix(tmp_path, rng):
    _pcm_utt(tmp_path / "a44k.wav", 0.8, rng, sr=44100)  # resampled → f32 row
    _pcm_utt(tmp_path / "stereo.wav", 0.9, rng, channels=2)  # downmix → f32
    _pcm_utt(tmp_path / "plain.wav", 0.7, rng)  # PCM-exact → int16 row
    lengths = scan_audio_lengths(tmp_path)
    plans = [plan_long_audio(lengths, 4.0, rng, SR) for _ in range(2)]
    cache = UtteranceCache(sample_rate=SR, lmax=1 << 15)
    dev = np.asarray(assemble_plans_on_device(plans, cache))
    assert np.array_equal(dev, _host(plans))


def test_chunked_long_utterance_and_overlap(tmp_path, rng):
    lmax = 4096
    p = _pcm_utt(tmp_path / "long.wav", (3 * lmax + 500) / SR, rng)
    # Placements that straddle chunk boundaries, start mid-file, clip the
    # tail past EOF, and overlap each other in the destination.
    plan = LongAudioPlan(
        total_samples=6 * lmax,
        sample_rate=SR,
        placements=[
            Placement(str(p), dest_start=100, dest_end=100 + 3 * lmax + 500),
            Placement(str(p), dest_start=50, dest_end=50 + 2000, src_start=lmax - 1000),
            # numpy-truncation semantics: reads past EOF shorten the segment
            Placement(str(p), dest_start=9000, dest_end=9000 + 4096, src_start=3 * lmax),
        ],
    )
    cache = UtteranceCache(sample_rate=SR, lmax=lmax)
    dev = np.asarray(assemble_plans_on_device([plan], cache))
    host = assemble_long_audio(plan)
    assert np.array_equal(dev, host)
    assert len(cache._entries[str(p)][0]) == 4  # 3*lmax+500 → 4 chunks


def test_lru_eviction_stays_correct(tmp_path, rng):
    paths = [_pcm_utt(tmp_path / f"u{i}.wav", 0.6, rng) for i in range(5)]
    lengths = scan_audio_lengths(tmp_path)
    lmax = 1 << 14
    cache = UtteranceCache(sample_rate=SR, lmax=lmax, max_bytes=2 * lmax * 4)
    plans = [plan_long_audio(lengths, 3.0, rng, SR) for _ in range(3)]
    dev = np.asarray(assemble_plans_on_device(plans, cache))
    assert np.array_equal(dev, _host(plans))
    assert len(cache._entries) <= 2  # evicted down to budget
    # Re-assembly after eviction reloads and stays exact.
    dev2 = np.asarray(assemble_plans_on_device(plans, cache))
    assert np.array_equal(dev2, dev)


def test_empty_plan_row_is_silent(tmp_path, rng):
    _pcm_utt(tmp_path / "u.wav", 0.5, rng)
    lengths = scan_audio_lengths(tmp_path)
    full = plan_long_audio(lengths, 2.0, rng, SR)
    silent = LongAudioPlan(total_samples=2 * SR, sample_rate=SR, placements=[])
    cache = UtteranceCache(sample_rate=SR, lmax=1 << 14)
    dev = np.asarray(assemble_plans_on_device([full, silent], cache))
    assert np.array_equal(dev, _host([full, silent]))
    assert np.all(dev[1] == 0.0)


@pytest.mark.slow
def test_generate_split_cache_bit_identical(tmp_path, rng):
    """The whole pipeline (bank render → device assembly → moving conv →
    LUFS → pcm16 WAVs) produces byte-identical artifacts with the
    utterance cache on vs off."""

    def factory(name):
        return Scene.synthetic(
            room=name, dims=(8.0, 3.0, 6.0), channel_type="Mono", seed=4,
            max_order=2,
        )

    spk_dirs = []
    for i in range(3):
        d = tmp_path / "speech" / f"spk{i}"
        d.mkdir(parents=True)
        for j in range(2):
            _pcm_utt(d / f"u{i}_{j}.wav", 1.0, rng)
        spk_dirs.append(str(d))
    d = tmp_path / "noise"; d.mkdir()
    _pcm_utt(d / "n0.wav", 1.5, rng)
    noise = scan_audio_lengths(d)
    d = tmp_path / "music"; d.mkdir()
    _pcm_utt(d / "m0.wav", 1.5, rng)
    music = scan_audio_lengths(d)

    outs = {}
    for flag in (True, False):
        produced = generate_split(
            factory, ["roomA"], spk_dirs, noise, music,
            tmp_path / f"set_{flag}", duration=4.0, base_seed=0,
            utterance_cache=flag,
        )
        assert len(produced) == 1
        outs[flag] = produced[0]
    names = sorted(p.name for p in outs[True].iterdir())
    assert names == sorted(p.name for p in outs[False].iterdir())
    for name in names:
        if name.endswith(".wav"):
            a, _ = read_wav(outs[True] / name)
            b, _ = read_wav(outs[False] / name)
            assert np.array_equal(a, b), name
