"""Tests: WAV I/O round-trips, config interpolation/instantiate, interp plans."""

import numpy as np
import pytest

from sonicsim_tpu.ops import dynamic_interp_plan, interpolate_positions
from sonicsim_tpu.utils import (
    instantiate,
    load_config,
    read_wav,
    resample,
    save_config,
    write_wav,
)


def test_wav_roundtrip_pcm16(tmp_path, rng):
    x = np.clip(rng.standard_normal((2, 1600)) * 0.3, -0.9, 0.9).astype(np.float32)
    write_wav(tmp_path / "a.wav", x, 16000)
    y, sr = read_wav(tmp_path / "a.wav")
    assert sr == 16000 and y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=1.0 / 32768)


def test_wav_roundtrip_float32(tmp_path, rng):
    x = (rng.standard_normal(500) * 2.0).astype(np.float32)  # out-of-range ok
    write_wav(tmp_path / "f.wav", x, 8000, encoding="float32")
    y, sr = read_wav(tmp_path / "f.wav")
    assert sr == 8000
    np.testing.assert_allclose(y[0], x, rtol=1e-6)


def test_resample_tone(rng):
    sr1, sr2 = 48000, 16000
    t = np.arange(sr1) / sr1
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = resample(x, sr1, sr2)
    assert abs(len(y) - sr2) <= 1
    t2 = np.arange(len(y)) / sr2
    ref = np.sin(2 * np.pi * 440 * t2)
    assert np.mean((y[100:-100] - ref[100:-100]) ** 2) < 1e-4


def test_config_interpolation_and_instantiate(tmp_path):
    cfg_text = """
exp:
  dir: Exps/
  name: demo
paths:
  out: ${exp.dir}/${exp.name}
obj:
  _target_: collections.OrderedDict
"""
    p = tmp_path / "c.yaml"
    p.write_text(cfg_text)
    cfg = load_config(p)
    assert cfg["paths"]["out"] == "Exps//demo"
    obj = instantiate(cfg["obj"])
    from collections import OrderedDict

    assert isinstance(obj, OrderedDict)
    save_config(cfg, tmp_path / "saved.yaml")
    assert load_config(tmp_path / "saved.yaml") == cfg


def test_dynamic_interp_plan_properties(rng):
    pos = np.cumsum(rng.uniform(0.1, 2.0, size=(7, 3)), axis=0)
    idx, w = dynamic_interp_plan(pos, 10_000, rng=rng)
    assert len(idx) == len(w) == 10_000
    assert idx.min() == 0 and idx.max() == len(pos) - 2
    assert np.all(np.diff(idx) >= 0)  # monotone through segments
    assert w.min() >= 0 and w.max() < 1
    # Segment sample counts proportional to segment lengths (constant speed).
    dist = np.linalg.norm(np.diff(pos, axis=0), axis=1)
    counts = np.bincount(idx, minlength=len(dist))
    expected = dist / dist.sum() * 10_000
    assert np.abs(counts - expected).max() <= len(dist) + 1


def test_dynamic_interp_plan_static_trajectory():
    pos = np.zeros((3, 3))
    idx, w = dynamic_interp_plan(pos, 100, rng=np.random.default_rng(0))
    assert np.all(idx == 0) and np.all(w == 0)


def test_interpolate_positions(rng):
    pos = np.array([[0.0, 0, 0], [1.0, 0, 0], [1.0, 1.0, 0]])
    idx, w = dynamic_interp_plan(pos, 1000, rng=rng)
    pts = interpolate_positions(pos, idx, w)
    assert pts.shape == (1000, 3)
    # Constant speed: consecutive step sizes nearly equal.
    step = np.linalg.norm(np.diff(pts, axis=0), axis=1)
    assert step.std() < step.mean() * 0.5


def test_audio_utils_parity():
    import numpy as np

    from sonicsim_tpu.utils import (
        all_pairs,
        clip_all,
        clip_two,
        normalize,
        sum_arrays_with_different_length,
    )

    a = np.array([0.5, -2.0, 1.0, 0.0, 0.0])
    assert np.abs(normalize(a)).max() == 1.0
    r = normalize(a, "rms")
    rms = np.sqrt(np.mean(np.square(np.trim_zeros(a, "b")))) * 100
    np.testing.assert_allclose(r, a / rms)

    x, y = clip_two(np.zeros(7), np.zeros(4))
    assert x.shape[-1] == y.shape[-1] == 4
    assert [c.shape[-1] for c in clip_all([np.zeros(3), np.zeros(9)])] == [3, 3]

    s = sum_arrays_with_different_length([np.ones(2), np.ones(4)])
    np.testing.assert_array_equal(s, [2.0, 2.0, 1.0, 1.0])

    l1, l2 = all_pairs([1, 2], ["a", "b"])
    assert l1 == [1, 1, 2, 2] and l2 == ["a", "b", "a", "b"]


def test_receiver_source_entities():
    from sonicsim_tpu.sim import Receiver, Source

    r = Receiver(position=(1.0, 0.0, 2.0))
    s = Source(position=(0.0, 0.0, 0.0), dry_sound="x.wav")
    assert r.sample_rate == 16000 and r.rotation == 90.0
    assert s.dry_sound == "x.wav"


def test_pcm16_quantize_matches_write_wav(tmp_path):
    """Device-side quantization produces bit-identical PCM bytes to the
    host path in write_wav."""
    import jax.numpy as jnp

    from sonicsim_tpu.utils import pcm16_quantize, read_wav, write_wav

    rng = np.random.default_rng(0)
    x = (rng.standard_normal((2, 1000)) * 0.7).astype(np.float32)
    x[0, :5] = [1.5, -1.5, 1.0, -1.0, 0.0]  # clipping edges

    write_wav(tmp_path / "host.wav", x, 16000)
    write_wav(tmp_path / "dev.wav", np.asarray(pcm16_quantize(jnp.asarray(x))), 16000)
    assert (tmp_path / "host.wav").read_bytes() == (tmp_path / "dev.wav").read_bytes()
    back, sr = read_wav(tmp_path / "dev.wav")
    assert sr == 16000 and back.shape == x.shape


def test_wav_num_frames_matches_decode(tmp_path, rng):
    from sonicsim_tpu.utils.wavio import read_wav, wav_num_frames, write_wav

    for i, t in enumerate((1600, 16001)):
        p = tmp_path / f"w{i}.wav"
        write_wav(p, (rng.standard_normal(t) * 0.1).astype(np.float32), 16000)
        assert wav_num_frames(p) == read_wav(p)[0].shape[-1] == t


def test_transcripts_load_is_reference_exact(tmp_path):
    """load_transcripts returns EXACTLY the CSV's rows (reference-dict
    parity, tool_utils.py:32-35); extension-blind lookup lives in the
    consumer (dataset/generate.py _words), covered below."""
    from sonicsim_tpu.utils.transcripts import load_transcripts

    csv_path = tmp_path / "t.csv"
    csv_path.write_text("name,words\n84-121123-0000.flac,HELLO WORLD\n")
    t = load_transcripts(csv_path)
    assert t == {"84-121123-0000.flac": "HELLO WORLD"}


def test_import_target_surfaces_real_import_errors(tmp_path, monkeypatch):
    """A module that EXISTS but fails to import must not be masked as
    'cannot import target'."""
    import sys

    import pytest

    from sonicsim_tpu.utils.config import import_target

    mod_dir = tmp_path / "brokenpkg"
    mod_dir.mkdir()
    (mod_dir / "__init__.py").write_text("import missing_dependency_xyz\n")
    monkeypatch.syspath_prepend(str(tmp_path))
    with pytest.raises(ModuleNotFoundError, match="missing_dependency_xyz"):
        import_target("brokenpkg.Thing")
    sys.modules.pop("brokenpkg", None)
