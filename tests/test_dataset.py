"""End-to-end tests: planners, generation pipeline, training samplers."""

import json
from pathlib import Path

import numpy as np
import pytest

from sonicsim_tpu.dataset import (
    MovingTrainDataset,
    MovingTestEvalDataset,
    apply_sir,
    apply_snr,
    assemble_long_audio,
    generate_split,
    overlap_audio,
    plan_background_audio,
    plan_long_audio,
    plan_mixture,
    render_mixture,
    remove_existing_speakers,
    scan_audio_lengths,
)
from sonicsim_tpu.sim import Scene
from sonicsim_tpu.utils import read_wav, write_wav

SR = 16000


def _make_corpus(root: Path, n_files: int, seconds: float, rng, prefix="utt"):
    root.mkdir(parents=True, exist_ok=True)
    for i in range(n_files):
        t = np.arange(int(seconds * SR)) / SR
        f0 = 200 + 40 * i
        x = (0.3 * np.sin(2 * np.pi * f0 * t) * (1 + 0.3 * np.sin(2 * np.pi * 3 * t))).astype(
            np.float32
        )
        x += 0.01 * rng.standard_normal(len(x)).astype(np.float32)
        write_wav(root / f"{prefix}{i}.wav", x, SR)
    return scan_audio_lengths(root)


def test_plan_long_audio_structure(tmp_path, rng):
    lengths = _make_corpus(tmp_path / "sp", 6, 2.0, rng)
    plan = plan_long_audio(lengths, 10.0, rng, SR)
    assert plan.total_samples == 10 * SR
    assert len(plan.placements) >= 1
    prev_end = 0
    for s, e in plan.start_end_points:
        assert s >= prev_end  # silences only push forward
        assert e <= plan.total_samples
        prev_end = e
    audio = assemble_long_audio(plan)
    assert audio.shape == (1, 10 * SR)
    s0, e0 = plan.start_end_points[0]
    assert np.abs(audio[0, s0:e0]).max() > 0.1
    if s0 > 0:
        assert np.abs(audio[0, :s0]).max() == 0  # leading silence is silent


def test_plan_long_audio_oversized_utterances_warn(tmp_path, rng, caplog):
    """A corpus whose every file exceeds the buffer yields an empty plan
    (reference semantics, SonicSim_audio.py:153-229) — but must WARN: the
    silent track otherwise surfaces only as all-NaN eval metrics."""
    import logging

    lengths = _make_corpus(tmp_path / "sp", 3, 12.0, rng)  # 12 s > 10 s buffer
    with caplog.at_level(logging.WARNING, "sonicsim_tpu.dataset.plan"):
        plan = plan_long_audio(lengths, 10.0, rng, SR)
    assert plan.placements == []
    assert any("SILENT" in r.message for r in caplog.records)


def test_plan_background_covers_tail(tmp_path, rng):
    lengths = _make_corpus(tmp_path / "bg", 4, 3.0, rng)
    plan = plan_background_audio(lengths, 8.0, rng, SR)
    audio = assemble_long_audio(plan)
    assert audio.shape == (1, 8 * SR)
    assert np.abs(audio).max() > 0.05


def test_generation_pipeline_end_to_end(tmp_path, rng):
    scene = Scene.synthetic(
        dims=(10.0, 3.0, 8.0), channel_type="Binaural", seed=1, max_order=2
    )
    speech = [
        _make_corpus(tmp_path / f"spk{i}", 3, 1.5, rng, prefix=f"s{i}_")
        for i in range(3)
    ]
    noise = _make_corpus(tmp_path / "noise", 3, 2.0, rng, prefix="n_")
    music = _make_corpus(tmp_path / "music", 3, 2.0, rng, prefix="m_")

    plan = plan_mixture(scene, speech, noise, music, rng, duration=6.0, seed=7)
    out = tmp_path / "out"
    # '.flac'-keyed transcripts (reference process_librispeech CSVs) must
    # still resolve for the '.wav' corpus via the stem fallback in _words.
    flac_transcripts = {
        f"s{i}_{j}.flac": "hello" for i in range(3) for j in range(3)
    }
    meta = render_mixture(scene, plan, out, transcripts=flac_transcripts)

    for i in (1, 2, 3):
        wav, sr = read_wav(out / f"moving_audio_{i}.wav")
        assert sr == SR and wav.shape == (2, 6 * SR)  # binaural, 6 s
        assert np.abs(wav).max() > 1e-4
    for n in ("noise_audio.wav", "music_audio.wav"):
        wav, _ = read_wav(out / n)
        assert wav.shape == (2, 6 * SR)
    with open(out / "json_data.json") as f:
        saved = json.load(f)
    assert set(saved) == {"source1", "source2", "source3", "noise", "music"}
    assert saved["source1"]["start_end_points"] == [
        list(t) for t in plan.speech_plans[0].start_end_points
    ]
    assert (out / "trace.png").exists()
    assert (out / "mixture_plan.json").exists()
    assert meta["noise"]["audio"] == plan.noise_plan.audio_names
    # every .flac-keyed transcript resolved against its .wav audio name
    words = [
        w
        for k in ("source1", "source2", "source3")
        for w in meta[k]["words"]
    ]
    assert words and all(w == "hello" for w in words)


def test_generation_lufs_levels(tmp_path, rng):
    """Speech tracks should land near -17 LUFS, noise near -24 (±2 jitter)."""
    import jax.numpy as jnp

    from sonicsim_tpu.ops import integrated_loudness

    scene = Scene.synthetic(dims=(8.0, 3.0, 6.0), channel_type="Mono", seed=2, max_order=2)
    speech = [
        _make_corpus(tmp_path / f"spk{i}", 3, 1.5, rng, prefix=f"s{i}_")
        for i in range(3)
    ]
    noise = _make_corpus(tmp_path / "noise", 2, 2.0, rng, prefix="n_")
    music = _make_corpus(tmp_path / "music", 2, 2.0, rng, prefix="m_")
    plan = plan_mixture(scene, speech, noise, music, rng, duration=6.0, seed=3)
    out = tmp_path / "o2"
    render_mixture(scene, plan, out, save_trace=False, save_bank=False)
    with open(out / "json_data.json") as f:
        scales = json.load(f).get("pcm16_peak_scale", {})

    def undo_scale(name, lufs):
        # peak-guarded pcm16: written = original * scale (clip-free)
        return lufs - 20.0 * np.log10(scales.get(name, 1.0))

    wav, _ = read_wav(out / "moving_audio_1.wav")
    lufs = undo_scale(
        "moving_audio_1.wav", float(integrated_loudness(jnp.asarray(wav), SR))
    )
    assert abs(lufs - plan.lufs_speech[0]) < 0.7
    wavn, _ = read_wav(out / "noise_audio.wav")
    lufs_n = undo_scale(
        "noise_audio.wav", float(integrated_loudness(jnp.asarray(wavn), SR))
    )
    assert abs(lufs_n - plan.lufs_noise) < 0.7


def test_generation_pcm16_peak_guard_and_float32_parity(tmp_path, rng):
    """Hot tracks must not hard-clip at int16 full scale: the pcm16 path
    scales them (recording the factor in json_data.json), and the
    float32 path reproduces the reference's torchaudio.save format
    (SonicSet_train.py:102-106) with peaks intact."""
    import jax.numpy as jnp

    from sonicsim_tpu.ops import integrated_loudness

    scene = Scene.synthetic(
        dims=(8.0, 3.0, 6.0), channel_type="Mono", seed=2, max_order=2
    )

    def spiky_corpus(root, n, secs, prefix):
        """Speech-like crest factor, exaggerated: quiet bed + sparse loud
        clicks. -17 LUFS normalization then pushes peaks past int16 full
        scale, guaranteeing the guard branch is exercised."""
        root.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            t = int(secs * SR)
            x = 0.02 * np.sin(2 * np.pi * 180 * np.arange(t) / SR)
            x[:: SR // 2] = 0.95  # clicks at 2 Hz
            from sonicsim_tpu.utils import write_wav as _ww

            _ww(root / f"{prefix}{i}.wav", x.astype(np.float32), SR)
        return scan_audio_lengths(root)

    speech = [
        spiky_corpus(tmp_path / f"spk{i}", 3, 1.5, f"s{i}_")
        for i in range(3)
    ]
    noise = _make_corpus(tmp_path / "noise", 2, 2.0, rng, prefix="n_")
    music = _make_corpus(tmp_path / "music", 2, 2.0, rng, prefix="m_")
    plan = plan_mixture(scene, speech, noise, music, rng, duration=6.0, seed=3)

    out16 = tmp_path / "pcm16"
    render_mixture(scene, plan, out16, save_trace=False, save_bank=False)
    outf = tmp_path / "f32"
    render_mixture(
        scene, plan, outf, save_trace=False, save_bank=False,
        wav_encoding="float32",
    )

    with open(out16 / "json_data.json") as f:
        scales = json.load(f).get("pcm16_peak_scale", {})
    assert scales, "spiky corpus must trip the peak guard on some track"
    full = 1.0 - 1.0 / 32768.0
    for name in [f"moving_audio_{i}.wav" for i in (1, 2, 3)] + [
        "noise_audio.wav", "music_audio.wav"
    ]:
        w16, _ = read_wav(out16 / name)
        wf, _ = read_wav(outf / name)
        # float32 keeps the true (possibly >1) peak; LUFS matches the plan
        if name == "moving_audio_1.wav":
            lufs_f = float(integrated_loudness(jnp.asarray(wf), SR))
            assert abs(lufs_f - plan.lufs_speech[0]) < 0.25
        if float(np.abs(wf).max()) > full:
            # ...and the pcm16 twin must have been scaled, not clipped:
            # written/scale returns the float track to quantization noise
            s = scales[name]
            assert 0.0 < s < 1.0
            err = np.abs(w16 / s - wf).max()
            assert err < 1.5 / 32768.0 / s
            # guarded quantization never saturates a run of samples
            assert np.mean(np.abs(w16) >= full) < 1e-4
        else:
            assert name not in scales
            assert np.abs(w16 - wf).max() < 1.0 / 32768.0


def test_generate_split_resume(tmp_path, rng):
    def factory(name):
        return Scene.synthetic(
            room=name, dims=(8.0, 3.0, 6.0), channel_type="Mono", seed=4, max_order=2
        )

    spk_dirs = []
    for i in range(3):
        _make_corpus(tmp_path / "speech" / f"spk{i}", 2, 1.0, rng, prefix=f"u{i}_")
        spk_dirs.append(str(tmp_path / "speech" / f"spk{i}"))
    noise = _make_corpus(tmp_path / "noise", 2, 1.5, rng, prefix="n_")
    music = _make_corpus(tmp_path / "music", 2, 1.5, rng, prefix="m_")

    produced = generate_split(
        factory, ["roomA"], spk_dirs, noise, music, tmp_path / "set",
        duration=4.0, base_seed=0,
    )
    assert len(produced) == 1  # 3 speakers → one triple
    # Resume: all speakers consumed → nothing left to generate.
    leftover = remove_existing_speakers(tmp_path / "set" / "roomA", spk_dirs)
    assert leftover == []
    again = generate_split(
        factory, ["roomA"], spk_dirs, noise, music, tmp_path / "set",
        duration=4.0, base_seed=0,
    )
    assert again == []


def _make_generated_tree(tmp_path, rng, n_dirs=2, seconds=5.0):
    for d in range(n_dirs):
        leaf = tmp_path / "train" / "room" / f"trip{d}"
        leaf.mkdir(parents=True)
        t = int(seconds * SR)
        for i in (1, 2, 3):
            x = 0.1 * rng.standard_normal(t).astype(np.float32)
            write_wav(leaf / f"moving_audio_{i}.wav", x, SR)
        write_wav(leaf / "noise_audio.wav", 0.05 * rng.standard_normal(t).astype(np.float32), SR)
        write_wav(leaf / "music_audio.wav", 0.05 * rng.standard_normal(t).astype(np.float32), SR)
    return tmp_path / "train"


def test_moving_train_dataset(tmp_path, rng):
    root = _make_generated_tree(tmp_path, rng)
    ds = MovingTrainDataset(
        speech_dir=str(root), duration=2.0, num_samples=4, num_spks=2, seed=1
    )
    mix, tgt = ds[0]
    assert mix.shape == (2 * SR,) and tgt.shape == (2, 2 * SR)
    # Deterministic per (seed, epoch, idx)
    mix2, tgt2 = ds[0]
    np.testing.assert_array_equal(mix, mix2)
    ds.set_epoch(1)
    mix3, _ = ds[0]
    assert not np.array_equal(mix, mix3)
    # enhancement mode: single-speaker target squeezed
    ds1 = MovingTrainDataset(
        speech_dir=str(root), duration=2.0, num_samples=2, num_spks=1, seed=1
    )
    _, t1 = ds1[0]
    assert t1.shape == (2 * SR,)


def test_moving_test_eval_dataset(tmp_path, rng):
    root = _make_generated_tree(tmp_path, rng)
    ds = MovingTestEvalDataset(speech_dir=str(root), seed=2)
    mix, spk, folder = ds[0]
    assert mix.shape == spk.shape[1:] and spk.shape[0] == 2
    enh = MovingTestEvalDataset(speech_dir=str(root), task="enhancement", seed=2)
    mix_e, clean, _ = enh[0]
    assert clean.shape == (1, mix_e.shape[-1])


def test_mix_math_matches_reference_rules(rng):
    spk = rng.standard_normal((2, 4000)).astype(np.float32) * [[1.0], [0.1]]
    sirs = np.array([3.0])
    scaled = apply_sir(spk, sirs)

    def _r(w):
        return 10 * np.log10(max(1e-20, np.mean(w**2)))

    got_sir = _r(scaled[0]) - _r(scaled[1])
    assert got_sir == pytest.approx(3.0, abs=0.01)
    noise = rng.standard_normal(4000).astype(np.float32)
    sn = apply_snr(scaled.sum(0), noise, 15.0)
    assert _r(scaled.sum(0)) - _r(sn) == pytest.approx(15.0, abs=0.01)


def test_overlap_audio(rng):
    x = rng.standard_normal(SR * 2).astype(np.float32)
    y = overlap_audio(x, SR, delay=0.5)
    d = int(0.5 * SR)
    np.testing.assert_allclose(y[:d], x[:d] + x[d : 2 * d], rtol=1e-5)


def test_remix_dataset_and_manifest(tmp_path, rng):
    from sonicsim_tpu.dataset import RemixTrainDataset, build_segment_manifest

    # Build a fixed tree: sample dirs with s1/s2.wav + noise.wav.
    for d in range(2):
        leaf = tmp_path / "fixed" / f"sample{d}"
        leaf.mkdir(parents=True)
        t = 6 * SR
        for i in (1, 2):
            write_wav(leaf / f"s{i}.wav", 0.1 * rng.standard_normal(t).astype(np.float32), SR)
        write_wav(leaf / "noise.wav", 0.05 * rng.standard_normal(t).astype(np.float32), SR)
        write_wav(leaf / "music.wav", 0.05 * rng.standard_normal(t).astype(np.float32), SR)
    manifest = build_segment_manifest(tmp_path / "fixed", tmp_path / "seg.json", duration=2.0)
    assert len(manifest) == 2
    for spans in manifest.values():
        assert all(e - s == 2 * SR for s, e in spans)

    ds = RemixTrainDataset(str(tmp_path / "seg.json"), duration=2.0, num_samples=3, seed=1)
    mix, tgt = ds[0]
    assert mix.shape == (2 * SR,) and tgt.shape == (2 * SR,)
    mix2, _ = ds[0]
    np.testing.assert_array_equal(mix, mix2)  # deterministic


def test_load_split_manifest_committed():
    """The committed split manifest carries the full SonicSet split spec
    (scene ids, speaker dirs, corpus length maps) and re-roots paths."""
    from sonicsim_tpu.dataset import load_split_manifest, select_files_to_fill

    path = Path(__file__).parents[1] / "data" / "sonicset_splits.json"
    train = load_split_manifest(path, "train", speech_root="/c", noise_root="/n")
    val = load_split_manifest(path, "val")
    test = load_split_manifest(path, "test")
    assert len(train["scenes"]) >= 60 and len(val["scenes"]) == 19
    assert len(test["scenes"]) == 9
    assert len(train["noise"]) == 4509 and len(train["music"]) == 3405
    assert all(p.startswith("/c/") for p in train["speech"])
    assert all(p.startswith("/n/") for p in train["noise"])
    assert all(v > 0 for v in train["noise"].values())
    # The length map drives utterance selection directly (manifest lengths
    # are 44.1 kHz samples; pick a target longer than one file).
    rng = np.random.default_rng(0)
    picks = select_files_to_fill(
        train["noise"], 44100 * 120, rng, stop_on_overflow=False
    )
    assert picks and all(p in train["noise"] for p in picks)

    with pytest.raises(KeyError, match="bogus"):
        load_split_manifest(path, "bogus")


def test_generate_split_regenerates_partial_mixture(tmp_path, rng):
    """Crash recovery: a dir left WITHOUT json_data.json (the completion
    marker the artifact writer lands last) must be cleaned and its
    mixture regenerated identically on the next run — the reference
    orphans those speakers forever (removing_exist_speaker counts any
    existing folder, SonicSet_train.py:140-151)."""

    def factory(name):
        return Scene.synthetic(
            room=name, dims=(8.0, 3.0, 6.0), channel_type="Mono", seed=4,
            max_order=2,
        )

    spk_dirs = []
    for i in range(3):
        _make_corpus(tmp_path / "speech" / f"spk{i}", 2, 1.0, rng, prefix=f"u{i}_")
        spk_dirs.append(str(tmp_path / "speech" / f"spk{i}"))
    noise = _make_corpus(tmp_path / "noise", 2, 1.5, rng, prefix="n_")
    music = _make_corpus(tmp_path / "music", 2, 1.5, rng, prefix="m_")

    produced = generate_split(
        factory, ["roomA"], spk_dirs, noise, music, tmp_path / "set",
        duration=4.0, base_seed=0,
    )
    assert len(produced) == 1
    out = produced[0]
    golden = {
        p.name: p.read_bytes() for p in out.iterdir() if p.suffix == ".wav"
    }

    # Simulate a crash between the WAV writes and the json marker.
    (out / "json_data.json").unlink()
    (out / "moving_audio_2.wav").unlink()

    # An unrelated user dir under the scene root must NOT be swept up
    # by the partial-mixture cleanup.
    keep = out.parent / "plots"
    keep.mkdir()
    (keep / "notes.txt").write_text("user data")

    again = generate_split(
        factory, ["roomA"], spk_dirs, noise, music, tmp_path / "set",
        duration=4.0, base_seed=0,
    )
    assert [p.name for p in again] == [out.name]  # same triple re-formed
    assert (out / "json_data.json").exists()
    assert (keep / "notes.txt").read_text() == "user data"
    for name, blob in golden.items():
        assert (out / name).read_bytes() == blob, name


def test_looks_like_partial_mixture(tmp_path):
    from sonicsim_tpu.dataset.generate import looks_like_partial_mixture

    empty = tmp_path / "empty"
    empty.mkdir()
    assert looks_like_partial_mixture(empty)  # crash right after mkdir

    partial = tmp_path / "partial"
    partial.mkdir()
    (partial / "moving_audio_1.wav").write_bytes(b"\0")
    assert looks_like_partial_mixture(partial)

    foreign = tmp_path / "foreign"
    foreign.mkdir()
    (foreign / "analysis.ipynb").write_text("{}")
    assert not looks_like_partial_mixture(foreign)


def test_artifact_writer_fifo_and_error_propagation(tmp_path):
    """ArtifactWriter drains in FIFO order (json_data.json must land
    after the WAVs for the resume contract) and re-raises the first
    worker error on close()."""
    import time as _time

    from sonicsim_tpu.dataset.generate import ArtifactWriter

    order: list[int] = []
    w = ArtifactWriter()
    for i in range(16):
        w.submit(lambda i=i: (order.append(i), _time.sleep(0.001)))
    w.barrier()
    assert order == list(range(16))
    w.close()

    w2 = ArtifactWriter()

    def boom():
        raise RuntimeError("disk full")

    w2.submit(boom)
    with pytest.raises(RuntimeError, match="disk full"):
        w2.barrier()
    w2.close()  # error already consumed; close is clean

    w3 = ArtifactWriter()
    w3.submit(boom)
    with pytest.raises(RuntimeError, match="disk full"):
        w3.close()


def test_artifact_writer_failure_latches(tmp_path):
    """After a write fails, items already queued behind it must NOT run
    even once _check hands the error to the caller — otherwise a
    json_data.json queued after a failed WAV write could land and mint a
    resume marker for a broken mixture."""
    import threading

    from sonicsim_tpu.dataset.generate import ArtifactWriter

    w = ArtifactWriter()
    gate = threading.Event()
    ran: list[str] = []

    w.submit(gate.wait)  # hold the worker so the queue builds up

    def boom():
        raise RuntimeError("disk full")

    w.submit(boom)
    w.submit(lambda: ran.append("json"))  # queued BEHIND the failure
    gate.set()
    # consume the error on the main thread (as generate_split's next
    # submit/_check would)
    with pytest.raises(RuntimeError, match="disk full"):
        w.barrier()
    w.close()
    assert ran == []  # the trailing write was skipped, not executed


def test_pcm16_exact_predicate():
    from sonicsim_tpu.utils.audio import pcm16_exact

    on_grid = np.array([0.0, 1 / 32768.0, -5 / 32768.0], np.float32)
    q = pcm16_exact(on_grid)
    assert q is not None and q.dtype == np.int16
    assert np.array_equal(q.astype(np.float32) * np.float32(2**-15), on_grid)
    assert pcm16_exact(np.array([0.3333], np.float32)) is None  # off-grid
    assert pcm16_exact(np.array([1.0], np.float32)) is None  # full scale
    empty = pcm16_exact(np.zeros(0, np.float32))
    assert empty is not None and empty.size == 0  # no crash on empty


def test_utterance_cache_empty_wav(tmp_path, rng):
    """A zero-length corpus WAV must not crash the cache (the host
    assembly path tolerates it)."""
    from sonicsim_tpu.dataset.device_assembly import UtteranceCache
    from sonicsim_tpu.utils import write_wav

    write_wav(tmp_path / "empty.wav", np.zeros(0, np.float32), SR)
    cache = UtteranceCache(sample_rate=SR, lmax=1 << 14)
    rows, n = cache.get(tmp_path / "empty.wav")
    assert n == 0 and len(rows) == 1


def test_select_files_exact_fill_accepted_walkdir():
    """Reference quirk: the walk-dir selector accepts an exactly-filling
    file (<=, SonicSim_audio.py:184); the from_json variant treats it as
    overflow-append (<, :220)."""
    from sonicsim_tpu.dataset.plan import select_files_to_fill

    lengths = {"a": 1000}
    rng = np.random.default_rng(0)
    # walk-dir: exactly-filling file is selected normally
    assert select_files_to_fill(lengths, 1000, rng) == ["a"]
    # from_json: < means 1000 doesn't fit, but the overflow append keeps it
    assert select_files_to_fill(
        lengths, 1000, np.random.default_rng(0), stop_on_overflow=False
    ) == ["a"]


def test_generate_split_from_bank_scene(tmp_path, rng):
    """--bank_dir production path: a Scene.from_bank over an imported RIR
    bank generates mixtures end-to-end (nearest-pair lookups, per-bank
    render fallback)."""
    from sonicsim_tpu.sim import render_rir_bank, save_rir_bank

    # Build a bank from a synthetic oracle over a 12x9 m footprint so
    # trajectory sampling (>=5 m span) has room.
    donor = Scene.synthetic(
        dims=(12.0, 3.0, 9.0), channel_type="Mono", seed=3, max_order=2
    )
    xs = np.linspace(1.0, 11.0, 4)
    zs = np.linspace(1.0, 8.0, 3)
    pts = np.array([[x, 1.5, z] for x in xs for z in zs])
    bank = render_rir_bank(donor.oracle, list(pts), list(pts[:4]), donor.channel)
    save_rir_bank(tmp_path / "roomB.npz", bank, pts, pts[:4], SR)

    scene = Scene.from_bank(tmp_path / "roomB.npz", channel_type="Mono")
    assert scene.room == "roomB"
    traj = scene.sample_trajectory(np.random.default_rng(0))
    assert len(traj) >= 2

    spk_dirs = []
    for i in range(3):
        _make_corpus(tmp_path / "speech" / f"spk{i}", 2, 1.0, rng,
                     prefix=f"u{i}_")
        spk_dirs.append(str(tmp_path / "speech" / f"spk{i}"))
    noise = _make_corpus(tmp_path / "noise", 2, 1.5, rng, prefix="n_")
    music = _make_corpus(tmp_path / "music", 2, 1.5, rng, prefix="m_")
    produced = generate_split(
        lambda name: Scene.from_bank(tmp_path / f"{name}.npz",
                                     channel_type="Mono"),
        ["roomB"], spk_dirs, noise, music, tmp_path / "set",
        duration=4.0, base_seed=0,
    )
    assert len(produced) == 1
    wav, sr = read_wav(produced[0] / "moving_audio_1.wav")
    assert sr == SR and wav.shape[-1] == 4 * SR
    assert np.abs(wav).max() > 1e-5


def test_val_crop_fallback_when_no_window_covers_all_speakers():
    """Deterministic val crop: with bursty NON-overlapping speakers, no
    crop-length window has every target active — max-of-min energy is 0
    everywhere and a blind argmax would land on index 0, i.e. the random
    opening silence where BOTH targets are quiet. The fallback must pick
    a window with speech in it (max total energy)."""
    from types import SimpleNamespace

    from sonicsim_tpu.dataset.datamodule import MovingDataModule

    sr, crop = 16000, 16000
    t = 30 * sr
    tgt = np.zeros((2, t), dtype=np.float32)
    tgt[0, 8 * sr : 12 * sr] = 0.5   # speaker 0: 8-12 s
    tgt[1, 14 * sr : 18 * sr] = 0.5  # speaker 1: 14-18 s (never overlaps)
    mix = tgt.sum(axis=0)

    class _DS:
        def __len__(self):
            return 1

        def __getitem__(self, i):
            return mix.copy(), tgt.copy()

    stub = SimpleNamespace(batch_size=1, num_workers=0, prefetch=0)
    (m, tg), = list(MovingDataModule._fixed_batches(stub, _DS(), crop=crop))
    assert m.shape[-1] == crop
    # the crop must contain speech energy, not the opening silence
    assert float(np.square(tg).sum()) > 0.0

    # and when a window DOES cover every speaker, max-of-min still picks it
    tgt2 = np.zeros((2, t), dtype=np.float32)
    tgt2[0, 8 * sr : 12 * sr] = 0.5
    tgt2[1, 11 * sr : 15 * sr] = 0.5  # overlaps 11-12 s
    class _DS2(_DS):
        def __getitem__(self, i):
            return tgt2.sum(axis=0), tgt2.copy()

    (m2, tg2), = list(MovingDataModule._fixed_batches(stub, _DS2(), crop=crop))
    assert float(np.square(tg2[0, 0]).sum()) > 0.0  # speaker 0 active
    assert float(np.square(tg2[0, 1]).sum()) > 0.0  # speaker 1 active
