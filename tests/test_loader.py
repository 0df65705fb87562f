"""Prefetching loader (dataset/loader.py) + native WAV decode parity.

The loader is the torch-DataLoader-worker role (SURVEY §2.8.3): threaded
__getitem__ with GIL-released native WAV decode and batch prefetch. Worker
parallelism must never change WHAT is loaded — only when — so every test
compares against the synchronous path.
"""

import numpy as np
import pytest

from sonicsim_tpu import native
from sonicsim_tpu.dataset.loader import batched_loader, prefetch_iter
from sonicsim_tpu.utils.wavio import read_wav, write_wav


class _SquareDataset:
    def __len__(self):
        return 10

    def __getitem__(self, i):
        return np.full((3,), i * i, np.float32)


def test_batched_loader_worker_parity():
    ds = _SquareDataset()
    sync = list(batched_loader(ds, 4, num_workers=0))
    pooled = list(batched_loader(ds, 4, num_workers=3))
    assert len(sync) == len(pooled) == 3  # 4 + 4 + 2
    for a, b in zip(sync, pooled):
        np.testing.assert_array_equal(a, b)
    assert sync[-1].shape == (2, 3)  # ragged tail preserved


def test_batched_loader_tuple_collate():
    class Pairs:
        def __len__(self):
            return 5

        def __getitem__(self, i):
            return np.float32(i), np.full((2,), i, np.float32)

    batches = list(batched_loader(Pairs(), 2, num_workers=2))
    assert batches[0][0].shape == (2,) and batches[0][1].shape == (2, 2)
    np.testing.assert_array_equal(batches[1][0], [2.0, 3.0])


def test_prefetch_iter_propagates_exceptions():
    def bad():
        yield 1
        raise RuntimeError("decode failed")

    it = prefetch_iter(bad, depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="decode failed"):
        list(it)


def test_native_wav_decode_parity(tmp_path):
    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(0)
    for enc in ("pcm16", "float32"):
        for ch in (1, 2):
            x = (rng.standard_normal((ch, 4000)) * 0.3).astype(np.float32)
            p = tmp_path / f"{enc}_{ch}.wav"
            write_wav(p, x, 16000, encoding=enc)
            got = native.read_wav(p)
            assert got is not None
            wav, sr = got
            ref, ref_sr = read_wav(p)  # same path (native first) — so also
            assert sr == ref_sr == 16000
            np.testing.assert_allclose(wav, ref, atol=1e-6)
            mono, _ = native.read_wav(p, mono=True)
            np.testing.assert_allclose(mono, ref.mean(0), atol=1e-6)


def test_python_fallback_still_errors(tmp_path):
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"this is not a riff file at all.....")
    with pytest.raises(ValueError, match="not a RIFF"):
        read_wav(bad)


def test_datamodule_workers_match_sync(tmp_path):
    from sonicsim_tpu.dataset.datamodule import MovingDataModule

    rng = np.random.default_rng(1)
    sr, t = 16000, 16000
    for split in ("train", "val"):
        d = tmp_path / split / "leaf"
        d.mkdir(parents=True)
        if split == "train":
            for name in ("moving_audio_1", "moving_audio_2", "moving_audio_3",
                         "noise_audio"):
                write_wav(d / f"{name}.wav",
                          (rng.standard_normal(t) * 0.1).astype(np.float32), sr)
        else:
            for name in ("mix", "s1", "s2"):
                write_wav(d / f"{name}.wav",
                          (rng.standard_normal(t) * 0.1).astype(np.float32), sr)

    kw = dict(
        train_dir=str(tmp_path / "train"), val_dir=str(tmp_path / "val"),
        test_dir=str(tmp_path / "val"), duration=0.5, num_samples=6,
        batch_size=4,
    )
    dm_sync = MovingDataModule(**kw)
    dm_pool = MovingDataModule(**kw, num_workers=2)
    for (ma, ta), (mb, tb) in zip(dm_sync.train_batches(3),
                                  dm_pool.train_batches(3)):
        np.testing.assert_array_equal(ma, mb)
        np.testing.assert_array_equal(ta, tb)
    for (ma, ta), (mb, tb) in zip(dm_sync.val_batches(), dm_pool.val_batches()):
        np.testing.assert_array_equal(ma, mb)
        np.testing.assert_array_equal(ta, tb)


def test_val_crop_seeks_active_audio(tmp_path):
    """val_batches(crop=N) must crop the max-energy window, not the head:
    generated mixtures open with random silences (plan_long_audio), so a
    head crop can validate against pure silence (neg-SI-SDR pinned at the
    eps cap) and the early-stop/plateau signal goes blind."""
    from sonicsim_tpu.dataset.datamodule import MovingDataModule

    rng = np.random.default_rng(2)
    sr = 16000
    d = tmp_path / "val" / "leaf"
    d.mkdir(parents=True)
    # 4 s samples: first 2 s silent, speech lives in [2, 4) s
    active = (rng.standard_normal(2 * sr) * 0.2).astype(np.float32)
    s1 = np.concatenate([np.zeros(2 * sr, np.float32), active])
    s2 = np.concatenate([np.zeros(2 * sr, np.float32), active[::-1]])
    write_wav(d / "s1.wav", s1, sr)
    write_wav(d / "s2.wav", s2, sr)
    write_wav(d / "mix.wav", s1 + s2, sr)

    dm = MovingDataModule(
        train_dir=str(tmp_path / "val"), val_dir=str(tmp_path / "val"),
        test_dir=str(tmp_path / "val"), batch_size=1,
    )
    (mix, tgt), = list(dm.val_batches(crop=sr))
    assert mix.shape[-1] == sr and tgt.shape[-1] == sr
    assert np.abs(tgt).max() > 0.01  # landed on the active region
    # the chosen second must carry (nearly) the most target energy
    full_energy = float(np.square(np.stack([s1, s2])).sum())
    crop_energy = float(np.square(tgt).sum())
    assert crop_energy > 0.4 * full_energy


def test_pooled_loader_bounds_inflight_decode():
    """Workers must not race ahead of the consumer: in-flight __getitem__
    submissions stay within num_workers + batch_size (ADVICE r2: eager
    ThreadPoolExecutor.map decoded whole epochs ahead, risking OOM)."""
    import threading
    import time

    lock = threading.Lock()
    state = {"started": 0, "max_ahead": 0, "consumed": 0}

    class Tracking:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            with lock:
                state["started"] += 1
                ahead = state["started"] - state["consumed"]
                state["max_ahead"] = max(state["max_ahead"], ahead)
            return np.full((2,), i, np.float32)

    batches = batched_loader(Tracking(), batch_size=4, num_workers=2,
                             prefetch=1)
    out = []
    for b in batches:
        out.append(b)
        time.sleep(0.005)  # slow consumer: give workers time to race
        with lock:
            state["consumed"] += len(b)
    assert len(out) == 16
    np.testing.assert_array_equal(out[3][:, 0], [12, 13, 14, 15])
    # window (workers+batch) + prefetch queue depth (1 batch) + the batch
    # being collated; anything near the dataset size means unbounded race.
    assert state["max_ahead"] <= 2 + 4 + 4 + 4 + 4


def test_prefetch_iter_abandoned_consumer_unblocks_producer():
    """Breaking out of the generator must release the producer thread
    (ADVICE r2: q.put blocked forever, leaking a thread + buffered items)."""
    import threading
    import time

    produced = []

    def gen():
        for i in range(1000):
            produced.append(i)
            yield i

    before = threading.active_count()
    it = prefetch_iter(gen, depth=2)
    assert next(it) == 0
    it.close()  # consumer abandons early
    deadline = time.monotonic() + 5.0
    while threading.active_count() > before and time.monotonic() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before
    assert len(produced) < 1000  # producer stopped, not drained
