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
