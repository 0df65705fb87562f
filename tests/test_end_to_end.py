"""Integration test: generate → fixed eval → train → test, all hermetic.

The reference's MVP path (SURVEY.md §7.5): generate a small fixed set with
the synthetic oracle, train ConvTasNet briefly, evaluate SI-SNRi.
"""

import json

import numpy as np

from sonicsim_tpu.dataset import (
    MovingDataModule,
    MovingTestEvalDataset,
    generate_split,
    scan_audio_lengths,
)
from sonicsim_tpu.losses import PairwiseNegSDR, PITLossWrapper
from sonicsim_tpu.metrics import MetricsTracker
from sonicsim_tpu.models import ConvTasNet, from_pretrain
from sonicsim_tpu.sim import Scene
from sonicsim_tpu.train import Trainer
from sonicsim_tpu.utils import write_wav

SR = 16000


def _corpus(root, n, seconds, rng, prefix):
    root.mkdir(parents=True, exist_ok=True)
    for i in range(n):
        t = np.arange(int(seconds * SR)) / SR
        x = (
            0.3 * np.sin(2 * np.pi * (180 + 60 * i) * t)
            * (1 + 0.4 * np.sin(2 * np.pi * (2 + i) * t))
        ).astype(np.float32)
        write_wav(root / f"{prefix}{i}.wav", x, SR)
    return scan_audio_lengths(root)


def test_generate_train_eval_pipeline(tmp_path, rng):
    # 1. Generate a tiny SonicSet split with the synthetic oracle.
    def factory(name):
        return Scene.synthetic(
            room=name, dims=(8.0, 3.0, 6.0), channel_type="Mono", seed=1,
            max_order=2,
        )

    spk_dirs = []
    for i in range(3):
        _corpus(tmp_path / "speech" / f"spk{i}", 2, 1.2, rng, f"u{i}_")
        spk_dirs.append(str(tmp_path / "speech" / f"spk{i}"))
    noise = _corpus(tmp_path / "noise", 2, 1.5, rng, "n_")
    music = _corpus(tmp_path / "music", 2, 1.5, rng, "m_")
    produced = generate_split(
        factory, ["roomA"], spk_dirs, noise, music, tmp_path / "set" / "train",
        duration=5.0, base_seed=0,
    )
    assert len(produced) == 1

    # 2. Materialize a fixed eval dir from the generated tree.
    ds = MovingTestEvalDataset(speech_dir=str(tmp_path / "set" / "train"), seed=3)
    for i in range(len(ds)):
        mix, targets, _ = ds[i]
        d = tmp_path / "set" / "val" / f"sample{i + 1}"
        d.mkdir(parents=True)
        write_wav(d / "mix.wav", mix, SR)
        for s in range(targets.shape[0]):
            write_wav(d / f"s{s + 1}.wav", targets[s], SR)

    # 3. Train a tiny ConvTasNet for 2 epochs on the generated data.
    dm = MovingDataModule(
        train_dir=str(tmp_path / "set" / "train"),
        val_dir=str(tmp_path / "set" / "val"),
        test_dir=str(tmp_path / "set" / "val"),
        duration=1.0,
        num_samples=4,
        batch_size=2,
    )
    model = ConvTasNet(N=16, L=16, B=8, H=16, P=3, X=1, R=1, num_spks=2)
    pit = PITLossWrapper(PairwiseNegSDR("snr"), threshold_byloss=False)
    trainer = Trainer(
        model=model, loss_fn=pit, metric_fn=pit, lr=1e-3, max_epochs=2,
        save_top_k=1, exp_dir=tmp_path / "exp",
    )
    trainer.fit(
        dm.train_batches, lambda: dm.val_batches(crop=SR), example_len=SR
    )
    assert (tmp_path / "exp" / "best_model.pkl").exists()
    # epoch -1 (pre-training baseline) + 2 training epochs
    assert len(trainer.history) == 3

    # 4. Reload the portable checkpoint and run the metric tracker on it.
    model2, params2 = from_pretrain(tmp_path / "exp" / "best_model.pkl")
    tracker = MetricsTracker(tmp_path / "exp" / "metrics.csv")
    mix, targets, _ = ds[0]
    # Pick a span where both references are active (leading audio is silence
    # by construction — the tracker correctly skips silent-reference spans).
    active = np.flatnonzero(
        (np.abs(targets) > 1e-4).all(axis=0)
    )
    s = int(active[0]) if len(active) else 0
    span = slice(s, s + SR)
    est = np.asarray(model2.apply(params2, mix[None, span]))[0]
    tracker(mix[span], targets[:, span], est, "sample1")
    result = tracker.final()
    assert np.isfinite(result["si-snr"])
    assert (tmp_path / "exp" / "metrics.csv").exists()


def test_generate_split_device_sink(tmp_path, rng):
    """sink="device" runs the identical generation computation but writes
    NOTHING and downloads nothing — the compute-only benchmark
    configuration separating chip capability from the artifact downlink
    (VERDICT r3 missing #1)."""
    def factory(name):
        return Scene.synthetic(
            room=name, dims=(8.0, 3.0, 6.0), channel_type="Mono", seed=1,
            max_order=2, n_bands=8,
        )

    spk_dirs = []
    for i in range(3):
        _corpus(tmp_path / "speech" / f"spk{i}", 2, 1.2, rng, f"u{i}_")
        spk_dirs.append(str(tmp_path / "speech" / f"spk{i}"))
    noise = _corpus(tmp_path / "noise", 2, 1.5, rng, "n_")
    music = _corpus(tmp_path / "music", 2, 1.5, rng, "m_")
    produced = generate_split(
        factory, ["roomD"], spk_dirs, noise, music, tmp_path / "dev",
        duration=5.0, base_seed=0, sink="device",
    )
    assert len(produced) == 1
    # No artifact bytes anywhere (only the empty mixture dir may exist).
    files = [p for p in (tmp_path / "dev").rglob("*") if p.is_file()]
    assert files == [], files

    # Same plan through the disk sink produces the real artifact set —
    # the device sink changed consumption, not the computation.
    produced_disk = generate_split(
        factory, ["roomD"], spk_dirs, noise, music, tmp_path / "disk",
        duration=5.0, base_seed=0,
    )
    names = {p.name for d in produced_disk for p in d.iterdir()}
    assert {"moving_audio_1.wav", "json_data.json"} <= names

    import pytest as _pytest

    with _pytest.raises(ValueError, match="sink"):
        generate_split(
            factory, ["roomX"], spk_dirs, noise, music, tmp_path / "x",
            duration=5.0, base_seed=0, sink="ram",
        )
