"""One-command on-chip training exercise → committed TRAIN artifact.

Runs the reference's training loop (separation/train.py:28-109 +
audio_litmodule.py:67-82) once outside pytest, end to end on real
hardware, with data produced by the flagship generation pipeline:

  1. build a small real-speech corpus (same fixture slicing as
     make_eval_artifact.py),
  2. generate a train split with `generate_split` (SonicSet_train.py role)
     and a fixed val tree (generate_fixed_validation.py role),
  3. drive `scripts/train.py` on a small ConvTasNet for a few epochs,
  4. copy metrics.jsonl + best_k_models.json (+ a README with wall-clock,
     link health, and the val-loss trajectory) into TRAIN_<tag>/.

The committed artifact certifies that the jitted DP train step, PIT loss,
plateau scheduler, top-k checkpointing and the datamodule's silence-retry
crop sampling run on the chip and LEARN on pipeline-generated data — the
CPU twin of this gate is tests/test_learning_gate.py.

Usage: python scripts/make_train_artifact.py --tag r03
"""

from __future__ import annotations

import argparse
import json
import shutil
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))  # for make_eval_artifact import

from sonicsim_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

import jax


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="local")
    ap.add_argument("--work", default=None)
    ap.add_argument("--mixtures", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--keep_work", action="store_true")
    args = ap.parse_args()

    from make_eval_artifact import build_corpus  # same fixture slicing

    from sonicsim_tpu.dataset.generate import generate_split
    from sonicsim_tpu.dataset.plan import scan_audio_lengths
    from sonicsim_tpu.sim import Scene

    work = Path(args.work) if args.work else Path("/tmp") / f"train_artifact_{args.tag}"
    if work.exists():
        shutil.rmtree(work)
    work.mkdir(parents=True)
    timings: dict[str, float] = {}

    t0 = time.perf_counter()
    # 3 speakers per mixture -> need 3*mixtures speaker dirs
    dirs, noise_dir, music_dir = build_corpus(work, n_speakers=3 * args.mixtures)
    timings["corpus_s"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    produced = generate_split(
        lambda name: Scene.synthetic(
            dims=(9.0, 3.0, 7.0), channel_type="Mono", seed=3, max_order=4,
            n_bands=32,  # production acoustics: fused on-device bank render
        ),
        ["room0"],
        dirs,
        scan_audio_lengths(noise_dir),
        scan_audio_lengths(music_dir),
        work / "train",
        duration=30.0,
        base_seed=11,
        max_mixtures=args.mixtures,
    )
    timings["generate_s"] = time.perf_counter() - t0
    print(f"generated {len(produced)} train mixtures in {timings['generate_s']:.1f}s")

    t0 = time.perf_counter()
    subprocess.run(
        [
            sys.executable, str(REPO / "scripts/generate_fixed_eval.py"),
            "--in_dir", str(work / "train"),
            "--out_dir", str(work / "val"),
            "--task", "separation",
        ],
        check=True,
    )
    timings["fixed_val_s"] = time.perf_counter() - t0

    conf = work / "conf.yaml"
    conf.write_text(f"""
exp:
  dir: {work / 'Exps'}
  name: convtasnet-chip

datas:
  _target_: sonicsim_tpu.dataset.MovingDataModule
  train_dir: {work / 'train'}
  val_dir: {work / 'val'}
  test_dir: {work / 'val'}
  sample_rate: 16000
  duration: 2.0
  num_samples: 48
  num_spks: 2
  batch_size: 8

model:
  _target_: sonicsim_tpu.models.ConvTasNet
  N: 128
  L: 16
  B: 64
  H: 128
  X: 4
  R: 2

loss:
  _target_: sonicsim_tpu.losses.PITLossWrapper
  loss_func:
    _target_: sonicsim_tpu.losses.PairwiseNegSDR
    sdr_type: sisdr
  pit_from: pw_mtx

optimizer:
  lr: 0.001

trainer:
  max_epochs: {args.epochs}
""")

    t0 = time.perf_counter()
    subprocess.run(
        [sys.executable, str(REPO / "scripts/train.py"), "--conf_dir", str(conf)],
        check=True,
    )
    timings["train_s"] = time.perf_counter() - t0

    exp = work / "Exps" / "convtasnet-chip"
    metrics = [
        json.loads(line)
        for line in (exp / "metrics.jsonl").read_text().splitlines()
        if line.strip()
    ]
    val_losses = [m["val_loss"] for m in metrics if "val_loss" in m]

    out = REPO / f"TRAIN_{args.tag}"
    out.mkdir(exist_ok=True)
    shutil.copy(exp / "metrics.jsonl", out / "metrics.jsonl")
    shutil.copy(exp / "best_k_models.json", out / "best_k_models.json")
    from bench_all import _link_health

    health = _link_health(verbose=False)
    devices = jax.devices()
    improvement = val_losses[0] - min(val_losses) if val_losses else float("nan")
    (out / "README.md").write_text(
        f"""# TRAIN_{args.tag} — on-chip training artifact

Produced by `python scripts/make_train_artifact.py --tag {args.tag}` on
`{devices[0].platform}` ({len(devices)} device(s)).

Reference loop (separation/train.py:28-109, audio_litmodule.py:67-82)
exercised end to end on real hardware: fixture-speech corpus ->
`generate_split` ({args.mixtures}x30 s Mono mixtures, flagship TPU
pipeline) -> fixed val tree -> `scripts/train.py` (jitted DP train step,
PIT neg-SI-SDR, plateau LR, top-k checkpoints) for {args.epochs} epochs on
a small ConvTasNet.

Val neg-SI-SDR trajectory (lower is better): {[round(v, 2) for v in val_losses]}
Improvement epoch0 -> best: **{improvement:.2f} dB** (the CPU learning gate,
tests/test_learning_gate.py, enforces >= 8 dB on its own fixture).

Wall clock: {json.dumps({k: round(v, 1) for k, v in timings.items()})}
Link health at run time (degraded tunnel inflates wall clock, not learning):
{json.dumps(health)}
"""
    )
    print("timings:", json.dumps(timings))
    print("val losses:", val_losses)
    print(f"artifact at {out}")
    if not args.keep_work:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
