"""Materialize the stochastic eval remix into fixed WAV trees.

Parity: separation/generate_fixed_validation.py:8-27 & generate_fixed_test.py
(mix.wav + s{i}.wav per sample) and the enhancement variants (clean.wav,
asserting a single source). Fixed trees make metrics comparable across runs.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from sonicsim_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()  # persistent XLA cache: ~8x faster cold starts

from sonicsim_tpu.dataset.sampler import MovingTestEvalDataset
from sonicsim_tpu.utils import write_wav


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--in_dir", required=True, help="generated split root")
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--task", default="separation",
                    choices=["separation", "enhancement"])
    ap.add_argument("--noise_type", default="noise",
                    choices=["noise", "music", "all"])
    ap.add_argument("--sample_rate", type=int, default=16000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    ds = MovingTestEvalDataset(
        speech_dir=args.in_dir,
        sample_rate=args.sample_rate,
        noise_type=args.noise_type,
        task=args.task,
        seed=args.seed,
    )
    out_root = Path(args.out_dir)
    for i in range(len(ds)):
        mix, targets, _folder = ds[i]
        sample_dir = out_root / f"sample{i + 1}"
        sample_dir.mkdir(parents=True, exist_ok=True)
        write_wav(sample_dir / "mix.wav", mix, args.sample_rate)
        if args.task == "enhancement":
            assert targets.shape[0] == 1  # enh fixture asserts n_src==1
            write_wav(sample_dir / "clean.wav", targets[0], args.sample_rate)
        else:
            for s in range(targets.shape[0]):
                write_wav(sample_dir / f"s{s + 1}.wav", targets[s], args.sample_rate)
    print(f"materialized {len(ds)} samples into {out_root}")


if __name__ == "__main__":
    main()
