"""Remix-tree benchmark evaluation (separation/audio_test*.py role).

Evaluates a model over the on-the-fly remixed test split using precomputed
voice-active segment JSONs instead of a VAD run (the reference strategy at
separation/audio_test_music.py:60: tests/sep_music_start_end_all.json).
``--noise_type music`` reproduces the audio_test_music variant.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from sonicsim_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()  # persistent XLA cache: ~8x faster cold starts

import jax

from sonicsim_tpu.dataset.sampler import MovingTestEvalDataset
from sonicsim_tpu.metrics import MetricsTracker
from sonicsim_tpu.infer import to_waveform
from sonicsim_tpu.models import from_pretrain
from sonicsim_tpu.utils import load_config

MIN_SEGMENT = 320


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--conf_dir", required=True)
    ap.add_argument("--model_path", default=None)
    ap.add_argument("--segments_json", default=None,
                    help="precomputed {folder: [[start, end], ...]} spans")
    ap.add_argument("--noise_type", default="noise",
                    choices=["noise", "music", "all"])
    ap.add_argument("--task", default="separation",
                    choices=["separation", "enhancement"])
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--bf16", action="store_true",
                    help="run the model core in bfloat16 (MXU-native)")
    ap.add_argument("--no_pesq", action="store_true",
                    help="drop the default pesq_nb/pesq_wb columns")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    cfg = load_config(args.conf_dir)
    exp_dir = Path(cfg["exp"]["dir"]) / cfg["exp"]["name"]
    model, params = from_pretrain(args.model_path or exp_dir / "best_model.pkl")
    from sonicsim_tpu.infer import bf16_forward

    apply_fn = bf16_forward(model) if args.bf16 else model.apply
    fwd = jax.jit(
        lambda p, x: to_waveform(model, apply_fn(p, x), x.shape[-1])
    )

    ds = MovingTestEvalDataset(
        speech_dir=cfg["datas"]["test_dir"],
        noise_type=args.noise_type,
        task=args.task,
        seed=args.seed,
    )
    segments = {}
    if args.segments_json:
        with open(args.segments_json) as f:
            segments = json.load(f)

    extra_metrics = {}
    if not args.no_pesq:  # default columns, reference wrapper.py:48
        from sonicsim_tpu.metrics import make_pesq

        p_nb, p_wb = make_pesq("nb"), make_pesq("wb")
        # Same backend-disclosure contract as scripts/test.py: when the
        # native P.862 approximation produced the scores (the compiled ITU
        # binding is unobtainable in-env), the column name says so.
        suffix = "" if p_nb.backend == "itu-p862-compiled" else "_native"
        extra_metrics[f"pesq_nb{suffix}"] = p_nb
        extra_metrics[f"pesq_wb{suffix}"] = p_wb

    suffix = f"remix-{args.noise_type}"
    tracker = MetricsTracker(
        exp_dir / "results" / f"metrics_{suffix}.csv",
        extra_metrics=extra_metrics or None,
    )
    n = len(ds) if args.limit is None else min(args.limit, len(ds))
    for i in range(n):
        mix, targets, folder = ds[i]
        spans = segments.get(folder) or segments.get(Path(folder).name) or [
            (0, mix.shape[-1])
        ]
        for s, e in spans:
            if e - s <= MIN_SEGMENT:
                continue
            est = np.asarray(fwd(params, mix[None, s:e]))[0]
            tracker(mix[s:e], targets[:, s:e], est, f"{Path(folder).name}:{s}")
        print(f"[{i + 1}/{n}] {Path(folder).name} running={tracker.update()}")
    print("final:", tracker.final())


if __name__ == "__main__":
    main()
