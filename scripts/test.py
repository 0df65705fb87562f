"""Benchmark evaluation driver (separation/test.py + enhancement/test.py roles).

Walks a generated test tree, segments each 60 s mixture by the metadata
start/end points recorded at generation time (json_data.json — the
enhancement/test.py:119-127 strategy; a VAD sidecar can replace it), runs
the model per voice-active segment and accumulates the MetricsTracker.
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

from sonicsim_tpu.dataset.sampler import MovingTestDataset
from sonicsim_tpu.metrics import MetricsTracker
from sonicsim_tpu.infer import to_waveform
from sonicsim_tpu.models import from_pretrain
from sonicsim_tpu.utils import load_config

MIN_SEGMENT = 320  # samples; reference skips shorter (separation/test.py:80)


def metadata_segments(folder: str, total: int) -> list[tuple[int, int]]:
    """Voice-active spans from json_data.json start_end_points (union over
    sources), falling back to one full-length segment."""
    meta_path = Path(folder) / "json_data.json"
    if not meta_path.exists():
        return [(0, total)]  # caller may VAD instead (see --use_vad)
    with open(meta_path) as f:
        meta = json.load(f)
    spans = []
    for key, src in meta.items():
        if key.startswith("source") and "start_end_points" in src:
            spans.extend(tuple(p) for p in src["start_end_points"])
    if not spans:
        return [(0, total)]
    spans.sort()
    merged = [list(spans[0])]
    for s, e in spans[1:]:
        if s <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], e)
        else:
            merged.append([s, e])
    return [(s, min(e, total)) for s, e in merged if e - s > MIN_SEGMENT]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--conf_dir", required=True)
    ap.add_argument("--model_path", default=None)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--bf16", action="store_true",
                    help="run the model core in bfloat16 (MXU-native)")
    ap.add_argument(
        "--use_vad", action="store_true",
        help="segment with the energy VAD (the reference's pyannote role) "
        "instead of json_data.json metadata spans",
    )
    ap.add_argument("--dnsmos_dir", default=None,
                    help="dir with model_v8.onnx + sig_bak_ovr.onnx → "
                    "adds a dnsmos column (native ONNX executor)")
    ap.add_argument("--sigmos_path", default=None,
                    help="SigMOS .onnx weights → adds the 7 MOS_* columns "
                    "(native ONNX executor)")
    ap.add_argument("--no_pesq", action="store_true",
                    help="drop the default pesq_nb/pesq_wb columns "
                    "(reference wrapper.py:48; native P.862 pipeline, "
                    "compiled ITU binding preferred when importable)")
    ap.add_argument("--whisper", default=None, metavar="MODEL_SIZE",
                    help="transcribe estimates with faster-whisper → adds "
                    "an asr transcript column (e.g. medium.en)")
    ap.add_argument("--vad_ckpt", default=None, metavar="CKPT",
                    help="PyanNet checkpoint — with --use_vad, segment with "
                    "the native neural VAD instead of the energy VAD")
    ap.add_argument("--bucket", type=int, default=0, metavar="SAMPLES",
                    help="zero-pad segments up to multiples of SAMPLES "
                    "before the forward and slice the estimate back, "
                    "bounding XLA recompiles across variable-length VAD "
                    "spans (default 0 = exact lengths, reference parity; "
                    "padding shifts global-norm statistics slightly)")
    args = ap.parse_args()

    cfg = load_config(args.conf_dir)
    exp_dir = Path(cfg["exp"]["dir"]) / cfg["exp"]["name"]
    model_path = args.model_path or exp_dir / "best_model.pkl"
    model, params = from_pretrain(model_path)

    ds = MovingTestDataset(
        speech_dir=cfg["datas"]["test_dir"],
        sample_rate=int(cfg["datas"].get("sample_rate", 16000)),
        num_spks=int(cfg["datas"].get("num_spks", 2)),
        return_path=True,
    )
    extra_metrics, extra_text = {}, {}
    if args.dnsmos_dir:
        from sonicsim_tpu.metrics import make_dnsmos

        extra_metrics["dnsmos"] = make_dnsmos(args.dnsmos_dir)
    if args.sigmos_path:
        from sonicsim_tpu.metrics import make_sigmos_all

        extra_metrics.update(make_sigmos_all(args.sigmos_path))
    if not args.no_pesq:
        from sonicsim_tpu.metrics import make_pesq

        p_nb, p_wb = make_pesq("nb"), make_pesq("wb")
        # The native P.862 pipeline is NOT bit-comparable with the ITU
        # binding the reference uses (wrapper.py:55-56,100-101), and the
        # compiled wheel is unobtainable in-env (no network; pypi probe
        # documented in metrics/pesq.py) — so when the native backend
        # produced the scores, the COLUMN NAME says so: a downstream
        # consumer can never mistake them for ITU P.862 numbers.
        suffix = "" if p_nb.backend == "itu-p862-compiled" else "_native"
        extra_metrics[f"pesq_nb{suffix}"] = p_nb
        extra_metrics[f"pesq_wb{suffix}"] = p_wb
    if args.whisper:
        from sonicsim_tpu.metrics import make_whisper_asr

        extra_text["asr"] = make_whisper_asr(args.whisper)
    tracker = MetricsTracker(
        exp_dir / "results" / "metrics.csv",
        extra_metrics=extra_metrics or None,
        extra_text=extra_text or None,
    )
    # Postprocessing is fused into the jitted forward: enhancement models
    # return spectra/tuples whose eager materialization is both slow and,
    # on some backends, unsupported op-by-op.
    from sonicsim_tpu.infer import bf16_forward

    apply_fn = bf16_forward(model) if args.bf16 else model.apply
    fwd = jax.jit(
        lambda p, x: to_waveform(model, apply_fn(p, x), x.shape[-1])
    )

    n = len(ds) if args.limit is None else min(args.limit, len(ds))
    from sonicsim_tpu.infer import segment_mixture

    vad_fn = None
    if args.vad_ckpt:
        if not args.use_vad:
            # --vad_ckpt without --use_vad would silently fall back to
            # metadata segments after paying the model load; the flag
            # states the intent, so honor it
            print("--vad_ckpt given: enabling --use_vad")
            args.use_vad = True
        from sonicsim_tpu.models.pyannet import make_neural_vad

        vad_fn = make_neural_vad(args.vad_ckpt)
    for i in range(n):
        mix, targets, folder = ds[i]
        spans = (
            segment_mixture(mix, ds.sample_rate, vad_fn=vad_fn)
            if args.use_vad
            else metadata_segments(folder, mix.shape[-1])
        )
        for s, e in spans:
            seg_mix = mix[s:e]
            run_mix = seg_mix
            if args.bucket:
                padded = -((s - e) // args.bucket) * args.bucket
                run_mix = np.pad(seg_mix, (0, padded - (e - s)))
            est = np.asarray(fwd(params, run_mix[None, :]))[0][..., : e - s]
            tracker(seg_mix, targets[:, s:e], est, f"{Path(folder).name}:{s}")
        print(f"[{i + 1}/{n}] {Path(folder).name} running={tracker.update()}")
    print("final:", tracker.final())


if __name__ == "__main__":
    main()
