"""Real-time streaming separation demo (SkiM forward_stream role,
separation/look2hear/models/skim.py:603+ at segment granularity).

Feeds a mixture WAV through :class:`SkiMStreamer` chunk by chunk — exactly
the frames a live microphone would deliver — and reports per-chunk latency
and the end-to-end real-time factor alongside the separated tracks. The
streamer carries SegLSTM/MemLSTM state, the encoder's frame overlap, and
the decoder's overlap-add tail across calls, so the output matches the
offline forward on the same audio.

Usage:
    python scripts/stream.py --model_path skim_causal.pkl --mix mix.wav
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from sonicsim_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()  # persistent XLA cache: ~8x faster cold starts

import jax.numpy as jnp

from sonicsim_tpu.models import from_pretrain
from sonicsim_tpu.models.skim import SkiMNet, SkiMStreamer
from sonicsim_tpu.utils import read_wav, write_wav


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", required=True,
                    help="causal SkiMNet checkpoint (native pack or .pth)")
    ap.add_argument("--mix", required=True, help="input mixture wav")
    ap.add_argument("--out_dir", default=".")
    ap.add_argument("--chunks_per_step", type=int, default=1,
                    help="stream granularity in streamer chunks "
                    "(1 = lowest latency)")
    ap.add_argument("--cpu", action="store_true",
                    help="pin JAX to the host CPU — streaming dispatches "
                    "many small per-segment ops, so a REMOTE (tunneled) "
                    "accelerator pays a round trip per op; use the local "
                    "device that actually sits next to the microphone")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    model, params = from_pretrain(args.model_path)
    if not isinstance(model, SkiMNet):
        raise SystemExit(
            f"streaming demo requires a SkiMNet checkpoint, got "
            f"{type(model).__name__}"
        )
    streamer = SkiMStreamer(model, params)
    mix, sr = read_wav(args.mix)
    mono = mix.mean(axis=0).astype(np.float32)

    step_samples = streamer.chunk_samples * args.chunks_per_step
    chunk_ms = 1000.0 * step_samples / sr
    n_steps = max(1, int(np.ceil(len(mono) / step_samples)))
    padded = np.pad(mono, (0, n_steps * step_samples - len(mono)))
    # The encoder's final frame needs kernel_size-hop extra samples, so a
    # run of N whole chunks leaves one segment buffered; this flush chunk
    # completes it (and is what a live pipeline feeds at end-of-stream).
    flush = np.zeros(
        streamer.model.kernel_size - streamer.hop, np.float32
    )

    # Warm up every compiled shape on silence (two whole chunks reach the
    # per-segment program — the first chunk alone leaves the segment one
    # frame short — plus the flush shape), then reset state.
    for warm in (step_samples, step_samples, len(flush)):
        streamer.step(jnp.zeros((1, warm), jnp.float32))
    streamer.reset()

    outs, latencies = [], []
    t_start = time.perf_counter()
    for i in range(n_steps):
        chunk = jnp.asarray(padded[None, i * step_samples:(i + 1) * step_samples])
        t0 = time.perf_counter()
        out = streamer.step(chunk)
        out = np.asarray(out)  # block: a live pipeline consumes each chunk
        latencies.append(time.perf_counter() - t0)
        if out.size:
            outs.append(out)
    out = np.asarray(streamer.step(jnp.asarray(flush[None])))
    if out.size:
        outs.append(out)
    wall = time.perf_counter() - t_start

    est = np.concatenate(outs, axis=-1)[0, :, : len(mono)]  # (spk, T)
    if est.shape[-1] < len(mono):
        est = np.pad(est, ((0, 0), (0, len(mono) - est.shape[-1])))
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for s in range(est.shape[0]):
        write_wav(out_dir / f"stream_spk{s + 1}.wav", est[s], sr)

    lat_ms = np.asarray(latencies) * 1000.0
    stats = {
        "audio_seconds": len(mono) / sr,
        "wall_seconds": round(wall, 3),
        "real_time_factor": round((len(mono) / sr) / wall, 2),
        "chunk_ms": round(chunk_ms, 1),
        "chunk_latency_ms": {
            "mean": round(float(lat_ms.mean()), 2),
            "p50": round(float(np.percentile(lat_ms, 50)), 2),
            "p95": round(float(np.percentile(lat_ms, 95)), 2),
            "max": round(float(lat_ms.max()), 2),
        },
        "realtime_safe": bool(np.percentile(lat_ms, 95) < chunk_ms),
        "outputs": [str(out_dir / f"stream_spk{s + 1}.wav")
                    for s in range(est.shape[0])],
    }
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
