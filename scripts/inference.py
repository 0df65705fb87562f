"""Single-mixture inference demo (separation/inference.py:32-154 role).

Segments the mixture (metadata spans or fixed windows), separates each
segment, re-tracks speakers across segments by embedding similarity, and
writes s{i}_est.wav.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from sonicsim_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()  # persistent XLA cache: ~8x faster cold starts

import jax

from sonicsim_tpu.infer import concatenate_tracks, stitch_segments
from sonicsim_tpu.models import from_pretrain
from sonicsim_tpu.utils import read_wav, write_wav


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--mix", required=True, help="input mixture wav")
    ap.add_argument("--out_dir", default=None,
                    help="output directory (default: next to the mix)")
    ap.add_argument("--segment_seconds", type=float, default=10.0)
    ap.add_argument("--bf16", action="store_true",
                    help="run the model core in bfloat16 (MXU-native)")
    ap.add_argument("--ecapa", default=None, metavar="CKPT",
                    help="speechbrain embedding_model.ckpt — re-track "
                    "speakers with the native ECAPA-TDNN embedder instead "
                    "of the spectral-envelope default")
    args = ap.parse_args()

    embed_fn = None
    if args.ecapa:
        from sonicsim_tpu.models.ecapa import make_ecapa_embedder

        embed_fn = make_ecapa_embedder(args.ecapa)

    model, params = from_pretrain(args.model_path)
    mix, sr = read_wav(args.mix)
    mono = mix.mean(axis=0)
    seg_len = int(args.segment_seconds * sr)
    from sonicsim_tpu.infer import bf16_forward, to_waveform

    apply_fn = bf16_forward(model) if args.bf16 else model.apply
    fwd = jax.jit(
        lambda p, x: to_waveform(model, apply_fn(p, x), x.shape[-1])
    )

    segments = []
    for s in range(0, len(mono), seg_len):
        chunk = mono[s : s + seg_len]
        pad = seg_len - len(chunk)
        if pad:
            chunk = np.pad(chunk, (0, pad))
        est = np.asarray(fwd(params, chunk[None, :]))[0]
        segments.append(est[..., : seg_len - pad])
    tracks = concatenate_tracks(
        stitch_segments(segments, sr, embed_fn=embed_fn)
    )

    out = Path(args.out_dir) if args.out_dir else Path(args.mix).parent
    out.mkdir(parents=True, exist_ok=True)
    for i in range(tracks.shape[0]):
        write_wav(out / f"s{i + 1}_est.wav", tracks[i], sr)
    print(f"wrote {tracks.shape[0]} tracks to {out}")


if __name__ == "__main__":
    main()
