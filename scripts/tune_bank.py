"""Bank-renderer tuning harness: times the EXACT bench battery stage
(bench_all.py "RIR bank render (3x40 pairs, binaural)") on the attached
device so placement knobs (SONICSIM_PLACE_BATCH, SONICSIM_BANK_BLOCK,
SONICSIM_AMP_RANK_PAD) can be swept via subprocess env without touching
the battery. Prints one JSON line with ms/call and audio-s/s.

Usage:  python scripts/tune_bank.py [--iters 8] [--label x]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from sonicsim_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--label", default="")
    ap.add_argument("--order", type=int, default=4)
    ap.add_argument("--bands", type=int, default=32)
    ap.add_argument("--banded-walls", action="store_true",
                    help="use per-wall banded materials (full-rank profile) "
                    "instead of the bench's uniform 0.3 room")
    args = ap.parse_args()

    from sonicsim_tpu.sim import bank_render
    from sonicsim_tpu.sim.bank_render import render_rir_banks
    from sonicsim_tpu.sim.channels import ChannelModel
    from sonicsim_tpu.sim.image_source import ShoeboxRoom
    from sonicsim_tpu.sim.oracle import SyntheticRirOracle

    if args.banded_walls:
        rng = np.random.default_rng(7)
        wall_bands = rng.uniform(0.05, 0.6, size=(args.bands, 6))
        room = ShoeboxRoom((8.0, 3.0, 6.0), absorption=0.3)
        room = room.with_wall_band_absorption(wall_bands) if hasattr(
            room, "with_wall_band_absorption") else room
    else:
        room = ShoeboxRoom((8.0, 3.0, 6.0), absorption=0.3)
    oracle = SyntheticRirOracle(room, n_bands=args.bands, max_order=args.order)
    bank_ch = ChannelModel("Binaural")
    mic = [np.array([4.0, 1.5, 3.0])]

    def speaker_ways(k):
        r = np.random.default_rng(1000 + k)
        return [r.uniform([1, 1, 1], [7, 2.5, 5]) for _ in range(40)]

    warm = render_rir_banks(
        oracle, [speaker_ways(90 + i) for i in range(3)], mic, bank_ch,
        out_device=True,
    )
    for b in warm:
        float(b.ravel()[0])

    sr = oracle.sample_rate
    n_iters = args.iters
    outs = []
    t0 = time.perf_counter()
    ir_sec = 0.0
    for it in range(n_iters):
        banks = render_rir_banks(
            oracle, [speaker_ways(3 * it + i) for i in range(3)], mic,
            bank_ch, out_device=True,
        )
        ir_sec += sum(
            b.shape[0] * b.shape[1] * b.shape[2] * b.shape[3] / sr
            for b in banks
        )
        outs.append(banks)
    float(outs[-1][0].ravel()[0])
    dt = time.perf_counter() - t0
    print(json.dumps({
        "label": args.label,
        "place_batch": bank_render._PLACE_BATCH,
        "block": bank_render._BLOCK,
        "iters": n_iters,
        "ms_per_call": round(dt / n_iters * 1e3, 2),
        "audio_s_per_s": round(ir_sec / dt, 1),
        "rir_len": int(banks[0].shape[-1]),
    }))


if __name__ == "__main__":
    main()
