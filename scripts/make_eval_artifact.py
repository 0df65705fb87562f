"""One-command on-chip eval-harness exercise → committed EVAL artifact.

Runs the reference's full benchmark loop (separation/test.py:41-121) once
outside pytest, end to end on real hardware, and records the proof:

  1. build a tiny real-speech corpus from the reference's committed fixture
     audio (separation/tests/noise/{s1,s2}.wav — audio data, not code),
  2. generate a split with the flagship pipeline (SonicSet_train.py role),
  3. materialize a fixed test tree (generate_fixed_validation.py role),
  4. save a random-init ConvTasNet pack and drive scripts/test.py over it
     with DNSMOS (reference .onnx weights) + native PESQ/STOI/SI-SDR,
  5. copy metrics.csv (+ a README with commands and wall-clock) into
     EVAL_<tag>/.

The model is random-init on purpose: the artifact certifies the *harness*
(driver, tracker, sidecars, segment logic, CSV plumbing), not a trained
model's quality.

Usage: python scripts/make_eval_artifact.py --tag r03
"""

from __future__ import annotations

import argparse
import json
import shutil
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from sonicsim_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

import jax

from sonicsim_tpu.dataset.generate import generate_split
from sonicsim_tpu.dataset.plan import scan_audio_lengths
from sonicsim_tpu.models import ConvTasNet, save_model
from sonicsim_tpu.sim import Scene
from sonicsim_tpu.utils import load_config, write_wav
from sonicsim_tpu.utils.wavio import read_wav

FIXTURE_DIR = Path("/root/reference/separation/tests/noise")
SR = 16000


def build_corpus(
    root: Path,
    n_speakers: int = 6,
    seed: int = 0,
    speed_range: tuple[float, float] = (0.85, 1.2),
) -> tuple[list[str], Path, Path]:
    """Per-speaker utterance dirs sliced from the two fixture voices, plus
    synthetic noise/music beds. Real speech keeps DNSMOS/PESQ meaningful.

    Each speaker gets a fixed speed/pitch factor (time-domain resample,
    ``speed_range``): the two fixture voices alone make every third PIT
    pair a same-voice pair — unseparable in principle — whereas
    speed-shifted crops have distinct pitch/formants, like distinct
    talkers. The default (0.85, 1.2) spans ~±2.5 semitones; the trained
    quality chain widens it to ~±6 (0.7, 1.45) so randomly paired
    pseudo-speakers are pitch-separated the way real talkers are —
    generalization to UNSEEN factors is what the held-out eval tests.
    ``seed`` shifts crop offsets, gains, and speed factors between the
    train and held-out eval corpora; since both slice the SAME two
    fixture voices from the same energy-ranked windows, the underlying
    source audio can recur across corpora — held-out-ness rests on the
    differing speed resample + crop alignment, not on disjoint source
    material (only two 60 s voices exist in-env)."""
    # read_wav returns (channels, T); flatten to 1-D so the crops below
    # slice TIME (slicing a (1, T) array would silently yield the whole
    # 60 s fixture as every "utterance", which can never fit the
    # mixture's utterance budget -> empty speech plans -> silent tracks).
    voices = [read_wav(FIXTURE_DIR / n)[0].reshape(-1) for n in ("s1.wav", "s2.wav")]
    rng = np.random.default_rng(seed)
    utt = 8 * SR

    def active_starts(voice: np.ndarray) -> np.ndarray:
        """Window starts ranked by energy — the fixtures have long silent
        stretches, and a silent 'utterance' poisons eval rows downstream."""
        starts = np.arange(0, len(voice) - utt, SR // 2)
        energy = np.array(
            [float(np.square(voice[s : s + utt]).mean()) for s in starts]
        )
        return starts[np.argsort(-energy)]

    ranked = [active_starts(v) for v in voices]
    dirs = []
    for spk in range(n_speakers):
        d = root / "speech" / f"spk{spk}"
        d.mkdir(parents=True, exist_ok=True)
        voice = voices[spk % 2]
        order = ranked[spk % 2]
        speed = float(rng.uniform(*speed_range))
        off = int(rng.integers(0, len(order)))
        for u in range(6):
            # top-energy crops at speaker-distinct offsets; small gain
            # jitter keeps utterances distinct. Slice speed*8 s, then
            # resample to 8 s — a fixed per-speaker pitch shift.
            start = int(order[(spk // 2 + 3 * u + off) % len(order)])
            src = voice[start : start + int(utt * speed)].astype(np.float64)
            crop = np.interp(
                np.linspace(0.0, len(src) - 1.0, utt),
                np.arange(len(src)),
                src,
            ).astype(np.float32)
            crop *= float(rng.uniform(0.6, 1.0))
            write_wav(d / f"utt{u}.wav", crop, SR)
        dirs.append(str(d))
    t = np.arange(12 * SR) / SR
    noise_dir, music_dir = root / "noise", root / "music"
    noise_dir.mkdir(parents=True, exist_ok=True)
    music_dir.mkdir(parents=True, exist_ok=True)
    for i in range(4):
        # pink-ish noise: cumulative-summed white, high-passed
        w = rng.standard_normal(12 * SR).astype(np.float32)
        pink = np.cumsum(w)
        pink -= np.convolve(pink, np.ones(512) / 512, mode="same")
        write_wav(noise_dir / f"n{i}.wav", 0.05 * pink / np.abs(pink).max(), SR)
        chord = sum(
            np.sin(2 * np.pi * f * t)
            for f in (220 * (i + 1), 277 * (i + 1), 330 * (i + 1))
        )
        write_wav(music_dir / f"m{i}.wav", (0.1 * chord / 3).astype(np.float32), SR)
    return dirs, noise_dir, music_dir


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="local")
    ap.add_argument("--work", default=None, help="work dir (default: tmp)")
    ap.add_argument("--mixtures", type=int, default=2)
    ap.add_argument("--keep_work", action="store_true")
    args = ap.parse_args()

    work = Path(args.work) if args.work else Path("/tmp") / f"eval_artifact_{args.tag}"
    if work.exists():
        shutil.rmtree(work)
    work.mkdir(parents=True)
    timings: dict[str, float] = {}

    t0 = time.perf_counter()
    dirs, noise_dir, music_dir = build_corpus(work)
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
        work / "split",
        duration=60.0,
        base_seed=7,
        max_mixtures=args.mixtures,
    )
    timings["generate_s"] = time.perf_counter() - t0
    print(f"generated {len(produced)} mixtures in {timings['generate_s']:.1f}s")

    t0 = time.perf_counter()
    subprocess.run(
        [
            sys.executable, str(REPO / "scripts/generate_fixed_eval.py"),
            "--in_dir", str(work / "split"),
            "--out_dir", str(work / "fixed_test"),
            "--task", "separation",
        ],
        check=True,
    )
    timings["fixed_eval_s"] = time.perf_counter() - t0

    # config clone pointing at the artifact tree, random-init pack
    cfg_text = (REPO / "configs/separation/convtasnet.yaml").read_text()
    cfg_text = cfg_text.replace("dir: Exps/", f"dir: {work}/Exps/")
    cfg_text = cfg_text.replace(
        "test_dir: SonicSet/test", f"test_dir: {work}/fixed_test"
    )
    conf_path = work / "config.yaml"
    conf_path.write_text(cfg_text)
    cfg = load_config(conf_path)
    mcfg = {k: v for k, v in cfg["model"].items() if k != "_target_"}
    model = ConvTasNet(**mcfg)
    params = model.init_params(jax.random.PRNGKey(0), example_len=4 * SR)
    exp_dir = Path(cfg["exp"]["dir"]) / cfg["exp"]["name"]
    save_model(model, params, exp_dir / "best_model.pkl")

    t0 = time.perf_counter()
    subprocess.run(
        [
            sys.executable, str(REPO / "scripts/test.py"),
            "--conf_dir", str(conf_path),
            "--dnsmos_dir", "/root/reference/separation/DNSMOS",
            # bound XLA recompiles across variable-length metadata spans
            # (each distinct length is a fresh ~30 s tunnel compile)
            "--bucket", "16000",
        ],
        check=True,
    )
    timings["eval_s"] = time.perf_counter() - t0

    out = REPO / f"EVAL_{args.tag}"
    out.mkdir(exist_ok=True)
    shutil.copy(exp_dir / "results" / "metrics.csv", out / "metrics.csv")
    meta = exp_dir / "results" / "metrics.meta.json"
    if meta.exists():  # which PESQ/sidecar backends produced the columns
        shutil.copy(meta, out / "metrics.meta.json")
    devices = jax.devices()
    from bench_all import _link_health

    health = _link_health(verbose=False)
    (out / "README.md").write_text(
        f"""# EVAL_{args.tag} — on-chip eval-harness artifact

Produced by `python scripts/make_eval_artifact.py --tag {args.tag}` on
`{devices[0].platform}` ({len(devices)} device(s)).

Full loop exercised outside pytest (reference flow separation/test.py:41-121):
fixture-speech corpus -> `generate_split` ({args.mixtures}x60 s mixtures,
synthetic room, flagship TPU pipeline) -> `generate_fixed_eval.py` ->
random-init ConvTasNet pack -> `scripts/test.py` with DNSMOS (reference
.onnx weights via the native ONNX->JAX executor), native PESQ nb/wb
(P.862 pipeline, not ITU-bit-exact -- see README "PESQ backends"), STOI,
SI-SDR/SDR columns, metadata segmenting (`--bucket 16000` pads spans to
1 s quanta, bounding per-length XLA recompiles through the tunnel),
MetricsTracker CSV.

The model is **random-init**: scores certify the harness, not separation
quality (expect negative SI-SDR improvements).

Wall clock: {json.dumps({k: round(v, 1) for k, v in timings.items()})}
Link health at run time (degraded tunnel inflates wall clock, not scores):
{json.dumps(health)}
"""
    )
    print("timings:", json.dumps(timings))
    print(f"artifact at {out}")
    if not args.keep_work:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
