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


def _stft(x: np.ndarray, nfft: int, hop: int) -> np.ndarray:
    n = 1 + max(0, (len(x) - nfft)) // hop
    win = np.hanning(nfft).astype(np.float64)
    frames = np.stack([x[i * hop : i * hop + nfft] * win for i in range(n)])
    return np.fft.rfft(frames, axis=1)  # (frames, bins)


def _istft(spec: np.ndarray, nfft: int, hop: int, length: int) -> np.ndarray:
    win = np.hanning(nfft).astype(np.float64)
    out = np.zeros(spec.shape[0] * hop + nfft)
    norm = np.zeros_like(out)
    frames = np.fft.irfft(spec, n=nfft, axis=1)
    for i in range(spec.shape[0]):
        out[i * hop : i * hop + nfft] += frames[i] * win
        norm[i * hop : i * hop + nfft] += win * win
    out /= np.maximum(norm, 1e-8)
    return out[:length]


def pitch_shift_keep_tempo(x: np.ndarray, factor: float, sr: int = SR) -> np.ndarray:
    """Pitch/formant shift by ``factor`` WITHOUT changing duration: phase
    vocoder time-stretch by 1/factor, then resample by factor. Distinct
    from the corpus's speed warp (which scales tempo AND pitch together)
    — combining both spans a 2-D (tempo × pitch) pseudo-speaker manifold
    instead of the 1-D resample line."""
    nfft, hop = 1024, 256
    spec = _stft(x.astype(np.float64), nfft, hop)
    n_in = spec.shape[0]
    n_out = max(2, int(round(n_in * factor)))
    # Phase-vocoder stretch: magnitude linearly interpolated between
    # frames, phase advanced by accumulated per-bin instantaneous freq.
    pos = np.linspace(0.0, n_in - 1.0001, n_out)
    i0 = np.floor(pos).astype(int)
    frac = (pos - i0)[:, None]
    mag = (1 - frac) * np.abs(spec[i0]) + frac * np.abs(spec[np.minimum(i0 + 1, n_in - 1)])
    omega = 2 * np.pi * hop * np.arange(spec.shape[1]) / nfft
    dphi = np.angle(spec[np.minimum(i0 + 1, n_in - 1)]) - np.angle(spec[i0]) - omega
    dphi -= 2 * np.pi * np.round(dphi / (2 * np.pi))
    inst = omega + dphi  # per-output-frame phase advance
    phase = np.cumsum(np.vstack([np.angle(spec[0])[None], inst[:-1]]), axis=0)
    stretched = _istft(mag * np.exp(1j * phase), nfft, hop, int(len(x) * factor))
    # Resample back to the original length: pitch moves by ``factor``.
    return np.interp(
        np.linspace(0.0, len(stretched) - 1.0, len(x)),
        np.arange(len(stretched)),
        stretched,
    ).astype(np.float32)


def noise_vocode(x: np.ndarray, n_bands: int = 12, seed: int = 0,
                 sr: int = SR) -> np.ndarray:
    """Noise-vocoded speech: per-band envelopes of ``x`` modulating
    band-limited noise carriers — intelligible envelope cues with a
    completely different glottal source, i.e. a maximally distinct
    pseudo-speaker timbre (widens the 2-voice corpus manifold)."""
    rng = np.random.default_rng(seed)
    edges = np.geomspace(80.0, sr / 2 * 0.95, n_bands + 1)
    X = np.fft.rfft(x.astype(np.float64))
    freqs = np.fft.rfftfreq(len(x), 1.0 / sr)
    smooth = int(0.01 * sr)  # 10 ms envelope smoothing
    kernel = np.hanning(2 * smooth + 1)
    kernel /= kernel.sum()
    out = np.zeros(len(x))
    noise = rng.standard_normal(len(x))
    N = np.fft.rfft(noise)
    for b in range(n_bands):
        band = (freqs >= edges[b]) & (freqs < edges[b + 1])
        xb = np.fft.irfft(np.where(band, X, 0), n=len(x))
        env = np.convolve(np.abs(xb), kernel, mode="same")
        nb = np.fft.irfft(np.where(band, N, 0), n=len(x))
        nb /= max(np.sqrt(np.mean(nb**2)), 1e-9)
        out += env * nb
    peak = np.abs(out).max()
    ref = np.abs(x).max()
    return (out * (ref / max(peak, 1e-9))).astype(np.float32)


def build_corpus(
    root: Path,
    n_speakers: int = 6,
    seed: int = 0,
    speed_range: tuple[float, float] = (0.85, 1.2),
    augment: float = 0.0,
    augment_kinds: tuple[str, ...] = ("pitch", "vocode"),
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
        # Offsets stay in the TOP THIRD of the energy ranking: the
        # fixtures have long silent stretches, and an offset deep into
        # the ranked list hands a speaker near-silent "utterances" —
        # observed as flat val-loss training runs (silent PIT targets).
        off = int(rng.integers(0, max(1, len(order) // 3)))
        # Per-SPEAKER augmentation (a speaker identity, constant across
        # its utterances): with probability ``augment``, either a pitch-
        # only phase-vocoder shift (tempo preserved — orthogonal to the
        # speed warp, spanning a 2-D tempo×pitch manifold) or a noise-
        # vocoded timbre (different glottal source entirely; kept the
        # rarer of the two — vocoded-vs-vocoded PIT pairs are close to
        # unseparable and drag training).
        aug_kind = None
        if rng.uniform() < augment:
            aug_kind = "pitch" if rng.uniform() < 0.8 else "vocode"
            if aug_kind not in augment_kinds:
                aug_kind = augment_kinds[0] if augment_kinds else None
        pitch_f = float(rng.choice([-1, 1]) * rng.uniform(0.12, 0.25) + 1.0)
        for u in range(6):
            # top-energy crops at speaker-distinct offsets; small gain
            # jitter keeps utterances distinct. Slice speed*8 s, then
            # resample to 8 s — a fixed per-speaker pitch shift.
            for attempt in range(8):  # skip rare still-quiet windows
                start = int(
                    order[(spk // 2 + 3 * u + off + 7 * attempt) % len(order)]
                )
                src = voice[start : start + int(utt * speed)].astype(
                    np.float64
                )
                crop = np.interp(
                    np.linspace(0.0, len(src) - 1.0, utt),
                    np.arange(len(src)),
                    src,
                ).astype(np.float32)
                if float(np.sqrt(np.mean(crop**2))) > 1e-3:
                    break
            if aug_kind == "pitch":
                crop = pitch_shift_keep_tempo(crop, pitch_f)
            elif aug_kind == "vocode":
                crop = noise_vocode(crop, seed=1000 * spk + u)
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
