"""SonicSet generation pipeline (the flagship entry point, TPU-native).

Mirrors SonicSet_train.py:25-219 / SonicSet_val_test.py / SonicSet.py: per
(scene, 3-speaker triple) sample trajectories + mic + noise/music points,
render per-waypoint RIR banks through the oracle, build 60 s speech/noise/
music tracks, moving-convolve speech and static-convolve backgrounds,
LUFS-normalize to -17/-24/-29 (±2), and write 5 WAVs + json_data.json +
trace.png, with resume-by-existence semantics (removing_exist_speaker,
SonicSet_train.py:140-151).

All randomness flows from one np.random.Generator per sample, so plans and
outputs are reproducible from (seed, scene, triple).
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path

import numpy as np

from ..ops.fftconv import segment_plan
from ..ops.interp import dynamic_interp_plan
from ..parallel.pipeline import pad_moving_plans, render_mixture_sources
from ..sim.maps import save_trace_image
from ..utils.seeding import stable_seed

logger = logging.getLogger(__name__)
from ..sim.oracle import save_rir_bank
from ..sim.scene import Scene
from ..utils.wavio import write_wav
from .assemble import (
    assemble_long_audio,
    loudness_normalize_to,
    render_moving_source,
    render_static_source,
)
from .device_assembly import UtteranceCache, assemble_plans_on_device
from .plan import (
    LUFS_JITTER,
    LUFS_MUSIC,
    LUFS_NOISE,
    LUFS_SPEECH,
    MixturePlan,
    plan_background_audio,
    plan_long_audio,
)


def plan_mixture(
    scene: Scene,
    speech_manifests: list[dict[str, int]],
    noise_manifest: dict[str, int],
    music_manifest: dict[str, int],
    rng: np.random.Generator,
    duration: float = 60.0,
    distance_threshold: float = 5.0,
    static_threshold: float = 6.0,
    seed: int = 0,
    max_silence_seconds: float = 10.0,
    min_waypoints: int = 0,
) -> MixturePlan:
    """Sample the full layout + audio plans for one mixture
    (SonicSet_train.py:40-74 geometry & track planning).

    ``min_waypoints`` arc-length-densifies each sampled trajectory
    (geometry.densify_path): the moving conv crossfades between adjacent
    waypoint RIRs, so more waypoints = finer spatial steps. 0 keeps the
    raw A* corner vertices (reference parity — habitat's
    ShortestPath.points are corners too)."""
    from ..sim.geometry import densify_path

    n_spk = len(speech_manifests)
    trajectories = [
        densify_path(
            scene.sample_trajectory(rng, distance_threshold), min_waypoints
        )
        for _ in range(n_spk)
    ]
    mid_points = [t[len(t) // 2] for t in trajectories]
    mic_point = scene.select_static_points(mid_points, rng, static_threshold, 1)[0]
    noise_music = scene.select_static_points(mid_points, rng, static_threshold, 2)
    sr = scene.oracle.sample_rate
    return MixturePlan(
        room=scene.room,
        sample_rate=sr,
        duration=duration,
        channel_type=scene.channel.channel_type,
        channel_order=scene.channel.channel_order,
        mic_array=scene.channel.mic_array,
        seed=seed,
        trajectories=[[list(map(float, p)) for p in t] for t in trajectories],
        mic_point=list(map(float, mic_point)),
        noise_point=list(map(float, noise_music[0])),
        music_point=list(map(float, noise_music[1])),
        speech_plans=[
            plan_long_audio(m, duration, rng, sr, max_silence_seconds)
            for m in speech_manifests
        ],
        noise_plan=plan_background_audio(
            noise_manifest, duration, rng, sr, max_silence_seconds
        ),
        music_plan=plan_background_audio(
            music_manifest, duration, rng, sr, max_silence_seconds
        ),
        lufs_speech=[
            float(rng.uniform(LUFS_SPEECH - LUFS_JITTER, LUFS_SPEECH + LUFS_JITTER))
            for _ in range(n_spk)
        ],
        lufs_noise=float(rng.uniform(LUFS_NOISE - LUFS_JITTER, LUFS_NOISE + LUFS_JITTER)),
        lufs_music=float(rng.uniform(LUFS_MUSIC - LUFS_JITTER, LUFS_MUSIC + LUFS_JITTER)),
    )


import functools


@functools.cache
def _pack_tracks_jit():
    """Jitted pcm16 pack: (S,C,T) moving + (K,C,T) static → one
    (S+K,C,T) int16 buffer plus per-track peak-guard scales.
    Quantization is bit-identical to utils/wavio.write_wav's host path
    for in-range tracks; tracks whose peak exceeds the pcm16 ceiling are
    scaled down by ``limit/peak`` FIRST (scale returned, recorded in
    json_data.json) instead of hard-clipping — the reference writes
    float32 WAVs (SonicSet_train.py:102-106) whose peaks survive, and a
    -17 LUFS speech track can clip >3% of its samples at int16 full
    scale. One jit-produced buffer matters twice on the tunneled link: a
    single transfer amortizes per-call overhead, and jit outputs fetch
    ~2× faster than eager-op outputs (~40 vs ~22 MB/s measured)."""
    import jax
    import jax.numpy as jnp

    from ..utils.audio import pcm16_quantize

    @jax.jit
    def pack(moving, static):
        x = jnp.concatenate([moving, static], axis=0)
        limit = 1.0 - 1.0 / 32768.0
        peak = jnp.max(jnp.abs(x), axis=(1, 2))
        scale = jnp.where(
            peak > limit, limit / jnp.maximum(peak, 1e-12), 1.0
        ).astype(jnp.float32)
        return pcm16_quantize(x * scale[:, None, None]), scale

    return pack


def _pcm16_upload(x: np.ndarray) -> np.ndarray:
    """Re-encode a float track block as int16 PCM for upload when every
    sample fits: audio assembled from PCM16 WAVs is exactly i/32768, so
    int16 halves the uplink bytes and the device-side ``* 2^-15``
    conversion (parallel/pipeline.py:_render_all) reproduces the floats
    bit-for-bit. Anything the round trip would not reproduce exactly —
    at/over full scale (resample or overlap-add overshoot) or off the
    PCM16 grid (float corpora, resampled/downmixed audio, quiet tracks
    whose quantization would otherwise be silently amplified by LUFS) —
    falls back to the float32 upload unchanged."""
    from ..utils.audio import pcm16_exact

    q = pcm16_exact(x)
    return x if q is None else q


def _copy_to_host_async(arr) -> None:
    """Start a device→host copy in the background when the runtime
    supports it (single-device jax.Array does; mesh-sharded arrays and
    numpy fall through to the later blocking fetch). Transfers stream
    over the link while subsequent device work executes — measured on
    the tunneled TPU: 72 MB async + 1.2 s of matmuls completes in 1.6 s
    vs 3.4 s serialized."""
    fn = getattr(arr, "copy_to_host_async", None)
    if fn is not None:
        try:
            fn()
        except Exception:  # sharded/committed layouts: finalize fetches
            pass


class ArtifactWriter:
    """Single background thread draining disk writes (WAVs, bank npz,
    trace, metadata) in FIFO order.

    The generation loop's host time is link waits (GIL released) plus
    light numpy; file writes also release the GIL, so one writer thread
    overlaps ~0.6 s/mixture of disk I/O with the next mixture's
    dispatch on a single core. Device fetches stay on the main thread —
    concurrent device access from threads measurably HURTS on the
    tunneled runtime. FIFO order preserves the resume contract
    (json_data.json, the existence marker, is queued after the WAVs).
    The first error aborts the queue and re-raises on the next submit
    or on close()."""

    def __init__(self) -> None:
        import queue
        import threading

        # Bounded: each mixture queues ~20-25 MB of track/bank payloads;
        # without backpressure a slow disk lets pending writes grow to
        # an epoch of audio. 32 items ≈ 2-3 mixtures in flight.
        self._q: "queue.Queue" = queue.Queue(maxsize=32)
        self._error: BaseException | None = None
        # Latched separately from _error: _check hands the error to the
        # caller (clearing _error), but the worker must keep skipping —
        # otherwise a json_data.json queued behind a failed WAV write
        # could still land, minting a resume marker for a broken mixture.
        self._failed = False
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self) -> None:
        while True:
            item = self._q.get()
            if item is None:
                return
            fn, args, kwargs = item
            if not self._failed:
                try:
                    fn(*args, **kwargs)
                except BaseException as e:  # noqa: BLE001 — re-raised on main thread
                    self._error = e
                    self._failed = True
            self._q.task_done()

    def _check(self) -> None:
        if self._error is not None:
            err, self._error = self._error, None
            raise err

    def submit(self, fn, *args, **kwargs) -> None:
        self._check()
        self._q.put((fn, args, kwargs))

    def barrier(self) -> None:
        """Block until everything queued so far is on disk."""
        self._q.join()
        self._check()

    def close(self) -> None:
        self._q.put(None)
        self._thread.join()
        self._check()


def dispatch_mixture(
    scene: Scene,
    plan: MixturePlan,
    output_dir: str | Path,
    transcripts: dict[str, str] | None = None,
    save_bank: bool = True,
    save_trace: bool = True,
    mesh=None,
    wav_encoding: str = "pcm16",
    cache=None,
    sink: str = "disk",
) -> dict:
    """Device half of :func:`render_mixture`: enqueue the RIR-bank render
    and the fused source render, start async device→host copies of every
    artifact, and return a handle for :func:`finalize_mixture`.

    Splitting dispatch from finalize lets :func:`generate_split` overlap
    mixture k's downloads (the tunneled link's dominant cost) with
    mixture k+1's device compute on a single thread — the role the
    reference fills with a process pool (SonicSet_train.py:153-219).

    ``cache``: optional :class:`.device_assembly.UtteranceCache` — long
    audio is then assembled ON DEVICE from cached utterance rows
    (bit-identical output; steady-state uplink drops to cache misses).

    ``sink="device"`` renders the identical computation but keeps every
    output ON DEVICE: no artifact downloads, no bank/trace/WAV bytes —
    finalize_mixture forces execution with one scalar readback and writes
    nothing. This is the compute-only configuration that separates chip
    capability from the tunnel's artifact downlink (the real pipeline's
    floor — docs/PERFORMANCE.md)."""
    if sink not in ("disk", "device"):
        raise ValueError(f"sink must be 'disk' or 'device', got {sink!r}")
    if sink == "device":
        save_bank = False
        save_trace = False
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    sr = plan.sample_rate
    rng = np.random.default_rng(plan.seed)

    # Per-speaker RIR banks: trajectory waypoints × the mic — all
    # trajectories rendered in ONE fused device dispatch, and kept
    # device-resident for the moving-conv (the tunneled TPU link is slow;
    # only an explicit save_bank pulls a host copy).
    mic = np.asarray(plan.mic_point)
    # The noise/music static RIRs ride the SAME fused dispatch as the
    # trajectory banks (a 4th "bank" of two sources): two standalone
    # render_ir calls cost ~110 ms of dispatch floors on the tunneled
    # link for two items of work. Their joint peak normalization differs
    # from the raw serial render by a scalar, which the downstream LUFS
    # normalization makes irrelevant.
    all_banks = scene.render_banks(
        [[np.asarray(p) for p in traj] for traj in plan.trajectories]
        + [[np.asarray(plan.noise_point), np.asarray(plan.music_point)]],
        [mic],
        out_device=True,
        mesh=mesh,
    )
    banks = [b[:, 0] for b in all_banks[:-1]]  # (P, C, L) each
    rir_noise, rir_music = all_banks[-1][0, 0], all_banks[-1][1, 0]
    bank_f16 = None
    if save_bank:
        # float16 halves the device→host download (~12 MB of f32 per
        # mixture); the quantization error (~5e-4 rel) sits at the f32
        # tap-placement noise floor. The copies start streaming NOW and
        # finalize_mixture collects them after the source render.
        bank_f16 = [b.astype("float16") for b in banks]
        for b in bank_f16:
            _copy_to_host_async(b)

    # All sources render in ONE jitted, mesh-shardable device computation
    # (moving conv + static conv + LUFS — parallel/pipeline.py); the host
    # only assembles dry tracks (I/O) and computes trajectory plans. The
    # rng is consumed in the reference's per-speaker order so seeded
    # outputs match the previous sequential path exactly.
    if all(b.shape[0] >= 2 for b in banks):
        dry, weights, offs, lens = [], [], [], []
        for sp, traj in zip(plan.speech_plans, plan.trajectories):
            if cache is None:
                audio = assemble_long_audio(sp)[0]
                n = audio.shape[-1]
                dry.append(audio)
            else:
                n = sp.total_samples
            idx, w = dynamic_interp_plan(np.asarray(traj), n, rng=rng)
            o, le, _ = segment_plan(idx)
            weights.append(w)
            offs.append(o)
            lens.append(le)
        banks_p, _, off_p, len_p, max_seg = pad_moving_plans(
            banks, weights, offs, lens, stack_weights=False
        )
        # Both static RIRs come from the same bank render: same length,
        # already stacked and device-resident.
        import jax.numpy as jnp

        static_rirs = jnp.stack([rir_noise, rir_music])
        if cache is not None:
            # Device-side assembly from cached utterance rows: dry audio
            # never crosses the link once its utterances are cached
            # (device_assembly.py; bit-identical to the host path).
            assembled = assemble_plans_on_device(
                list(plan.speech_plans)
                + [plan.noise_plan, plan.music_plan],
                cache,
            )
            speech_in = assembled[: len(plan.speech_plans)]
            static_in = assembled[len(plan.speech_plans) :]
        else:
            static_audio = np.stack([
                assemble_long_audio(plan.noise_plan)[0],
                assemble_long_audio(plan.music_plan)[0],
            ]).astype(np.float32)
            # Upload audio as int16 PCM (half the f32 bytes; device
            # converts back exactly — sources decoded from PCM16 WAVs
            # round-trip bit-for-bit).
            speech_in = _pcm16_upload(np.stack(dry).astype(np.float32))
            static_in = _pcm16_upload(static_audio)
        # Crossfade weights rebuild on device (weights=None): with the
        # int16 uploads together ~21 MB less uplink per 60 s mixture.
        moving_t, static_t = render_mixture_sources(
            speech_in,
            banks_p, None, off_p, len_p,
            max_seg, static_in, static_rirs,
            np.asarray(plan.lufs_speech, np.float32),
            np.asarray([plan.lufs_noise, plan.lufs_music], np.float32),
            sr, mesh=mesh,
            weight_mask=np.asarray(
                [1.0 if w.any() else 0.0 for w in weights], np.float32
            ),
        )
        if wav_encoding == "pcm16":
            tracks, peak_scales = _pack_tracks_jit()(moving_t, static_t)
            # The axon backend materializes each OUTPUT lazily: without
            # an explicit flush the tiny peak_scales read in
            # finalize_mixture blocked ~1.2 s (profiled) waiting on
            # deferred work even though the sibling tracks array had
            # already streamed its copy.
            if sink != "device":
                _copy_to_host_async(peak_scales)
        else:  # float32: reference-format output (no quantization)
            tracks = jnp.concatenate([moving_t, static_t], axis=0)
            peak_scales = None
        if sink != "device":
            _copy_to_host_async(tracks)
        payload = {
            "tracks": tracks,
            "peak_scales": peak_scales,
            "n_moving": len(banks),
        }
    else:
        # Degenerate single-waypoint trajectories: per-source host loop.
        moving = []
        for i, (sp, traj, bank) in enumerate(
            zip(plan.speech_plans, plan.trajectories, banks)
        ):
            wet = render_moving_source(
                assemble_long_audio(sp), bank, np.asarray(traj), rng
            )
            wet, _ = loudness_normalize_to(wet, sr, plan.lufs_speech[i])
            moving.append(wet)
        noise = render_static_source(
            assemble_long_audio(plan.noise_plan), np.asarray(rir_noise)
        )
        music = render_static_source(
            assemble_long_audio(plan.music_plan), np.asarray(rir_music)
        )
        noise, _ = loudness_normalize_to(noise, sr, plan.lufs_noise)
        music, _ = loudness_normalize_to(music, sr, plan.lufs_music)
        payload = {"moving": moving, "noise": noise, "music": music}
    return {
        **payload,
        "scene": scene,
        "plan": plan,
        "out": out,
        "mic": mic,
        "transcripts": transcripts,
        "bank_f16": bank_f16,
        "save_trace": save_trace,
        "wav_encoding": wav_encoding,
        "sink": sink,
    }


def _write_json(path: Path, obj: dict) -> None:
    with open(path, "w") as f:
        json.dump(obj, f)


def finalize_mixture(handle: dict, writer: "ArtifactWriter | None" = None) -> dict:
    """Host half of :func:`render_mixture`: collect the (already
    streaming) device→host copies and write WAVs + bank + trace +
    metadata (SonicSet_train.py:50-138 artifact set).

    Device fetches happen here on the calling thread; with ``writer``
    the pure-disk writes are queued to its background thread instead of
    blocking the pipeline (call ``writer.barrier()`` before relying on
    the files)."""
    if handle.get("sink") == "device":
        # Compute-only consumption: write nothing and do NOT fence here.
        # A per-mixture scalar read would drain the whole in-order queue
        # (device→host copies are stream-ordered behind every queued
        # program — docs/PERFORMANCE.md), serializing a tunnel RTT into
        # every mixture; generate_split fences every few mixtures to
        # bound live device memory and once at the end for correct
        # timing. The returned "fence" array transitively depends on the
        # whole mixture's computation.
        fence = handle.get("tracks")
        if fence is None:  # degenerate host path: already materialized
            float(np.ravel(handle["moving"][0])[0])
        return {"device_resident": True, "out": handle["out"],
                "fence": fence}
    out: Path = handle["out"]
    plan: MixturePlan = handle["plan"]
    mic = handle["mic"]
    transcripts = handle["transcripts"]
    sr = plan.sample_rate

    def do(fn, *args, **kwargs):
        if writer is not None:
            writer.submit(fn, *args, **kwargs)
        else:
            fn(*args, **kwargs)

    if handle["bank_f16"] is not None:
        banks_np = [np.asarray(b) for b in handle["bank_f16"]]
        do(
            save_rir_bank,
            out / f"rir_bank_{plan.channel_type}.npz",
            np.stack(
                [b[: min(x.shape[0] for x in banks_np)] for b in banks_np]
            ) if len({b.shape for b in banks_np}) > 1 else np.stack(banks_np),
            source_positions=np.asarray(
                [t[0] for t in plan.trajectories], np.float64
            ),
            receiver_positions=mic[None, :],
            sample_rate=sr,
        )

    encoding = handle.get("wav_encoding", "pcm16")
    peak_scales = None
    if "tracks" in handle:
        tracks = np.asarray(handle["tracks"])
        n_moving = handle["n_moving"]
        moving = [tracks[i] for i in range(n_moving)]
        noise, music = tracks[n_moving], tracks[n_moving + 1]
        if handle.get("peak_scales") is not None:
            peak_scales = np.asarray(handle["peak_scales"])
    else:
        moving = list(handle["moving"])
        noise, music = handle["noise"], handle["music"]
        if encoding == "pcm16":
            # Host twin of _pack_tracks_jit's peak guard: scale tracks
            # whose peak exceeds the pcm16 ceiling instead of clipping.
            limit = 1.0 - 1.0 / 32768.0
            all_tracks = moving + [noise, music]
            peak_scales = np.ones(len(all_tracks), np.float32)
            for i, tr in enumerate(all_tracks):
                peak = float(np.max(np.abs(tr))) if np.size(tr) else 0.0
                if peak > limit:
                    peak_scales[i] = limit / peak
            moving = [t * s for t, s in zip(moving, peak_scales)]
            noise = noise * peak_scales[len(moving)]
            music = music * peak_scales[len(moving) + 1]
    track_names = [f"moving_audio_{i + 1}.wav" for i in range(len(moving))]
    track_names += ["noise_audio.wav", "music_audio.wav"]
    for name, wet in zip(track_names, moving + [noise, music]):
        do(write_wav, out / name, wet, sr, encoding=encoding)

    if handle["save_trace"]:
        do(
            save_trace_image,
            out / "trace.png",
            handle["scene"].nav,
            trajectories=[np.asarray(t) for t in plan.trajectories],
            mic_points=mic[None, :],
            static_points=np.stack(
                [np.asarray(plan.noise_point), np.asarray(plan.music_point)]
            ),
        )

    def _words(names):
        if not transcripts:
            return []
        # Extension-blind fallback: reference transcript CSVs key
        # '<id>.flac' (tool_utils.py process_librispeech) while the WAV
        # corpus places '<id>.wav' — try the exact name, then the bare
        # stem, then any CSV key sharing the stem.
        by_stem = {Path(k).stem: v for k, v in transcripts.items()}
        return [
            transcripts.get(Path(n).name)
            or by_stem.get(Path(n).stem, "")
            for n in names
        ]

    meta = {
        **{
            f"source{i + 1}": {
                "audio": sp.audio_names,
                "start_end_points": sp.start_end_points,
                "words": _words(sp.audio_names),
            }
            for i, sp in enumerate(plan.speech_plans)
        },
        "noise": {
            "audio": plan.noise_plan.audio_names,
            "start_end_points": plan.noise_plan.start_end_points,
        },
        "music": {
            "audio": plan.music_plan.audio_names,
            "start_end_points": plan.music_plan.start_end_points,
        },
    }
    if peak_scales is not None:
        applied = {
            name: float(s)
            for name, s in zip(track_names, peak_scales)
            if s != 1.0
        }
        if applied:
            # Tracks scaled below the plan's LUFS target to fit int16
            # full scale without clipping; original = written / scale.
            meta["pcm16_peak_scale"] = applied
    # json_data.json is the resume/completion marker — it must be the
    # LAST artifact queued (generate_split's partial-dir cleanup and
    # remove_existing_speakers both key on its existence).
    do(plan.save, out / "mixture_plan.json")
    do(_write_json, out / "json_data.json", meta)
    return meta


def render_mixture(
    scene: Scene,
    plan: MixturePlan,
    output_dir: str | Path,
    transcripts: dict[str, str] | None = None,
    save_bank: bool = True,
    save_trace: bool = True,
    mesh=None,
    wav_encoding: str = "pcm16",
    cache=None,
    sink: str = "disk",
) -> dict:
    """Execute a MixturePlan → WAVs + metadata on disk
    (SonicSet_train.py:50-138 execution half).

    ``mesh``: optional jax.sharding.Mesh — shards the per-source render
    across devices (parallel/pipeline.py); identical output either way.
    ``wav_encoding``: "pcm16" (half-size downloads/files; peak-guarded,
    scales recorded in json_data.json) or "float32" (the reference's
    torchaudio.save format, SonicSet_train.py:102-106).
    ``sink="device"``: compute-only — no downloads, no files (see
    dispatch_mixture)."""
    return finalize_mixture(
        dispatch_mixture(
            scene, plan, output_dir, transcripts, save_bank, save_trace,
            mesh, wav_encoding, cache, sink,
        )
    )


def looks_like_partial_mixture(folder: Path) -> bool:
    """True for dirs this pipeline plausibly created and left incomplete:
    empty (crash right after mkdir) or holding a recognizable mixture
    artifact. Unrelated user dirs (plots/, logs/, …) are preserved by the
    resume cleanup in :func:`generate_split`."""
    entries = list(folder.iterdir())
    if not entries:
        return True
    marks = ("moving_audio_", "noise_audio", "music_audio",
             "rir_bank_", "mixture_plan", "trace.")
    return any(e.name.startswith(marks) for e in entries)


def remove_existing_speakers(results_root: str | Path, speech_dirs: list[str]) -> list[str]:
    """Resume: drop speakers already present in a COMPLETED triple dir
    (removing_exist_speaker, SonicSet_train.py:140-151).

    Stricter than the reference, which counts any existing folder: a dir
    left partial by a crash (no ``json_data.json`` — the marker the
    artifact writer lands LAST) would orphan its speakers forever. Here
    those speakers return to the pool, and when the same triple re-forms
    the per-mixture json gate in :func:`generate_split` regenerates the
    partial dir in place (plans are seeded by (scene, triple), so the
    redone mixture is identical)."""
    root = Path(results_root)
    if not root.exists():
        return list(speech_dirs)
    used: set[str] = set()
    for folder in root.iterdir():
        if (folder / "json_data.json").exists():
            used.update(folder.name.split("-"))
    return [s for s in speech_dirs if Path(s).name not in used]


def generate_split(
    scene_factory,
    scene_names: list[str],
    speech_dirs: list[str],
    noise_manifest: dict[str, int],
    music_manifest: dict[str, int],
    results_root: str | Path,
    transcripts: dict[str, str] | None = None,
    duration: float = 60.0,
    speakers_per_mixture: int = 3,
    base_seed: int = 0,
    max_mixtures: int | None = None,
    pipeline: bool = True,
    pipeline_depth: int = 2,
    wav_encoding: str = "pcm16",
    utterance_cache: "bool | UtteranceCache" = True,
    save_bank: bool = True,
    sink: str = "disk",
) -> list[Path]:
    """Outer generation loop (SonicSet_train.py:153-219): per scene, consume
    speaker directories in random triples until exhausted, with resume.

    ``scene_factory(scene_name) -> Scene``; speech dirs are per-speaker
    folders whose WAV lengths are scanned into manifests.

    With ``pipeline`` (default), mixture k's device→host downloads (the
    tunneled link's dominant cost) stream via async copies while mixture
    k+1's bank render + source conv execute — the overlap the reference
    gets from its process pool (SonicSet_train.py:153-219), on a single
    thread (worker threads measurably HURT on the tunneled runtime:
    concurrent fetch+compute from two threads ran 2× slower than
    serial). ``pipeline_depth`` mixtures stay in flight (device output +
    write queue ≈ 50 MB each; depth 2 measured 1.00 s vs depth 1's
    1.21 s per 60 s binaural mixture on chip — deeper shows no further
    gain). Plans are seeded per (scene, triple) so results are
    identical either way.

    With ``utterance_cache`` (default), decoded utterances stay
    device-resident across mixtures and long audio assembles on device
    (device_assembly.py) — bit-identical output, steady-state uplink
    reduced to cache misses (the speaker pool resets per scene, so every
    speaker recurs across scenes — SonicSet_train.py:180-218). Pass an
    :class:`UtteranceCache` instance to share the warm cache across
    several generate_split calls (e.g. train + val of one corpus).
    """
    from .plan import scan_audio_lengths

    results_root = Path(results_root)
    produced: list[Path] = []
    pending: list = []  # [(handle, out_dir, scene, name, t0), ...]
    writer = ArtifactWriter() if pipeline else None
    cache: UtteranceCache | None = (
        utterance_cache if isinstance(utterance_cache, UtteranceCache) else None
    )
    length_memo: dict[str, dict] = {}

    def scan_lengths_memo(c: str) -> dict:
        # Speaker dirs recur across scenes; re-reading every WAV header
        # per mixture costs ~1 ms/file on real corpora (100+ files/dir).
        got = length_memo.get(c)
        if got is None:
            got = length_memo[c] = scan_audio_lengths(c)
        return got

    fences: list = []  # device-sink outputs awaiting an execution fence

    def _note_fence(res) -> None:
        """Device-sink memory/timing management: collect each mixture's
        device output and fence every 4th (one scalar read forces the
        whole in-order queue — docs/PERFORMANCE.md — so per-mixture
        fences would serialize a tunnel RTT into every mixture, while
        unbounded deferral pins every mixture's ~50 MB output in HBM)."""
        if isinstance(res, dict) and res.get("fence") is not None:
            fences.append(res["fence"])
            if len(fences) >= 4:
                import jax.numpy as jnp

                float(jnp.ravel(fences[-1])[0])
                fences.clear()

    def _drain_fences() -> None:
        if fences:
            import jax.numpy as jnp

            float(jnp.ravel(fences[-1])[0])
            fences.clear()

    def _finish(p) -> None:
        handle, out_dir, scene_name_, name_, t0_ = p
        _note_fence(finalize_mixture(handle, writer))
        produced.append(out_dir)
        # per-mixture elapsed log (SonicSet_train.py:215 parity)
        logger.info(
            "%s/%s: %.1f s elapsed (%d generated)",
            scene_name_, name_, time.perf_counter() - t0_, len(produced),
        )

    try:
        for s_idx, scene_name in enumerate(scene_names):
            scene = scene_factory(scene_name)
            scene_root = results_root / scene_name
            if scene_root.exists():
                # A crash between artifact writes leaves a dir without
                # json_data.json (the writer lands it last). Clean it so
                # its speakers re-enter the pool AND no datamodule scans
                # a half-written sample.
                import shutil

                for folder in scene_root.iterdir():
                    if not folder.is_dir() or (
                        folder / "json_data.json"
                    ).exists():
                        continue
                    if looks_like_partial_mixture(folder):
                        logger.warning(
                            "removing partial mixture dir %s", folder
                        )
                        shutil.rmtree(folder)
                    else:
                        logger.warning(
                            "ignoring non-mixture dir %s (no pipeline "
                            "artifacts)", folder
                        )
            pool = remove_existing_speakers(scene_root, speech_dirs)
            rng_outer = np.random.default_rng(base_seed + s_idx)
            while len(pool) >= speakers_per_mixture:
                triple = list(
                    rng_outer.choice(
                        len(pool), speakers_per_mixture, replace=False
                    )
                )
                chosen = [pool[i] for i in sorted(triple)]
                pool = [p for p in pool if p not in chosen]
                name = "-".join(Path(c).name.split(".")[0] for c in chosen)
                out_dir = scene_root / name
                if (out_dir / "json_data.json").exists():
                    continue
                # stable_seed, NOT hash(): str hashing is randomized per
                # process, which would make the same (scene, triple)
                # non-reproducible across runs/resumes
                seed = stable_seed(base_seed, scene_name, name)
                rng = np.random.default_rng(seed)
                t0 = time.perf_counter()
                plan = plan_mixture(
                    scene,
                    [scan_lengths_memo(c) for c in chosen],
                    noise_manifest,
                    music_manifest,
                    rng,
                    duration=duration,
                    seed=seed,
                )
                if utterance_cache and cache is None:
                    cache = UtteranceCache(sample_rate=plan.sample_rate)
                if pipeline:
                    handle = dispatch_mixture(
                        scene, plan, out_dir, transcripts,
                        save_bank=save_bank,
                        wav_encoding=wav_encoding, cache=cache, sink=sink,
                    )
                    # Dispatch k BEFORE finalizing k-1: k's device work +
                    # async copies stream while the host blocks on k-1's
                    # remaining bytes and writes its files.
                    pending.append((handle, out_dir, scene_name, name,
                                    time.perf_counter()))
                    # Keep up to pipeline_depth mixtures in flight: their
                    # device compute + async device→host copies stream
                    # while the host finalizes (writes) the oldest. Each
                    # in-flight 60 s binaural mixture pins ~25 MB of
                    # device output + ~25 MB of host write queue.
                    while len(pending) > max(int(pipeline_depth), 1):
                        _finish(pending.pop(0))
                else:
                    _note_fence(render_mixture(
                        scene, plan, out_dir, transcripts,
                        save_bank=save_bank,
                        wav_encoding=wav_encoding, cache=cache, sink=sink,
                    ))
                    produced.append(out_dir)
                    logger.info(
                        "%s/%s: %.1f s elapsed (%d generated)",
                        scene_name, name, time.perf_counter() - t0,
                        len(produced),
                    )
                if (
                    max_mixtures is not None
                    and len(produced) + len(pending) >= max_mixtures
                ):
                    while pending:
                        _finish(pending.pop(0))
                    _drain_fences()
                    return produced
        while pending:
            _finish(pending.pop(0))
        _drain_fences()
        return produced
    finally:
        while pending:
            # Unwinding with renders in flight (main-thread error or
            # interrupt): surface the dispatched mixtures' outcomes
            # rather than silently discarding them.
            try:
                _finish(pending.pop(0))
            except Exception:
                logger.exception("pipelined render failed while unwinding")
        try:
            _drain_fences()
        except Exception:
            logger.exception("device-sink fence drain failed while unwinding")
        if writer is not None:
            # All queued artifacts are on disk before the caller sees
            # `produced`; a deferred write error surfaces here — unless
            # another exception is already unwinding, which must not be
            # masked.
            import sys as _sys

            unwinding = _sys.exc_info()[0] is not None
            try:
                writer.close()
            except Exception:
                if unwinding:
                    logger.exception("artifact writer failed while unwinding")
                else:
                    raise
