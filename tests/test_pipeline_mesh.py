"""Full generation pipeline on the device mesh.

Asserts the one-jit batched source renderer (parallel/pipeline.py) is
numerically identical (a) sharded over the 8-device mesh vs single-device,
and (b) vs the sequential per-source host path it replaced
(dataset/assemble.py render_moving_source + loudness_normalize_to) —
including ragged trajectory plans that exercise the padding inertness.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sonicsim_tpu.dataset.assemble import (
    loudness_normalize_to,
    render_static_source,
)
from sonicsim_tpu.ops import (
    convolve_moving_segmented,
    dynamic_interp_plan,
    lufs_norm,
    segment_plan,
)
from sonicsim_tpu.parallel import (
    make_mesh,
    pad_moving_plans,
    render_mixture_sources,
)

SR = 16000


def _synthetic_mixture(rng, n_src=3, t=SR, c=2, l=400):
    """Per-source ragged trajectories (different waypoint counts)."""
    speech = rng.standard_normal((n_src, t)).astype(np.float32) * 0.1
    banks, weights, offs, lens = [], [], [], []
    for i in range(n_src):
        p = 3 + i  # ragged: 3, 4, 5 waypoints
        traj = np.cumsum(rng.uniform(0.3, 1.0, (p, 3)), axis=0)
        bank = (rng.standard_normal((p, c, l)) * 0.02).astype(np.float32)
        bank[:, :, 0] = 1.0  # direct path keeps outputs non-degenerate
        idx, w = dynamic_interp_plan(traj, t, rng=rng)
        o, le, _ = segment_plan(idx)
        banks.append(bank)
        weights.append(w)
        offs.append(o)
        lens.append(le)
    static_audio = rng.standard_normal((2, t)).astype(np.float32) * 0.1
    static_rirs = (rng.standard_normal((2, c, l)) * 0.02).astype(np.float32)
    static_rirs[:, :, 0] = 1.0
    speech_lufs = np.asarray([-17.0, -16.0, -18.0], np.float32)[:n_src]
    static_lufs = np.asarray([-24.0, -29.0], np.float32)
    return (
        speech, banks, weights, offs, lens,
        static_audio, static_rirs, speech_lufs, static_lufs,
    )


def _sequential_reference(speech, banks, weights, offs, lens,
                          static_audio, static_rirs,
                          speech_lufs, static_lufs):
    """The per-source host loop the batched path replaced."""
    moving = []
    for i in range(len(speech)):
        _, _, max_seg = (
            offs[i], lens[i], int(lens[i].max())
        )
        wet = np.asarray(convolve_moving_segmented(
            jnp.asarray(speech[i]), jnp.asarray(banks[i]),
            jnp.asarray(weights[i]), jnp.asarray(offs[i]),
            jnp.asarray(lens[i]), max_seg,
        ))
        wet, _ = loudness_normalize_to(wet, SR, float(speech_lufs[i]))
        moving.append(wet)
    static = []
    for k in range(len(static_audio)):
        wet = render_static_source(static_audio[k], static_rirs[k])
        wet, _ = loudness_normalize_to(wet, SR, float(static_lufs[k]))
        static.append(wet)
    return np.stack(moving), np.stack(static)


def test_batched_matches_sequential(rng):
    data = _synthetic_mixture(rng)
    speech, banks, weights, offs, lens, sa, sr_, sl, stl = data
    banks_p, w_p, off_p, len_p, max_seg = pad_moving_plans(
        banks, weights, offs, lens
    )
    moving, static = render_mixture_sources(
        speech, banks_p, w_p, off_p, len_p, max_seg, sa, sr_, sl, stl, SR,
    )
    want_m, want_s = _sequential_reference(*data)
    # Same math modulo batched-FFT padding differences (common max_seg pads
    # FFT sizes differently per source than the per-source plans).
    np.testing.assert_allclose(np.asarray(moving), want_m, atol=2e-4)
    np.testing.assert_allclose(np.asarray(static), want_s, atol=2e-4)


def test_sharded_matches_single_device(rng):
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    data = _synthetic_mixture(rng, n_src=8)
    speech, banks, weights, offs, lens, sa, sr_, sl, stl = data
    sl = np.asarray([-17.0 - 0.5 * i for i in range(8)], np.float32)
    banks_p, w_p, off_p, len_p, max_seg = pad_moving_plans(
        banks, weights, offs, lens
    )
    args = (speech, banks_p, w_p, off_p, len_p, max_seg, sa, sr_, sl, stl, SR)
    single_m, single_s = render_mixture_sources(*args)
    mesh = make_mesh(8)
    shard_m, shard_s = render_mixture_sources(*args, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(shard_m), np.asarray(single_m), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(shard_s), np.asarray(single_s), atol=1e-6
    )
    # The sharded output really lives distributed on the mesh.
    assert len(shard_m.sharding.device_set) == 8


def test_ragged_source_count_not_divisible(rng):
    """3 sources on an 8-device mesh (the real SonicSet shape) still works
    and matches — GSPMD pads internally."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    data = _synthetic_mixture(rng, n_src=3)
    speech, banks, weights, offs, lens, sa, sr_, sl, stl = data
    banks_p, w_p, off_p, len_p, max_seg = pad_moving_plans(
        banks, weights, offs, lens
    )
    args = (speech, banks_p, w_p, off_p, len_p, max_seg, sa, sr_, sl, stl, SR)
    single = render_mixture_sources(*args)
    shard = render_mixture_sources(*args, mesh=make_mesh(8))
    for a, b in zip(shard, single):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_render_mixture_mesh_end_to_end(tmp_path, rng):
    """Whole render_mixture (bank render → assembly → conv → LUFS → WAVs)
    with and without a mesh produces identical files."""
    from sonicsim_tpu.dataset.generate import plan_mixture, render_mixture
    from sonicsim_tpu.sim import Scene
    from sonicsim_tpu.utils.wavio import read_wav, write_wav
    from sonicsim_tpu.dataset import scan_audio_lengths

    def corpus(root, n, seconds, prefix):
        root.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            t = np.arange(int(seconds * SR)) / SR
            x = (0.3 * np.sin(2 * np.pi * (200 + 80 * i) * t)).astype(
                np.float32
            )
            write_wav(root / f"{prefix}{i}.wav", x, SR)
        return scan_audio_lengths(root)

    scene = Scene.synthetic(
        room="r", dims=(8.0, 3.0, 6.0), channel_type="Mono", seed=1,
        max_order=2,
    )
    speech = [
        corpus(tmp_path / f"spk{i}", 2, 1.0, f"u{i}_") for i in range(2)
    ]
    noise = corpus(tmp_path / "noise", 1, 1.5, "n_")
    music = corpus(tmp_path / "music", 1, 1.5, "m_")
    plan = plan_mixture(
        scene, speech, noise, music, np.random.default_rng(0),
        duration=4.0, seed=7,
    )
    render_mixture(scene, plan, tmp_path / "single", save_trace=False)
    render_mixture(
        scene, plan, tmp_path / "meshed", save_trace=False,
        mesh=make_mesh(min(8, len(jax.devices()))),
    )
    # Device-assembled speech (UtteranceCache) through the sharded path:
    # the assembled jax.Array must survive pad_to/device_put resharding.
    from sonicsim_tpu.dataset.device_assembly import UtteranceCache

    render_mixture(
        scene, plan, tmp_path / "meshed_cache", save_trace=False,
        mesh=make_mesh(min(8, len(jax.devices()))),
        cache=UtteranceCache(sample_rate=SR),
    )
    for name in ["moving_audio_1", "moving_audio_2", "noise_audio",
                 "music_audio"]:
        a, _ = read_wav(tmp_path / "single" / f"{name}.wav")
        b, _ = read_wav(tmp_path / "meshed" / f"{name}.wav")
        c, _ = read_wav(tmp_path / "meshed_cache" / f"{name}.wav")
        # Sharding changes XLA fusion; allow one int16 quantization step.
        np.testing.assert_allclose(a, b, atol=1.01 / 32768)
        np.testing.assert_allclose(a, c, atol=1.01 / 32768)


def test_device_weights_match_host_plan(rng):
    """weights=None reconstructs dynamic_interp_plan's ramps on device
    (the upload-saving path generate.py uses) — same rendered output."""
    data = _synthetic_mixture(rng)
    speech, banks, weights, offs, lens, sa, sr_, sl, stl = data
    banks_p, w_p, off_p, len_p, max_seg = pad_moving_plans(
        banks, weights, offs, lens
    )
    from sonicsim_tpu.parallel.pipeline import _weights_from_segments

    w_dev = _weights_from_segments(
        off_p, len_p, np.ones(len(banks), np.float32), t=speech.shape[-1]
    )
    np.testing.assert_allclose(np.asarray(w_dev), w_p, atol=2e-7)

    host = render_mixture_sources(
        speech, banks_p, w_p, off_p, len_p, max_seg, sa, sr_, sl, stl, SR,
    )
    dev = render_mixture_sources(
        speech, banks_p, None, off_p, len_p, max_seg, sa, sr_, sl, stl, SR,
    )
    for a, b in zip(dev, host):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_degenerate_trajectory_device_weights(rng):
    """A zero-distance trajectory (host plan: all-zero weights) must NOT
    become a ramp on device — the weight_mask zeroes it."""
    data = _synthetic_mixture(rng)
    speech, banks, weights, offs, lens, sa, sr_, sl, stl = data
    # Make source 0 degenerate the way dynamic_interp_plan reports it.
    t = speech.shape[-1]
    weights[0] = np.zeros(t, np.float32)
    offs[0] = np.zeros(1, np.int32)
    lens[0] = np.asarray([t], np.int32)
    banks_p, w_p, off_p, len_p, max_seg = pad_moving_plans(
        banks, weights, offs, lens
    )
    mask = np.asarray(
        [1.0 if w.any() else 0.0 for w in weights], np.float32
    )
    host = render_mixture_sources(
        speech, banks_p, w_p, off_p, len_p, max_seg, sa, sr_, sl, stl, SR,
    )
    dev = render_mixture_sources(
        speech, banks_p, None, off_p, len_p, max_seg, sa, sr_, sl, stl, SR,
        weight_mask=mask,
    )
    for a, b in zip(dev, host):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_int16_pcm_upload_exact(rng):
    """int16 PCM uploads decode to the identical float track on device
    when the sources are PCM16-exact (the WAV-decoded case)."""
    data = _synthetic_mixture(rng)
    speech, banks, weights, offs, lens, sa, sr_, sl, stl = data
    # PCM16-quantize the float sources so both paths see the same signal.
    speech = np.rint(
        np.clip(speech, -1, 0.999) * 32768.0
    ).astype(np.int16).astype(np.float32) / 32768.0
    sa = np.rint(
        np.clip(sa, -1, 0.999) * 32768.0
    ).astype(np.int16).astype(np.float32) / 32768.0
    banks_p, w_p, off_p, len_p, max_seg = pad_moving_plans(
        banks, weights, offs, lens
    )
    from sonicsim_tpu.dataset.generate import _pcm16_upload

    sp16, sa16 = _pcm16_upload(speech), _pcm16_upload(sa)
    assert sp16.dtype == np.int16 and sa16.dtype == np.int16
    f = render_mixture_sources(
        speech, banks_p, w_p, off_p, len_p, max_seg, sa, sr_, sl, stl, SR,
    )
    i = render_mixture_sources(
        sp16, banks_p, w_p, off_p, len_p, max_seg, sa16, sr_, sl, stl, SR,
    )
    for a, b in zip(i, f):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pcm16_upload_fallback():
    """Full-scale samples (clipping risk) keep the float32 upload."""
    from sonicsim_tpu.dataset.generate import _pcm16_upload

    x = np.asarray([[0.5, -1.0, 1.0]], np.float32)
    assert _pcm16_upload(x).dtype == np.float32
    y = np.asarray([[0.25, -0.5]], np.float32)
    assert _pcm16_upload(y).dtype == np.int16


def test_same_bucket_mixtures_share_one_executable(rng):
    """Mixtures whose trajectory raggedness lands in the same
    (P-quantum, segment-bucket) must reuse ONE compiled fused render —
    per-mixture recompiles of _render_all cost tens of seconds through
    the tunnel (pad_moving_plans quantizes P to 8 and max_seg to 8192
    precisely so this holds)."""
    from sonicsim_tpu.parallel.pipeline import _render_all

    _render_all._clear_cache()
    for seed in (0, 1, 2):
        r = np.random.default_rng(seed)
        (speech, banks, weights, offs, lens, static_audio, static_rirs,
         speech_lufs, static_lufs) = _synthetic_mixture(r)
        banks_p, w_p, off_p, len_p, max_seg = pad_moving_plans(
            banks, weights, offs, lens
        )
        moving, static = render_mixture_sources(
            speech, banks_p, w_p, off_p, len_p, max_seg,
            static_audio, static_rirs, speech_lufs, static_lufs, SR,
        )
        np.asarray(moving), np.asarray(static)
    assert _render_all._cache_size() == 1


def test_static_single_waypoint_bank(rng):
    """A 1-waypoint (static) bank normalizes inside pad_moving_plans to the
    duplicated-RIR 2-waypoint form and renders exactly the static conv."""
    data = _synthetic_mixture(rng)
    speech, banks, weights, offs, lens, sa, sr_, sl, stl = data
    banks[1] = banks[1][:1]  # (1, C, L): a static source
    weights[1] = np.zeros(SR, np.float32)
    offs[1] = np.zeros(0, np.int32)
    lens[1] = np.zeros(0, np.int32)

    banks_p, w_p, off_p, len_p, max_seg = pad_moving_plans(
        banks, weights, offs, lens
    )
    moving, _ = render_mixture_sources(
        speech, banks_p, w_p, off_p, len_p, max_seg, sa, sr_, sl, stl, SR,
    )
    want = render_static_source(speech[1], banks[1][0])
    want, _ = loudness_normalize_to(want, SR, float(sl[1]))
    np.testing.assert_allclose(np.asarray(moving[1]), want, atol=2e-4)
