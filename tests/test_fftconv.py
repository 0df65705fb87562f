"""Golden tests: FFT convolution kernels vs scipy references."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy import signal

from sonicsim_tpu.ops import (
    convolve_fixed_receiver,
    convolve_moving_blocked,
    convolve_moving_receiver,
    convolve_moving_segmented,
    dynamic_interp_plan,
    fft_convolve,
    moving_block_plan,
    segment_plan,
)


def test_fft_convolve_full_matches_scipy(rng):
    x = rng.standard_normal(1000).astype(np.float32)
    k = rng.standard_normal(137).astype(np.float32)
    ours = np.asarray(fft_convolve(jnp.asarray(x), jnp.asarray(k)))
    ref = signal.fftconvolve(x, k, mode="full")
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("mode", ["same", "valid"])
def test_fft_convolve_modes(rng, mode):
    x = rng.standard_normal(512).astype(np.float32)
    k = rng.standard_normal(64).astype(np.float32)
    ours = np.asarray(fft_convolve(jnp.asarray(x), jnp.asarray(k), mode=mode))
    ref = signal.fftconvolve(x, k, mode=mode)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_fft_convolve_batched(rng):
    x = rng.standard_normal((3, 1, 400)).astype(np.float32)
    k = rng.standard_normal((1, 2, 93)).astype(np.float32)
    ours = np.asarray(fft_convolve(jnp.asarray(x), jnp.asarray(k)))
    ref = signal.fftconvolve(x, k, mode="full", axes=-1)
    assert ours.shape == ref.shape == (3, 2, 492)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_convolve_fixed_receiver_parity(rng):
    """Reference: SonicSim_moving.py:47-61 (fftconvolve full, truncate to T)."""
    audio = rng.standard_normal(2000).astype(np.float32)
    rirs = rng.standard_normal((4, 300)).astype(np.float32)
    ours = np.asarray(convolve_fixed_receiver(jnp.asarray(audio), jnp.asarray(rirs)))
    ref = signal.fftconvolve(audio.reshape(1, -1), rirs, mode="full")[:, :2000]
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def _reference_moving(audio, rirs, interp_index, interp_weight):
    """NumPy reimplementation of SonicSim_moving.py:63-96 semantics."""
    num_channels = rirs.shape[1]
    t = audio.shape[0]
    conv = signal.oaconvolve(audio[None, None, :], rirs, axes=-1)[..., :t]
    start = conv[interp_index, np.arange(num_channels)[:, None], np.arange(t)]
    end = conv[interp_index + 1, np.arange(num_channels)[:, None], np.arange(t)]
    w = interp_weight[None, :]
    return (1 - w) * start + w * end


def _make_case(rng, t=4000, p=6, c=2, l=200):
    audio = rng.standard_normal(t).astype(np.float32)
    rirs = (rng.standard_normal((p, c, l)) * np.exp(
        -np.linspace(0, 6, l)
    )).astype(np.float32)
    positions = np.cumsum(rng.uniform(0.5, 1.5, size=(p, 3)), axis=0)
    idx, w = dynamic_interp_plan(positions, t, rng=rng)
    return audio, rirs, idx, w


def test_convolve_moving_dense_parity(rng):
    audio, rirs, idx, w = _make_case(rng)
    ours = np.asarray(
        convolve_moving_receiver(
            jnp.asarray(audio), jnp.asarray(rirs), jnp.asarray(idx), jnp.asarray(w)
        )
    )
    ref = _reference_moving(audio, rirs, idx, w)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_convolve_moving_segmented_matches_dense(rng):
    audio, rirs, idx, w = _make_case(rng, t=5000, p=8, c=3, l=256)
    offsets, lengths, max_seg = segment_plan(idx)
    seg = np.asarray(
        convolve_moving_segmented(
            jnp.asarray(audio),
            jnp.asarray(rirs),
            jnp.asarray(w),
            jnp.asarray(offsets),
            jnp.asarray(lengths),
            max_seg,
        )
    )
    ref = _reference_moving(audio, rirs, idx, w)
    np.testing.assert_allclose(seg, ref, rtol=1e-3, atol=1e-4)


def test_convolve_moving_blocked_matches_dense(rng):
    audio, rirs, idx, w = _make_case(rng, t=5000, p=8, c=3, l=256)
    offsets, lengths, _ = segment_plan(idx)
    block = 512  # forces multi-block segments
    nb = -(-5000 // block) + len(offsets)
    block_off, block_seg = moving_block_plan(offsets, lengths, 5000, block, nb)
    out = np.asarray(
        convolve_moving_blocked(
            jnp.asarray(audio),
            jnp.asarray(rirs),
            jnp.asarray(w),
            jnp.asarray(block_off),
            jnp.asarray(block_seg),
            block,
        )
    )
    ref = _reference_moving(audio, rirs, idx, w)
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_convolve_moving_blocked_fused_epilogue_matches_dense(rng):
    """Fused crossfade epilogue (segment tables, no per-sample weight
    array) must reproduce the dense reference like the legacy combine."""
    audio, rirs, idx, w = _make_case(rng, t=5000, p=8, c=3, l=256)
    offsets, lengths, _ = segment_plan(idx)
    block = 512
    nb = -(-5000 // block) + len(offsets)
    block_off, block_seg = moving_block_plan(offsets, lengths, 5000, block, nb)
    out = np.asarray(
        convolve_moving_blocked(
            jnp.asarray(audio),
            jnp.asarray(rirs),
            None,
            jnp.asarray(block_off),
            jnp.asarray(block_seg),
            block,
            seg_offsets=jnp.asarray(offsets),
            seg_lengths=jnp.asarray(lengths),
        )
    )
    ref = _reference_moving(audio, rirs, idx, w)
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_convolve_moving_blocked_one_giant_segment(rng):
    # A near-static trajectory: one segment owns almost the whole signal
    # (the case that made per-segment windows degenerate to full length).
    t, p, c, l = 8000, 3, 2, 128
    audio = rng.standard_normal(t).astype(np.float32)
    rirs = rng.standard_normal((p, c, l)).astype(np.float32) * 0.1
    idx = np.zeros(t, np.int32)
    idx[-100:] = 1  # last 100 samples on the second pair
    w = rng.uniform(0, 1, t).astype(np.float32)
    offsets, lengths, _ = segment_plan(idx)
    block = 1024
    nb = -(-t // block) + len(offsets)
    block_off, block_seg = moving_block_plan(offsets, lengths, t, block, nb)
    out = np.asarray(
        convolve_moving_blocked(
            jnp.asarray(audio), jnp.asarray(rirs), jnp.asarray(w),
            jnp.asarray(block_off), jnp.asarray(block_seg), block,
        )
    )
    ref = _reference_moving(audio, rirs, idx, w)
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_moving_block_plan_covers_and_pads(rng):
    _, _, idx, _ = _make_case(rng)
    offsets, lengths, _ = segment_plan(idx)
    t, block = len(idx), 300
    nb = -(-t // block) + len(offsets) + 5
    block_off, block_seg = moving_block_plan(offsets, lengths, t, block, nb)
    assert block_off.shape == block_seg.shape == (nb,)
    assert np.all(np.diff(block_off) >= 0)  # sorted for searchsorted
    # every sample owned by exactly the right segment
    owner = np.clip(np.searchsorted(block_off, np.arange(t), "right") - 1,
                    0, nb - 1)
    np.testing.assert_array_equal(block_seg[owner], idx.clip(0, len(offsets) - 1))


def test_segment_plan_covers_everything(rng):
    _, _, idx, _ = _make_case(rng)
    offsets, lengths, max_seg = segment_plan(idx)
    assert lengths.sum() == len(idx)
    assert max_seg == lengths.max()
    for p, (o, n) in enumerate(zip(offsets, lengths)):
        assert np.all(idx[o : o + n] == p)


def test_pallas_crossfade_combine_interpret(rng):
    """Pallas combine (interpret mode) matches the XLA gather combine."""
    audio, rirs, idx, w = _make_case(rng, t=40000, p=5, c=2, l=400)
    offsets, lengths, max_seg = segment_plan(idx)
    ref = np.asarray(
        convolve_moving_segmented(
            jnp.asarray(audio), jnp.asarray(rirs), jnp.asarray(w),
            jnp.asarray(offsets), jnp.asarray(lengths), max_seg,
        )
    )
    # Recompute the conv tensor exactly as the op does, then run the Pallas
    # combine in interpreter mode.
    from scipy.fft import next_fast_len as _nfl

    from sonicsim_tpu.ops.pallas_kernels import crossfade_combine

    t = audio.shape[0]
    p, c, l = rirs.shape
    offsets_al = offsets - offsets % 128
    mx = max_seg + 128
    win = mx + l - 1
    xpad = np.pad(audio, (l - 1, mx))
    windows = np.stack([xpad[o : o + win] for o in offsets_al])
    nfft = _nfl(win + l - 1)
    sf = np.fft.rfft(windows, nfft)
    kf = np.fft.rfft(rirs, nfft)
    prod = sf[:, None, None, :] * np.stack([kf[:-1], kf[1:]], axis=1)
    conv = np.fft.irfft(prod, nfft)[..., l - 1 : l - 1 + mx].astype(np.float32)
    out = np.asarray(
        crossfade_combine(
            jnp.asarray(conv), jnp.asarray(offsets), jnp.asarray(offsets_al),
            jnp.asarray(w), t, interpret=True,
        )
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_pallas_guard_short_segments(rng):
    """Segments shorter than the Pallas BLOCK must fall back to the exact
    gather combine instead of blending from the wrong conv window."""
    import jax.numpy as jnp

    from sonicsim_tpu.ops import (
        convolve_moving_segmented,
        dynamic_interp_plan,
        segment_plan,
    )

    t, p, c, l = 40000, 9, 1, 400  # ~5000-sample segments << BLOCK (8192)
    positions = np.cumsum(rng.uniform(0.3, 0.6, (p, 3)), axis=0)
    idx, w = dynamic_interp_plan(positions, t, rng=rng)
    off, le, max_seg = segment_plan(idx)
    assert int(np.asarray(le).min()) < 8192
    audio = jnp.asarray(rng.standard_normal(t).astype(np.float32) * 0.1)
    rirs = jnp.asarray(rng.standard_normal((p, c, l)).astype(np.float32) * 0.02)
    safe = convolve_moving_segmented(
        audio, rirs, jnp.asarray(w), jnp.asarray(off), jnp.asarray(le),
        max_seg, use_pallas=True,
    )
    ref = convolve_moving_segmented(
        audio, rirs, jnp.asarray(w), jnp.asarray(off), jnp.asarray(le),
        max_seg, use_pallas=False,
    )
    np.testing.assert_allclose(np.asarray(safe), np.asarray(ref), atol=1e-6)


def test_next_fast_len_odd_part_capped():
    """TPU FFT sizes must keep a tiny odd factor: a size like 486000
    (5-smooth but odd part 30375) gets lowered as a literal DFT matmul —
    a 944 GB constant at that length (observed compile OOM). The contract:
    smallest 2^a·m >= n with m in {1, 3, 5, 9, 15}, <= ~7% padding."""
    from sonicsim_tpu.ops.fftconv import next_fast_len

    for n in (1, 2, 7, 100, 16001, 65219, 486000, 490207, 10_000_001):
        f = next_fast_len(n)
        assert f >= n
        odd = f
        while odd % 2 == 0:
            odd //= 2
        assert odd in (1, 3, 5, 9, 15), (n, f, odd)
        if n >= 1000:
            assert f / n <= 1.07, (n, f)
