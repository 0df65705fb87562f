"""Mesh-sharded mixture rendering: the generation pipeline's device path.

The reference parallelizes dataset generation with a host process pool
(SonicSim-SonicSet/SonicSim_rir.py:751-791 mp.Pool over RIR batches; one
mixture per worker in SonicSet_train.py). Here the WHOLE per-mixture DSP —
every speaker's moving-source convolution, the static noise/music reverbs,
and all the BS.1770 loudness normalizations — is one jitted computation
batched over sources, so a `jax.sharding.Mesh` spreads the source axis
across chips and XLA overlaps the FFT work; no process pool.

Per-source trajectory plans have ragged shapes (different waypoint counts
P_i and segment layouts), so :func:`pad_moving_plans` pads them to a common
static shape first: extra bank entries repeat the last RIR and extra plan
segments get offset=T/length=0, which own no output samples in the
segmented conv's searchsorted combine (ops/fftconv.py:218-223) — padding is
mathematically inert, verified by tests/test_pipeline_mesh.py.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np

from ..ops.fftconv import (
    block_plan_sizes,
    convolve_fixed_receiver,
    convolve_moving_blocked,
    moving_block_plan,
)
from ..ops.loudness import lufs_norm
from .mesh import batch_sharding


def pad_moving_plans(
    banks: list[np.ndarray],
    weights: list[np.ndarray],
    offsets: list[np.ndarray],
    lengths: list[np.ndarray],
    stack_weights: bool = True,
) -> tuple[np.ndarray, np.ndarray | None, np.ndarray, np.ndarray, int]:
    """Stack ragged per-source moving plans into common static shapes.

    banks[i]: (P_i, C, L); weights[i]: (T,); offsets/lengths[i]: (P_i-1,).
    Returns (banks (S,P,C,L), weights (S,T), offsets (S,P-1),
    lengths (S,P-1), max_seg) with P = max_i P_i.

    ``stack_weights=False`` returns None in the weights slot: callers
    that rebuild crossfade ramps on device (render_mixture_sources
    ``weights=None``) skip the ~11.5 MB (S, T) f32 host materialization.

    Banks may be device-resident ``jax.Array``s (the fused bank renderer's
    ``out_device=True`` output) — they are then padded/stacked with jnp and
    never round-trip through the host.
    """
    import jax.numpy as jnp

    t = int(weights[0].shape[-1])
    # Normalize single-waypoint (static) banks to their exact 2-waypoint
    # equivalent: the RIR duplicated and one segment owning the whole
    # signal. Crossfading between identical RIRs IS the static conv, so
    # no special case leaks downstream (previously lengths[i] was empty
    # and the max_seg reduction crashed).
    banks, offsets, lengths = list(banks), list(offsets), list(lengths)
    for i, b in enumerate(banks):
        if b.shape[0] == 1:
            xp_i = jnp if isinstance(b, jax.Array) else np
            banks[i] = xp_i.concatenate([b, b])
            offsets[i] = np.zeros(1, np.int32)
            lengths[i] = np.full(1, t, np.int32)
    # Quantize the static shapes (waypoint count up to a multiple of 8,
    # segment bound to 8192 samples): every distinct (P, max_seg) pair is
    # a fresh XLA compile of the fused render, and trajectory lengths
    # vary per mixture. Extra waypoints are inert (offsets point past the
    # end, lengths zero), and a larger segment bound only pads windows.
    p = -(-max(b.shape[0] for b in banks) // 8) * 8
    on_device = any(isinstance(b, jax.Array) for b in banks)
    xp = jnp if on_device else np
    banks_p, off_p, len_p = [], [], []
    for b, o, le in zip(banks, offsets, lengths):
        extra = p - b.shape[0]
        b = xp.asarray(b)
        banks_p.append(
            xp.concatenate([b, xp.repeat(b[-1:], extra, axis=0)])
            if extra
            else b
        )
        pad = p - 1 - o.shape[0]
        off_p.append(np.concatenate([o, np.full(pad, t, o.dtype)]))
        len_p.append(np.concatenate([le, np.zeros(pad, le.dtype)]))
    max_seg = int(max(int(le.max()) for le in lengths))
    max_seg = -(-max_seg // 8192) * 8192
    return (
        xp.stack(banks_p).astype(xp.float32),
        np.stack(weights).astype(np.float32) if stack_weights else None,
        np.stack(off_p).astype(np.int32),
        np.stack(len_p).astype(np.int32),
        max_seg,
    )


@partial(jax.jit, static_argnames=("t",))
def _weights_from_segments(offsets, lengths, mask, *, t: int):
    """Reconstruct dynamic_interp_plan's per-sample crossfade ramps ON
    DEVICE from the (S, P-1) segment starts/lengths.

    The host plan's weights are ``linspace(0, 1, len, endpoint=False)``
    per segment, i.e. (t - seg_start)/seg_len — recomputing that here
    from the already-needed segment table saves an (S, T) float32 upload
    (11.5 MB per 60 s mixture) over the tunneled device link. ``mask``
    zeroes rows whose host plan is degenerate (zero-distance trajectory:
    dynamic_interp_plan returns all-zero weights there, not a ramp).
    Matches the host float64 linspace to ~1e-7 (f32 division vs f64
    step), far inside the conv's crossfade tolerance."""
    import jax.numpy as jnp

    ts = jnp.arange(t, dtype=jnp.int32)

    def one(off, le, m):
        ends = off + le  # sorted: segments are contiguous, pads end at T
        seg = jnp.clip(
            jnp.searchsorted(ends, ts, side="right"), 0, off.shape[0] - 1
        )
        num = jnp.maximum(le[seg], 1).astype(jnp.float32)
        return (ts - off[seg]).astype(jnp.float32) / num * m

    return jax.vmap(one)(offsets, lengths, mask)


@partial(
    jax.jit,
    static_argnames=("block", "sample_rate", "use_mxu_fft"),
)
def _render_all(
    speech,  # (S, T) float32, or int16 PCM (converted here)
    banks,  # (S, P, C, L)
    weights,  # (S, T)
    block_off,  # (S, NB)
    block_seg,  # (S, NB)
    static_audio,  # (K, T) float32 or int16 PCM
    static_rirs,  # (K, C, L)
    speech_lufs,  # (S,)
    static_lufs,  # (K,)
    *,
    block: int,
    sample_rate: int,
    use_mxu_fft: bool | None = None,
):
    import jax.numpy as jnp

    # int16 PCM uploads (half the bytes of f32 over the tunneled link)
    # convert on device: i * 2^-15 is exact in f32, so PCM-exact sources
    # reproduce the float path bit-for-bit.
    if speech.dtype == jnp.int16:
        speech = speech.astype(jnp.float32) * (1.0 / 32768.0)
    if static_audio.dtype == jnp.int16:
        static_audio = static_audio.astype(jnp.float32) * (1.0 / 32768.0)
    moving = jax.vmap(
        lambda a, r, w, o, s: convolve_moving_blocked(
            a, r, w, o, s, block, use_mxu_fft=use_mxu_fft,
        )
    )(speech, banks, weights, block_off, block_seg)  # (S, C, T)
    moving = jax.vmap(
        lambda x, tgt: lufs_norm(x, sample_rate, tgt)[0]
    )(moving, speech_lufs)

    static = jax.vmap(convolve_fixed_receiver)(static_audio, static_rirs)
    static = jax.vmap(
        lambda x, tgt: lufs_norm(x, sample_rate, tgt)[0]
    )(static, static_lufs)
    return moving, static


@partial(
    jax.jit,
    static_argnames=("block", "sample_rate", "use_mxu_fft"),
)
def _render_all_fused(
    speech,  # (S, T) float32, or int16 PCM (converted here)
    banks,  # (S, P, C, L)
    seg_off,  # (S, P-1) int32 segment starts
    seg_len,  # (S, P-1) int32 segment lengths
    wmask,  # (S,) crossfade gain (0 for degenerate static trajectories)
    block_off,  # (S, NB)
    block_seg,  # (S, NB)
    static_audio,  # (K, T) float32 or int16 PCM
    static_rirs,  # (K, C, L)
    speech_lufs,  # (S,)
    static_lufs,  # (K,)
    *,
    block: int,
    sample_rate: int,
    use_mxu_fft: bool | None = None,
):
    """_render_all with the FUSED crossfade epilogue: no per-sample
    (S, T) weight array exists anywhere (host or device) — the blocked
    conv derives each block's linear ramp from the segment table and
    folds it into the irfft epilogue (convolve_moving_blocked
    seg_offsets path), halving the combine-side HBM traffic of the
    pipeline's hottest stage."""
    import jax.numpy as jnp

    if speech.dtype == jnp.int16:
        speech = speech.astype(jnp.float32) * (1.0 / 32768.0)
    if static_audio.dtype == jnp.int16:
        static_audio = static_audio.astype(jnp.float32) * (1.0 / 32768.0)
    moving = jax.vmap(
        lambda a, r, o, s, so, sl, m: convolve_moving_blocked(
            a, r, None, o, s, block, use_mxu_fft=use_mxu_fft,
            seg_offsets=so, seg_lengths=sl, w_scale=m,
        )
    )(speech, banks, block_off, block_seg, seg_off, seg_len, wmask)
    moving = jax.vmap(
        lambda x, tgt: lufs_norm(x, sample_rate, tgt)[0]
    )(moving, speech_lufs)

    static = jax.vmap(convolve_fixed_receiver)(static_audio, static_rirs)
    static = jax.vmap(
        lambda x, tgt: lufs_norm(x, sample_rate, tgt)[0]
    )(static, static_lufs)
    return moving, static


def render_mixture_sources(
    speech: np.ndarray,
    banks: np.ndarray,
    weights: np.ndarray | None,
    offsets: np.ndarray,
    lengths: np.ndarray,
    max_seg: int,
    static_audio: np.ndarray,
    static_rirs: np.ndarray,
    speech_lufs: np.ndarray,
    static_lufs: np.ndarray,
    sample_rate: int,
    mesh=None,
    use_mxu_fft: bool | None = None,
    weight_mask: np.ndarray | None = None,
):
    """All of a mixture's sources → reverberant, LUFS-normalized tracks.

    One jitted computation (moving conv + static conv + loudness gating for
    every source). With ``mesh``, the source axes are sharded over the mesh's
    'data' axis and params/plans travel with them — the multi-chip layout of
    the generation pipeline. Returns (moving (S,C,T), static (K,C,T)).

    ``offsets``/``lengths`` (host np arrays from :func:`pad_moving_plans`)
    are re-cut into a fixed-size block plan here: the compiled window span
    is ``min(16384, max_seg)`` samples whatever the trajectory raggedness,
    so every mixture of a split shares one executable (a whole-mixture
    segment used to compile a 273 MB one — see moving_block_plan).
    """
    s, k = speech.shape[0], static_audio.shape[0]
    t = int(speech.shape[-1])
    offsets = np.asarray(offsets)
    lengths = np.asarray(lengths)
    # Deterministic (block, nb) for (T, P, max_seg): stable compiled
    # shapes, shared formula with dataset/assemble.py (max_seg arrives
    # 8192-quantized from pad_moving_plans; the helper's ceil is a no-op).
    block, nb = block_plan_sizes(max_seg, t, int(offsets.shape[1]))
    fused = weights is None
    if fused:
        # FUSED crossfade epilogue: no (S, T) weight array anywhere —
        # the blocked conv folds each block's linear ramp (from the
        # segment table) into its irfft epilogue. ``weights`` given
        # explicitly keeps the legacy gather+lerp combine (the parity
        # tests drive both and compare).
        mask = (
            np.ones(s, np.float32)
            if weight_mask is None
            else np.asarray(weight_mask, np.float32)
        )
    plans = [
        moving_block_plan(offsets[i], lengths[i], t, block, nb)
        for i in range(s)
    ]
    block_off = np.stack([p[0] for p in plans])
    block_seg = np.stack([p[1] for p in plans])
    if fused:
        moving_args = (speech, banks, offsets.astype(np.int32),
                       lengths.astype(np.int32), mask, block_off, block_seg,
                       speech_lufs)
    else:
        moving_args = (speech, banks, weights, block_off, block_seg,
                       speech_lufs)
    static_args = (static_audio, static_rirs, static_lufs)
    if mesh is not None:
        # GSPMD shardings need axis-0 divisible by the mesh; pad with zero
        # sources (they render to silence on otherwise-idle devices, then
        # get sliced off — no wall-clock cost).
        n = int(np.prod(list(mesh.shape.values())))

        import jax.numpy as jnp

        def pad_to(arrs, count):
            target = -(-count // n) * n
            return tuple(
                # jnp.pad keeps device-resident banks on device (np inputs
                # are uploaded here either way, ahead of the device_put).
                jnp.pad(a, [(0, target - count)] + [(0, 0)] * (a.ndim - 1))
                for a in arrs
            )

        shard = batch_sharding(mesh)
        moving_args = tuple(
            jax.device_put(a, shard) for a in pad_to(moving_args, s)
        )
        static_args = tuple(
            jax.device_put(a, shard) for a in pad_to(static_args, k)
        )
    if fused:
        moving, static = _render_all_fused(
            *moving_args[:7],
            *static_args[:2],
            moving_args[7],
            static_args[2],
            block=block,
            sample_rate=sample_rate,
            use_mxu_fft=use_mxu_fft,
        )
    else:
        moving, static = _render_all(
            *moving_args[:5],
            *static_args[:2],
            moving_args[5],
            static_args[2],
            block=block,
            sample_rate=sample_rate,
            use_mxu_fft=use_mxu_fft,
        )
    return moving[:s], static[:k]
