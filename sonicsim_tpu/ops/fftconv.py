"""Batched FFT convolution — the reference's hottest DSP loop, TPU-native.

Replaces scipy.signal.fftconvolve/oaconvolve and the torch rfft path
(SonicSim-SonicSet/SonicSim_moving.py:47-96, SonicSim_audio.py:17-47,
SonicSim_rir.py:62-92) with jitted jnp.fft.rfft kernels batched over arbitrary
leading dims. Two moving-receiver strategies:

* ``convolve_moving_receiver`` (dense): exact reference semantics — convolve
  the full signal against every trajectory RIR, then per-sample crossfade
  between the adjacent-position renders (SonicSim_moving.py:63-96).
* ``convolve_moving_segmented`` (fast): each trajectory position's render is
  only *used* on its own output span, so we convolve per-position windows of
  size O(span + rir_len) instead of the full signal — O(P·S log S) instead of
  O(P·T log T) work, a ~T/S (≈ #positions/2) FLOP reduction with identical
  output up to FFT rounding.

All FFT sizes are computed host-side with scipy's ``next_fast_len`` so XLA
sees static, small-prime-factor shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def next_fast_len(n: int) -> int:
    """Smallest 2^a·m ≥ n with odd part m ∈ {1, 3, 5, 9, 15}.

    The TPU FFT is radix-sensitive in the extreme: sizes with a LARGE odd
    part are lowered as a literal DFT matmul — nfft = 486000 = 2^4·3^5·5^3
    (odd part 30375) made the compiler plan a 944 GB f32[486000, 486000]
    DFT matrix and OOM the whole generation executable, even though the
    size is perfectly 5-smooth. Power-of-two-dominant sizes (odd part
    ≤ 15) stay on the fast path; the worst-case padding over n is the
    15·2^a → 16·2^a gap, ~6.7%."""
    if n <= 1:
        return 1
    best = None
    for m in (1, 3, 5, 9, 15):
        p2 = 1 << max(-(-n // m) - 1, 0).bit_length()
        cand = p2 * m
        if cand >= n and (best is None or cand < best):
            best = cand
    return best


def fft_convolve(signal: jax.Array, kernel: jax.Array, mode: str = "full") -> jax.Array:
    """Linear convolution along the last axis via rfft.

    Leading dims broadcast (like scipy.signal.fftconvolve with axes=-1).
    """
    t = signal.shape[-1]
    l = kernel.shape[-1]
    n = t + l - 1
    nfft = next_fast_len(n)
    sf = jnp.fft.rfft(signal.astype(jnp.float32), nfft)
    kf = jnp.fft.rfft(kernel.astype(jnp.float32), nfft)
    out = jnp.fft.irfft(sf * kf, nfft)[..., :n]
    if mode == "full":
        return out
    if mode == "same":
        start = (l - 1) // 2
        return out[..., start : start + t]
    if mode == "valid":
        return out[..., l - 1 : t]
    raise ValueError(f"unknown mode {mode!r}")


def convolve_fixed_receiver(source_audio: jax.Array, rirs: jax.Array) -> jax.Array:
    """Static source/receiver reverb: (T,) ⊛ (C, L) → (C, T).

    Parity: scipy fftconvolve 'full' truncated to T (SonicSim_moving.py:47-61).
    """
    return fft_convolve(source_audio[None, :], rirs, mode="full")[
        ..., : source_audio.shape[-1]
    ]


def convolve_moving_receiver(
    source_audio: jax.Array,
    rirs: jax.Array,
    interp_index: jax.Array,
    interp_weight: jax.Array,
) -> jax.Array:
    """Moving-source reverb, dense strategy (reference-exact semantics).

    Args:
      source_audio: (T,)
      rirs: (P, C, L) — one RIR per trajectory position.
      interp_index: (T,) int32 in [0, P-2], start position per sample.
      interp_weight: (T,) float32 in [0, 1).

    Returns (C, T). Parity: SonicSim_moving.py:63-96.
    """
    t = source_audio.shape[-1]
    conv = fft_convolve(source_audio[None, None, :], rirs)[..., :t]  # (P, C, T)
    conv_t = jnp.swapaxes(conv, 0, 2)  # (T, C, P)
    idx = interp_index[:, None, None]
    start = jnp.take_along_axis(conv_t, idx, axis=2)[..., 0]  # (T, C)
    end = jnp.take_along_axis(conv_t, idx + 1, axis=2)[..., 0]
    w = interp_weight[:, None]
    return ((1.0 - w) * start + w * end).T


def segment_plan(interp_index: np.ndarray) -> tuple[np.ndarray, np.ndarray, int]:
    """Host-side plan for the segmented strategy.

    Given the (sorted, contiguous) per-sample position indices, return
    per-segment (offsets, lengths, max_len) where segment p covers the output
    samples with interp_index == p.
    """
    idx = np.asarray(interp_index)
    n_seg = int(idx[-1]) + 1
    offsets = np.searchsorted(idx, np.arange(n_seg), side="left").astype(np.int32)
    ends = np.searchsorted(idx, np.arange(n_seg), side="right").astype(np.int32)
    lengths = ends - offsets
    return offsets, lengths, int(lengths.max())


def _take_windows_aligned(x: jax.Array, off_al: jax.Array, win: int) -> jax.Array:
    """Gather 128-aligned windows: x (N,) → (len(off_al), win).

    ``off_al`` must be multiples of 128 and ``win`` a multiple of 128.
    Implemented as a LANE-ROW gather (reshape to (N/128, 128) and take
    whole rows) instead of vmap(dynamic_slice): the TPU compiler lowers a
    batched dynamic_slice pathologically (measured 392 s compile for 80
    windows of a 1 M-sample buffer vs ~2 s for this gather — the old
    formulation dominated every generation executable's build time).
    """
    n_rows = win // 128
    pad = (-x.shape[-1]) % 128
    if pad:
        x = jnp.pad(x, (0, pad))
    lanes = x.reshape(-1, 128)
    idx = off_al[:, None] // 128 + jnp.arange(n_rows, dtype=jnp.int32)[None]
    return jnp.take(lanes, idx, axis=0).reshape(off_al.shape[0], win)


def _on_tpu() -> bool:
    """True only on TPU-like backends: the matmul-FFT trades O(N log N)
    for MXU-friendly dense work, a win on the systolic array but a large
    loss vs cuFFT on GPU — so GPU (and any other backend) stays on the
    native FFT path."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _fft_ctx(win: int, use_mxu_fft: bool | None):
    """(rfft, irfft) pair for one window size: MXU matmul-FFT grids on
    TPU, native FFT at next_fast_len elsewhere. Shared by both moving-conv
    strategies so their FFT dispatch cannot drift apart."""
    if use_mxu_fft is None:
        use_mxu_fft = _on_tpu()
    if use_mxu_fft:
        from .mxu_fft import irfft_grid, pick_split, rfft_grid

        n1, n2 = pick_split(win)
        return (
            lambda x: rfft_grid(x, n1, n2),
            lambda x: irfft_grid(x, n1, n2),
        )
    nfft = next_fast_len(win)
    return (
        lambda x: jnp.fft.rfft(x, nfft),
        lambda x: jnp.fft.irfft(x, nfft),
    )


def _ownership_combine(conv, off_true, off_al, interp_weight, span: int,
                       t: int):
    """Gather-based crossfade combine shared by both strategies (TPU-
    friendly: no scatter). Output sample t belongs to exactly one window
    own(t) = searchsorted(off_true, t) - 1; read its crossfaded value
    from that window's (start, end) conv pair via one flattened gather.

    conv: (N, 2, C, span); off_true/off_al: (N,) int32. Returns (C, T)."""
    n, _, c, _ = conv.shape
    tt = jnp.arange(t, dtype=jnp.int32)
    own = jnp.clip(jnp.searchsorted(off_true, tt, side="right") - 1, 0, n - 1)
    within = jnp.clip(tt - off_al[own], 0, span - 1)
    flat_idx = own * span + within  # (T,)
    conv_flat = jnp.swapaxes(conv, 0, 1).swapaxes(1, 2).reshape(
        2, c, n * span
    )
    start = conv_flat[0, :, flat_idx].T  # (C, T)
    end = conv_flat[1, :, flat_idx].T
    w = interp_weight.astype(jnp.float32)[None, :]
    return (1.0 - w) * start + w * end


def _fused_lerp_select(combined, off_true, off_al, t: int):
    """Ownership select over PRE-COMBINED, span-sliced windows → (C, T).

    ``combined`` is (N, C, span) with the crossfade already applied and
    sample q of window p at global time off_al[p] + q (the callers slice
    the irfft output at l-1); output sample t reads window own(t) at
    position t - off_al[own]. Half the gather traffic of
    _ownership_combine (one stream, no weight array). On TPU the
    segmented path prefers the Pallas select (pallas_kernels.
    select_segments) — this XLA gather measured ~3x slower end-to-end."""
    n, c, span = combined.shape
    tt = jnp.arange(t, dtype=jnp.int32)
    own = jnp.clip(jnp.searchsorted(off_true, tt, side="right") - 1, 0, n - 1)
    within = jnp.clip(tt - off_al[own], 0, span - 1)
    flat_idx = own * span + within  # (T,)
    return jnp.swapaxes(combined, 0, 1).reshape(c, n * span)[:, flat_idx]


def _window_ramp(off_true, off_al, lengths, span: int):
    """Per-window crossfade ramp W (N, span) over SLICED window coords
    (sample q ↔ global t = off_al + q): the interp weight is EXACTLY
    linear inside a segment (dynamic_interp_plan: linspace(0, 1, len,
    endpoint=False)), so w(q) = (q - lead)/len with lead = off_true -
    off_al — an elementwise expression XLA fuses into the irfft epilogue,
    which is what lets the whole gather+lerp combine collapse into a
    select."""
    u = jnp.arange(span, dtype=jnp.float32)[None, :]
    lead = (off_true - off_al).astype(jnp.float32)[:, None]
    inv_len = 1.0 / jnp.maximum(lengths.astype(jnp.float32), 1.0)[:, None]
    return (u - lead) * inv_len


def convolve_moving_segmented(
    source_audio: jax.Array,
    rirs: jax.Array,
    interp_weight: jax.Array,
    offsets: jax.Array,
    lengths: jax.Array,
    max_seg: int,
    use_pallas: bool = False,
    use_mxu_fft: bool | None = None,
    fused_epilogue: bool = True,
) -> jax.Array:
    """Moving-source reverb, segmented strategy.

    Output samples in segment p (span [offsets[p], offsets[p]+lengths[p]))
    depend only on rir_p and rir_{p+1} convolved with the last L-1+span input
    samples, so we convolve per-segment windows instead of the full signal.

    Args:
      source_audio: (T,)
      rirs: (P, C, L)
      interp_weight: (T,)
      offsets/lengths: (P-1,) int32 from ``segment_plan`` (static-shape arrays)
      max_seg: static max segment length.
      use_mxu_fft: run the FFTs as matmuls on the systolic array
        (ops/mxu_fft.py) — ~2.5x faster than XLA's VPU FFT on TPU; default
        auto-enables on TPU backends and stays off on CPU.

    Returns (C, T), numerically ≈ the dense strategy (same math, different
    FFT partitioning).
    """
    t = source_audio.shape[-1]
    p, c, l = rirs.shape
    n_seg = p - 1
    # Segment windows start at 128-aligned origins (off_al <= off): the
    # Pallas combine slices VMEM at lane granularity, and the extra <=127
    # lead samples cost nothing. Ownership still uses the true offsets.
    offsets_al = offsets - offsets % 128
    max_seg = max_seg + 128
    win = -(-(max_seg + l - 1) // 128) * 128  # lane multiple (row gather)

    # Window the input: segment p needs x[off_al_p - (L-1) : off_al_p + max_seg).
    xpad = jnp.pad(source_audio.astype(jnp.float32), (l - 1, win))
    windows = _take_windows_aligned(xpad, offsets_al, win)  # (n_seg, win)

    # Convolve each window against its start & end RIRs. Each interior RIR
    # serves as both an end (segment p-1) and a start (segment p) kernel, so
    # FFT every RIR exactly once and gather the adjacent pairs in frequency
    # domain — ~2x fewer kernel FFTs than FFTing stacked pairs.
    #
    # Overlap-save: only outputs [l-1, l-1+max_seg) of each window's
    # convolution are consumed, and circular convolution at nfft >= win is
    # EXACT there (wraparound only corrupts samples < l-1) — so nfft needs
    # to cover the window, not the full linear length win+l-1. This halves
    # the padding waste of every rfft/product/irfft in the hot loop.
    rfft, irfft = _fft_ctx(win, use_mxu_fft)
    sf = rfft(windows)  # (n_seg, ...)
    kf = rfft(rirs.astype(jnp.float32))  # (P, C, ...)

    if fused_epilogue and not use_pallas:
        # Crossfade folded into the irfft epilogue: with d = end − start
        # kernels, out = conv_start + w·conv_d and w is LINEAR inside a
        # segment (_window_ramp) — so the combine is elementwise on the
        # two irfft outputs and fuses into their final matmul, instead of
        # materializing an (N, 2, C, span) conv tensor and gathering
        # start/end pairs per output sample. Halves the combine-side HBM
        # traffic of the hot loop (the reference's per-sample lerp over
        # fully materialized position renders, SonicSim_moving.py:63-96).
        ds = kf[1:] - kf[:-1]  # (n_seg, C, ...)
        sl = slice(l - 1, l - 1 + max_seg)
        mxu = use_mxu_fft if use_mxu_fft is not None else _on_tpu()
        if mxu:
            # Single-matmul epilogue: the linear ramp rides INSIDE the
            # final irfft contraction (mxu_fft.irfft_grid_lerp), so the
            # only materialized time-domain tensor is the combined
            # render — xr_start / xr_d never exist separately.
            from .mxu_fft import irfft_grid_lerp, pick_split

            n1, n2 = pick_split(win)
            lead = (offsets - offsets_al).astype(jnp.float32)
            inv_len = 1.0 / jnp.maximum(
                lengths.astype(jnp.float32), 1.0
            )
            alpha = (-(l - 1) - lead) * inv_len  # w(u) = α + β·u
            beta = inv_len
            combined = irfft_grid_lerp(
                sf[:, None] * kf[:-1], sf[:, None] * ds,
                alpha[:, None], beta[:, None], n1, n2,
            )[..., sl]
        else:
            conv_s = irfft(sf[:, None] * kf[:-1])  # (n_seg, C, NF)
            conv_d = irfft(sf[:, None] * ds)
            ramp = _window_ramp(offsets, offsets_al, lengths, max_seg)
            combined = (
                conv_s[..., sl] + ramp[:, None, :] * conv_d[..., sl]
            )
        # Final ownership select: Pallas block-select on TPU (contiguous
        # VMEM slices; valid when every segment spans >= its BLOCK), XLA
        # gather elsewhere.
        if _on_tpu() and not isinstance(lengths, jax.core.Tracer):
            from .pallas_kernels import BLOCK, select_segments

            lv = np.asarray(lengths)
            if lv.size == 0 or int(lv.min()) >= BLOCK:
                return select_segments(
                    combined, offsets.astype(jnp.int32),
                    offsets_al.astype(jnp.int32), t,
                )
        return _fused_lerp_select(combined, offsets, offsets_al, t)

    # Adjacent kernel pairs as contiguous slices (NOT a gather: the
    # segmented path is the bench-critical one).
    pair = jnp.stack([kf[:-1], kf[1:]], axis=1)  # (n_seg, 2, C, ...)
    prod = (sf[:, None, None] if sf.ndim == 3 else sf[:, None, None, :]) * pair
    conv = irfft(prod)  # (n_seg, 2, C, nfft)
    # Sample s of segment p sits at position (L-1) + s of the full conv.
    conv = conv[..., l - 1 : l - 1 + max_seg]  # (n_seg, 2, C, max_seg)

    if use_pallas:
        from .pallas_kernels import BLOCK, crossfade_combine

        # The Pallas kernel blends at most the 2 segments (s0, s0+1) a
        # grid block can touch — valid only when every segment is at
        # least BLOCK long. Enforce when lengths are concrete (host
        # call); silently-wrong audio otherwise. Traced lengths keep the
        # caller's contract.
        if not isinstance(lengths, jax.core.Tracer):
            lv = np.asarray(lengths)
            if lv.size and int(lv.min()) < BLOCK:
                use_pallas = False
        if use_pallas:
            return crossfade_combine(
                conv, offsets.astype(jnp.int32), offsets_al.astype(jnp.int32),
                interp_weight.astype(jnp.float32), t,
            )

    return _ownership_combine(
        conv, offsets, offsets_al, interp_weight, max_seg, t
    )


def block_plan_sizes(max_seg: int, t: int, n_seg: int) -> tuple[int, int]:
    """One source of truth for the blocked-conv compiled shape.

    ``block`` is the longest segment rounded up to an 8192-sample quantum,
    capped at 16384; ``nb`` covers ``t`` plus one boundary block per
    segment, rounded up to a multiple of 16. Both callers
    (dataset/assemble.py and parallel/pipeline.py) must agree or the
    shared executable cache and moving_block_plan's capacity check
    desynchronize.
    """
    block = min(16384, -(-int(max_seg) // 8192) * 8192)
    nb = -(-int(t) // block) + int(n_seg)
    nb = -(-nb // 16) * 16
    return block, nb


def moving_block_plan(
    offsets: np.ndarray,
    lengths: np.ndarray,
    t: int,
    block: int,
    n_blocks: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Chop a segment plan into fixed-size blocks (host side).

    Trajectory segments are ragged — a slow-moving source can own most of
    the mixture in ONE segment, which made the segmented conv's window (and
    the matmul-FFT's O(n1²) tables) scale with the longest segment: the
    60 s production render compiled to a 273 MB executable. Blocks bound
    the window at ``block`` samples regardless of raggedness, so every
    mixture shares one small compiled shape.

    Returns (block_off, block_seg), each (n_blocks,) int32: the true start
    sample of each block and the segment (RIR-pair index) it belongs to.
    Unused trailing blocks are inert: off == t never owns an output sample
    (ownership is searchsorted(block_off, t, 'right') - 1 over t < t).
    """
    offs: list[int] = []
    segs: list[int] = []
    for s, (o, le) in enumerate(zip(offsets.tolist(), lengths.tolist())):
        k = 0
        while k < le:
            offs.append(o + k)
            segs.append(s)
            k += block
    if len(offs) > n_blocks:
        raise ValueError(
            f"plan needs {len(offs)} blocks > n_blocks={n_blocks}"
        )
    pad = n_blocks - len(offs)
    last_seg = max(len(offsets) - 2, 0)
    offs += [t] * pad
    segs += [last_seg] * pad
    return np.asarray(offs, np.int32), np.asarray(segs, np.int32)


def convolve_moving_blocked(
    source_audio: jax.Array,
    rirs: jax.Array,
    interp_weight: jax.Array | None,
    block_off: jax.Array,
    block_seg: jax.Array,
    block: int,
    use_mxu_fft: bool | None = None,
    seg_offsets: jax.Array | None = None,
    seg_lengths: jax.Array | None = None,
    w_scale: jax.Array | float | None = None,
) -> jax.Array:
    """Moving-source reverb over a fixed-size block plan.

    Same math as :func:`convolve_moving_segmented` (output sample t is the
    crossfade of x ⊛ rir_{seg(t)} and x ⊛ rir_{seg(t)+1} at t), but the
    per-window span is the static ``block`` instead of the longest segment,
    so FFT sizes — and the MXU matmul-FFT's constant tables — are bounded
    by the block, not the trajectory raggedness.

    Args:
      source_audio: (T,)
      rirs: (P, C, L)
      interp_weight: (T,) — legacy combine only; pass the segment tables
        below instead (fused epilogue) and this may be None.
      block_off/block_seg: (NB,) int32 from ``moving_block_plan``.
      block: static block span in samples.
      seg_offsets/seg_lengths: (P-1,) segment table — enables the FUSED
        crossfade epilogue: the weight is linear within a segment
        ((t − seg_off)/seg_len, dynamic_interp_plan), so the combine is
        an elementwise ramp on two irfft outputs that XLA fuses into
        their final matmuls; no (NB, 2, C, span) conv materialization,
        no per-sample (T,) weight array at all, half the gather traffic.
      w_scale: scalar ramp gain (the degenerate-trajectory mask rows of
        parallel/pipeline._weights_from_segments).

    Returns (C, T).
    """
    t = source_audio.shape[-1]
    l = rirs.shape[-1]
    # 128-aligned window origins (lane granularity); ownership uses the
    # true offsets, the <=127 lead samples are just extra context. win is
    # rounded up to a lane multiple for the row gather — the extra tail
    # samples only wrap into the discarded [0, l-1) prefix (nfft >= win).
    off_al = block_off - block_off % 128
    span = block + 128
    win = -(-(span + l - 1) // 128) * 128

    xpad = jnp.pad(source_audio.astype(jnp.float32), (l - 1, win))
    windows = _take_windows_aligned(xpad, off_al, win)  # (NB, win)

    # FFT every RIR once; each block gathers its segment's (start, end)
    # kernel pair in the frequency domain. Overlap-save: only outputs
    # [l-1, l-1+span) are consumed, where circular conv at nfft >= win is
    # exact.
    rfft, irfft = _fft_ctx(win, use_mxu_fft)
    sf = rfft(windows)  # (NB, ...)
    kf = rfft(rirs.astype(jnp.float32))  # (P, C, ...)

    if seg_offsets is not None:
        ks = jnp.take(kf, block_seg, axis=0)  # (NB, C, ...)
        kd = jnp.take(kf, block_seg + 1, axis=0) - ks
        so = jnp.take(seg_offsets, block_seg)
        inv_len = 1.0 / jnp.maximum(
            jnp.take(seg_lengths, block_seg), 1
        ).astype(jnp.float32)
        if w_scale is not None:
            inv_len = inv_len * w_scale
        sl = slice(l - 1, l - 1 + span)
        mxu = use_mxu_fft if use_mxu_fft is not None else _on_tpu()
        if mxu:
            from .mxu_fft import irfft_grid_lerp, pick_split

            n1, n2 = pick_split(win)
            # w(u) = (off_al + u − (l−1) − seg_off)/seg_len over FULL
            # irfft coords u (see the segmented path).
            alpha = (
                (off_al - so).astype(jnp.float32) - (l - 1)
            ) * inv_len
            combined = irfft_grid_lerp(
                sf[:, None] * ks, sf[:, None] * kd,
                alpha[:, None], inv_len[:, None], n1, n2,
            )[..., sl]
        else:
            conv_s = irfft(sf[:, None] * ks)  # (NB, C, NF)
            conv_d = irfft(sf[:, None] * kd)
            # Ramp over SLICED window coords (sample q ↔ t = off_al + q).
            u = jnp.arange(span, dtype=jnp.float32)[None, :]
            ramp = (
                (off_al - so).astype(jnp.float32)[:, None] + u
            ) * inv_len[:, None]
            combined = (
                conv_s[..., sl] + ramp[:, None, :] * conv_d[..., sl]
            )
        return _fused_lerp_select(combined, block_off, off_al, t)

    pair = jnp.stack(
        [jnp.take(kf, block_seg, axis=0), jnp.take(kf, block_seg + 1, axis=0)],
        axis=1,
    )  # (NB, 2, C, ...)
    prod = (sf[:, None, None] if sf.ndim == 3 else sf[:, None, None, :]) * pair
    conv = irfft(prod)[..., l - 1 : l - 1 + span]  # (NB, 2, C, span)

    return _ownership_combine(
        conv, block_off, off_al, interp_weight, span, t
    )


def overlap_add_chunks(chunks: jax.Array, hop: int, total_len: int) -> jax.Array:
    """Overlap-add of (N, ..., W) windows at stride ``hop`` → (..., total_len)."""
    n, *mid, w = chunks.shape
    out = jnp.zeros((*mid, total_len + w), chunks.dtype)
    for i in range(n):  # unrolled: n is static and small
        out = jax.lax.dynamic_update_slice(
            out,
            jax.lax.dynamic_slice(out, (0,) * len(mid) + (i * hop,), (*mid, w))
            + chunks[i],
            (0,) * len(mid) + (i * hop,),
        )
    return out[..., :total_len]
