"""Pallas TPU kernels for the hot DSP epilogues.

``crossfade_combine``: the moving-source convolution's final stage — blend
each trajectory segment's (start, end) convolution pair with per-sample
weights and lay the segments on the output timeline. The XLA formulation is
a per-sample gather over a ~100 MB tensor (searchsorted + advanced
indexing), which dominates the render; here the grid walks aligned output
blocks, scalar-prefetched per-block segment indices steer the BlockSpec
index maps to the (at most two) segments a block touches, and the kernel
assembles each block from two *contiguous* lane-aligned VMEM dynamic
slices + a select — no gathers, no scatters.

Alignment contract: segment conv windows are computed from 128-aligned
origins (``aligned_offsets``, see fftconv.convolve_moving_segmented) so
every in-kernel slice start is a lane multiple; sample ownership uses the
true ``offsets``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 8192  # output samples per grid step; must stay < min segment length


def _combine_kernel(off_ref, offal_ref, bseg_ref, conv0_ref, conv1_ref, w_ref, out_ref):
    b = pl.program_id(0)
    base = b * BLOCK
    s0 = bseg_ref[b]
    n_seg = off_ref.shape[0] - 1  # last entry is a sentinel (> T)
    s1 = jnp.minimum(s0 + 1, n_seg - 1)
    next_start = off_ref[s0 + 1]  # sentinel covers the last segment

    w = w_ref[:]  # (BLOCK,)
    # conv refs are left-padded by BLOCK on the time axis, so slice starts
    # stay non-negative; all quantities are multiples of 128.
    d0 = base - offal_ref[s0] + BLOCK
    d1 = base - offal_ref[s1] + BLOCK

    def blend(ref, d):
        d = pl.multiple_of(d, 128)
        start = ref[0, 0, :, pl.ds(d, BLOCK)]  # (C, BLOCK)
        end = ref[0, 1, :, pl.ds(d, BLOCK)]
        return (1.0 - w)[None, :] * start + w[None, :] * end

    val0 = blend(conv0_ref, d0)
    val1 = blend(conv1_ref, d1)
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, BLOCK), 1) + base
    out_ref[:, :] = jnp.where(idx < next_start, val0, val1)


@partial(jax.jit, static_argnames=("t", "interpret"))
def crossfade_combine(
    conv: jax.Array,  # (n_seg, 2, C, max_seg)
    offsets: jax.Array,  # (n_seg,) int32 true ascending segment starts
    aligned_offsets: jax.Array,  # (n_seg,) int32 128-aligned window origins
    weights: jax.Array,  # (T,) crossfade weight per output sample
    t: int,
    interpret: bool = False,
) -> jax.Array:
    """→ (C, T): out[:, s] = blend of conv[seg(s)] at s - aligned_off[seg]."""
    n_seg, _, c, max_seg = conv.shape
    nb = -(-t // BLOCK)
    t_pad = nb * BLOCK

    conv_p = jnp.pad(
        conv.astype(jnp.float32), ((0, 0), (0, 0), (0, 0), (BLOCK, 2 * BLOCK))
    )
    w_pad = jnp.pad(weights.astype(jnp.float32), (0, t_pad - t))

    block_starts = jnp.arange(nb, dtype=jnp.int32) * BLOCK
    bseg = jnp.clip(
        jnp.searchsorted(offsets, block_starts, side="right") - 1, 0, n_seg - 1
    ).astype(jnp.int32)
    off_sent = jnp.concatenate(
        [offsets.astype(jnp.int32), jnp.asarray([t_pad + 1], jnp.int32)]
    )

    time_pad = conv_p.shape[-1]
    out = pl.pallas_call(
        _combine_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(
                    (1, 2, c, time_pad),
                    lambda b, off, offal, bs: (bs[b], 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 2, c, time_pad),
                    lambda b, off, offal, bs: (
                        jnp.minimum(bs[b] + 1, offal.shape[0] - 1),
                        0,
                        0,
                        0,
                    ),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (BLOCK,), lambda b, off, offal, bs: (b,),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (c, BLOCK), lambda b, off, offal, bs: (0, b),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((c, t_pad), jnp.float32),
        interpret=interpret,
    )(off_sent, aligned_offsets.astype(jnp.int32), bseg, conv_p, conv_p, w_pad)
    return out[:, :t]


def _select_kernel(off_ref, offal_ref, bseg_ref, conv0_ref, conv1_ref,
                   out_ref):
    b = pl.program_id(0)
    base = b * BLOCK
    s0 = bseg_ref[b]
    n_seg = off_ref.shape[0] - 1  # last entry is a sentinel (> T)
    s1 = jnp.minimum(s0 + 1, n_seg - 1)
    next_start = off_ref[s0 + 1]

    d0 = pl.multiple_of(base - offal_ref[s0] + BLOCK, 128)
    d1 = pl.multiple_of(base - offal_ref[s1] + BLOCK, 128)
    val0 = conv0_ref[0, :, pl.ds(d0, BLOCK)]  # (C, BLOCK)
    val1 = conv1_ref[0, :, pl.ds(d1, BLOCK)]
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, BLOCK), 1) + base
    out_ref[:, :] = jnp.where(idx < next_start, val0, val1)


@partial(jax.jit, static_argnames=("t", "interpret"))
def select_segments(
    combined: jax.Array,  # (n_seg, C, span) PRE-COMBINED window renders
    offsets: jax.Array,  # (n_seg,) int32 true ascending segment starts
    aligned_offsets: jax.Array,  # (n_seg,) int32 128-aligned window origins
    t: int,
    interpret: bool = False,
) -> jax.Array:
    """→ (C, T): out[:, s] = combined[seg(s), :, s - aligned_off[seg]].

    The ownership SELECT for the fused-epilogue moving conv: the
    crossfade already happened upstream (elementwise ramp folded into the
    irfft — fftconv.convolve_moving_segmented), so this is
    crossfade_combine minus the lerp: per output block, two contiguous
    lane-aligned VMEM slices and a select. The plain-XLA formulation is a
    per-sample gather, which measured ~3x slower end-to-end on the
    12-source bench workload.
    """
    n_seg, c, span = combined.shape
    nb = -(-t // BLOCK)
    t_pad = nb * BLOCK

    conv_p = jnp.pad(
        combined.astype(jnp.float32), ((0, 0), (0, 0), (BLOCK, 2 * BLOCK))
    )
    block_starts = jnp.arange(nb, dtype=jnp.int32) * BLOCK
    bseg = jnp.clip(
        jnp.searchsorted(offsets, block_starts, side="right") - 1, 0, n_seg - 1
    ).astype(jnp.int32)
    off_sent = jnp.concatenate(
        [offsets.astype(jnp.int32), jnp.asarray([t_pad + 1], jnp.int32)]
    )

    time_pad = conv_p.shape[-1]
    out = pl.pallas_call(
        _select_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(
                    (1, c, time_pad),
                    lambda b, off, offal, bs: (bs[b], 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, c, time_pad),
                    lambda b, off, offal, bs: (
                        jnp.minimum(bs[b] + 1, offal.shape[0] - 1),
                        0,
                        0,
                    ),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (c, BLOCK), lambda b, off, offal, bs: (0, b),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((c, t_pad), jnp.float32),
        interpret=interpret,
    )(off_sent, aligned_offsets.astype(jnp.int32), bseg, conv_p, conv_p)
    return out[:, :t]
