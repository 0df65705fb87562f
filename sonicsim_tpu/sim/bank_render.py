"""Batched RIR-bank rendering: all (source, receiver, channel) items at once.

This replaces the reference's process-pool fan-out (render_rir_parallel,
SonicSim_rir.py:724-791 — one habitat Simulator per task, mp.Pool(cpu_count))
with the TPU-native split:

* geometry: ONE threaded native call enumerates image sources for every
  (pair, channel) item (``native.image_sources_batch``), padded to a static
  cap so shapes are XLA-friendly;
* assembly: ONE jitted dispatch over the flattened item axis
  (``lax.map`` per item inside). With uniform per-wall absorption the
  per-band amplitude factorizes as ``amp[n, b] = g_n * beta_b ** hits_n``
  — so windowed-sinc taps are scattered once into *hit-class*
  accumulators (one 25-wide row payload per image: TPU scatter cost is
  per index row) and the per-band expansion becomes a small
  ``(bands, classes) @ (classes, time)`` matmul (MXU work, ~n_bands×
  less scatter traffic than per-band impulse trains).

Output is numerically equivalent to looping ``SyntheticRirOracle.render``
over pairs (same native geometry, same per-pair tail RNG streams), verified
by tests/test_bank_render.py. The item axis is the mesh-shardable axis for
multi-chip generation fan-out.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import native
from .channels import ChannelModel
from .image_source import (
    SINC_HALF,
    SPEED_OF_SOUND,
    ShoeboxRoom,
    band_masks,
    image_sources,
)

_CHUNK = 32  # item-axis padding quantum: bounds distinct compiled shapes


@partial(
    jax.jit,
    static_argnames=("sample_rate", "ir_len", "nfft", "n_classes"),
)
def _assemble_items(
    delays_s,  # (P, N) float32 seconds (0 beyond count)
    hits,  # (P, N) int32 total wall reflections
    g,  # (P, N) float32 directional_gain / (4 pi d), 0 beyond count
    valid,  # (P, N) bool
    noise_keys,  # (P,) typed PRNG keys — tail noise generated ON DEVICE
    beta,  # (n_bands,) float32 per-band wall reflection coefficient
    masks,  # (n_bands, nfft//2+1) float32 filterbank partition
    rt60_bands,  # (n_bands,) float32 Eyring RT60 per band
    sample_rate: int,
    ir_len: int,
    nfft: int,
    n_classes: int,
):
    """(P items) → (P, ir_len) float32 RIRs. See module docstring.

    TPU scatter cost is per index ROW, so the sinc taps are scattered as
    one 25-wide row payload per image into a (classes, pad, taps)
    accumulator — 25× fewer scatter rows than per-(tap, image) scalars —
    and recombined with static shifted slices (fused adds, no extra
    scatter). Items run sequentially under ``lax.map``: the per-item
    scatter does not vectorize profitably and the map keeps the live
    accumulator at one item (~18 MB) instead of the whole batch.
    """
    taps = jnp.arange(-SINC_HALF, SINC_HALF + 1, dtype=jnp.float32)
    n_taps = 2 * SINC_HALF + 1
    pad = ir_len + 2 * SINC_HALF + 2
    # (n_bands, n_classes): band profile of each total-hit-count class.
    band_profile = beta[:, None] ** jnp.arange(n_classes, dtype=jnp.float32)[None, :]

    n_bands = beta.shape[0]

    def scatter_one(args):
        """Impulse-train accumulation for ONE item → (n_classes, ir_len)."""
        delays_si, hits_i, g_i = args
        delays = delays_si * sample_rate  # float samples
        base = jnp.floor(delays)
        frac = delays - base
        t = taps[None, :] - frac[:, None]  # (N, taps)
        window = 0.5 + 0.5 * jnp.cos(jnp.pi * t / (SINC_HALF + 1))
        kern = jnp.sinc(t) * window * g_i[:, None]  # (N, taps)
        # Row-payload scatter: image n's 25 taps land in
        # acc3[cls_n, base_n + SINC_HALF, :]; tap slot t belongs at time
        # sample (base_n + t - SINC_HALF), recovered by the shifted
        # static slices below. base + SINC_HALF < pad by construction
        # (native enumeration filters delays to <= ir_seconds).
        cls = jnp.clip(hits_i, 0, n_classes - 1)
        row = base.astype(jnp.int32) + SINC_HALF
        acc3 = jnp.zeros((n_classes, pad, n_taps), jnp.float32)
        acc3 = acc3.at[cls, row, :].add(kern)
        acc = acc3[:, 2 * SINC_HALF : 2 * SINC_HALF + ir_len, 0]
        for tap in range(1, n_taps):
            acc = acc + acc3[
                :, 2 * SINC_HALF - tap : 2 * SINC_HALF - tap + ir_len, tap
            ]
        return acc

    # Sequential scatters (one live ~18 MB accumulator at a time), then
    # everything downstream batched over the whole item axis so the FFTs
    # amortize (per-item FFT batches are far below TPU efficiency).
    accs = jax.lax.map(scatter_one, (delays_s, hits, g))  # (P, C, ir_len)
    trains = jnp.einsum("bc,pct->pbt", band_profile, accs)
    spec = jnp.fft.rfft(trains, nfft, axis=-1) * masks[None]
    early = jnp.fft.irfft(spec.sum(axis=1), nfft, axis=-1)[:, :ir_len]

    # Late tail: per-band Eyring decay, level matched to the mixing-zone
    # image energy (parity with render_shoebox_rir_multiband).
    cls_b = jnp.clip(hits, 0, n_classes - 1)  # (P, N)
    big = jnp.float32(1e30)
    t_direct = jnp.min(jnp.where(valid, delays_s, big), axis=1)
    t_direct = jnp.where(jnp.any(valid, axis=1), t_direct, 0.0)  # (P,)
    mix_sel = (
        valid
        & (delays_s > t_direct[:, None] + 0.03)
        & (delays_s < t_direct[:, None] + 0.08)
    )
    cls_sum = jax.vmap(
        lambda sel, g_i, c: jax.ops.segment_sum(
            jnp.where(sel, g_i * g_i, 0.0), c, num_segments=n_classes
        )
    )(mix_sel, g, cls_b)  # (P, n_classes)
    k = jnp.sum(mix_sel, axis=1)  # (P,)
    level_sel = jnp.sqrt(
        cls_sum @ (band_profile**2).T / jnp.maximum(k, 1)[:, None]
    )  # (P, n_bands)
    # segment_max yields -inf for empty classes; |g| >= 0 so clamp to 0.
    cls_max = jnp.maximum(
        jax.vmap(
            lambda v, g_i, c: jax.ops.segment_max(
                jnp.where(v, jnp.abs(g_i), 0.0), c, num_segments=n_classes
            )
        )(valid, g, cls_b),
        0.0,
    )  # (P, n_classes)
    level_fb = (
        jnp.max(band_profile[None] * cls_max[:, None, :], axis=2) * 0.05
    )  # (P, n_bands)
    level = jnp.where((k > 0)[:, None], level_sel, level_fb)

    noise = jax.vmap(
        lambda key: jax.random.normal(key, (n_bands, ir_len), jnp.float32)
    )(noise_keys)  # (P, n_bands, ir_len)
    t_axis = jnp.arange(ir_len, dtype=jnp.float32) / sample_rate
    decay = jnp.exp(
        -6.908
        * jnp.maximum(t_axis[None, None, :] - t_direct[:, None, None], 0.0)
        / rt60_bands[None, :, None]
    )
    ramp = (
        jnp.clip(
            (t_axis[None, :] - t_direct[:, None]) / 0.02, 0.0, 1.0
        )
        ** 2
    )  # (P, ir_len)
    shaped = noise * (level[:, :, None] * decay * ramp[:, None, :])
    tail_spec = jnp.fft.rfft(shaped, nfft, axis=-1) * masks[None]
    tail = jnp.fft.irfft(tail_spec.sum(axis=1), nfft, axis=-1)[:, :ir_len]
    return early + tail


def _enumerate_fallback(room, srcs, recvs, max_order, max_delay_s):
    """Pure-NumPy per-pair enumeration when the native library is absent."""
    cap = 8 * (2 * max_order + 1) ** 3
    n = len(srcs)
    delays = np.zeros((n, cap), np.float64)
    hits_out = np.zeros((n, cap), np.uint8)
    dirs_out = np.zeros((n, cap, 3), np.float32)
    counts = np.zeros(n, np.int32)
    for p in range(n):
        imgs, hits = image_sources(room, srcs[p], max_order)
        diff = imgs - recvs[p][None, :]
        dist = np.linalg.norm(diff, axis=1)
        keep = (dist / SPEED_OF_SOUND <= max_delay_s) & (dist >= 1e-6)
        k = int(keep.sum())
        d = dist[keep]
        delays[p, :k] = d / SPEED_OF_SOUND
        hits_out[p, :k] = np.minimum(hits[keep], 255)
        dirs_out[p, :k] = (diff[keep] / d[:, None]).astype(np.float32)
        counts[p] = k
    return delays, hits_out, dirs_out, counts


def render_bank_batched(
    oracle,
    source_positions: list[np.ndarray],
    receiver_positions: list[np.ndarray],
    channel: ChannelModel,
    receiver_rotations: list[float] | None = None,
    peak_normalize: bool = True,
) -> np.ndarray:
    """All-pairs bank (S, R, C, L) via the batched multiband renderer.

    Matches ``render_rir_bank``'s serial loop over
    ``SyntheticRirOracle.render`` (multiband path) numerically: identical
    native geometry, identical per-pair tail RNG streams.
    """
    room: ShoeboxRoom = oracle.room
    n_bands = oracle.n_bands
    sample_rate = oracle.sample_rate
    max_order = oracle.max_order
    rotations = receiver_rotations or [90.0] * len(receiver_positions)

    band_absorption = np.asarray(room.band_absorption(n_bands), np.float64)
    rt60_bands = 0.161 * room.volume / np.maximum(
        -room.surface * np.log(np.maximum(1.0 - band_absorption, 1e-4)), 1e-6
    )
    ir_seconds = oracle.ir_seconds
    if ir_seconds is None:
        ir_seconds = min(max(float(rt60_bands.max()) * 1.1, 0.25), 2.0)
    ir_len = int(ir_seconds * sample_rate)
    nfft = int(2 ** np.ceil(np.log2(ir_len + 2 * SINC_HALF + 2)))
    beta = np.sqrt(np.maximum(1.0 - band_absorption, 1e-4))
    n_classes = 6 * max_order + 4  # max total hits = 3*(2*max_order+1)

    n_src, n_recv, n_ch = len(source_positions), len(receiver_positions), channel.count

    # ---- flatten (s, r, c) items -------------------------------------------
    srcs_flat, recvs_flat = [], []
    for s in range(n_src):
        for r in range(n_recv):
            offsets = channel.receiver_offsets(rotations[r])  # (C, 3)
            rcv = np.asarray(receiver_positions[r], np.float64)
            for c in range(n_ch):
                srcs_flat.append(np.asarray(source_positions[s], np.float64))
                recvs_flat.append(rcv + offsets[c])
    srcs_flat = np.stack(srcs_flat)
    recvs_flat = np.stack(recvs_flat)
    n_items = len(srcs_flat)

    # ---- geometry: one threaded native call --------------------------------
    enum = native.image_sources_batch(
        np.asarray(room.dims, np.float64),
        srcs_flat,
        recvs_flat,
        max_order,
        ir_seconds,
    )
    if enum is None:
        enum = _enumerate_fallback(
            room, srcs_flat, recvs_flat, max_order, ir_seconds
        )
    delays, hits, dirs, counts = enum
    cap = delays.shape[1]
    valid = np.arange(cap)[None, :] < counts[:, None]

    # ---- host side: directional gains + per-pair tail noise ----------------
    g = np.zeros((n_items, cap), np.float32)
    item = 0
    for s in range(n_src):
        for r in range(n_recv):
            rows = slice(item, item + n_ch)
            flat_dirs = dirs[rows].reshape(-1, 3)
            gains_full = channel.directional_gain(
                flat_dirs, rotations[r]
            ).reshape(n_ch, cap, channel.count)
            for c in range(n_ch):
                g[item + c] = gains_full[c, :, c]
            item += n_ch
    with np.errstate(divide="ignore"):
        inv = 1.0 / (4.0 * np.pi * delays * SPEED_OF_SOUND)
    g = np.where(valid, g * np.where(valid, inv, 0.0), 0.0).astype(np.float32)

    # Tail-noise keys: same (pair seed, channel) streams as
    # SyntheticRirOracle.render (image_source.tail_noise) — the noise itself
    # is generated on device inside _assemble_items, so nothing crosses the
    # (slow, remote-tunnel) host->device link.
    seeds = np.empty(n_items, np.int64)
    chans = np.empty(n_items, np.int32)
    item = 0
    for s in range(n_src):
        for r in range(n_recv):
            pair = np.concatenate(
                [
                    np.ravel(source_positions[s]),
                    np.ravel(receiver_positions[r]),
                ]
            )
            seed = int(
                np.uint32(oracle.seed)
                + np.uint32(abs(hash(tuple(np.round(pair, 4).tolist()))) % (2**31))
            )
            for c in range(n_ch):
                seeds[item] = seed
                chans[item] = c
                item += 1
    from .image_source import tail_noise_key

    noise_keys = jax.vmap(tail_noise_key)(
        jnp.asarray(seeds, jnp.uint32), jnp.asarray(chans)
    )

    # ---- device side: ONE jitted dispatch over the padded item axis --------
    # (items padded to a _CHUNK multiple so distinct bank sizes reuse a
    # small set of compiled shapes; padded outputs are discarded below)
    masks = jnp.asarray(band_masks(n_bands, nfft, sample_rate))
    beta_j = jnp.asarray(beta, jnp.float32)
    rt60_j = jnp.asarray(rt60_bands, jnp.float32)
    padn = (-n_items) % _CHUNK

    def padded(a):
        if padn:
            a = np.concatenate([a, np.zeros((padn,) + a.shape[1:], a.dtype)])
        return jnp.asarray(a)

    keys_all = noise_keys
    if padn:  # pad with repeats; padded outputs are discarded below
        keys_all = jnp.concatenate(
            [keys_all, jnp.repeat(noise_keys[:1], padn, axis=0)]
        )
    out = _assemble_items(
        padded(delays.astype(np.float32)),
        padded(hits.astype(np.int32)),
        padded(g),
        padded(valid),
        keys_all,
        beta_j,
        masks,
        rt60_j,
        sample_rate,
        ir_len,
        nfft,
        n_classes,
    )
    bank = np.asarray(out)[:n_items].reshape(n_src, n_recv, n_ch, ir_len)
    if peak_normalize:
        peak = np.abs(bank).max()
        if peak > 0:
            bank = bank / peak
    return bank
