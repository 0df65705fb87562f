"""Batched RIR-bank rendering: all (source, receiver, channel) items at once.

This replaces the reference's process-pool fan-out (render_rir_parallel,
SonicSim_rir.py:724-791 — one habitat Simulator per task, mp.Pool(cpu_count))
with the TPU-native split:

* geometry: ONE threaded native call enumerates image sources for every
  (pair, channel) item (``native.image_sources_batch``), padded to a static
  cap so shapes are XLA-friendly;
* assembly: ONE jitted computation over the flattened item axis. With
  uniform per-wall absorption the per-band amplitude factorizes as
  ``amp[n, b] = g_n * beta_b ** hits_n`` — so windowed-sinc taps are
  scattered once into *hit-class* accumulators and the per-band expansion
  becomes a small ``(bands, classes) @ (classes, time)`` matmul (MXU work,
  ~n_bands× less scatter traffic than per-band impulse trains).

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

_CHUNK = 32  # items per jitted vmap call: bounds the (chunk, cap, taps) kern


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
    """(P items) → (P, ir_len) float32 RIRs. See module docstring."""
    taps = jnp.arange(-SINC_HALF, SINC_HALF + 1, dtype=jnp.float32)
    pad = ir_len + 2 * SINC_HALF + 2
    # (n_bands, n_classes): band profile of each total-hit-count class.
    band_profile = beta[:, None] ** jnp.arange(n_classes, dtype=jnp.float32)[None, :]

    n_bands = beta.shape[0]

    def one(delays_si, hits_i, g_i, valid_i, key_i):
        noise_i = jax.random.normal(key_i, (n_bands, ir_len), jnp.float32)
        delays = delays_si * sample_rate  # float samples
        base = jnp.floor(delays)
        frac = delays - base
        t = taps[None, :] - frac[:, None]  # (N, taps)
        window = 0.5 + 0.5 * jnp.cos(jnp.pi * t / (SINC_HALF + 1))
        kern = jnp.sinc(t) * window * g_i[:, None]  # (N, taps)
        idx = base[:, None].astype(jnp.int32) + taps[None, :].astype(jnp.int32)
        idx = jnp.clip(idx + SINC_HALF, 0, pad - 1)
        # Scatter into hit-class accumulators: one scatter for ALL bands.
        cls = jnp.clip(hits_i, 0, n_classes - 1)
        acc = jnp.zeros((n_classes, pad), jnp.float32)
        acc = acc.at[
            jnp.broadcast_to(cls[:, None], idx.shape), idx
        ].add(kern)
        trains = band_profile @ acc[:, SINC_HALF : SINC_HALF + ir_len]
        spec = jnp.fft.rfft(trains, nfft) * masks
        early = jnp.fft.irfft(spec.sum(axis=0), nfft)[:ir_len]

        # Late tail: per-band Eyring decay, level matched to the mixing-zone
        # image energy (parity with render_shoebox_rir_multiband).
        big = jnp.float32(1e30)
        t_direct = jnp.min(jnp.where(valid_i, delays_si, big))
        t_direct = jnp.where(jnp.any(valid_i), t_direct, 0.0)
        mix_sel = (
            valid_i
            & (delays_si > t_direct + 0.03)
            & (delays_si < t_direct + 0.08)
        )
        g2 = g_i * g_i
        cls_sum = jax.ops.segment_sum(
            jnp.where(mix_sel, g2, 0.0), cls, num_segments=n_classes
        )  # (n_classes,)
        k = jnp.sum(mix_sel)
        level_sel = jnp.sqrt(
            (band_profile**2) @ cls_sum / jnp.maximum(k, 1)
        )  # (n_bands,)
        # segment_max yields -inf for empty classes; |g| >= 0 so clamp to 0.
        cls_max = jnp.maximum(
            jax.ops.segment_max(
                jnp.where(valid_i, jnp.abs(g_i), 0.0), cls, num_segments=n_classes
            ),
            0.0,
        )
        level_fb = jnp.max(band_profile * cls_max[None, :], axis=1) * 0.05
        level = jnp.where(k > 0, level_sel, level_fb)

        t_axis = jnp.arange(ir_len, dtype=jnp.float32) / sample_rate
        decay = jnp.exp(
            -6.908
            * jnp.maximum(t_axis[None, :] - t_direct, 0.0)
            / rt60_bands[:, None]
        )
        ramp = jnp.clip((t_axis - t_direct) / 0.02, 0.0, 1.0) ** 2
        shaped = noise_i * (level[:, None] * decay * ramp[None, :])
        tail_spec = jnp.fft.rfft(shaped, nfft) * masks
        tail = jnp.fft.irfft(tail_spec.sum(axis=0), nfft)[:ir_len]
        return early + tail

    return jax.vmap(one)(delays_s, hits, g, valid, noise_keys)


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

    # ---- device side: chunked jitted assembly ------------------------------
    masks = jnp.asarray(band_masks(n_bands, nfft, sample_rate))
    beta_j = jnp.asarray(beta, jnp.float32)
    rt60_j = jnp.asarray(rt60_bands, jnp.float32)
    out = np.empty((n_items, ir_len), np.float32)
    for lo in range(0, n_items, _CHUNK):
        hi = min(lo + _CHUNK, n_items)
        padn = _CHUNK - (hi - lo)
        sl = slice(lo, hi)

        def padded(a):
            x = a[sl]
            if padn:
                x = np.concatenate([x, np.zeros((padn,) + x.shape[1:], x.dtype)])
            return jnp.asarray(x)

        keys_chunk = noise_keys[sl]
        if padn:  # pad with repeats; padded outputs are discarded below
            keys_chunk = jnp.concatenate(
                [keys_chunk, jnp.repeat(noise_keys[:1], padn, axis=0)]
            )
        chunk = _assemble_items(
            padded(delays.astype(np.float32)),
            padded(hits.astype(np.int32)),
            padded(g),
            padded(valid),
            keys_chunk,
            beta_j,
            masks,
            rt60_j,
            sample_rate,
            ir_len,
            nfft,
            n_classes,
        )
        out[sl] = np.asarray(chunk)[: hi - lo]

    bank = out.reshape(n_src, n_recv, n_ch, ir_len)
    if peak_normalize:
        peak = np.abs(bank).max()
        if peak > 0:
            bank = bank / peak
    return bank
