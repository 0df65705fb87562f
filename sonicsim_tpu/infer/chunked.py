"""Chunked long-audio inference: overlap-add sliding windows.

Parity: wav_chunk_inference (separation/look2hear/utils/separator.py:72-131)
— the reference's long-sequence mechanism: pad, window into
``target_length``-second chunks at ``hop_length`` stride, run the model on
batches of windows, sum overlapping outputs and divide by the overlap ratio.

TPU-native: all windows are gathered into one (num_windows, T_chunk) array
and processed in fixed-size batches so the model compiles once; overlap-add
is a scatter-add on device.

Sequence-parallel over a mesh: windows of ONE long mixture are
embarrassingly parallel, so with ``mesh=`` the window axis is sharded
across the mesh's devices (``batch_size`` windows per device per
dispatch) and XLA partitions the jitted model over it — long-file eval
throughput scales with chips without any model change. Numerically
identical to the single-device path (window rows are independent).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def wav_chunk_inference(
    model_fn: Callable[[np.ndarray], np.ndarray],
    mixture: np.ndarray,
    sample_rate: int = 16000,
    target_length: float = 12.0,
    hop_length: float = 4.0,
    batch_size: int = 10,
    n_tracks: int = 2,
    mesh: "jax.sharding.Mesh | None" = None,
) -> np.ndarray:
    """mixture (T,) → (n_tracks, T); ``model_fn`` maps (B, T_chunk) →
    (B, n_tracks, T_chunk).

    With ``mesh``, ``model_fn`` must be a jitted JAX function: each
    dispatch feeds ``batch_size × n_devices`` windows sharded on the
    batch axis (sonicsim_tpu.parallel.batch_sharding), so the per-device
    batch stays ``batch_size``."""
    x = np.asarray(mixture, np.float32).reshape(-1)
    total = x.shape[-1]
    chunk = int(sample_rate * target_length)
    hop = int(sample_rate * hop_length)
    overlap_ratio = target_length / hop_length

    # Lead/tail padding so every sample sees the full overlap count.
    lead = chunk - hop
    xpad = np.concatenate([np.zeros(lead, np.float32), x, np.zeros(lead, np.float32)])
    n_win = (len(xpad) - chunk) // hop + 2

    windows = np.zeros((n_win, chunk), np.float32)
    for i in range(n_win):
        seg = xpad[i * hop : i * hop + chunk]
        windows[i, : len(seg)] = seg

    shard = None
    if mesh is not None:
        from sonicsim_tpu.parallel import batch_sharding

        shard = batch_sharding(mesh)
        batch_size *= mesh.devices.size

    outs = []
    for b in range(0, n_win, batch_size):
        batch = windows[b : b + batch_size]
        if len(batch) < batch_size:  # keep a single compiled shape
            batch = np.concatenate(
                [batch, np.zeros((batch_size - len(batch), chunk), np.float32)]
            )
        if shard is not None:
            batch = jax.device_put(jnp.asarray(batch), shard)
        est = np.asarray(model_fn(batch))
        outs.append(est[: min(batch_size, n_win - b)])
    est_all = np.concatenate(outs, axis=0)  # (n_win, n_tracks, chunk)

    acc = jnp.zeros((n_tracks, len(xpad) + chunk), jnp.float32)
    for i in range(n_win):
        acc = acc.at[:, i * hop : i * hop + chunk].add(est_all[i])
    out = np.asarray(acc)[:, lead : lead + total] / overlap_ratio
    return out
