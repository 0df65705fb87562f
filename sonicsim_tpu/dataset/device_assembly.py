"""Device-resident utterance cache + on-device long-audio assembly.

The host assembly path (:func:`.assemble.assemble_long_audio`) re-reads
and re-uploads every utterance for every mixture: a 60 s SonicSet triple
ships ~10 MB of dry audio up the tunneled link per mixture even though
the same LibriSpeech utterances recur across many speaker triples
(SonicSet_train.py:180-218 reuses each speaker dir in every triple it
appears in). This module keeps decoded utterances on the device and
executes the placement plan (concatenate-with-silences,
SonicSim_audio.py:231-340) as one jitted scatter, so steady-state
generation uploads only cache *misses*.

Output is bit-identical to the host path: cached rows hold exactly the
float32 samples ``read_wav`` produces (PCM-exact audio crosses the link
as int16 and converts on device by ``* 2^-15``, which is exact in f32;
resampled/downmixed audio crosses as f32), and the assembly jit adds
placements into the timeline in plan order with f32 adds — the same
IEEE operations ``assemble_long_audio``'s ``+=`` loop performs.

TPU-first notes: every row is padded to one global ``lmax`` so the
per-mixture gather is a single eager ``jnp.stack`` (one dispatch, one
compiled signature per row-count bucket) and the assembly jit compiles
once per (rows, duration) bucket — no per-utterance-shape retraces.
Utterances longer than ``lmax`` are chunked across several rows and
their placements split at chunk boundaries on the host (integer
arithmetic only).
"""

from __future__ import annotations

from collections import OrderedDict
from functools import partial
from pathlib import Path

import numpy as np

from ..utils.wavio import read_wav, resample
from .plan import LongAudioPlan

__all__ = ["UtteranceCache", "assemble_plans_on_device"]


def _bucket(n: int, floor: int = 1 << 14) -> int:
    b = floor
    while b < n:
        b <<= 1
    return b


_EXPAND = None


def _expand_row(chunk: np.ndarray, lmax: int):
    """Upload one ≤lmax chunk and return a device (lmax,) f32 row.

    int16 chunks (PCM-exact audio, half the uplink bytes) convert on
    device; f32 chunks pad unchanged. One tiny compiled program per
    (dtype, bucket) pair — bounded by the bucket count, not the corpus
    size (the jit object is module-cached so signatures persist)."""
    global _EXPAND
    import jax
    import jax.numpy as jnp

    if _EXPAND is None:

        @partial(jax.jit, static_argnames="lmax")
        def expand(q, lmax):
            x = (
                q.astype(jnp.float32) * jnp.float32(1.0 / 32768.0)
                if q.dtype == jnp.int16
                else q
            )
            return jnp.pad(x, (0, lmax - x.shape[0]))

        _EXPAND = expand
    return _EXPAND(chunk, lmax=lmax)


class UtteranceCache:
    """LRU cache of decoded utterances as device-resident (lmax,) f32 rows.

    ``get`` returns the chunk rows for one file; eviction is by total
    row bytes (a row costs ``lmax * 4`` bytes of HBM regardless of the
    utterance's true length — simplicity over packing, HBM is the
    roomy resource here)."""

    def __init__(
        self,
        max_bytes: int = 4 << 30,
        lmax: int = 1 << 19,  # 32.77 s at 16 kHz
        sample_rate: int = 16000,
        mono_downmix: bool = True,
    ) -> None:
        self.max_bytes = int(max_bytes)
        self.lmax = int(lmax)
        if self.lmax & (self.lmax - 1):
            raise ValueError("lmax must be a power of two")
        self.sample_rate = int(sample_rate)
        self.mono_downmix = bool(mono_downmix)
        # path -> (rows [device (lmax,) f32 per chunk], true_len)
        self._entries: OrderedDict[str, tuple[list, int]] = OrderedDict()
        self._bytes = 0
        self.hits = 0
        self.misses = 0
        self._zeros = None

    def zeros_row(self):
        """Shared all-zero row used to pad gather batches."""
        if self._zeros is None:
            import jax.numpy as jnp

            self._zeros = jnp.zeros((self.lmax,), jnp.float32)
        return self._zeros

    def _load(self, path: str) -> tuple[list, int]:
        from ..utils.audio import pcm16_exact

        wav, sr = read_wav(path)
        if sr != self.sample_rate:
            wav = resample(wav, sr, self.sample_rate)
        if self.mono_downmix and wav.shape[0] > 1:
            wav = wav.mean(axis=0, keepdims=True)
        x = np.ascontiguousarray(wav[0], np.float32)
        # Decoded PCM16 is exactly i/32768 (and resample/downmix leaves
        # that grid); the shared predicate decides int16-vs-f32 uplink.
        q = pcm16_exact(x)
        rows = []
        for c0 in range(0, max(x.shape[0], 1), self.lmax):
            chunk = (x if q is None else q)[c0 : c0 + self.lmax]
            b = _bucket(len(chunk), floor=min(1 << 14, self.lmax))
            rows.append(
                _expand_row(np.pad(chunk, (0, b - len(chunk))), self.lmax)
            )
        return rows, x.shape[0]

    def get(self, path: str | Path) -> tuple[list, int]:
        key = str(path)
        hit = self._entries.get(key)
        if hit is not None:
            self.hits += 1
            self._entries.move_to_end(key)
            return hit
        self.misses += 1
        rows, n = self._load(key)
        self._entries[key] = (rows, n)
        self._bytes += len(rows) * self.lmax * 4
        while self._bytes > self.max_bytes and len(self._entries) > 1:
            _, (old_rows, _n) = self._entries.popitem(last=False)
            self._bytes -= len(old_rows) * self.lmax * 4
        return rows, n


def _assemble_jit():
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("t", "n_out"))
    def assemble(rows, src, length, dest, row_of, *, t, n_out):
        """rows (R, lmax) f32; per-placement src offset into its row,
        length, dest offset in the timeline, and output-row index.
        Zero-length padding entries add nothing."""
        lmax = rows.shape[1]
        rows2 = jnp.pad(rows, ((0, 0), (0, lmax)))  # in-bounds window slice
        ar = jnp.arange(lmax)

        def step(tl, xs):
            row, s0, ln, d0, ro = xs
            win = jax.lax.dynamic_slice(row, (s0,), (lmax,))
            win = jnp.where(ar < ln, win, 0.0)
            cur = jax.lax.dynamic_slice(tl, (ro, d0), (1, lmax))
            return (
                jax.lax.dynamic_update_slice(tl, cur + win[None], (ro, d0)),
                None,
            )

        timeline = jnp.zeros((n_out, t + lmax), jnp.float32)
        timeline, _ = jax.lax.scan(
            step, timeline, (rows2, src, length, dest, row_of)
        )
        return timeline[:, :t]

    return assemble


_ASSEMBLE = None


def assemble_plans_on_device(plans: list[LongAudioPlan], cache: UtteranceCache):
    """Execute several LongAudioPlans in ONE jitted device computation.

    Returns a device (len(plans), total_samples) f32 array bit-identical
    to stacking :func:`.assemble.assemble_long_audio` over ``plans``
    (same placements, same f32 add order per output row)."""
    global _ASSEMBLE
    import jax.numpy as jnp

    if not plans:
        raise ValueError("no plans")
    t = plans[0].total_samples
    if any(
        p.total_samples != t or p.sample_rate != cache.sample_rate
        for p in plans
    ):
        raise ValueError("plans must share total_samples and the cache's rate")

    rows, src, length, dest, row_of = [], [], [], [], []
    for out_idx, plan in enumerate(plans):
        for p in plan.placements:
            chunk_rows, true_len = cache.get(p.path)
            stop = min(p.src_start + p.length, true_len)
            s = p.src_start
            # Split at chunk boundaries (long utterances span rows).
            while s < stop:
                c = s // cache.lmax
                take = min(stop, (c + 1) * cache.lmax) - s
                rows.append(chunk_rows[c])
                src.append(s - c * cache.lmax)
                length.append(take)
                dest.append(p.dest_start + (s - p.src_start))
                row_of.append(out_idx)
                s += take

    r_pad = max(8, _bucket(len(rows), floor=8))
    zeros = cache.zeros_row()
    while len(rows) < r_pad:
        rows.append(zeros)
        src.append(0)
        length.append(0)
        dest.append(0)
        row_of.append(0)

    if _ASSEMBLE is None:
        _ASSEMBLE = _assemble_jit()
    return _ASSEMBLE(
        jnp.stack(rows),
        jnp.asarray(np.asarray(src, np.int32)),
        jnp.asarray(np.asarray(length, np.int32)),
        jnp.asarray(np.asarray(dest, np.int32)),
        jnp.asarray(np.asarray(row_of, np.int32)),
        t=t,
        n_out=len(plans),
    )
