"""BSRNN (band-split RNN separation, STFT domain), flax/TPU-native.

Parity: separation/look2hear/models/bsrnn.py:6-180 (config
separation/configs/bsrnn.yaml: 16 kHz, win 512, hop 128, feature 128,
12 repeats): band-split the complex STFT into psychoacoustic sub-bands,
per-band bottleneck, alternating band-RNN / band-communication ResRNN
stack, per-band complex ratio masks with sum-to-one correction, iSTFT.

TPU note: all per-band convs/bottlenecks are executed as one batched einsum
per band group (bands have unequal widths so they stay a Python loop over
~47 small matmuls — compiled once).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stft import hann_window, istft, stft
from .base import BaseModel, register_model
from .zoo_layers import GroupNorm1, ResRNN


def band_widths(sample_rate: int, enc_dim: int) -> list[int]:
    """Sub-band layout (bsrnn.py:64-74): 20×50 Hz, 10×100 Hz, 8×250 Hz,
    8×500 Hz, remainder."""
    def bw(hz):
        return int(np.floor(hz / (sample_rate / 2.0) * enc_dim))

    bands = [bw(50)] * 20 + [bw(100)] * 10 + [bw(250)] * 8 + [bw(500)] * 8
    bands.append(enc_dim - int(np.sum(bands)))
    return [b for b in bands if b > 0]


class BSNet(nn.Module):
    """One band-RNN + band-communication layer (bsrnn.py:28-48).

    Input (B, T, nband, N)."""

    feature_dim: int
    nband: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, t, nband, n = x.shape
        # band_rnn: over time, per band.
        y = jnp.swapaxes(x, 1, 2).reshape(b * nband, t, n)
        y = ResRNN(n, n * 2, name="band_rnn")(y)
        y = jnp.swapaxes(y.reshape(b, nband, t, n), 1, 2)
        # band_comm: over bands, per time step.
        z = y.reshape(b * t, nband, n)
        z = ResRNN(n, n * 2, name="band_comm")(z)
        return z.reshape(b, t, nband, n)


@register_model
class BSRNN(BaseModel):
    sample_rate: int = 16000
    win: int = 512
    stride: int = 128
    feature_dim: int = 128
    num_repeat: int = 12
    num_output: int = 2

    @nn.compact
    def __call__(self, wav: jax.Array) -> jax.Array:  # (B, T) → (B, out, T)
        if wav.ndim == 1:
            wav = wav[None, :]
        bsz, nsample = wav.shape
        enc_dim = self.win // 2 + 1
        bands = band_widths(self.sample_rate, enc_dim)
        nband = len(bands)
        window = hann_window(self.win)

        spec = stft(wav, self.win, self.stride, window)  # (B, F, T') complex
        spec = jnp.swapaxes(spec, 1, 2)  # (B, T', F)
        t_frames = spec.shape[1]

        # Band-split bottleneck (bsrnn.py:77-83, :146-149).
        feats = []
        edges = np.concatenate([[0], np.cumsum(bands)])
        for i, (lo, hi) in enumerate(zip(edges[:-1], edges[1:])):
            sub = spec[:, :, lo:hi]
            ri = jnp.concatenate([sub.real, sub.imag], axis=-1)  # (B, T', 2*bw)
            ri = GroupNorm1(name=f"bn_norm_{i}")(ri)
            feats.append(
                nn.Conv(self.feature_dim, (1,), name=f"bn_conv_{i}")(ri)
            )
        x = jnp.stack(feats, axis=2)  # (B, T', nband, N)

        # Separator stack (bsrnn.py:85-88, :152).
        for r in range(self.num_repeat):
            x = BSNet(self.feature_dim, nband, name=f"bsnet_{r}")(x)

        # Per-band masks (bsrnn.py:90-101, :155-169).
        outs = []
        for i, (lo, hi) in enumerate(zip(edges[:-1], edges[1:])):
            bw = hi - lo
            h = GroupNorm1(name=f"mask_norm_{i}")(x[:, :, i])  # (B, T', N)
            h = jnp.tanh(
                nn.Conv(self.feature_dim * self.num_output, (1,), name=f"mask_c1_{i}")(h)
            )
            h = jnp.tanh(
                nn.Conv(
                    self.feature_dim * 2 * self.num_output,
                    (1,),
                    feature_group_count=self.num_output,
                    name=f"mask_c2_{i}",
                )(h)
            )
            h = nn.Conv(
                bw * 4 * self.num_output,
                (1,),
                feature_group_count=self.num_output,
                name=f"mask_c3_{i}",
            )(h)  # (B, T', out*4*bw)
            # Channel axis factored (2, 2, out, bw) — the reference's exact
            # view of the group-blocked conv output (bsrnn.py:157).
            h = h.reshape(bsz, t_frames, 2, 2, self.num_output, bw)
            mask = h[:, :, 0] * jax.nn.sigmoid(h[:, :, 1])  # (B,T',2,out,bw)
            m_re, m_im = mask[:, :, 0], mask[:, :, 1]
            # Sum-to-one mask correction (bsrnn.py:161-164).
            m_re = m_re - (m_re.sum(axis=2, keepdims=True) - 1.0) / self.num_output
            m_im = m_im - m_im.sum(axis=2, keepdims=True) / self.num_output
            sub = spec[:, :, lo:hi][:, :, None, :]  # (B, T', 1, bw)
            est_re = sub.real * m_re - sub.imag * m_im
            est_im = sub.real * m_im + sub.imag * m_re
            outs.append(est_re + 1j * est_im)  # (B, T', out, bw)
        est_spec = jnp.concatenate(outs, axis=-1)  # (B, T', out, F)
        est_spec = jnp.moveaxis(est_spec, 2, 1).reshape(
            bsz * self.num_output, t_frames, enc_dim
        )
        est_spec = jnp.swapaxes(est_spec, 1, 2)  # (B*out, F, T')
        out = istft(est_spec, self.win, self.stride, window, length=nsample)
        return out.reshape(bsz, self.num_output, nsample)
