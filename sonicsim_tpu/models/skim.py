"""SkiM (Skipping-Memory LSTM separation), flax/TPU-native.

Parity: separation/look2hear/models/skim.py:286-900 (config
separation/configs/skim.yaml: 64-dim conv encoder k4/s2, 6 SkiM blocks,
unit 128, segment 250, mem_type hc, seg_overlap true, non-causal):
segment-local SegLSTMs whose final (h, c) states are carried across
segments by Mem-LSTMs between blocks — long-sequence modeling at
segment-level cost. Offline (batch) path; the reference's sample-level
``forward_stream`` streaming API maps to running the causal variant
segment-by-segment and is not reproduced here.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .base import BaseModel, register_model
from .layers import PReLU, get_activation
from .zoo_layers import (
    GroupNorm1,
    LSTMLayer,
    overlap_add_sequence,
    segment_sequence,
)


class SegLSTM(nn.Module):
    """skim.py:418-476: LSTM over a segment with injected initial states;
    returns (output, final (h, c))."""

    input_size: int
    hidden_size: int
    bidirectional: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, hc):
        bs = x.shape[0]
        h_dim = self.hidden_size

        def make_rnn(name):
            return nn.RNN(nn.OptimizedLSTMCell(h_dim), name=name)

        if hc is None:
            zeros = jnp.zeros((bs, h_dim), x.dtype)
            n_dir = 2 if self.bidirectional else 1
            hc = tuple((zeros, zeros) for _ in range(n_dir))

        if self.bidirectional:
            carry_f, out_f = make_rnn("lstm_fwd")(
                x, initial_carry=hc[0], return_carry=True
            )
            carry_b, out_b = make_rnn("lstm_bwd")(
                x[:, ::-1], initial_carry=hc[1], return_carry=True
            )
            out = jnp.concatenate([out_f, out_b[:, ::-1]], axis=-1)
            final = (carry_f, carry_b)
        else:
            carry, out = make_rnn("lstm_fwd")(x, initial_carry=hc[0], return_carry=True)
            final = (carry,)
        out = nn.Dense(self.input_size, name="proj")(out)
        out = x + GroupNorm1(name="norm")(out)
        return out, final


class MemLSTM(nn.Module):
    """skim.py:286-389 ('hc' mode): refine per-segment (h, c) across the
    segment axis with residual LSTMs."""

    hidden_size: int
    bidirectional: bool = True
    mem_type: str = "hc"

    @nn.compact
    def __call__(self, hc, n_seg: int):
        if self.mem_type == "id":
            return hc
        n_dir = len(hc)
        d_h = n_dir * self.hidden_size

        def across_segments(x, name):  # x: (B*S, d*H) stacked as (B, S, dH)
            y = LSTMLayer(self.hidden_size, self.bidirectional, name=f"{name}_net")(x)
            return x + GroupNorm1(name=f"{name}_norm")(y)

        # Gather (c, h) per direction → (B, S, d*H).
        cs = jnp.concatenate([hc[d][0] for d in range(n_dir)], axis=-1)
        hs = jnp.concatenate([hc[d][1] for d in range(n_dir)], axis=-1)
        bs = cs.shape[0] // n_seg
        cs = cs.reshape(bs, n_seg, d_h)
        hs = hs.reshape(bs, n_seg, d_h)
        if self.mem_type in ("hc", "h"):
            hs = across_segments(hs, "h")
        else:
            hs = jnp.zeros_like(hs)
        if self.mem_type in ("hc", "c"):
            cs = across_segments(cs, "c")
        else:
            cs = jnp.zeros_like(cs)
        cs = cs.reshape(bs * n_seg, d_h)
        hs = hs.reshape(bs * n_seg, d_h)
        return tuple(
            (
                cs[:, d * self.hidden_size : (d + 1) * self.hidden_size],
                hs[:, d * self.hidden_size : (d + 1) * self.hidden_size],
            )
            for d in range(n_dir)
        )


@register_model
class SkiMNet(BaseModel):
    input_dim: int = 64
    causal: bool = False
    num_spk: int = 2
    nonlinear: str = "relu"
    layer: int = 6
    unit: int = 128
    segment_size: int = 250
    dropout: float = 0.1
    mem_type: str = "hc"
    seg_overlap: bool = True
    kernel_size: int = 4
    sample_rate: int = 16000

    @nn.compact
    def __call__(self, wav: jax.Array) -> jax.Array:
        if wav.ndim == 1:
            wav = wav[None, :]
        bsz, nsample = wav.shape
        bidirectional = not self.causal

        enc = jax.nn.relu(
            nn.Conv(
                self.input_dim, (self.kernel_size,),
                strides=(self.kernel_size // 2,), padding="VALID", use_bias=False,
                name="encoder",
            )(wav[..., None])
        )  # (B, T, D)
        t_enc = enc.shape[1]

        # Segmentation (skim.py:560-575).
        if self.seg_overlap:
            chunks, gap = segment_sequence(enc, self.segment_size)  # (B,S,K,D)
        else:
            rest = (-t_enc) % self.segment_size
            padded = jnp.pad(enc, ((0, 0), (0, rest), (0, 0)))
            chunks = padded.reshape(bsz, -1, self.segment_size, self.input_dim)
            gap = rest
        b, s, k, d = chunks.shape

        out = chunks.reshape(b * s, k, d)
        hc = None
        for i in range(self.layer):
            out, hc = SegLSTM(
                self.input_dim, self.unit, bidirectional, name=f"seg_lstm_{i}"
            )(out, hc)
            if self.mem_type and i < self.layer - 1:
                hc = MemLSTM(
                    self.unit, bidirectional, self.mem_type, name=f"mem_lstm_{i}"
                )(hc, s)

        out = out.reshape(b, s, k, d)
        if self.seg_overlap:
            merged = overlap_add_sequence(out, gap)  # (B, T, D)
        else:
            merged = out.reshape(b, s * k, d)[:, :t_enc]
        merged = PReLU(name="out_prelu")(merged)
        masks = nn.Conv(
            self.input_dim * self.num_spk, (1,), name="output_fc"
        )(merged)  # (B, T, D*spks)
        masks = masks.reshape(bsz, -1, self.num_spk, self.input_dim)
        masks = get_activation(self.nonlinear)(masks)

        masked = enc[:, :, None, :] * masks  # (B, T, spk, D)
        masked = jnp.moveaxis(masked, 2, 1).reshape(bsz * self.num_spk, -1, self.input_dim)
        dec = nn.ConvTranspose(
            1, (self.kernel_size,), strides=(self.kernel_size // 2,),
            padding="VALID", use_bias=False, name="decoder",
        )(masked)[..., 0]
        dec = dec[:, :nsample]
        dec = jnp.pad(dec, ((0, 0), (0, nsample - dec.shape[-1])))
        return dec.reshape(bsz, self.num_spk, nsample)
