"""DPRNN-TasNet (dual-path RNN separation), flax/TPU-native.

Parity: separation/look2hear/models/dprnn.py:319-409 + Dual_Path_RNN
(:171-258): ReLU conv encoder → chunked dual-path RNN stack → per-speaker
2D 1x1 conv masks → gated output → transposed-conv decoder. Config:
separation/configs/dprnn.yaml.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .base import BaseModel, register_model
from .layers import PReLU
from .zoo_layers import (
    DualRNNBlock,
    GroupNorm1,
    overlap_add_sequence,
    segment_sequence,
)


@register_model
class DPRNNTasNet(BaseModel):
    in_channels: int = 512  # encoder filters (N)
    out_channels: int = 64  # bottleneck / dual-path width
    hidden_channels: int = 128
    kernel_size: int = 4
    rnn_type: str = "LSTM"
    norm: str = "gln"
    dropout: float = 0.0
    bidirectional: bool = False
    num_layers: int = 4
    K: int = 250
    num_spks: int = 2
    sample_rate: int = 16000

    @nn.compact
    def __call__(self, wav: jax.Array) -> jax.Array:  # (B, T) → (B, spks, T)
        if wav.ndim == 1:
            wav = wav[None, :]
        nsample = wav.shape[-1]

        # Encoder (dprnn.py:11-40): conv stride k/2 + ReLU.
        x = nn.Conv(
            self.in_channels,
            (self.kernel_size,),
            strides=(self.kernel_size // 2,),
            padding="VALID",
            use_bias=False,
            name="encoder",
        )(wav[..., None])
        enc = jax.nn.relu(x)  # (B, T', N)

        # Separator (dprnn.py:227-258).
        w = GroupNorm1()(enc)
        w = nn.Conv(self.out_channels, (1,), use_bias=False, name="bottleneck")(w)
        chunks, gap = segment_sequence(w, self.K)  # (B, S, K, C)
        for i in range(self.num_layers):
            chunks = DualRNNBlock(
                self.out_channels,
                self.hidden_channels,
                self.bidirectional,
                name=f"dual_rnn_{i}",
            )(chunks)
        chunks = PReLU(name="prelu")(chunks)
        chunks = nn.Conv(
            self.out_channels * self.num_spks, (1, 1), name="mask_conv2d"
        )(chunks)  # (B, S, K, C*spks)
        b, s, k, _ = chunks.shape
        chunks = chunks.reshape(b, s, k, self.num_spks, self.out_channels)
        chunks = jnp.moveaxis(chunks, 3, 1).reshape(
            b * self.num_spks, s, k, self.out_channels
        )
        masks = overlap_add_sequence(chunks, gap)  # (B*spks, T', C)
        gated = jnp.tanh(nn.Conv(self.out_channels, (1,), name="output")(masks)) * (
            jax.nn.sigmoid(nn.Conv(self.out_channels, (1,), name="output_gate")(masks))
        )
        masks = nn.Conv(
            self.in_channels, (1,), use_bias=False, name="end_conv1x1"
        )(gated)
        masks = jax.nn.relu(masks)  # (B*spks, T', N)

        # Apply masks and decode (dprnn.py:383-400).
        enc_rep = jnp.repeat(enc, self.num_spks, axis=0)
        out = nn.ConvTranspose(
            1,
            (self.kernel_size,),
            strides=(self.kernel_size // 2,),
            padding="VALID",
            use_bias=False,
            name="decoder",
        )(enc_rep * masks)[..., 0]
        out = out[:, :nsample]
        out = jnp.pad(out, ((0, 0), (0, nsample - out.shape[-1])))
        return out.reshape(-1, self.num_spks, nsample)
