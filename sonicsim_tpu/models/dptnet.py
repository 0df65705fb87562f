"""DPTNet (dual-path improved transformer), flax/TPU-native.

Parity: separation/look2hear/models/dptnet.py:323-735 (config
separation/configs/dptnet.yaml: conv enc k4/s2 64ch, 6 layers, unit 128,
4 heads, segment 360, gLN): conv encoder → segment unfold (pad = segment,
hop = segment/2) → per-layer intra/inter ImprovedTransformerLayer (MHSA +
residual + gLN, then BLSTM feed-forward) → gated mask head → masked
features → transposed-conv decoder. Trains with the DPTNetScheduler
(sonicsim_tpu.train.schedulers).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .base import BaseModel, register_model
from .layers import PReLU, get_activation
from .zoo_layers import GroupNorm1, LSTMLayer


class ImprovedTransformerLayer(nn.Module):
    """dptnet.py:323-400. (B, T, N) → same."""

    input_size: int
    att_heads: int
    hidden_size: int
    bidirectional: bool = True
    activation: str = "relu"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.att_heads, qkv_features=self.input_size, name="self_attn"
        )(x, x)
        out = attn + x
        out = GroupNorm1(name="norm_attn")(out)
        h = LSTMLayer(self.hidden_size, self.bidirectional, name="rnn")(out)
        h = get_activation(self.activation)(h)
        h = nn.Dense(self.input_size, name="ff_linear")(h)
        out2 = h + out
        return GroupNorm1(name="norm_ff")(out2)


@register_model
class DPTNetModel(BaseModel):
    channel: int = 64
    kernel_size: int = 4
    stride: int = 2
    num_spk: int = 2
    layer: int = 6
    bidirectional: bool = True
    unit: int = 128
    att_heads: int = 4
    activation: str = "relu"
    segment_size: int = 360
    nonlinear: str = "relu"
    sample_rate: int = 16000

    @nn.compact
    def __call__(self, wav: jax.Array) -> jax.Array:
        if wav.ndim == 1:
            wav = wav[None, :]
        bsz, nsample = wav.shape

        # ConvEncoder (dptnet.py:46-91): conv stride 2 + ReLU.
        feat = jax.nn.relu(
            nn.Conv(
                self.channel, (self.kernel_size,), strides=(self.stride,),
                padding="VALID", use_bias=False, name="encoder",
            )(wav[..., None])
        )  # (B, T, N)
        t_enc = feat.shape[1]

        h = GroupNorm1(name="enc_LN")(feat)

        # split_feature (dptnet.py:663-671): pad segment both sides, hop seg/2.
        seg, hop = self.segment_size, self.segment_size // 2
        padded = jnp.pad(h, ((0, 0), (seg, seg), (0, 0)))
        n_chunks = (padded.shape[1] - seg) // hop + 1
        idx = jnp.arange(n_chunks)[:, None] * hop + jnp.arange(seg)[None, :]
        chunks = padded[:, idx]  # (B, n_chunks, seg, N)

        for i in range(self.layer):
            b, s, k, n = chunks.shape
            intra = ImprovedTransformerLayer(
                self.channel, self.att_heads, self.unit, True, self.activation,
                name=f"row_transformer_{i}",
            )(chunks.reshape(b * s, k, n)).reshape(b, s, k, n)
            inter = jnp.swapaxes(intra, 1, 2).reshape(b * k, s, n)
            inter = ImprovedTransformerLayer(
                self.channel, self.att_heads, self.unit, self.bidirectional,
                self.activation, name=f"col_transformer_{i}",
            )(inter)
            chunks = jnp.swapaxes(inter.reshape(b, k, s, n), 1, 2)

        # Output head (dptnet.py:467-469): PReLU + 1x1 conv to N*num_spk.
        chunks = PReLU(name="out_prelu")(chunks)
        chunks = nn.Conv(self.channel * self.num_spk, (1, 1), name="out_conv")(chunks)
        b, s, k, _ = chunks.shape
        chunks = chunks.reshape(b, s, k, self.num_spk, self.channel)
        chunks = jnp.moveaxis(chunks, 3, 1).reshape(
            b * self.num_spk, s, k, self.channel
        )

        # merge_feature (dptnet.py:673-701): fold with pad=seg, normalized.
        total = (s - 1) * hop + seg
        buf = jnp.zeros((chunks.shape[0], total, self.channel))
        norm = jnp.zeros((1, total, 1))
        flat_idx = (jnp.arange(s)[:, None] * hop + jnp.arange(seg)[None, :]).reshape(-1)
        buf = buf.at[:, flat_idx].add(chunks.reshape(chunks.shape[0], -1, self.channel))
        norm = norm.at[:, flat_idx].add(
            jnp.ones((1, s * seg, 1))
        )
        merged = (buf / jnp.maximum(norm, 1e-8))[:, seg : seg + t_enc]  # (B*spk, T, N)

        gated = jnp.tanh(nn.Conv(self.channel, (1,), name="output")(merged)) * (
            jax.nn.sigmoid(nn.Conv(self.channel, (1,), name="output_gate")(merged))
        )
        masks = get_activation(self.nonlinear)(gated)  # (B*spk, T, N)

        masked = jnp.repeat(feat, self.num_spk, axis=0) * masks

        out = nn.ConvTranspose(
            1, (self.kernel_size,), strides=(self.stride,), padding="VALID",
            use_bias=False, name="decoder",
        )(masked)[..., 0]
        out = out[:, :nsample]
        out = jnp.pad(out, ((0, 0), (0, nsample - out.shape[-1])))
        return out.reshape(bsz, self.num_spk, nsample)
