"""MossFormer (gated single-head FLASH attention separation), flax/TPU-native.

Parity: separation/look2hear/models/mossformer.py +
mossformer_block.py (config separation/configs/mossformer.yaml: enc k16/s8,
512 dims, 24 blocks, group 256, qk 128, expansion 4): conv encoder →
MaskNet (norm → 1x1 → scaled sinusoidal pos-emb → stack of
FLASH_ShareA_FFConvM blocks → gated mask head) → masked features →
transposed-conv decoder.

The FLASH attention (mossformer_block.py:143-294): token-shift on half the
channels, shared qk projection offset-scaled into quad/lin heads with
partial rotary embeddings, quadratic ReLU² attention inside groups of 256 +
global linear attention, and a (u·attV)·σ(v·attU) gate.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .base import BaseModel, register_model
from .layers import GroupedConv1D, PReLU
from .zoo_layers import GroupNorm1


class ScaleNorm(nn.Module):
    """mossformer_block.py:44-57."""

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.ones, (1,))
        norm = jnp.linalg.norm(x, axis=-1, keepdims=True) * self.dim**-0.5
        return x / jnp.maximum(norm, self.eps) * g


class ScaledSinuEmbedding(nn.Module):
    """mossformer_block.py:60-73: fixed sin/cos with a learned scale."""

    dim: int

    @nn.compact
    def __call__(self, n: int) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (1,))
        inv_freq = 1.0 / (10000 ** (np.arange(0, self.dim, 2) / self.dim))
        sinu = np.arange(n)[:, None] * inv_freq[None, :]
        emb = jnp.asarray(
            np.concatenate([np.sin(sinu), np.cos(sinu)], axis=-1), jnp.float32
        )
        return emb * scale


class ConvModuleRes(nn.Module):
    """Conformer-style residual depthwise conv (conv_module.py:180-219)."""

    dim: int
    kernel_size: int = 17

    @nn.compact
    def __call__(self, x):  # (B, T, C)
        pad = (self.kernel_size - 1) // 2
        y = GroupedConv1D(
            self.dim, (self.kernel_size,), padding=[(pad, pad)],
            feature_group_count=self.dim, use_bias=False, name="dwconv",
        )(x)
        return x + y


class FFConvM(nn.Module):
    """norm → linear → SiLU → residual depthwise conv
    (mossformer_block.py:89-103)."""

    dim_in: int
    dim_out: int
    norm_type: str = "scalenorm"

    @nn.compact
    def __call__(self, x):
        if self.norm_type == "scalenorm":
            x = ScaleNorm(self.dim_in, name="norm")(x)
        else:
            x = nn.LayerNorm(name="norm")(x)
        x = jax.nn.silu(nn.Dense(self.dim_out, name="linear")(x))
        return ConvModuleRes(self.dim_out, name="conv")(x)


def _rotary(x: jax.Array, rot_dim: int) -> jax.Array:
    """Partial rotary embedding on the first ``rot_dim`` features (GPT-J
    style interleaved pairs), positions along axis 1."""
    t = x.shape[1]
    half = rot_dim // 2
    freqs = 1.0 / (10000 ** (np.arange(half) / half))
    angles = jnp.asarray(np.arange(t)[:, None] * freqs[None, :], jnp.float32)
    cos, sin = jnp.cos(angles), jnp.sin(angles)  # (T, half)
    xr = x[..., :rot_dim]
    x1, x2 = xr[..., 0::2], xr[..., 1::2]
    rot1 = x1 * cos - x2 * sin
    rot2 = x1 * sin + x2 * cos
    rotated = jnp.stack([rot1, rot2], axis=-1).reshape(*xr.shape)
    return jnp.concatenate([rotated, x[..., rot_dim:]], axis=-1)


class FlashBlock(nn.Module):
    """FLASH_ShareA_FFConvM (mossformer_block.py:143-294), non-causal."""

    dim: int
    group_size: int = 256
    query_key_dim: int = 128
    expansion_factor: float = 4.0
    norm_type: str = "scalenorm"
    shift_tokens: bool = True

    @nn.compact
    def __call__(self, x):  # (B, T, C)
        b, n, c = x.shape
        hidden = int(self.dim * self.expansion_factor)
        normed = x
        if self.shift_tokens:
            x_shift, x_pass = jnp.split(normed, 2, axis=-1)
            x_shift = jnp.pad(x_shift, ((0, 0), (1, 0), (0, 0)))[:, :-1]
            normed = jnp.concatenate([x_shift, x_pass], axis=-1)

        vu = FFConvM(self.dim, hidden, self.norm_type, name="to_hidden")(normed)
        v, u = jnp.split(vu, 2, axis=-1)
        qk = FFConvM(self.dim, self.query_key_dim, self.norm_type, name="to_qk")(normed)

        gamma = self.param(
            "qk_gamma",
            lambda key, s: 1.0 + 0.02 * jax.random.normal(key, s),
            (4, self.query_key_dim),
        )
        beta = self.param("qk_beta", nn.initializers.zeros, (4, self.query_key_dim))
        heads = qk[..., None, :] * gamma + beta  # (B, T, 4, D)
        quad_q, lin_q, quad_k, lin_k = [heads[..., i, :] for i in range(4)]

        rot = min(32, self.query_key_dim)
        quad_q, lin_q, quad_k, lin_k = (
            _rotary(t, rot) for t in (quad_q, lin_q, quad_k, lin_k)
        )

        g = self.group_size
        pad = (-n) % g
        if pad:
            quad_q, quad_k, lin_q, lin_k, vp, up = (
                jnp.pad(t, ((0, 0), (0, pad), (0, 0)))
                for t in (quad_q, quad_k, lin_q, lin_k, v, u)
            )
        else:
            vp, up = v, u
        ng = (n + pad) // g

        def grp(t):
            return t.reshape(b, ng, g, t.shape[-1])

        qq, qk_, lq, lk, vg, ug = map(grp, (quad_q, quad_k, lin_q, lin_k, vp, up))

        sim = jnp.einsum("bgid,bgjd->bgij", qq, qk_) / g
        attn = jax.nn.relu(sim) ** 2
        quad_v = jnp.einsum("bgij,bgjd->bgid", attn, vg)
        quad_u = jnp.einsum("bgij,bgjd->bgid", attn, ug)

        # Global linear attention (non-causal: mossformer_block.py:283-289).
        lin_kv = jnp.einsum("bgnd,bgne->bde", lk, vg) / n
        lin_v = jnp.einsum("bgnd,bde->bgne", lq, lin_kv)
        lin_ku = jnp.einsum("bgnd,bgne->bde", lk, ug) / n
        lin_u = jnp.einsum("bgnd,bde->bgne", lq, lin_ku)

        att_v = (quad_v + lin_v).reshape(b, n + pad, -1)[:, :n]
        att_u = (quad_u + lin_u).reshape(b, n + pad, -1)[:, :n]

        out = (att_u * v) * jax.nn.sigmoid(att_v * u)
        out = FFConvM(self.dim * 2, self.dim, self.norm_type, name="to_out")(out)
        return x + out


@register_model
class MossFormer(BaseModel):
    kernel_size: int = 16
    stride: int = 8
    bias: bool = False
    out_channels: int = 512
    in_channels: int = 512
    num_blocks: int = 24
    d_model: int = 512
    attn_dropout: float = 0.1
    group_size: int = 256
    query_key_dim: int = 128
    expansion_factor: float = 4.0
    causal: bool = False
    norm: str = "ln"
    num_spks: int = 2
    sample_rate: int = 16000

    def _blocks(self, x):
        for i in range(self.num_blocks):
            x = FlashBlock(
                self.d_model,
                self.group_size,
                self.query_key_dim,
                self.expansion_factor,
                name=f"flash_{i}",
            )(x)
        return x

    @nn.compact
    def __call__(self, wav: jax.Array) -> jax.Array:
        if wav.ndim == 1:
            wav = wav[None, :]
        bsz, nsample = wav.shape

        enc = jax.nn.relu(
            nn.Conv(
                self.out_channels, (self.kernel_size,), strides=(self.stride,),
                padding="VALID", use_bias=False, name="encoder",
            )(wav[..., None])
        )  # (B, S, N)

        # MaskNet (mossformer.py:364-476).
        x = GroupNorm1(name="masknet_norm")(enc)
        x = nn.Conv(self.out_channels, (1,), use_bias=False, name="conv1d_encoder")(x)
        x = x + ScaledSinuEmbedding(self.out_channels, name="pos_enc")(x.shape[1])
        att = self._blocks(x)
        att = nn.LayerNorm(epsilon=1e-6, name="att_final_norm")(att)
        att = GroupNorm1(name="att_norm")(att)
        x = x + att  # skip connection (ComputeAttention)
        x = PReLU(name="prelu")(x)
        x = nn.Conv(self.out_channels * self.num_spks, (1,), name="conv1d_out")(x)
        s_frames = x.shape[1]
        x = x.reshape(bsz, s_frames, self.num_spks, self.out_channels)
        x = jnp.moveaxis(x, 2, 1).reshape(bsz * self.num_spks, s_frames, self.out_channels)
        x = jnp.tanh(nn.Conv(self.out_channels, (1,), name="output")(x)) * (
            jax.nn.sigmoid(nn.Conv(self.out_channels, (1,), name="output_gate")(x))
        )
        x = nn.Conv(self.in_channels, (1,), use_bias=False, name="conv1_decoder")(x)
        masks = jax.nn.relu(x)  # (B*spks, S, N)

        masked = jnp.repeat(enc, self.num_spks, axis=0) * masks
        dec = nn.ConvTranspose(
            1, (self.kernel_size,), strides=(self.stride,), padding="VALID",
            use_bias=self.bias, name="decoder",
        )(masked)[..., 0]
        dec = dec[:, :nsample]
        dec = jnp.pad(dec, ((0, 0), (0, nsample - dec.shape[-1])))
        return dec.reshape(bsz, self.num_spks, nsample)
