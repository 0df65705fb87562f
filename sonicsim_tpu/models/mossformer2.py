"""MossFormer2 (FLASH attention + gated dilated FSMN recurrence), flax.

Parity: separation/look2hear/models/mossformer2.py + mossformer_block.py
(MossformerBlockGFSMN :428-489) + fsmn.py (UniDeepFsmnDilated :114-143,
DilatedDenseNet :76-111): MossFormer's mask net where every FLASH block is
followed by a GatedFSMNBlockDilated — 1x1 bottleneck to 256, cLN, a gated
pair of FFConvM branches where the u-branch runs a dilated dense FSMN
memory (depth 2, lorder 20, InstanceNorm+PReLU per layer), cLN, 1x1 back.
Config separation/configs/mossformer2.yaml (same hyperparams as mossformer).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .base import BaseModel, register_model
from .layers import ChannelLayerNorm, GroupedConv1D, PReLU
from .mossformer import FFConvM, FlashBlock, MossFormer


class DilatedDenseFSMN(nn.Module):
    """fsmn.py DilatedDenseNet (:76-111) on (B, T, C): depth dilated
    depthwise memory convs with dense skip concatenation."""

    dim: int
    lorder: int = 20
    depth: int = 2

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        skip = x  # (B, T, C*(i+1)) growing
        out = x
        twidth = self.lorder * 2 - 1
        for i in range(self.depth):
            dil = 2**i
            pad = self.lorder + (dil - 1) * (self.lorder - 1) - 1
            y = jnp.pad(skip, ((0, 0), (pad, pad), (0, 0)))
            y = GroupedConv1D(
                self.dim,
                (twidth,),
                kernel_dilation=(dil,),
                feature_group_count=self.dim,
                use_bias=False,
                padding="VALID",
                name=f"conv_{i}",
            )(y)
            # InstanceNorm2d(affine) over time, per (B, C).
            mu = y.mean(axis=1, keepdims=True)
            var = y.var(axis=1, keepdims=True)
            gamma = self.param(f"in_gamma_{i}", nn.initializers.ones, (self.dim,))
            beta = self.param(f"in_beta_{i}", nn.initializers.zeros, (self.dim,))
            y = (y - mu) * jax.lax.rsqrt(var + 1e-5) * gamma + beta
            alpha = self.param(
                f"prelu_{i}", lambda key, s: jnp.full(s, 0.25), (self.dim,)
            )
            y = jnp.where(y >= 0, y, alpha * y)
            skip = jnp.concatenate([y, skip], axis=-1)
            out = y
        return out


class UniDeepFsmnDilated(nn.Module):
    """fsmn.py:114-143."""

    input_dim: int
    hidden_size: int
    lorder: int = 20
    depth: int = 2

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        f = jax.nn.relu(nn.Dense(self.hidden_size, name="linear")(x))
        p = nn.Dense(self.input_dim, use_bias=False, name="project")(f)
        mem = DilatedDenseFSMN(self.input_dim, self.lorder, self.depth, name="conv")(p)
        return x + mem


class GatedFSMNBlock(nn.Module):
    """GatedFSMNBlockDilated (mossformer_block.py:391-426)."""

    dim: int
    inner: int = 256

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, T, C)
        h = nn.Conv(self.inner, (1,), name="conv1")(x)
        h = PReLU(name="conv1_prelu")(h)
        h = ChannelLayerNorm(self.inner, name="norm1")(h)
        # Gated FSMN (mossformer_block.py:297-326).
        u = FFConvM(self.inner, self.inner, "layernorm", name="to_u")(h)
        v = FFConvM(self.inner, self.inner, "layernorm", name="to_v")(h)
        u = UniDeepFsmnDilated(self.inner, self.inner, name="fsmn")(u)
        h = v * u + h
        h = ChannelLayerNorm(self.inner, name="norm2")(h)
        h = nn.Conv(self.dim, (1,), name="conv2")(h)
        return h + x


@register_model
class MossFormer2(MossFormer):
    """Same interface/config keys as MossFormer (mossformer2.yaml)."""

    fsmn_inner: int = 256  # GatedFSMNBlockDilated inner_channels

    def _blocks(self, x):
        for i in range(self.num_blocks):
            x = FlashBlock(
                self.d_model,
                self.group_size,
                self.query_key_dim,
                self.expansion_factor,
                name=f"flash_{i}",
            )(x)
            x = GatedFSMNBlock(self.d_model, self.fsmn_inner, name=f"fsmn_{i}")(x)
        return x
