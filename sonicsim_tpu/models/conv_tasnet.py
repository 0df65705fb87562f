"""Conv-TasNet (waveform masking separation), flax/TPU-native.

Behavioral parity with the reference implementation
(separation/look2hear/models/ConvTasnet.py:89-235; config
separation/configs/convtasnet.yaml): free conv encoder (N filters, kernel L,
stride L/2) → bottleneck 1x1 → R repeats of X dilated depthwise TCN blocks
→ per-speaker mask 1x1 + nonlinearity → masked transposed-conv decoder.

TPU-first choices: channel-last (B, T, C) activations so every 1x1 conv is
an MXU matmul and the depthwise convs tile cleanly; the API is always
(B, T) → (B, num_spks, T) (the reference's B==1 squeeze quirk at
ConvTasnet.py:225 is not reproduced).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .base import BaseModel, register_model
from .layers import GroupedConv1D, PReLU, get_activation, select_norm


class Conv1DBlock(nn.Module):
    """Dilated depthwise TCN residual block (ConvTasnet.py:89-115)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    dilation: int
    norm_type: str = "gLN"
    causal: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, T, Cin)
        w = nn.Conv(self.out_channels, (1,), name="conv1x1")(x)
        w = PReLU(name="prelu1")(w)
        w = select_norm(self.norm_type, self.out_channels)(w)
        pad = self.dilation * (self.kernel_size - 1)
        padding = [(pad, 0)] if self.causal else [(pad // 2, pad - pad // 2)]
        w = GroupedConv1D(
            self.out_channels,
            (self.kernel_size,),
            kernel_dilation=(self.dilation,),
            padding=padding,
            feature_group_count=self.out_channels,
            name="dwconv",
        )(w)
        w = PReLU(name="prelu2")(w)
        w = select_norm(self.norm_type, self.out_channels)(w)
        w = nn.Conv(self.in_channels, (1,), name="sconv")(w)
        return x + w


@register_model
class ConvTasNet(BaseModel):
    """Field names mirror the reference config keys (configs/convtasnet.yaml)."""

    N: int = 512
    L: int = 32
    B: int = 128
    H: int = 512
    P: int = 3
    X: int = 8
    R: int = 3
    norm: str = "gLN"
    num_spks: int = 2
    activate: str = "relu"
    causal: bool = False
    sample_rate: int = 16000

    @nn.compact
    def __call__(self, wav: jax.Array) -> jax.Array:  # (B, T) → (B, spks, T)
        if self.N != self.H:
            # The mask is sized H per speaker but multiplies the N-channel
            # encoder output — the reference carries the same implicit
            # contract (`x * m[i]`, ConvTasnet.py:196,211-222) and every
            # shipped config sets N == H. Fail with a clear message
            # instead of a broadcast error deep in the masking multiply.
            raise ValueError(
                f"ConvTasNet requires N == H (got N={self.N}, H={self.H}); "
                "the H-sized masks multiply the N-channel encoder output "
                "(ConvTasnet.py:196,211-222)"
            )
        if wav.ndim == 1:
            wav = wav[None, :]
        nsample = wav.shape[-1]
        x = wav[..., None]  # (B, T, 1)

        # Encoder (ConvTasnet.py:142-162): free filterbank + bottleneck.
        enc = nn.Conv(
            self.N, (self.L,), strides=(self.L // 2,), padding="VALID", name="encoder"
        )(x)  # (B, T', N)
        w = select_norm(self.norm, self.N)(enc)
        w = nn.Conv(self.B, (1,), name="bottleneck")(w)

        # Separator: R repeats of X dilated blocks (ConvTasnet.py:118-139).
        for r in range(self.R):
            for i in range(self.X):
                w = Conv1DBlock(
                    in_channels=self.B,
                    out_channels=self.H,
                    kernel_size=self.P,
                    dilation=2**i,
                    norm_type=self.norm,
                    causal=self.causal,
                    name=f"tcn_{r}_{i}",
                )(w)

        # Per-speaker masks (ConvTasnet.py:196,215-220).
        m = nn.Conv(self.H * self.num_spks, (1,), name="mask")(w)  # (B, T', H*S)
        bsz, t_enc, _ = m.shape
        m = m.reshape(bsz, t_enc, self.num_spks, self.H)
        if self.activate == "softmax":
            m = jax.nn.softmax(m, axis=2)
        else:
            m = get_activation(self.activate)(m)

        masked = enc[:, :, None, :] * m  # (B, T', S, H) — N == H by config
        masked = jnp.swapaxes(masked, 1, 2).reshape(bsz * self.num_spks, t_enc, self.H)

        # Decoder: transposed conv back to waveform (ConvTasnet.py:165-173).
        dec = nn.ConvTranspose(
            1, (self.L,), strides=(self.L // 2,), padding="VALID", name="decoder"
        )(masked)[..., 0]  # (B*S, T'')
        dec = dec[:, :nsample]
        dec = jnp.pad(dec, ((0, 0), (0, nsample - dec.shape[-1])))
        return dec.reshape(bsz, self.num_spks, nsample)
