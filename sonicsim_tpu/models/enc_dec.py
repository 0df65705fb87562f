"""Free-filterbank encoder/decoder helpers (asteroid-style API parity).

The reference's shared layers expose ``make_enc_dec``/``FreeFB``
(separation/look2hear/layers/enc_dec.py, SURVEY.md §2.3): a learned conv
filterbank encoder and its transposed-conv decoder, reused across
waveform-domain models. These are the channel-last flax equivalents; the
zoo models embed their own convs for checkpoint-name parity, while these
standalone modules serve new-model construction and experiments.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class FreeEncoder(nn.Module):
    """Learned analysis filterbank: (B, T) → (B, frames, n_filters)."""

    n_filters: int = 512
    kernel_size: int = 16
    stride: int | None = None
    use_bias: bool = False
    activation: str | None = None

    @nn.compact
    def __call__(self, wav: jax.Array) -> jax.Array:
        if wav.ndim == 1:
            wav = wav[None, :]
        stride = self.stride or self.kernel_size // 2
        x = nn.Conv(
            self.n_filters, (self.kernel_size,), strides=(stride,),
            padding="VALID", use_bias=self.use_bias, name="filterbank",
        )(wav[..., None])
        if self.activation == "relu":
            x = jax.nn.relu(x)
        return x


class FreeDecoder(nn.Module):
    """Learned synthesis filterbank: (B, frames, n_filters) → (B, T)."""

    kernel_size: int = 16
    stride: int | None = None
    use_bias: bool = False

    @nn.compact
    def __call__(self, rep: jax.Array, length: int | None = None) -> jax.Array:
        stride = self.stride or self.kernel_size // 2
        wav = nn.ConvTranspose(
            1, (self.kernel_size,), strides=(stride,), padding="VALID",
            use_bias=self.use_bias, name="filterbank",
        )(rep)[..., 0]
        if length is not None:
            wav = wav[..., :length]
            if wav.shape[-1] < length:
                wav = jnp.pad(
                    wav, [(0, 0)] * (wav.ndim - 1) + [(0, length - wav.shape[-1])]
                )
        return wav


def make_enc_dec(
    fb_name: str = "free",
    n_filters: int = 512,
    kernel_size: int = 16,
    stride: int | None = None,
    **kwargs,
) -> tuple[FreeEncoder, FreeDecoder]:
    """enc_dec.make_enc_dec parity (free filterbank only — the reference
    also only ships FreeFB)."""
    if fb_name != "free":
        raise ValueError("only the 'free' learned filterbank is supported")
    enc = FreeEncoder(n_filters=n_filters, kernel_size=kernel_size, stride=stride)
    dec = FreeDecoder(kernel_size=kernel_size, stride=stride)
    return enc, dec
