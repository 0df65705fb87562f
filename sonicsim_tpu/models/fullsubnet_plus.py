"""FullSubNet+ (multi-branch fullband attention + subband), flax/TPU-native.

Parity: enhancement/look2hear/models/fullsubnet_plus.py:439-1399 (config
enhancement/config/fullsubnet_plus.yaml: SE channel attention, TCN fullband
extractors on magnitude/real/imag, LSTM subband, neighbors 15): three
SE-gated fullband TCN branches (8 dilated blocks 1,2,5,9 ×2, hidden 512)
over mag/real/imag spectra; the subband LSTM consumes the unfolded
SE-attended magnitude plus all three fullband outputs and emits the cIRM.
Output contract matches FullSubNet (losses.cirm).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .base import BaseModel, register_model
from .fullsubnet import SequenceModel, _stft_features, freq_unfold, offline_laplace_norm
from .layers import GroupedConv1D, PReLU
from .zoo_layers import GroupNorm1


class ChannelSELayer(nn.Module):
    """fullsubnet_plus.py:54-88: SE over frequency 'channels' of (B, F, T)."""

    num_channels: int
    reduction_ratio: int = 2

    @nn.compact
    def __call__(self, x):  # (B, F, T)
        squeeze = x.mean(axis=2)  # (B, F)
        h = jax.nn.relu(
            nn.Dense(self.num_channels // self.reduction_ratio, name="fc1")(squeeze)
        )
        gate = jax.nn.sigmoid(nn.Dense(self.num_channels, name="fc2")(h))
        return x * gate[:, :, None]


class TCNBlock(nn.Module):
    """fullsubnet_plus.py:439-487 (non-causal, skip connection)."""

    channels: int
    hidden: int = 512
    kernel_size: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x):  # (B, T, F)
        y = nn.Conv(self.hidden, (1,), name="conv1x1")(x)
        y = GroupNorm1(eps=1e-8, name="norm1")(PReLU(name="prelu1")(y))
        pad = (self.dilation * (self.kernel_size - 1)) // 2
        y = GroupedConv1D(
            self.hidden, (self.kernel_size,), kernel_dilation=(self.dilation,),
            padding=[(pad, pad)], feature_group_count=self.hidden,
            name="depthwise",
        )(y)
        y = GroupNorm1(eps=1e-8, name="norm2")(PReLU(name="prelu2")(y))
        y = nn.Conv(self.channels, (1,), name="sconv")(y)
        return x + y


class TCNSequence(nn.Module):
    """SequenceModel('TCN') (fullsubnet_plus.py:543-555, 584-598):
    8 dilated TCN blocks + linear head. (B, T, F) → (B, T, F)."""

    channels: int
    activate: str | bool = "ReLU"

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate([1, 2, 5, 9, 1, 2, 5, 9]):
            x = TCNBlock(self.channels, dilation=d, name=f"tcn_{i}")(x)
        x = jax.nn.relu(x)  # trailing ReLU inside the Sequential
        # (fullsubnet_plus.py:551-555), before the linear head
        x = nn.Dense(self.channels, name="fc_output")(x)
        if self.activate == "ReLU":
            x = jax.nn.relu(x)
        elif self.activate == "Tanh":
            x = jnp.tanh(x)
        return x


@register_model
class FullSubNet_Plus(BaseModel):
    num_freqs: int = 257
    look_ahead: int = 2
    sequence_model: str = "LSTM"
    fb_num_neighbors: int = 0
    sb_num_neighbors: int = 15
    fb_output_activate_function: str | bool = "ReLU"
    sb_output_activate_function: str | bool = False
    fb_model_hidden_size: int = 512
    sb_model_hidden_size: int = 384
    n_fft: int = 512
    hop_length: int = 256
    win_length: int = 512
    channel_attention_model: str = "SE"
    norm_type: str = "offline_laplace_norm"
    num_groups_in_drop_band: int = 2
    output_size: int = 2
    subband_num: int = 1
    kersize: tuple[int, ...] = (3, 5, 10)
    weight_init: bool = True
    sample_rate: int = 16000

    @nn.compact
    def __call__(self, wav: jax.Array):
        if wav.ndim == 1:
            wav = wav[None, :]
        mag, real, imag = _stft_features(wav, self.n_fft, self.hop_length)
        pad = ((0, 0), (0, 0), (0, self.look_ahead))
        mag_p, real_p, imag_p = (jnp.pad(z, pad) for z in (mag, real, imag))
        b, f, t = mag_p.shape

        def branch(spec, name):
            x = offline_laplace_norm(spec)
            x = ChannelSELayer(self.num_freqs, name=f"{name}_se")(x)
            out = TCNSequence(
                self.num_freqs, self.fb_output_activate_function, name=f"{name}_tcn"
            )(jnp.swapaxes(x, 1, 2))
            return x, jnp.swapaxes(out, 1, 2)  # attended input, (B, F, T)

        fb_in, fb_out = branch(mag_p, "fb")
        _, fbr_out = branch(real_p, "fbr")
        _, fbi_out = branch(imag_p, "fbi")

        n_fb = self.fb_num_neighbors * 2 + 1
        sb_feats = jnp.concatenate(
            [
                freq_unfold(fb_in, self.sb_num_neighbors),
                freq_unfold(fb_out, self.fb_num_neighbors),
                freq_unfold(fbr_out, self.fb_num_neighbors),
                freq_unfold(fbi_out, self.fb_num_neighbors),
            ],
            axis=2,
        )  # (B, F, Fs+3*Ff, T)
        sb_feats = offline_laplace_norm(sb_feats)
        n_feat = sb_feats.shape[2]
        sb_in = jnp.swapaxes(sb_feats.reshape(b * f, n_feat, t), 1, 2)
        sb_mask = SequenceModel(
            output_size=self.output_size,
            hidden_size=self.sb_model_hidden_size,
            num_layers=2,
            sequence_model=self.sequence_model,
            output_activate_function=self.sb_output_activate_function,
            name="sb_model",
        )(sb_in)  # (B*F, T, 2)
        crm = jnp.moveaxis(sb_mask.reshape(b, f, t, self.output_size), 3, 1)
        return crm[:, :, :, self.look_ahead :], real, imag
