"""Inter-SubNet (subband interaction enhancement), flax/TPU-native.

Parity: enhancement/look2hear/models/inter_subnet.py:732-1474 (config
enhancement/config/inter_subnet.yaml: LSTM, 31-bin subband units, hidden
384, 2 SIL blocks): per-frequency subband magnitude units run through
stacked SIL blocks — a subband-interaction module (mean-pooled global
exchange across frequencies per frame) followed by a per-frequency LSTM —
ending in a 2-channel cIRM head. Same output contract as FullSubNet.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .base import BaseModel, register_model
from .fullsubnet import _stft_features, freq_unfold, offline_laplace_norm
from .layers import PReLU
from .zoo_layers import GroupNorm1


class SubbandInteraction(nn.Module):
    """inter_subnet.py:732-776: residual global exchange across the
    frequency-group axis. Input (B, F, T, N)."""

    input_size: int
    hidden_size: int

    @nn.compact
    def __call__(self, x):
        h = PReLU(name="in_prelu")(nn.Dense(self.hidden_size, name="input_linear")(x))
        mean = h.mean(axis=1, keepdims=True)  # pool over F
        mean = PReLU(name="mean_prelu")(nn.Dense(self.hidden_size, name="mean_linear")(mean))
        mean = jnp.broadcast_to(mean, h.shape)
        out = jnp.concatenate([h, mean], axis=-1)
        out = PReLU(name="out_prelu")(nn.Dense(self.input_size, name="output_linear")(out))
        # torch GroupNorm(1, N) runs per (B, F) group over (N, T)
        # (inter_subnet.py:773-774), not jointly over F.
        b, f, t, n = out.shape
        out = GroupNorm1(eps=1e-5, name="norm")(
            out.reshape(b * f, t, n)
        ).reshape(b, f, t, n)
        return x + out


class SILBlock(nn.Module):
    """inter_subnet.py:779-818: interaction + per-frequency LSTM + norm."""

    input_size: int
    tac_hidden: int
    lstm_hidden: int

    @nn.compact
    def __call__(self, x):  # (B, F, T, N)
        b, f, t, n = x.shape
        x = SubbandInteraction(self.input_size, self.tac_hidden, name="subinter")(x)
        h = x.reshape(b * f, t, n)
        h = nn.RNN(nn.OptimizedLSTMCell(self.lstm_hidden), name="rnn")(h)
        h = GroupNorm1(eps=1e-5, name="norm")(h)
        return h.reshape(b, f, t, self.lstm_hidden)


@register_model
class Inter_SubNet(BaseModel):
    num_freqs: int = 257
    look_ahead: int = 2
    sequence_model: str = "LSTM"
    sb_num_neighbors: int = 15
    sb_output_activate_function: str | bool = False
    sb_model_hidden_size: int = 384
    n_fft: int = 512
    hop_length: int = 256
    win_length: int = 512
    norm_type: str = "offline_laplace_norm"
    num_groups_in_drop_band: int = 2
    sbinter_middle_hidden_times: float = 0.8
    weight_init: bool = True
    sample_rate: int = 16000

    @nn.compact
    def __call__(self, wav: jax.Array):
        if wav.ndim == 1:
            wav = wav[None, :]
        mag, real, imag = _stft_features(wav, self.n_fft, self.hop_length)
        noisy_mag = jnp.pad(mag, ((0, 0), (0, 0), (0, self.look_ahead)))
        b, f, t = noisy_mag.shape
        n_sub = self.sb_num_neighbors * 2 + 1

        units = freq_unfold(noisy_mag, self.sb_num_neighbors)  # (B, F, N, T)
        units = offline_laplace_norm(units)
        x = jnp.swapaxes(units, 2, 3)  # (B, F, T, N)

        x = SILBlock(
            n_sub, 3 * n_sub, self.sb_model_hidden_size, name="sil_0"
        )(x)
        mid = int(self.sbinter_middle_hidden_times * self.sb_model_hidden_size)
        x = SILBlock(
            self.sb_model_hidden_size, mid, self.sb_model_hidden_size, name="sil_1"
        )(x)

        out = nn.Dense(2, name="fc_output")(x)  # (B, F, T, 2)
        crm = jnp.moveaxis(out, 3, 1)  # (B, 2, F, T)
        return crm[:, :, :, self.look_ahead :], real, imag
