"""Fast FullSubNet (mel-domain full/sub-band enhancement), flax/TPU-native.

Parity: enhancement/look2hear/models/fastfullsubnet.py:155-790 (config
enhancement/config/fastfullsubnet.yaml: 64 mels, shrink 2, LSTM, subband
neighbors 5): magnitude STFT → mel projection (HTK filterbank) → F_l2m
encoder LSTMs → per-mel subband bottleneck on time-downsampled units →
nearest time-upsampling → F_m2l decoder LSTMs emitting a (B, 2, F, T)
cIRM. Output contract matches FullSubNet (losses.cirm).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .base import BaseModel, register_model
from .fullsubnet import SequenceModel, _stft_features, freq_unfold, offline_laplace_norm


def mel_filterbank(
    n_freqs: int, n_mels: int, sample_rate: int, f_min: float = 0.0,
    f_max: float | None = None,
) -> np.ndarray:
    """torchaudio MelScale parity (HTK mels, no norm): (n_freqs, n_mels)."""
    f_max = f_max or sample_rate / 2.0

    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)

    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(hz_to_mel(f_min), hz_to_mel(f_max), n_mels + 2)
    f_pts = mel_to_hz(m_pts)
    f_diff = np.diff(f_pts)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels+2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


@register_model
class FastFullSubnet(BaseModel):
    look_ahead: int = 2
    shrink_size: int = 2
    sequence_model: str = "LSTM"
    encoder_input_size: int = 257
    num_mels: int = 64
    n_fft: int = 512
    hop_length: int = 256
    win_length: int = 512
    bottleneck_hidden_size: int = 384
    bottleneck_num_layers: int = 2
    noisy_input_num_neighbors: int = 5
    encoder_output_num_neighbors: int = 0
    norm_type: str = "offline_laplace_norm"
    weight_init: bool = False
    sample_rate: int = 16000

    def _downsample(self, x: jax.Array) -> jax.Array:
        """real_time_downsampling (fastfullsubnet.py:260-281); (..., T)."""
        s = self.shrink_size
        first = x[..., :1]
        rest = x[..., 1:]
        n_full = (rest.shape[-1] - 1) // s  # full blocks; remainder = last
        full = rest[..., : n_full * s].reshape(*rest.shape[:-1], n_full, s).mean(-1)
        last = rest[..., n_full * s :].mean(axis=-1, keepdims=True)
        return jnp.concatenate([first, full, last], axis=-1)

    def _upsample(self, x: jax.Array, target_len: int) -> jax.Array:
        s = self.shrink_size
        up = jnp.repeat(x, s, axis=-1)
        return up[..., :target_len]

    @nn.compact
    def __call__(self, wav: jax.Array):
        if wav.ndim == 1:
            wav = wav[None, :]
        mag, real, imag = _stft_features(wav, self.n_fft, self.hop_length)
        mix_mag = jnp.pad(mag, ((0, 0), (0, 0), (0, self.look_ahead)))
        b, f, t = mix_mag.shape

        fb = jnp.asarray(
            mel_filterbank(f, self.num_mels, self.sample_rate, 0.0, 8000.0)
        )
        mel_mag = jnp.einsum("bft,fm->bmt", mix_mag, fb)  # (B, M, T)

        # F_l2m encoder (fastfullsubnet.py:187-206).
        enc_in = jnp.swapaxes(offline_laplace_norm(mel_mag), 1, 2)  # (B, T, M)
        h = SequenceModel(0, 384, 1, sequence_model=self.sequence_model,
                          output_activate_function=None, name="encoder_0")(enc_in)
        enc_out = SequenceModel(64, 257, 1, sequence_model=self.sequence_model,
                                output_activate_function="ReLU", name="encoder_1")(h)
        enc_out = jnp.swapaxes(enc_out, 1, 2)  # (B, M=64, T)

        # Subband bottleneck over downsampled time.
        mel_unf = freq_unfold(mel_mag, self.noisy_input_num_neighbors)
        enc_unf = freq_unfold(enc_out, self.encoder_output_num_neighbors)
        bn_in = jnp.concatenate([mel_unf, enc_unf], axis=2)  # (B, M, n, T)
        n_unit = bn_in.shape[2]
        bn_shrunk = self._downsample(bn_in)
        bn_shrunk = offline_laplace_norm(bn_shrunk)
        t_small = bn_shrunk.shape[-1]
        bn_seq = jnp.swapaxes(
            bn_shrunk.reshape(b * self.num_mels, n_unit, t_small), 1, 2
        )
        bn_out = SequenceModel(
            1, self.bottleneck_hidden_size, self.bottleneck_num_layers,
            sequence_model=self.sequence_model,
            output_activate_function="ReLU",  # fastfullsubnet.py:225
            name="bottleneck",
        )(bn_seq)  # (B*M, T', 1)
        bn_out = jnp.swapaxes(bn_out, 1, 2).reshape(b, self.num_mels, t_small)
        bn_out = self._upsample(bn_out, t)  # (B, M, T)

        # F_m2l decoder.
        dec_in = jnp.concatenate([enc_out, bn_out], axis=1)  # (B, 128, T)
        dec_in = jnp.swapaxes(dec_in, 1, 2)
        h = SequenceModel(0, 512, 1, sequence_model=self.sequence_model,
                          output_activate_function=None, name="decoder_0")(dec_in)
        dec = SequenceModel(257 * 2, 512, 1, sequence_model=self.sequence_model,
                            output_activate_function=None, name="decoder_1")(h)
        dec = jnp.swapaxes(dec, 1, 2).reshape(b, 2, 257, t)
        return dec[:, :, :, self.look_ahead :], real, imag
