"""TF-GridNet (full- + sub-band T-F modeling), flax/TPU-native.

Parity: separation/look2hear/models/TFGNet.py:352-785 (config
separation/configs/tfgnet.yaml: n_fft 512, hop 128, 6 layers, emb 48,
ks 4 / hs 1, BLSTM 192, 4-head full-band attention): variance-normalized
input → STFT → 2D conv embed → GridNetV2 blocks (intra-freq BLSTM over
unfolded patches, inter-frame BLSTM, frame-level full-band MHSA with
per-head PReLU+LN) → 2D transposed-conv to per-source complex spectra →
iSTFT, de-normalize.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.stft import hann_window, istft, stft
from .base import BaseModel, register_model


class AllHeadPReLULN(nn.Module):
    """AllHeadPReLULayerNormalization4DCF (TFGNet.py:739-768).

    Input (B, T, F, H*E) → (B, H, E, T, F) normalized."""

    n_head: int
    e_dim: int
    n_freqs: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, t, f, _ = x.shape
        h, e = self.n_head, self.e_dim
        # (B, T, F, H*E) → (B, H, E, T, F); torch views channel C=H*E with H
        # outer, so the last axis splits as (H, E).
        y = x.reshape(b, t, f, h, e).transpose(0, 3, 4, 1, 2)
        alpha = self.param("prelu_alpha", lambda k, s: jnp.full(s, 0.25), (h, 1, 1, 1))
        y = jnp.where(y >= 0, y, alpha[None] * y)
        mu = y.mean(axis=(2, 4), keepdims=True)
        var = y.var(axis=(2, 4), keepdims=True)
        gamma = self.param("gamma", nn.initializers.ones, (1, h, e, 1, self.n_freqs))
        beta = self.param("beta", nn.initializers.zeros, (1, h, e, 1, self.n_freqs))
        return ((y - mu) * jax.lax.rsqrt(var + self.eps)) * gamma + beta


class LayerNorm4DCF(nn.Module):
    """LayerNormalization4DCF (TFGNet.py:716-737): stats over (C, F)."""

    n_freqs: int
    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, T, F, C)
        mu = x.mean(axis=(2, 3), keepdims=True)
        var = x.var(axis=(2, 3), keepdims=True)
        gamma = self.param("gamma", nn.initializers.ones, (1, 1, self.n_freqs, self.dim))
        beta = self.param("beta", nn.initializers.zeros, (1, 1, self.n_freqs, self.dim))
        return ((x - mu) * jax.lax.rsqrt(var + self.eps)) * gamma + beta


def _unfold_1d(x: jax.Array, ks: int, hs: int) -> jax.Array:
    """(N, L, C) → (N, n_win, C*ks) with torch F.unfold channel-major order."""
    n, l, c = x.shape
    n_win = (l - ks) // hs + 1
    idx = jnp.arange(n_win)[:, None] * hs + jnp.arange(ks)[None, :]
    win = x[:, idx]  # (N, n_win, ks, C)
    return jnp.swapaxes(win, 2, 3).reshape(n, n_win, c * ks)


class GridNetV2Block(nn.Module):
    """TFGNet.py:539-713."""

    emb_dim: int
    emb_ks: int
    emb_hs: int
    n_freqs: int
    hidden: int
    n_head: int = 4
    approx_qk_dim: int = 512
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, T, Q, C)
        from .zoo_layers import LSTMLayer

        b, old_t, old_q, c = x.shape
        ks, hs = self.emb_ks, self.emb_hs
        olp = ks - hs
        t_pad = math.ceil((old_t + 2 * olp - ks) / hs) * hs + ks
        q_pad = math.ceil((old_q + 2 * olp - ks) / hs) * hs + ks
        x = jnp.pad(
            x,
            ((0, 0), (olp, t_pad - old_t - olp), (olp, q_pad - old_q - olp), (0, 0)),
        )

        # --- intra (across frequency) ---
        inp = x
        h = nn.LayerNorm(epsilon=self.eps, name="intra_norm")(inp)
        h = _unfold_1d(h.reshape(b * t_pad, q_pad, c), ks, hs)
        h = LSTMLayer(self.hidden, bidirectional=True, name="intra_rnn")(h)
        if ks == hs:
            h = nn.Dense(c * ks, name="intra_linear")(h)
            h = h.reshape(b, t_pad, -1, ks, c).reshape(b, t_pad, q_pad, c)
        else:
            h = nn.ConvTranspose(
                self.emb_dim, (ks,), strides=(hs,), padding="VALID",
                name="intra_linear",
            )(h)  # (B*T, Q, C)
            h = h.reshape(b, t_pad, q_pad, c)
        x = inp + h

        # --- inter (across time) ---
        inp = x
        h = nn.LayerNorm(epsilon=self.eps, name="inter_norm")(inp)
        h = jnp.swapaxes(h, 1, 2)  # (B, Q, T, C)
        h = _unfold_1d(h.reshape(b * q_pad, t_pad, c), ks, hs)
        h = LSTMLayer(self.hidden, bidirectional=True, name="inter_rnn")(h)
        if ks == hs:
            h = nn.Dense(c * ks, name="inter_linear")(h)
            h = h.reshape(b, q_pad, -1, ks, c).reshape(b, q_pad, t_pad, c)
        else:
            h = nn.ConvTranspose(
                self.emb_dim, (ks,), strides=(hs,), padding="VALID",
                name="inter_linear",
            )(h)
            h = h.reshape(b, q_pad, t_pad, c)
        x = inp + jnp.swapaxes(h, 1, 2)

        x = x[:, olp : olp + old_t, olp : olp + old_q]  # (B, T, Q, C)

        # --- full-band frame attention (TFGNet.py:699-711) ---
        e_dim = math.ceil(self.approx_qk_dim / self.n_freqs)
        q = AllHeadPReLULN(self.n_head, e_dim, old_q, name="attn_norm_Q")(
            nn.Conv(self.n_head * e_dim, (1, 1), name="attn_conv_Q")(x)
        )  # (B, H, E, T, F)
        k = AllHeadPReLULN(self.n_head, e_dim, old_q, name="attn_norm_K")(
            nn.Conv(self.n_head * e_dim, (1, 1), name="attn_conv_K")(x)
        )
        v_dim = self.emb_dim // self.n_head
        v = AllHeadPReLULN(self.n_head, v_dim, old_q, name="attn_norm_V")(
            nn.Conv(self.n_head * v_dim, (1, 1), name="attn_conv_V")(x)
        )
        # Flatten (E, F) per frame.
        qf = q.transpose(0, 1, 3, 2, 4).reshape(b, self.n_head, old_t, e_dim * old_q)
        kf = k.transpose(0, 1, 3, 2, 4).reshape(b, self.n_head, old_t, e_dim * old_q)
        vf = v.transpose(0, 1, 3, 2, 4).reshape(b, self.n_head, old_t, v_dim * old_q)
        attn = jax.nn.softmax(
            jnp.einsum("bhtd,bhsd->bhts", qf, kf) / math.sqrt(e_dim * old_q), axis=-1
        )
        out = jnp.einsum("bhts,bhsd->bhtd", attn, vf)  # (B, H, T, v*F)
        out = out.reshape(b, self.n_head, old_t, v_dim, old_q)
        out = out.transpose(0, 2, 4, 1, 3).reshape(b, old_t, old_q, self.n_head * v_dim)
        out = nn.Conv(self.emb_dim, (1, 1), name="attn_concat_conv")(out)
        alpha = self.param("attn_prelu", lambda key, s: jnp.full(s, 0.25), (1,))
        out = jnp.where(out >= 0, out, alpha * out)
        out = LayerNorm4DCF(old_q, self.emb_dim, name="attn_concat_norm")(out)
        return out + x


@register_model
class TFGridNet(BaseModel):
    input_dim: int = 64  # placeholder, unused (TFGNet.py:392)
    n_srcs: int = 2
    n_fft: int = 512
    stride: int = 128
    window: str = "hann"
    n_imics: int = 1
    n_layers: int = 6
    lstm_hidden_units: int = 192
    attn_n_head: int = 4
    attn_approx_qk_dim: int = 512
    emb_dim: int = 48
    emb_ks: int = 4
    emb_hs: int = 1
    activation: str = "prelu"
    eps: float = 1e-5
    use_builtin_complex: bool = False
    sample_rate: int = 16000

    @nn.compact
    def __call__(self, wav: jax.Array) -> jax.Array:
        if wav.ndim == 1:
            wav = wav[None, :]
        bsz, nsample = wav.shape
        n_freqs = self.n_fft // 2 + 1
        win = hann_window(self.n_fft)

        # Variance normalization (TFGNet.py:495-497); torch.std is Bessel-
        # corrected (ddof=1).
        std = jnp.std(wav, axis=1, keepdims=True, ddof=1) + 1e-8
        x = wav / std

        spec = stft(x, self.n_fft, self.stride, win)  # (B, F, T)
        spec = jnp.swapaxes(spec, 1, 2)  # (B, T, F)
        feats = jnp.stack([spec.real, spec.imag], axis=-1)  # (B, T, F, 2)
        n_frames = feats.shape[1]

        h = nn.Conv(self.emb_dim, (3, 3), padding=[(1, 1), (1, 1)], name="conv")(feats)
        h = nn.GroupNorm(num_groups=1, epsilon=self.eps, name="conv_norm")(h)

        for i in range(self.n_layers):
            h = GridNetV2Block(
                self.emb_dim,
                self.emb_ks,
                self.emb_hs,
                n_freqs,
                self.lstm_hidden_units,
                self.attn_n_head,
                self.attn_approx_qk_dim,
                self.eps,
                name=f"block_{i}",
            )(h)

        out = nn.ConvTranspose(
            self.n_srcs * 2, (3, 3), padding=[(1, 1), (1, 1)], name="deconv"
        )(h)  # (B, T, F, 2*S)
        out = out.reshape(bsz, n_frames, n_freqs, self.n_srcs, 2)
        est = out[..., 0] + 1j * out[..., 1]  # (B, T, F, S)
        est = jnp.moveaxis(est, 3, 1).reshape(bsz * self.n_srcs, n_frames, n_freqs)
        est = jnp.swapaxes(est, 1, 2)  # (B*S, F, T)
        wav_out = istft(est, self.n_fft, self.stride, win, length=nsample)
        wav_out = wav_out.reshape(bsz, self.n_srcs, nsample)
        return wav_out * std[..., None]  # (B,1,1) de-normalization broadcast
