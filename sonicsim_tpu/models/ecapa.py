"""ECAPA-TDNN speaker embedder, TPU-native (flax, channel-last).

The reference re-tracks separated speakers across VAD segments with
speechbrain's pretrained spkrec-ecapa-voxceleb model
(separation/inference.py:21-30,60-83). This is that architecture —
TDNN stem, three SE-Res2Net blocks at dilations 2/3/4, multi-layer feature
aggregation, attentive statistics pooling with global context, 192-d
embedding — implemented natively so the stitcher's embedder runs on-device
from an imported speechbrain checkpoint instead of a torch sidecar.

Inference-mode module: BatchNorms carry imported running stats
(StatelessBatchNorm(use_running_stats=True)); forward parity vs a torch
replica of the published architecture is tested in tests/test_ecapa.py.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .zoo_layers import StatelessBatchNorm


def _same_pad(k: int, d: int) -> list[tuple[int, int]]:
    span = d * (k - 1)
    return [(span // 2, span - span // 2)]


class TDNNBlock(nn.Module):
    """Conv1d(k, dilation) → ReLU → BatchNorm (ECAPA_TDNN.py TDNNBlock)."""

    out_channels: int
    kernel_size: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, T, C)
        x = nn.Conv(
            self.out_channels,
            (self.kernel_size,),
            kernel_dilation=(self.dilation,),
            padding=_same_pad(self.kernel_size, self.dilation),
            name="conv",
        )(x)
        x = nn.relu(x)
        return StatelessBatchNorm(
            self.out_channels, use_running_stats=True, name="norm"
        )(x)


class Res2NetBlock(nn.Module):
    """Hierarchical multi-scale residual block (scale-way channel split)."""

    channels: int
    scale: int = 8
    kernel_size: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        width = self.channels // self.scale
        chunks = jnp.split(x, self.scale, axis=-1)
        outs = [chunks[0]]
        y = None
        for i in range(1, self.scale):
            inp = chunks[i] if i == 1 else chunks[i] + y
            y = TDNNBlock(
                width, self.kernel_size, self.dilation, name=f"block{i - 1}"
            )(inp)
            outs.append(y)
        return jnp.concatenate(outs, axis=-1)


class SEBlock(nn.Module):
    """Squeeze-and-excitation over time (ECAPA_TDNN.py SEBlock)."""

    channels: int
    se_channels: int = 128

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        s = x.mean(axis=1, keepdims=True)  # (B, 1, C)
        s = nn.relu(nn.Conv(self.se_channels, (1,), name="conv1")(s))
        s = nn.sigmoid(nn.Conv(self.channels, (1,), name="conv2")(s))
        return x * s


class SERes2NetBlock(nn.Module):
    channels: int
    res2net_scale: int = 8
    se_channels: int = 128
    kernel_size: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        residual = x
        x = TDNNBlock(self.channels, 1, 1, name="tdnn1")(x)
        x = Res2NetBlock(
            self.channels, self.res2net_scale, self.kernel_size, self.dilation,
            name="res2net",
        )(x)
        x = TDNNBlock(self.channels, 1, 1, name="tdnn2")(x)
        x = SEBlock(self.channels, self.se_channels, name="se")(x)
        return x + residual


class AttentiveStatsPool(nn.Module):
    """Attention-weighted mean+std with global context
    (ECAPA_TDNN.py AttentiveStatisticsPooling, global_context=True)."""

    channels: int
    attention_channels: int = 128
    eps: float = 1e-12

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, T, C) → (B, 2C)
        t = x.shape[1]
        mean = x.mean(axis=1, keepdims=True)
        std = jnp.sqrt(jnp.clip(x.var(axis=1, keepdims=True), self.eps))
        ctx = jnp.concatenate(
            [x, jnp.broadcast_to(mean, x.shape), jnp.broadcast_to(std, x.shape)],
            axis=-1,
        )
        attn = TDNNBlock(self.attention_channels, 1, 1, name="tdnn")(ctx)
        attn = nn.Conv(self.channels, (1,), name="conv")(jnp.tanh(attn))
        alpha = jax.nn.softmax(attn, axis=1)  # (B, T, C)
        mu = jnp.sum(alpha * x, axis=1)
        var = jnp.sum(alpha * x * x, axis=1) - mu * mu
        sg = jnp.sqrt(jnp.clip(var, self.eps))
        return jnp.concatenate([mu, sg], axis=-1)


class EcapaTdnn(nn.Module):
    """Full embedder: (B, T, n_feats) fbank frames → (B, lin_neurons)."""

    n_feats: int = 80
    channels: int = 1024
    res2net_scale: int = 8
    se_channels: int = 128
    attention_channels: int = 128
    lin_neurons: int = 192

    @nn.compact
    def __call__(self, feats: jax.Array) -> jax.Array:
        c = self.channels
        x = TDNNBlock(c, 5, 1, name="block0")(feats)
        outs = []
        for i, dil in enumerate((2, 3, 4)):
            x = SERes2NetBlock(
                c, self.res2net_scale, self.se_channels, 3, dil,
                name=f"block{i + 1}",
            )(x)
            outs.append(x)
        x = jnp.concatenate(outs, axis=-1)  # (B, T, 3C)
        x = TDNNBlock(3 * c, 1, 1, name="mfa")(x)
        x = AttentiveStatsPool(
            3 * c, self.attention_channels, name="asp"
        )(x)  # (B, 6C)
        x = StatelessBatchNorm(
            6 * c, use_running_stats=True, name="asp_bn"
        )(x[:, None, :])[:, 0]
        return nn.Dense(self.lin_neurons, name="fc")(x)


# ---------------------------------------------------------------------------
# Feature frontend: 80-dim log-mel fbanks, speechbrain Fbank conventions
# (n_fft 400, hop 160, 80 mels to 8 kHz, natural-log mel energies with
# top_db-free log, per-utterance mean normalization).
# ---------------------------------------------------------------------------


def speechbrain_mel_fb(sample_rate: int, n_fft: int, n_mels: int,
                       f_min: float = 0.0,
                       f_max: float | None = None) -> np.ndarray:
    """speechbrain.processing.features.Filterbank triangular filters:
    HTK mel points, each filter a SYMMETRIC triangle of half-width equal
    to its LEFT mel gap (band[:-1]) — not librosa's slaney-normalized
    asymmetric triangles. → (n_mels, n_fft//2+1)."""
    f_max = f_max if f_max is not None else sample_rate / 2

    def to_mel(hz):
        return 2595.0 * np.log10(1.0 + np.asarray(hz) / 700.0)

    def to_hz(mel):
        return 700.0 * (10.0 ** (np.asarray(mel) / 2595.0) - 1.0)

    hz = to_hz(np.linspace(to_mel(f_min), to_mel(f_max), n_mels + 2))
    band = (hz[1:] - hz[:-1])[:-1]  # (n_mels,)
    f_central = hz[1:-1]  # (n_mels,)
    all_freqs = np.linspace(0, sample_rate // 2, n_fft // 2 + 1)
    slope = (all_freqs[None, :] - f_central[:, None]) / band[:, None]
    return np.maximum(0.0, np.minimum(slope + 1.0, 1.0 - slope)).astype(
        np.float32
    )


def ecapa_fbank(wav: jax.Array, sample_rate: int = 16000,
                n_mels: int = 80, n_fft: int = 400, hop: int = 160):
    """(T,) or (B, T) waveform → (B, frames, n_mels) normalized log-fbanks.

    Replicates the speechbrain Fbank frontend the pretrained
    spkrec-ecapa-voxceleb checkpoint was trained on
    (speechbrain/lobes/features.py Fbank → processing/features.py STFT +
    Filterbank): periodic Hamming window, constant (zero) center padding,
    power spectrum, HTK-mel symmetric triangular filters, 10*log10 dB
    with a per-utterance top_db=80 floor, then sentence mean-norm
    (InputNormalization norm_type='sentence', std_norm=False)."""
    from ..ops.stft import stft

    wav = jnp.atleast_2d(wav.astype(jnp.float32))
    pad = n_fft // 2
    x = jnp.pad(wav, ((0, 0), (pad, pad)))  # torch.stft pad_mode=constant
    n = jnp.arange(n_fft)
    window = 0.54 - 0.46 * jnp.cos(2.0 * jnp.pi * n / n_fft)  # periodic
    spec = stft(x, n_fft, hop, window, center=False)  # (B, F, frames)
    power = jnp.abs(spec) ** 2
    fb = jnp.asarray(speechbrain_mel_fb(sample_rate, n_fft, n_mels))
    mel = jnp.einsum("mf,bft->btm", fb, power)
    db = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
    floor = db.max(axis=(1, 2), keepdims=True) - 80.0  # top_db
    db = jnp.maximum(db, floor)
    return db - db.mean(axis=1, keepdims=True)  # sentence mean-norm


# ---------------------------------------------------------------------------
# speechbrain checkpoint import
# ---------------------------------------------------------------------------


def convert_ecapa(sd: dict) -> dict:
    """speechbrain embedding_model state_dict → flax params for EcapaTdnn.

    Key layout (speechbrain lobes/models/ECAPA_TDNN.py): TDNNBlock =
    {conv.conv, norm.norm}; SERes2NetBlock = {tdnn1, res2net_block.blocks.i,
    tdnn2, se_block.conv{1,2}}; asp = {tdnn, conv}; fc is a 1x1 sb-Conv1d.
    """
    from .torch_import import conv1d

    def t(x):
        return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)

    def bn(key):
        return {
            "scale": t(sd[f"{key}.weight"]),
            "bias": t(sd[f"{key}.bias"]),
            "mean": t(sd[f"{key}.running_mean"]),
            "var": t(sd[f"{key}.running_var"]),
        }

    def tdnn(key):
        return {
            "conv": conv1d(sd, f"{key}.conv.conv"),
            "norm": bn(f"{key}.norm.norm"),
        }

    def se_res2(key, scale):
        p = {
            "tdnn1": tdnn(f"{key}.tdnn1"),
            "tdnn2": tdnn(f"{key}.tdnn2"),
            "se": {
                "conv1": conv1d(sd, f"{key}.se_block.conv1.conv"),
                "conv2": conv1d(sd, f"{key}.se_block.conv2.conv"),
            },
        }
        res2 = {
            f"block{i}": tdnn(f"{key}.res2net_block.blocks.{i}")
            for i in range(scale - 1)
        }
        p["res2net"] = res2
        return p

    idxs = {
        int(k.split("res2net_block.blocks.")[1].split(".")[0])
        for k in sd
        if "blocks.1.res2net_block.blocks." in k
    }
    scale = max(idxs) + 2  # scale-1 inner TDNN blocks
    params = {
        "block0": tdnn("blocks.0"),
        "mfa": tdnn("mfa"),
        "asp": {
            "tdnn": tdnn("asp.tdnn"),
            "conv": conv1d(sd, "asp.conv.conv"),
        },
        "asp_bn": bn("asp_bn.norm"),
        "fc": {
            "kernel": t(sd["fc.conv.weight"])[:, :, 0].T,
            "bias": t(sd["fc.conv.bias"])
            if "fc.conv.bias" in sd
            else np.zeros(t(sd["fc.conv.weight"]).shape[0], np.float32),
        },
    }
    for i in range(1, 4):
        params[f"block{i}"] = se_res2(f"blocks.{i}", scale)
    return {"params": params}


def make_ecapa_embedder(checkpoint_path):
    """ECAPA embed_fn(wav, sample_rate) for infer.stitch_segments.

    ``checkpoint_path``: speechbrain embedding_model.ckpt (a raw torch
    state_dict). Every architecture dimension is inferred from the weights.
    """
    import jax
    import torch

    sd = torch.load(checkpoint_path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                        else v) for k, v in sd.items()}
    stem = sd["blocks.0.conv.conv.weight"]  # (C, n_feats, 5)
    idxs = {
        int(k.split("res2net_block.blocks.")[1].split(".")[0])
        for k in sd
        if "blocks.1.res2net_block.blocks." in k
    }
    model = EcapaTdnn(
        n_feats=stem.shape[1],
        channels=stem.shape[0],
        res2net_scale=max(idxs) + 2,
        se_channels=sd["blocks.1.se_block.conv1.conv.weight"].shape[0],
        attention_channels=sd["asp.tdnn.conv.conv.weight"].shape[0],
        lin_neurons=sd["fc.conv.weight"].shape[0],
    )
    params = convert_ecapa(sd)
    fwd = jax.jit(lambda f: model.apply(params, f))

    def embed(wav, sample_rate=16000):
        wav = np.asarray(wav, np.float32)
        if sample_rate != 16000:
            # the pretrained weights expect 25 ms / 10 ms frames at 16 kHz;
            # n_fft/hop are in samples, so resample instead of rescaling
            # the filterbank only
            from ..utils.wavio import resample

            wav = resample(wav, sample_rate, 16000)
        feats = ecapa_fbank(
            jnp.asarray(wav), 16000, n_mels=model.n_feats,
        )
        out = np.asarray(fwd(feats))[0]
        return out / (np.linalg.norm(out) + 1e-9)

    return embed
