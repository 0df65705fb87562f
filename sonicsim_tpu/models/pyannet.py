"""PyanNet neural VAD, TPU-native (flax).

The reference segments eval mixtures with pyannote's
voice-activity-detection pipeline (separation/test.py:58-87: PyanNet
segmentation model + hysteresis binarization). This is that stack natively:

* SincNet frontend — parametric band-pass sinc filters (learned low/band
  cutoffs, Hamming window) at stride 10, abs, 3 conv blocks with maxpool-3
  and affine InstanceNorm + leaky ReLU;
* 2-layer BiLSTM (128 hidden) + 2 leaky-ReLU FF layers (128) + sigmoid
  classifier per frame;
* :func:`binarize_activations` — pyannote Binarize semantics (onset/offset
  hysteresis, min_duration_on/off, pad_onset/offset);
* :func:`make_neural_vad` — loads a pyannote checkpoint (torch state_dict,
  `model.`/lightning prefixes handled) and returns the framework's
  ``vad_fn(wav, sample_rate) -> [(start, end)]`` contract
  (infer/vad.py segment_mixture).

Forward parity is tested against a torch replica of the published
architecture in tests/test_pyannet.py (the pretrained pyannote weights are
gated behind HF auth upstream and are not shipped here either).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .gagnet import InstanceNorm
from .zoo_layers import LSTMLayer

LEAK = 0.01  # torch F.leaky_relu default


def sinc_filters(low_hz, band_hz, kernel_size: int, sample_rate: int,
                 min_low_hz: float = 50.0, min_band_hz: float = 50.0):
    """(F,) learned params → (F, kernel_size) band-pass FIR bank
    (SincNet, Ravanelli & Bengio 2018 — the parameterization pyannote's
    frontend learns)."""
    low = min_low_hz + jnp.abs(low_hz)
    high = jnp.clip(
        low + min_band_hz + jnp.abs(band_hz), min_low_hz, sample_rate / 2
    )
    half = (kernel_size - 1) // 2
    n = jnp.arange(-half, 0, dtype=jnp.float32) / sample_rate  # left half, s
    # SincNet's half-Hamming window samples linspace(0, k/2-1, k//2) —
    # NON-integer points for odd kernels (e.g. 0..124.5 for k=251), the
    # function the pretrained low_hz/band_hz were optimized against.
    n_lin = jnp.linspace(0.0, kernel_size / 2 - 1, half)
    window = 0.54 - 0.46 * jnp.cos(2 * jnp.pi * n_lin / kernel_size)
    f_low = 2 * jnp.pi * low[:, None] * n[None, :]
    f_high = 2 * jnp.pi * high[:, None] * n[None, :]
    # SincNet formula: left = (sin(2π f2 t) − sin(2π f1 t)) / (π t) · w,
    # center = 2·band; whole filter scaled by 1/(2·band).
    left = ((jnp.sin(f_high) - jnp.sin(f_low)) / (jnp.pi * n)[None, :]
            * window[None, :])
    band = (high - low)[:, None]
    filt = jnp.concatenate([left, 2 * band, left[:, ::-1]], axis=1)
    return filt / (2 * band)


class SincConv(nn.Module):
    n_filters: int = 80
    kernel_size: int = 251
    stride: int = 10
    sample_rate: int = 16000

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, T, 1) → (B, T', F)
        low = self.param(
            "low_hz",
            lambda k, n: jnp.linspace(0.0, 40.0, n, dtype=jnp.float32),
            self.n_filters,
        )
        band = self.param(
            "band_hz",
            lambda k, n: jnp.full((n,), 10.0, jnp.float32),
            self.n_filters,
        )
        filt = sinc_filters(low, band, self.kernel_size, self.sample_rate)
        return jax.lax.conv_general_dilated(
            x,
            filt.T[:, None, :],  # (k, 1, F)
            window_strides=(self.stride,),
            padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
        )


class SincNet(nn.Module):
    """pyannote/audio blocks/sincnet.py forward semantics, channel-last."""

    stride: int = 10
    sample_rate: int = 16000

    @nn.compact
    def __call__(self, wav: jax.Array) -> jax.Array:  # (B, T) → (B, T', 60)
        x = wav[..., None]  # (B, T, 1)
        x = InstanceNorm(1, name="wav_norm")(x)
        x = SincConv(stride=self.stride, sample_rate=self.sample_rate,
                     name="sinc")(x)
        x = jnp.abs(x)
        x = nn.max_pool(x, (3,), strides=(3,))
        x = nn.leaky_relu(InstanceNorm(80, name="norm0")(x), LEAK)
        x = nn.Conv(60, (5,), padding="VALID", name="conv1")(x)
        x = nn.max_pool(x, (3,), strides=(3,))
        x = nn.leaky_relu(InstanceNorm(60, name="norm1")(x), LEAK)
        x = nn.Conv(60, (5,), padding="VALID", name="conv2")(x)
        x = nn.max_pool(x, (3,), strides=(3,))
        return nn.leaky_relu(InstanceNorm(60, name="norm2")(x), LEAK)


class PyanNet(nn.Module):
    """SincNet → 2×BiLSTM(128) → 2×FF(128) → sigmoid frame activations."""

    n_classes: int = 1
    lstm_hidden: int = 128
    lstm_layers: int = 2
    ff_layers: int = 2
    sample_rate: int = 16000

    @nn.compact
    def __call__(self, wav: jax.Array) -> jax.Array:  # (B, T) → (B, F, K)
        x = SincNet(sample_rate=self.sample_rate, name="sincnet")(wav)
        for i in range(self.lstm_layers):
            x = LSTMLayer(self.lstm_hidden, bidirectional=True,
                          name=f"lstm{i}")(x)
        for i in range(self.ff_layers):
            x = nn.leaky_relu(
                nn.Dense(self.lstm_hidden, name=f"linear{i}")(x), LEAK
            )
        return nn.sigmoid(
            nn.Dense(self.n_classes, name="classifier")(x)
        )

    def frame_times(self, n_samples: int) -> np.ndarray:
        """Center time (seconds) of each output frame (receptive-field math
        of the three conv/pool stages at the given stride).

        Every stage maps an arithmetic sequence of centers to another
        arithmetic sequence (the mean of k consecutive terms is the middle
        term), so the whole cascade reduces to closed-form (offset, step,
        length) bookkeeping — no per-frame work."""
        # stage: (kernel, stride) in input samples
        offset, step, length = 0.0, 1.0, n_samples
        for k, s in ((251, 10), (3, 3), (5, 1), (3, 3), (5, 1), (3, 3)):
            offset += step * (k - 1) / 2.0
            length = (length - k) // s + 1
            step *= s
        pos = offset + step * np.arange(max(length, 0), dtype=np.float64)
        return pos / self.sample_rate


def binarize_activations(
    probs: np.ndarray,
    frame_times: np.ndarray,
    onset: float = 0.5,
    offset: float = 0.5,
    min_duration_on: float = 0.0,
    min_duration_off: float = 0.0,
    pad_onset: float = 0.0,
    pad_offset: float = 0.0,
) -> list[tuple[float, float]]:
    """pyannote.audio Binarize semantics: hysteresis thresholding with
    minimum-duration and padding post-processing → [(start_s, end_s)]."""
    spans: list[list[float]] = []
    active = False
    start = 0.0
    for t, p in zip(frame_times, probs):
        if not active and p > onset:
            active, start = True, t
        elif active and p < offset:
            spans.append([start, t])
            active = False
    if active:
        spans.append([start, float(frame_times[-1])])
    spans = [[s - pad_onset, e + pad_offset] for s, e in spans]
    # fill short gaps
    merged: list[list[float]] = []
    for s, e in spans:
        if merged and s - merged[-1][1] < min_duration_off:
            merged[-1][1] = e
        else:
            merged.append([s, e])
    # drop short active regions
    return [
        (max(s, 0.0), e) for s, e in merged if e - s >= min_duration_on
    ]


def convert_pyannet(sd: dict) -> dict:
    """pyannote PyanNet state_dict → flax params (lightning `model.` or
    bare prefixes; asteroid ParamSincFB low/band parameter names)."""
    from .torch_import import conv1d, lstm_cell

    sd = {k.removeprefix("model."): np.asarray(v) for k, v in sd.items()}

    def inorm(key):
        return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}

    def find(*cands):
        for c in cands:
            if c in sd:
                return sd[c]
        raise KeyError(cands)

    low = find(
        "sincnet.conv1d.0.filterbank.low_hz_", "sincnet.conv1d.0.low_hz_"
    ).reshape(-1)
    band = find(
        "sincnet.conv1d.0.filterbank.band_hz_", "sincnet.conv1d.0.band_hz_"
    ).reshape(-1)
    sinc_p = {"sinc": {"low_hz": low, "band_hz": band}}

    params: dict = {
        "sincnet": {
            **sinc_p,
            "wav_norm": inorm("sincnet.wav_norm1d"),
            "norm0": inorm("sincnet.norm1d.0"),
            "norm1": inorm("sincnet.norm1d.1"),
            "norm2": inorm("sincnet.norm1d.2"),
            "conv1": conv1d(sd, "sincnet.conv1d.1"),
            "conv2": conv1d(sd, "sincnet.conv1d.2"),
        }
    }
    for i in range(10):
        if f"lstm.weight_ih_l{i}" not in sd:
            break
        params[f"lstm{i}"] = {
            "OptimizedLSTMCell_0": lstm_cell(sd, "lstm", suffix=f"l{i}")[
                "OptimizedLSTMCell_0"
            ],
            "OptimizedLSTMCell_1": lstm_cell(
                sd, "lstm", suffix=f"l{i}", reverse=True
            )["OptimizedLSTMCell_0"],
        }
    from .torch_import import linear

    j = 0
    while f"linear.{j}.weight" in sd:
        params[f"linear{j}"] = linear(sd, f"linear.{j}")
        j += 1
    params["classifier"] = linear(sd, "classifier")
    return {"params": params}


def make_neural_vad(
    checkpoint_path,
    onset: float = 0.5,
    offset: float = 0.5,
    min_duration_on: float = 0.0,
    min_duration_off: float = 0.0,
):
    """vad_fn(wav, sample_rate) -> [(start_sample, end_sample)] backed by an
    imported PyanNet checkpoint — drop-in for infer.vad.segment_mixture's
    ``vad_fn`` hook (the reference's pyannote pipeline role)."""
    import torch

    sd = torch.load(checkpoint_path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                        else v) for k, v in sd.items()}
    sd_clean = {k.removeprefix("model."): v for k, v in sd.items()}
    n_classes = sd_clean["classifier.weight"].shape[0]
    hidden = sd_clean["lstm.weight_ih_l0"].shape[0] // 4
    # Infer depth from the checkpoint rather than hardcoding: flax
    # silently ignores unused param subtrees, so a too-shallow model
    # would skip imported LSTM/FF layers without any error.
    n_lstm = len([k for k in sd_clean
                  if k.startswith("lstm.weight_ih_l")
                  and not k.endswith("_reverse")])
    ff_ids = {k.split(".")[1] for k in sd_clean if k.startswith("linear.")}
    model = PyanNet(n_classes=n_classes, lstm_hidden=hidden,
                    lstm_layers=max(n_lstm, 1),
                    ff_layers=max(len(ff_ids), 1))
    params = convert_pyannet(sd)
    fwd = jax.jit(lambda w: model.apply(params, w))

    def vad_fn(wav, sample_rate=16000):
        wav = np.asarray(wav, np.float32).reshape(-1)
        if sample_rate != model.sample_rate:
            from ..utils.wavio import resample

            wav = resample(wav, sample_rate, model.sample_rate)
        probs = np.asarray(fwd(jnp.asarray(wav)[None]))[0]
        speech = probs.max(axis=-1)  # any-class activity
        times = model.frame_times(len(wav))
        spans = binarize_activations(
            speech, times, onset, offset, min_duration_on, min_duration_off
        )
        return [
            (int(s * sample_rate), int(e * sample_rate)) for s, e in spans
        ]

    return vad_fn
