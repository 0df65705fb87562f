"""PyanNet neural VAD: forward parity vs a torch replica, binarization
semantics, and the vad_fn contract."""

import math

import numpy as np
import pytest
import torch
import torch.nn as tnn

from sonicsim_tpu.models.pyannet import (
    PyanNet,
    binarize_activations,
    convert_pyannet,
    make_neural_vad,
)

SR = 16000


class TSinc(tnn.Module):
    """SincNet parametric filterbank (Ravanelli & Bengio formula)."""

    def __init__(self, n_filters=80, kernel_size=251, stride=10, sr=SR):
        super().__init__()
        self.k, self.stride, self.sr = kernel_size, stride, sr
        self.low_hz_ = tnn.Parameter(
            torch.linspace(0.0, 40.0, n_filters).view(-1, 1)
        )
        self.band_hz_ = tnn.Parameter(torch.full((n_filters, 1), 10.0))

    def filters(self):
        low = 50.0 + self.low_hz_.abs()
        high = (low + 50.0 + self.band_hz_.abs()).clamp(50.0, self.sr / 2)
        half = (self.k - 1) // 2
        n = torch.arange(-half, 0).float() / self.sr
        # true SincNet window: linspace(0, k/2-1, k//2) — non-integer pts
        window = 0.54 - 0.46 * torch.cos(
            2 * math.pi * torch.linspace(0.0, self.k / 2 - 1, half) / self.k
        )
        f1 = 2 * math.pi * low * n
        f2 = 2 * math.pi * high * n
        left = (torch.sin(f2) - torch.sin(f1)) / (math.pi * n) * window
        band = high - low
        filt = torch.cat([left, 2 * band, left.flip(-1)], dim=1)
        return (filt / (2 * band)).unsqueeze(1)  # (F, 1, k)

    def forward(self, x):  # (B, 1, T)
        return torch.nn.functional.conv1d(
            x, self.filters(), stride=self.stride
        )


class TSincNet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.wav_norm1d = tnn.InstanceNorm1d(1, affine=True)
        self.conv1d = tnn.ModuleList(
            [TSinc(), tnn.Conv1d(80, 60, 5), tnn.Conv1d(60, 60, 5)]
        )
        self.pool1d = tnn.ModuleList([tnn.MaxPool1d(3, 3)] * 3)
        self.norm1d = tnn.ModuleList(
            [tnn.InstanceNorm1d(80, affine=True),
             tnn.InstanceNorm1d(60, affine=True),
             tnn.InstanceNorm1d(60, affine=True)]
        )

    def forward(self, wav):  # (B, T)
        x = self.wav_norm1d(wav.unsqueeze(1))
        for c, (conv, pool, norm) in enumerate(
            zip(self.conv1d, self.pool1d, self.norm1d)
        ):
            x = conv(x)
            if c == 0:
                x = torch.abs(x)
            x = torch.nn.functional.leaky_relu(norm(pool(x)))
        return x  # (B, 60, T')


class TPyanNet(tnn.Module):
    def __init__(self, n_classes=1, hidden=32):
        super().__init__()
        self.sincnet = TSincNet()
        self.lstm = tnn.LSTM(60, hidden, num_layers=2, bidirectional=True,
                             batch_first=True)
        self.linear = tnn.ModuleList(
            [tnn.Linear(2 * hidden, hidden), tnn.Linear(hidden, hidden)]
        )
        self.classifier = tnn.Linear(hidden, n_classes)

    def forward(self, wav):
        x = self.sincnet(wav).transpose(1, 2)
        x, _ = self.lstm(x)
        for lin in self.linear:
            x = torch.nn.functional.leaky_relu(lin(x))
        return torch.sigmoid(self.classifier(x))


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    return TPyanNet(hidden=32).eval()


def test_pyannet_forward_parity(torch_model, rng):
    wav = rng.standard_normal((2, SR)).astype(np.float32) * 0.1
    with torch.no_grad():
        want = torch_model(torch.from_numpy(wav)).numpy()
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    model = PyanNet(lstm_hidden=32)
    params = convert_pyannet(sd)
    got = np.asarray(model.apply(params, wav))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_frame_times_monotone_and_cover():
    model = PyanNet()
    times = model.frame_times(SR)
    assert np.all(np.diff(times) > 0)
    assert 0.0 < times[0] < 0.05
    assert 0.9 < times[-1] <= 1.0


def test_binarize_hysteresis():
    times = np.arange(10) * 0.1
    probs = np.array([0.1, 0.9, 0.8, 0.6, 0.4, 0.9, 0.2, 0.1, 0.95, 0.9])
    # onset .7 / offset .3: enters at t=0.1, stays through 0.4/0.6 (above
    # offset), leaves below .3 at t=0.6; re-enters at 0.8.
    spans = binarize_activations(probs, times, onset=0.7, offset=0.3)
    np.testing.assert_allclose(spans, [(0.1, 0.6), (0.8, 0.9)], atol=1e-9)
    # min_duration_off merges the gap; min_duration_on drops short spans.
    spans = binarize_activations(
        probs, times, onset=0.7, offset=0.3, min_duration_off=0.5
    )
    np.testing.assert_allclose(spans, [(0.1, 0.9)], atol=1e-9)
    spans = binarize_activations(
        probs, times, onset=0.7, offset=0.3, min_duration_on=0.2
    )
    np.testing.assert_allclose(spans, [(0.1, 0.6)], atol=1e-9)


def test_make_neural_vad_contract(torch_model, tmp_path, rng):
    ckpt = tmp_path / "pyannet.ckpt"
    # Lightning-style checkpoint with "model." prefix.
    torch.save(
        {"state_dict": {f"model.{k}": v
                        for k, v in torch_model.state_dict().items()}},
        ckpt,
    )
    vad = make_neural_vad(ckpt, onset=0.5, offset=0.5)
    wav = (rng.standard_normal(2 * SR) * 0.1).astype(np.float32)
    spans = vad(wav, SR)
    assert isinstance(spans, list)
    for s, e in spans:
        assert isinstance(s, int) and isinstance(e, int)
        assert 0 <= s < e <= 2 * SR

    from sonicsim_tpu.infer import segment_mixture

    segs = segment_mixture(wav, SR, vad_fn=vad)
    assert all(e - s > 320 for s, e in segs)
