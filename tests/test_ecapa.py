"""ECAPA-TDNN forward parity vs a torch replica of the published
architecture (speechbrain lobes/models/ECAPA_TDNN.py — the embedder the
reference's inference demo loads via spkrec-ecapa-voxceleb,
separation/inference.py:21-30), plus the stitcher integration.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

from sonicsim_tpu.models.ecapa import (
    EcapaTdnn,
    convert_ecapa,
    ecapa_fbank,
)

C, SCALE, SE, ATT, LIN, FEATS = 64, 4, 16, 24, 12, 20


class TTDNN(tnn.Module):
    def __init__(self, cin, cout, k, d=1):
        super().__init__()
        pad = d * (k - 1) // 2
        self.conv = tnn.Module()
        self.conv.conv = tnn.Conv1d(cin, cout, k, dilation=d, padding=pad)
        self.norm = tnn.Module()
        self.norm.norm = tnn.BatchNorm1d(cout)

    def forward(self, x):
        return self.norm.norm(torch.relu(self.conv.conv(x)))


class TRes2Net(tnn.Module):
    def __init__(self, c, scale, k, d):
        super().__init__()
        w = c // scale
        self.blocks = tnn.ModuleList(
            [TTDNN(w, w, k, d) for _ in range(scale - 1)]
        )
        self.scale = scale

    def forward(self, x):
        chunks = torch.chunk(x, self.scale, dim=1)
        outs, y = [chunks[0]], None
        for i in range(1, self.scale):
            inp = chunks[i] if i == 1 else chunks[i] + y
            y = self.blocks[i - 1](inp)
            outs.append(y)
        return torch.cat(outs, dim=1)


class TSE(tnn.Module):
    def __init__(self, c, se):
        super().__init__()
        self.conv1 = tnn.Module()
        self.conv1.conv = tnn.Conv1d(c, se, 1)
        self.conv2 = tnn.Module()
        self.conv2.conv = tnn.Conv1d(se, c, 1)

    def forward(self, x):
        s = x.mean(dim=2, keepdim=True)
        s = torch.relu(self.conv1.conv(s))
        s = torch.sigmoid(self.conv2.conv(s))
        return x * s


class TSERes2(tnn.Module):
    def __init__(self, c, scale, se, k, d):
        super().__init__()
        self.tdnn1 = TTDNN(c, c, 1)
        self.res2net_block = TRes2Net(c, scale, k, d)
        self.tdnn2 = TTDNN(c, c, 1)
        self.se_block = TSE(c, se)

    def forward(self, x):
        return x + self.se_block(self.tdnn2(
            self.res2net_block(self.tdnn1(x))
        ))


class TASP(tnn.Module):
    def __init__(self, c, att):
        super().__init__()
        self.tdnn = TTDNN(3 * c, att, 1)
        self.conv = tnn.Module()
        self.conv.conv = tnn.Conv1d(att, c, 1)
        self.eps = 1e-12

    def forward(self, x):
        t = x.shape[2]
        mean = x.mean(dim=2, keepdim=True).expand(-1, -1, t)
        std = x.var(dim=2, keepdim=True, unbiased=False).clamp(
            min=self.eps
        ).sqrt().expand(-1, -1, t)
        attn = self.conv.conv(torch.tanh(self.tdnn(
            torch.cat([x, mean, std], dim=1)
        )))
        alpha = torch.softmax(attn, dim=2)
        mu = (alpha * x).sum(dim=2)
        sg = ((alpha * x * x).sum(dim=2) - mu * mu).clamp(min=self.eps).sqrt()
        return torch.cat([mu, sg], dim=1)


class TEcapa(tnn.Module):
    def __init__(self):
        super().__init__()
        self.blocks = tnn.ModuleList(
            [TTDNN(FEATS, C, 5)]
            + [TSERes2(C, SCALE, SE, 3, d) for d in (2, 3, 4)]
        )
        self.mfa = TTDNN(3 * C, 3 * C, 1)
        self.asp = TASP(3 * C, ATT)
        self.asp_bn = tnn.Module()
        self.asp_bn.norm = tnn.BatchNorm1d(6 * C)
        self.fc = tnn.Module()
        self.fc.conv = tnn.Conv1d(6 * C, LIN, 1)

    def forward(self, feats):  # (B, T, FEATS)
        x = feats.transpose(1, 2)
        outs = []
        for i, blk in enumerate(self.blocks):
            x = blk(x)
            if i > 0:
                outs.append(x)
        x = self.mfa(torch.cat(outs, dim=1))
        x = self.asp(x).unsqueeze(2)
        x = self.asp_bn.norm(x)
        return self.fc.conv(x).squeeze(2)


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    m = TEcapa().eval()
    # Randomize BN running stats so the import path is actually exercised.
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, tnn.BatchNorm1d):
                mod.running_mean.normal_(0, 0.1)
                mod.running_var.uniform_(0.5, 1.5)
    return m


def test_ecapa_forward_parity(torch_model, rng):
    feats = rng.standard_normal((2, 50, FEATS)).astype(np.float32)
    with torch.no_grad():
        want = torch_model(torch.from_numpy(feats)).numpy()

    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    model = EcapaTdnn(
        n_feats=FEATS, channels=C, res2net_scale=SCALE, se_channels=SE,
        attention_channels=ATT, lin_neurons=LIN,
    )
    params = convert_ecapa(sd)
    got = np.asarray(model.apply(params, feats))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_ecapa_fbank_shape_and_norm(rng):
    wav = rng.standard_normal(16000).astype(np.float32)
    import jax.numpy as jnp

    feats = np.asarray(ecapa_fbank(jnp.asarray(wav)))
    assert feats.shape == (1, 101, 80)
    np.testing.assert_allclose(feats.mean(axis=1), 0.0, atol=1e-4)


def test_ecapa_embedder_in_stitcher(torch_model, tmp_path, rng):
    """make_ecapa_embedder round-trips a saved state_dict and plugs into
    stitch_segments as embed_fn."""
    ckpt = tmp_path / "embedding_model.ckpt"
    torch.save(torch_model.state_dict(), ckpt)

    from sonicsim_tpu.models.ecapa import make_ecapa_embedder

    embed = make_ecapa_embedder(ckpt)
    # The tiny random model still yields deterministic unit-norm embeddings.
    wav = rng.standard_normal(8000).astype(np.float32)
    e1, e2 = embed(wav, 16000), embed(wav, 16000)
    assert e1.shape == (LIN,)
    np.testing.assert_allclose(e1, e2, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(e1), 1.0, atol=1e-5)

    from sonicsim_tpu.infer import stitch_segments

    a = rng.standard_normal(8000).astype(np.float32)
    b = rng.standard_normal(8000).astype(np.float32)
    segs = [np.stack([a, b]), np.stack([b, a])]  # swapped in segment 2
    out = stitch_segments(segs, 16000, embed_fn=embed)
    np.testing.assert_array_equal(out[1], segs[1][[1, 0]])


def test_ecapa_fbank_stft_matches_torch_speechbrain_framing(rng):
    """speechbrain's STFT is torch.stft with a periodic Hamming window and
    CONSTANT (zero) center padding — verify our framing against torch."""
    import jax.numpy as jnp
    import torch

    from sonicsim_tpu.ops.stft import stft

    x = rng.standard_normal(3200).astype(np.float32)
    n_fft, hop = 400, 160
    want = torch.stft(
        torch.from_numpy(x), n_fft=n_fft, hop_length=hop,
        window=torch.hamming_window(n_fft, periodic=True),
        center=True, pad_mode="constant", return_complex=True,
    ).numpy()
    pad = n_fft // 2
    xp = jnp.pad(jnp.asarray(x), (pad, pad))
    n = jnp.arange(n_fft)
    window = 0.54 - 0.46 * jnp.cos(2.0 * jnp.pi * n / n_fft)
    got = np.asarray(stft(xp, n_fft, hop, window, center=False))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_speechbrain_mel_fb_shape_and_peaks():
    """HTK-mel symmetric triangles: unit peak per filter, support within
    [f_central - band, f_central + band]."""
    from sonicsim_tpu.models.ecapa import speechbrain_mel_fb

    fb = speechbrain_mel_fb(16000, 400, 80)
    assert fb.shape == (80, 201)
    assert fb.min() >= 0.0 and fb.max() <= 1.0 + 1e-6
    # Low-mel triangles can be narrower than the 40 Hz bin spacing (a
    # speechbrain property too), but most filters must have support and
    # their sampled peaks must march upward in frequency.
    has = fb.max(axis=1) > 0
    assert has.mean() > 0.8
    centers = fb[has].argmax(axis=1)
    assert (np.diff(centers) >= 0).all()
