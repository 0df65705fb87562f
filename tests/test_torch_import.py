"""Checkpoint-import parity: torch ConvTasNet forward == flax forward.

Builds a torch model with the reference's architecture and parameter names
(ConvTasnet.py:89-235) from standard torch.nn parts, converts its random
weights through the import shim, and checks output parity to float32
tolerance. This validates that released reference ``best_model.pth`` files
load correctly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as tF

from sonicsim_tpu.models import ConvTasNet
from sonicsim_tpu.models.torch_import import import_torch_checkpoint

N, L, B, H, P, X, R, SPKS = 16, 8, 8, 16, 3, 2, 1, 2


class TorchGLN(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.beta = tnn.Parameter(torch.zeros(dim, 1))
        self.gamma = tnn.Parameter(torch.ones(dim, 1))

    def forward(self, x):
        mean = torch.mean(x, (1, 2), keepdim=True)
        var = torch.mean((x - mean) ** 2, (1, 2), keepdim=True)
        return self.gamma * (x - mean) / torch.sqrt(var + 1e-5) + self.beta


class TorchBlock(tnn.Module):
    def __init__(self, dilation):
        super().__init__()
        self.conv1x1 = tnn.Conv1d(B, H, 1)
        self.prelu1 = tnn.PReLU()
        self.norm1 = TorchGLN(H)
        pad = dilation * (P - 1) // 2
        self.dwconv = tnn.Conv1d(H, H, P, 1, padding=pad, dilation=dilation, groups=H)
        self.prelu2 = tnn.PReLU()
        self.norm2 = TorchGLN(H)
        self.sconv = tnn.Conv1d(H, B, 1)

    def forward(self, x):
        w = self.norm1(self.prelu1(self.conv1x1(x)))
        w = self.norm2(self.prelu2(self.dwconv(w)))
        return x + self.sconv(w)


class TorchTCN(tnn.Module):
    def __init__(self):
        super().__init__()
        self.tcn = tnn.ModuleList([TorchBlock(2**i) for i in range(X)])

    def forward(self, x):
        for blk in self.tcn:
            x = blk(x)
        return x


class TorchEncoder(tnn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = tnn.Conv1d(1, N, L, L // 2)
        self.norm = TorchGLN(N)
        self.conv1x1 = tnn.Conv1d(N, B, 1)

    def forward(self, x):
        x = self.encoder(x.unsqueeze(1))
        return x, self.conv1x1(self.norm(x))


class TorchDecoderWrap(tnn.Module):
    def __init__(self):
        super().__init__()
        self.decoder = tnn.ConvTranspose1d(H, 1, L, L // 2)


class TorchConvTasNet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = TorchEncoder()
        self.separation = tnn.Module()
        self.separation.sep = tnn.ModuleList([TorchTCN() for _ in range(R)])
        self.mask = tnn.Conv1d(B, H * SPKS, 1)
        self.decoder = TorchDecoderWrap()

    def forward(self, x):
        nsample = x.shape[-1]
        enc, w = self.encoder(x)
        for rep in self.separation.sep:
            w = rep(w)
        m = torch.chunk(self.mask(w), SPKS, dim=1)
        m = tF.relu(torch.stack(m, dim=0))
        outs = []
        for i in range(SPKS):
            d = self.decoder.decoder(enc * m[i])
            d = tF.pad(d, (0, nsample - d.shape[-1]))[:, 0] if d.shape[-1] < nsample else d[:, 0, :nsample]
            outs.append(d)
        return torch.stack(outs, dim=1)


def test_convtasnet_torch_import_parity(rng):
    torch.manual_seed(0)
    tmodel = TorchConvTasNet().eval()
    x = rng.standard_normal((2, 400)).astype(np.float32)
    with torch.no_grad():
        yt = tmodel(torch.from_numpy(x)).numpy()

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    jmodel = ConvTasNet(N=N, L=L, B=B, H=H, P=P, X=X, R=R, num_spks=SPKS)
    model, params = import_torch_checkpoint(
        {"model_name": "ConvTasNet", "model_args": {}, "state_dict": sd},
        model=jmodel,
    )
    yj = np.asarray(model.apply(params, jnp.asarray(x)))
    assert yj.shape == yt.shape
    np.testing.assert_allclose(yj, yt, rtol=1e-3, atol=1e-4)


class TorchDPRNNBlock(tnn.Module):
    def __init__(self, n, h):
        super().__init__()
        self.intra_rnn = tnn.LSTM(n, h, 1, batch_first=True)
        self.inter_rnn = tnn.LSTM(n, h, 1, batch_first=True)
        self.intra_norm = tnn.GroupNorm(1, n, eps=1.1920929e-7)
        self.inter_norm = tnn.GroupNorm(1, n, eps=1.1920929e-7)
        self.intra_linear = tnn.Linear(h, n)
        self.inter_linear = tnn.Linear(h, n)

    def forward(self, x):  # (B, N, K, S)
        B, N, K, S = x.shape
        intra = x.permute(0, 3, 2, 1).reshape(B * S, K, N)
        intra = self.intra_linear(self.intra_rnn(intra)[0])
        intra = intra.reshape(B, S, K, N).permute(0, 3, 2, 1)
        x = x + self.intra_norm(intra)
        inter = x.permute(0, 2, 3, 1).reshape(B * K, S, N)
        inter = self.inter_linear(self.inter_rnn(inter)[0])
        inter = inter.reshape(B, K, S, N).permute(0, 3, 1, 2)
        return x + self.inter_norm(inter)


def test_dprnn_lstm_and_groupnorm_import_parity(rng):
    """The hard conversions (LSTM gates, GroupNorm, Conv2d mask) round-trip:
    build a torch dual-path block with the reference's parameter names and
    check the flax DualRNNBlock forward matches after conversion."""
    import flax.linen as fnn

    from sonicsim_tpu.models.torch_import import groupnorm as _gn
    from sonicsim_tpu.models.torch_import import linear as _lin
    from sonicsim_tpu.models.torch_import import lstm_cell as _lstm
    from sonicsim_tpu.models.zoo_layers import DualRNNBlock

    torch.manual_seed(0)
    n_feat, hidden, K, S = 8, 12, 10, 6
    tblk = TorchDPRNNBlock(n_feat, hidden).eval()
    sd = {k: v.detach().numpy() for k, v in tblk.state_dict().items()}

    x = rng.standard_normal((2, n_feat, K, S)).astype(np.float32)
    with torch.no_grad():
        yt = tblk(torch.from_numpy(x)).numpy()  # (B, N, K, S)

    params = {
        "params": {
            "LSTMLayer_0": _lstm(sd, "intra_rnn"),
            "Dense_0": _lin(sd, "intra_linear"),
            "GroupNorm1_0": _gn(sd, "intra_norm"),
            "LSTMLayer_1": _lstm(sd, "inter_rnn"),
            "Dense_1": _lin(sd, "inter_linear"),
            "GroupNorm1_1": _gn(sd, "inter_norm"),
        }
    }
    jblk = DualRNNBlock(n_feat, hidden, bidirectional=False)
    xj = jnp.asarray(x.transpose(0, 3, 2, 1))  # (B, S, K, N)
    yj = np.asarray(jblk.apply(params, xj)).transpose(0, 3, 2, 1)
    np.testing.assert_allclose(yj, yt, rtol=1e-3, atol=1e-4)
