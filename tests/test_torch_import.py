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


# --- SuDORMRF import parity (sudormrf.py:159-330 naming) -------------------

class _TGlob(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.gamma = tnn.Parameter(torch.ones(c))
        self.beta = tnn.Parameter(torch.zeros(c))

    def forward(self, x):
        m = x.mean((1, 2), keepdim=True)
        v = ((x - m) ** 2).mean((1, 2), keepdim=True)
        xh = (x - m) / torch.sqrt(v + 1e-8)
        return self.gamma.view(1, -1, 1) * xh + self.beta.view(1, -1, 1)


class _TConvNormAct(tnn.Module):
    def __init__(self, nin, nout, k, stride=1, groups=1):
        super().__init__()
        self.conv = tnn.Conv1d(nin, nout, k, stride=stride,
                               padding=(k - 1) // 2, groups=groups)
        self.norm = _TGlob(nout)
        self.act = tnn.PReLU()

    def forward(self, x):
        return self.act(self.norm(self.conv(x)))


class _TDilConvNorm(tnn.Module):
    def __init__(self, nin, nout, k, stride=1, groups=1):
        super().__init__()
        self.conv = tnn.Conv1d(nin, nout, k, stride=stride,
                               padding=(k - 1) // 2, groups=groups)
        self.norm = _TGlob(nout)

    def forward(self, x):
        return self.norm(self.conv(x))


class _TNormAct(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.norm = _TGlob(c)
        self.act = tnn.PReLU()

    def forward(self, x):
        return self.act(self.norm(x))


class _TUConv(tnn.Module):
    def __init__(self, out_ch, in_ch, depth):
        super().__init__()
        self.depth = depth
        self.proj_1x1 = _TConvNormAct(out_ch, in_ch, 1)
        self.spp_dw = tnn.ModuleList(
            [_TDilConvNorm(in_ch, in_ch, 5, 1, groups=in_ch)]
            + [_TDilConvNorm(in_ch, in_ch, 5, 2, groups=in_ch)
               for _ in range(1, depth)]
        )
        self.upsampler = tnn.Upsample(scale_factor=2)
        self.final_norm = _TNormAct(in_ch)
        self.res_conv = tnn.Conv1d(in_ch, out_ch, 1)

    def forward(self, x):
        res = x
        out = [self.spp_dw[0](self.proj_1x1(x))]
        for k in range(1, self.depth):
            out.append(self.spp_dw[k](out[-1]))
        for _ in range(self.depth - 1):
            up = self.upsampler(out.pop(-1))
            out[-1] = out[-1] + up[..., : out[-1].shape[-1]]
        return self.res_conv(self.final_norm(out[-1])) + res


class _TSuDO(tnn.Module):
    def __init__(self, out_ch=8, in_ch=16, blocks=2, depth=3, k=9, basis=16, srcs=2):
        super().__init__()
        import math as _m
        self.k, self.basis, self.srcs = k, basis, srcs
        self.lcm = abs(k // 2 * 2 ** depth) // _m.gcd(k // 2, 2 ** depth)
        self.encoder = tnn.Conv1d(1, basis, k, stride=k // 2, padding=k // 2,
                                  bias=False)
        self.ln = _TGlob(basis)
        self.bottleneck = tnn.Conv1d(basis, out_ch, 1)
        self.sm = tnn.Sequential(
            *[_TUConv(out_ch, in_ch, depth) for _ in range(blocks)]
        )
        self.mask_net = tnn.Sequential(tnn.PReLU(),
                                       tnn.Conv1d(out_ch, srcs * basis, 1))
        self.decoder = tnn.ConvTranspose1d(
            basis * srcs, srcs, k, stride=k // 2, padding=k // 2,
            output_padding=k // 2 - 1, bias=False)

    def forward(self, wav):
        t = wav.shape[-1]
        pad = (-t) % self.lcm
        x = tF.pad(wav[:, None, :], (0, pad))
        x = self.encoder(x)
        s = x.clone()
        x = self.mask_net(self.sm(self.bottleneck(self.ln(x))))
        x = torch.relu(x.view(x.shape[0], self.srcs, self.basis, -1))
        x = x * s.unsqueeze(1)
        out = self.decoder(x.view(x.shape[0], -1, x.shape[-1]))
        return out[..., :t]


def test_sudormrf_torch_import_parity(rng):
    from sonicsim_tpu.models import SuDORMRF

    torch.manual_seed(1)
    tm = _TSuDO().eval()
    x = rng.standard_normal((2, 1600)).astype(np.float32) * 0.2
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()

    model = SuDORMRF(out_channels=8, in_channels=16, num_blocks=2,
                     upsampling_depth=3, enc_kernel_size=9,
                     enc_num_basis=16, num_sources=2)
    _, params = import_torch_checkpoint(
        {"model_name": "SuDORMRF", "model_args": {},
         "state_dict": {k: v.numpy() for k, v in tm.state_dict().items()}},
        model=model,
    )
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)


# --- AFRCNN import parity (afrcnn.py:157-366 naming) ------------------------

class _TAFBlocks(tnn.Module):
    def __init__(self, out_ch, in_ch, depth):
        super().__init__()
        self.depth = depth
        self.proj_1x1 = _TConvNormAct(out_ch, in_ch, 1)
        self.spp_dw = tnn.ModuleList(
            [_TDilConvNorm(in_ch, in_ch, 5, 1, groups=in_ch)]
            + [_TDilConvNorm(in_ch, in_ch, 5, 2, groups=in_ch)
               for _ in range(1, depth)]
        )
        self.fuse_layers = tnn.ModuleList([])
        for i in range(depth):
            fl = tnn.ModuleList([])
            for j in range(depth):
                if i - j == 1:
                    fl.append(_TDilConvNorm(in_ch, in_ch, 5, 2, groups=in_ch))
                elif abs(i - j) <= 1:
                    fl.append(None)
            self.fuse_layers.append(fl)
        self.concat_layer = tnn.ModuleList([
            _TConvNormAct(in_ch * (2 if i in (0, depth - 1) else 3), in_ch, 1)
            for i in range(depth)
        ])
        self.last_layer = tnn.Sequential(_TConvNormAct(in_ch * depth, in_ch, 1))
        self.res_conv = tnn.Conv1d(in_ch, out_ch, 1)

    def forward(self, x):
        res = x
        out = [self.spp_dw[0](self.proj_1x1(x))]
        for k in range(1, self.depth):
            out.append(self.spp_dw[k](out[-1]))
        fused = []
        for i in range(self.depth):
            n = out[i].shape[-1]
            parts = []
            if i - 1 >= 0:
                parts.append(self.fuse_layers[i][0](out[i - 1])[..., :n])
            parts.append(out[i])
            if i + 1 < self.depth:
                parts.append(tF.interpolate(out[i + 1], size=n, mode="nearest"))
            fused.append(self.concat_layer[i](torch.cat(parts, dim=1)))
        top = out[0].shape[-1]
        fused = [fused[0]] + [
            tF.interpolate(f, size=top, mode="nearest") for f in fused[1:]
        ]
        return self.res_conv(self.last_layer(torch.cat(fused, dim=1))) + res


class _TAFRCNN(tnn.Module):
    def __init__(self, out_ch=8, in_ch=16, blocks=2, depth=3, k=9, basis=16,
                 srcs=2):
        super().__init__()
        import math as _m
        self.k, self.basis, self.srcs, self.blocks_n = k, basis, srcs, blocks
        self.lcm = abs(k // 2 * 2 ** depth) // _m.gcd(k // 2, 2 ** depth)
        self.encoder = tnn.Conv1d(1, basis, k, stride=k // 2, padding=k // 2,
                                  bias=False)
        self.ln = _TGlob(basis)
        self.bottleneck = tnn.Conv1d(basis, out_ch, 1)

        class _Rec(tnn.Module):
            def __init__(s):
                super().__init__()
                s.blocks = _TAFBlocks(out_ch, in_ch, depth)
                s.concat_block = tnn.Sequential(
                    tnn.Conv1d(out_ch, out_ch, 1, 1, groups=out_ch), tnn.PReLU()
                )

            def forward(s, x):
                mix = x.clone()
                for i in range(blocks):
                    x = s.blocks(x if i == 0 else s.concat_block(mix + x))
                return x

        self.sm = _Rec()
        self.mask_net = tnn.Sequential(tnn.PReLU(),
                                       tnn.Conv1d(out_ch, srcs * basis, 1))
        self.decoder = tnn.ConvTranspose1d(
            basis * srcs, srcs, k, stride=k // 2, padding=k // 2,
            output_padding=k // 2 - 1, bias=False)

    def forward(self, wav):
        t = wav.shape[-1]
        x = tF.pad(wav[:, None, :], (0, (-t) % self.lcm))
        x = self.encoder(x)
        s = x.clone()
        x = self.mask_net(self.sm(self.bottleneck(self.ln(x))))
        x = torch.relu(x.view(x.shape[0], self.srcs, self.basis, -1))
        x = x * s.unsqueeze(1)
        return self.decoder(x.view(x.shape[0], -1, x.shape[-1]))[..., :t]


def test_afrcnn_torch_import_parity(rng):
    from sonicsim_tpu.models import AFRCNN

    torch.manual_seed(2)
    tm = _TAFRCNN().eval()
    x = rng.standard_normal((2, 1600)).astype(np.float32) * 0.2
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()

    model = AFRCNN(out_channels=8, in_channels=16, num_blocks=2,
                   upsampling_depth=3, enc_kernel_size=9,
                   enc_num_basis=16, num_sources=2)
    _, params = import_torch_checkpoint(
        {"model_name": "AFRCNN", "model_args": {},
         "state_dict": {k: v.numpy() for k, v in tm.state_dict().items()}},
        model=model,
    )
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)


# --- TDANet import parity (TDANet.py:199-557 naming; batch-1 eval) ----------

class _TConvNormNB(tnn.Module):
    def __init__(self, nin, nout, k, groups=1):
        super().__init__()
        self.conv = tnn.Conv1d(nin, nout, k, padding=(k - 1) // 2,
                               groups=groups, bias=False)
        self.norm = _TGlob(nout)

    def forward(self, x):
        return self.norm(self.conv(x))


class _TMlp(tnn.Module):
    def __init__(self, c, hid):
        super().__init__()
        self.fc1 = _TConvNormNB(c, hid, 1)
        self.dwconv = tnn.Conv1d(hid, hid, 5, 1, 2, groups=hid)
        self.fc2 = _TConvNormNB(hid, c, 1)

    def forward(self, x):
        return self.fc2(torch.relu(self.dwconv(self.fc1(x))))


class _TMHA(tnn.Module):
    def __init__(self, c, heads):
        super().__init__()
        import math as _m
        pe = torch.zeros(10000, c)
        pos = torch.arange(0, 10000).unsqueeze(1).float()
        div = torch.exp(torch.arange(0, c, 2).float() * -(_m.log(10000.0) / c))
        pe[:, 0::2] = torch.sin(pos * div)
        pe[:, 1::2] = torch.cos(pos * div)
        self.register_buffer("pe", pe.unsqueeze(0))
        self.attn_in_norm = tnn.LayerNorm(c)
        self.attn = tnn.MultiheadAttention(c, heads, 0.0)
        self.norm = tnn.LayerNorm(c)

    def forward(self, x):  # x (B, C, T); reference transpose quirk kept
        x = x.transpose(1, 2)
        out = self.attn_in_norm(x) + self.pe[:, : x.size(1)]
        out, _ = self.attn(out, out, out)
        out = self.norm(out + out)
        return out.transpose(1, 2)


class _TGlobalAtt(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.attn = _TMHA(c, 8)
        self.mlp = _TMlp(c, c * 2)

    def forward(self, x):
        x = x + self.attn(x)
        return x + self.mlp(x)


class _TInjection(tnn.Module):
    def __init__(self, c, k=1, with_sum=False):
        super().__init__()
        self.local_embedding = _TConvNormNB(c, c, k, groups=c)
        if with_sum:
            self.global_embedding = _TConvNormNB(c, c, k, groups=c)
        self.global_act = _TConvNormNB(c, c, k, groups=c)
        self.with_sum = with_sum

    def forward(self, xl, xg):
        t = xl.shape[-1]
        out = self.local_embedding(xl) * tF.interpolate(
            torch.sigmoid(self.global_act(xg)), size=t, mode="nearest")
        if self.with_sum:
            out = out + tF.interpolate(self.global_embedding(xg), size=t,
                                       mode="nearest")
        return out


class _TTDAUConv(tnn.Module):
    def __init__(self, out_ch, in_ch, depth):
        super().__init__()
        self.depth = depth
        self.proj_1x1 = _TConvNormAct(out_ch, in_ch, 1)
        self.spp_dw = tnn.ModuleList(
            [_TDilConvNorm(in_ch, in_ch, 5, 1, groups=in_ch)]
            + [_TDilConvNorm(in_ch, in_ch, 5, 2, groups=in_ch)
               for _ in range(1, depth)]
        )
        self.loc_glo_fus = tnn.ModuleList(
            [_TInjection(in_ch) for _ in range(depth)])
        self.res_conv = tnn.Conv1d(in_ch, out_ch, 1)
        self.globalatt = _TGlobalAtt(in_ch)
        self.last_layer = tnn.ModuleList(
            [_TInjection(in_ch, 5, with_sum=True) for _ in range(depth - 1)])

    def forward(self, x):
        res = x
        out = [self.spp_dw[0](self.proj_1x1(x))]
        for k in range(1, self.depth):
            out.append(self.spp_dw[k](out[-1]))
        gf = sum(tF.adaptive_avg_pool1d(f, out[-1].shape[-1]) for f in out)
        gf = self.globalatt(gf)
        fused = [self.loc_glo_fus[i](out[i], gf) for i in range(self.depth)]
        exp = None
        for i in range(self.depth - 2, -1, -1):
            other = fused[i - 1] if i == self.depth - 2 else exp
            exp = self.last_layer[i](fused[i], other)
        return self.res_conv(exp) + res


class _TTDANet(tnn.Module):
    def __init__(self, out_ch=8, in_ch=16, blocks=2, depth=3, k=16, srcs=2):
        super().__init__()
        self.k, self.srcs, self.blocks_n = k, srcs, blocks
        self.basis = k // 2 + 1
        self.encoder = tnn.Conv1d(1, self.basis, k, stride=k // 4,
                                  padding=k // 2, bias=False)
        self.ln = _TGlob(self.basis)
        self.bottleneck = tnn.Conv1d(self.basis, out_ch, 1)

        class _Rec(tnn.Module):
            def __init__(s):
                super().__init__()
                s.unet = _TTDAUConv(out_ch, in_ch, depth)
                s.concat_block = tnn.Sequential(
                    tnn.Conv1d(out_ch, out_ch, 1, 1, groups=out_ch), tnn.PReLU())

            def forward(s, x):
                mix = x.clone()
                for i in range(blocks):
                    x = s.unet(x if i == 0 else s.concat_block(mix + x))
                return x

        self.sm = _Rec()
        self.mask_net = tnn.Sequential(
            tnn.PReLU(), tnn.Conv1d(out_ch, srcs * self.basis, 1))
        self.decoder = tnn.ConvTranspose1d(
            self.basis * srcs, srcs, k, stride=k // 4, padding=k // 2,
            bias=False)

    def forward(self, wav):
        k, stride = self.k, self.k // 4
        b, n = wav.shape
        rest = k - (stride + n % k) % k
        x = wav
        if rest > 0:
            x = tF.pad(x, (0, rest))
        x = tF.pad(x, (k - stride, k - stride))
        x = self.encoder(x[:, None, :])
        s = x.clone()
        x = self.mask_net(self.sm(self.bottleneck(self.ln(x))))
        x = torch.relu(x.view(x.shape[0], self.srcs, self.basis, -1))
        x = x * s.unsqueeze(1)
        out = self.decoder(x.view(x.shape[0], -1, x.shape[-1]))
        return out[:, :, k - stride : -(rest + k - stride)]


def test_tdanet_torch_import_parity(rng):
    from sonicsim_tpu.models import TDANet

    torch.manual_seed(3)
    tm = _TTDANet().eval()
    x = rng.standard_normal((1, 1600)).astype(np.float32) * 0.2
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()

    model = TDANet(out_channels=8, in_channels=16, num_blocks=2,
                   upsampling_depth=3, enc_kernel_size=1, num_sources=2,
                   torch_compat=True)
    _, params = import_torch_checkpoint(
        {"model_name": "TDANet", "model_args": {},
         "state_dict": {kk: v.numpy() for kk, v in tm.state_dict().items()}},
        model=model,
    )
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)


# --- BSRNN import parity (bsrnn.py:6-180 naming) ----------------------------

class _TResRNN(tnn.Module):
    def __init__(self, c, h):
        super().__init__()
        self.norm = tnn.GroupNorm(1, c, torch.finfo(torch.float32).eps)
        self.rnn = tnn.LSTM(c, h, 1, batch_first=True, bidirectional=True)
        self.proj = tnn.Linear(h * 2, c)

    def forward(self, x):  # (B, C, T)
        y, _ = self.rnn(self.norm(x).transpose(1, 2))
        return x + self.proj(y).transpose(1, 2)


class _TBSNet(tnn.Module):
    def __init__(self, in_ch, nband):
        super().__init__()
        self.nband, self.fd = nband, in_ch // nband
        self.band_rnn = _TResRNN(self.fd, self.fd * 2)
        self.band_comm = _TResRNN(self.fd, self.fd * 2)

    def forward(self, x):
        b, n, t = x.shape
        y = self.band_rnn(x.reshape(b * self.nband, self.fd, -1))
        y = y.view(b, self.nband, -1, t)
        y = y.permute(0, 3, 2, 1).reshape(b * t, -1, self.nband)
        y = self.band_comm(y).view(b, t, -1, self.nband).permute(0, 3, 2, 1)
        return y.reshape(b, n, t)


class _TBSRNN(tnn.Module):
    def __init__(self, sr=16000, win=512, stride=128, fd=8, repeat=1, out=2):
        super().__init__()
        self.win, self.stride, self.fd, self.out = win, stride, fd, out
        enc = win // 2 + 1
        bw = lambda hz: int(np.floor(hz / (sr / 2) * enc))
        self.band_width = [bw(50)] * 20 + [bw(100)] * 10 + [bw(250)] * 8 + \
            [bw(500)] * 8
        self.band_width.append(enc - int(np.sum(self.band_width)))
        self.nband = len(self.band_width)
        eps = torch.finfo(torch.float32).eps
        self.BN = tnn.ModuleList([
            tnn.Sequential(tnn.GroupNorm(1, w * 2, eps), tnn.Conv1d(w * 2, fd, 1))
            for w in self.band_width])
        self.separator = tnn.Sequential(
            *[_TBSNet(self.nband * fd, self.nband) for _ in range(repeat)])
        self.mask = tnn.ModuleList([
            tnn.Sequential(
                tnn.GroupNorm(1, fd, eps),
                tnn.Conv1d(fd, fd * out, 1), tnn.Tanh(),
                tnn.Conv1d(fd * out, fd * 2 * out, 1, groups=out), tnn.Tanh(),
                tnn.Conv1d(fd * 2 * out, w * 4 * out, 1, groups=out))
            for w in self.band_width])

    def forward(self, wav):
        b, n = wav.shape
        spec = torch.stft(wav, n_fft=self.win, hop_length=self.stride,
                          window=torch.hann_window(self.win),
                          return_complex=True)
        ri = torch.stack([spec.real, spec.imag], 1)
        feats, subs = [], []
        idx = 0
        for i, w in enumerate(self.band_width):
            band_ri = ri[:, :, idx:idx + w]
            subs.append(spec[:, idx:idx + w])
            feats.append(self.BN[i](band_ri.reshape(b, w * 2, -1)))
            idx += w
        x = torch.stack(feats, 1).reshape(b, self.nband * self.fd, -1)
        x = self.separator(x).view(b, self.nband, self.fd, -1)
        est = []
        for i, w in enumerate(self.band_width):
            o = self.mask[i](x[:, i]).view(b, 2, 2, self.out, w, -1)
            msk = o[:, 0] * torch.sigmoid(o[:, 1])
            mr, mi = msk[:, 0], msk[:, 1]
            mr = mr - (mr.sum(1, keepdim=True) - 1) / self.out
            mi = mi - mi.sum(1, keepdim=True) / self.out
            sr_ = subs[i].real.unsqueeze(1)
            si_ = subs[i].imag.unsqueeze(1)
            est.append(torch.complex(sr_ * mr - si_ * mi, sr_ * mi + si_ * mr))
        est = torch.cat(est, 2)
        out = torch.istft(est.reshape(b * self.out, self.win // 2 + 1, -1),
                          n_fft=self.win, hop_length=self.stride,
                          window=torch.hann_window(self.win), length=n)
        return out.view(b, self.out, -1)


def test_bsrnn_torch_import_parity(rng):
    from sonicsim_tpu.models import BSRNN

    torch.manual_seed(4)
    tm = _TBSRNN().eval()
    x = rng.standard_normal((2, 1600)).astype(np.float32) * 0.2
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()

    model = BSRNN(feature_dim=8, num_repeat=1, num_output=2, win=512,
                  stride=128, sample_rate=16000)
    _, params = import_torch_checkpoint(
        {"model_name": "BSRNN", "model_args": {},
         "state_dict": {k: v.numpy() for k, v in tm.state_dict().items()}},
        model=model,
    )
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)


# --- DCCRN import parity (dccrn.py:11-226 + complexnn.py naming) ------------

def _stft_kernels(win_len, fft_len, invers=False):
    from scipy.signal import get_window
    window = get_window("hann", win_len, fftbins=True)
    basis = np.fft.rfft(np.eye(fft_len))[:win_len]
    kernel = np.concatenate([basis.real, basis.imag], 1).T
    if invers:
        kernel = np.linalg.pinv(kernel).T
    kernel = (kernel * window)[:, None, :]
    return (torch.from_numpy(kernel.astype(np.float32)),
            torch.from_numpy(window[None, :, None].astype(np.float32)))


class _TCC2d(tnn.Module):
    def __init__(self, cin, cout, k=(5, 2), stride=(2, 1), padding=(2, 1)):
        super().__init__()
        self.pad_t = padding[1]
        self.real_conv = tnn.Conv2d(cin // 2, cout // 2, k, stride,
                                    padding=[padding[0], 0])
        self.imag_conv = tnn.Conv2d(cin // 2, cout // 2, k, stride,
                                    padding=[padding[0], 0])

    def forward(self, x):  # causal time pad
        x = tF.pad(x, [self.pad_t, 0, 0, 0])
        real, imag = torch.chunk(x, 2, 1)
        rr, ii = self.real_conv(real), self.imag_conv(imag)
        ri, ir = self.imag_conv(real), self.real_conv(imag)
        return torch.cat([rr - ii, ri + ir], 1)


class _TCCT2d(tnn.Module):
    def __init__(self, cin, cout, k=(5, 2), stride=(2, 1)):
        super().__init__()
        self.real_conv = tnn.ConvTranspose2d(cin // 2, cout // 2, k, stride,
                                             padding=(2, 0),
                                             output_padding=(1, 0))
        self.imag_conv = tnn.ConvTranspose2d(cin // 2, cout // 2, k, stride,
                                             padding=(2, 0),
                                             output_padding=(1, 0))

    def forward(self, x):
        real, imag = torch.chunk(x, 2, 1)
        rr, ii = self.real_conv(real), self.imag_conv(imag)
        ri, ir = self.imag_conv(real), self.real_conv(imag)
        return torch.cat([rr - ii, ri + ir], 1)


class _TNCLSTM(tnn.Module):
    def __init__(self, input_size, hidden_size, projection_dim=None):
        super().__init__()
        self.real_lstm = tnn.LSTM(input_size // 2, hidden_size // 2, 1)
        self.imag_lstm = tnn.LSTM(input_size // 2, hidden_size // 2, 1)
        if projection_dim is not None:
            self.r_trans = tnn.Linear(hidden_size // 2, projection_dim // 2)
            self.i_trans = tnn.Linear(hidden_size // 2, projection_dim // 2)
        self.proj = projection_dim

    def forward(self, rin):
        real, imag = rin
        r2r, r2i = self.real_lstm(real)[0], self.imag_lstm(real)[0]
        i2r, i2i = self.real_lstm(imag)[0], self.imag_lstm(imag)[0]
        ro, io = r2r - i2i, i2r + r2i
        if self.proj is not None:
            ro, io = self.r_trans(ro), self.i_trans(io)
        return [ro, io]


class _TDCCRN(tnn.Module):
    def __init__(self, win=48, inc=12, fft=64, kernel_num=(8, 16),
                 rnn_layers=2, rnn_units=16):
        super().__init__()
        self.win, self.inc, self.fft = win, inc, fft
        kn = [2] + list(kernel_num)
        self.kn = kn
        k_f, _ = _stft_kernels(win, fft)
        k_i, w = _stft_kernels(win, fft, invers=True)
        self.register_buffer("fwd_k", k_f)
        self.register_buffer("inv_k", k_i)
        self.register_buffer("win_buf", w)
        self.register_buffer("enframe", torch.eye(win)[:, None, :])
        self.encoder = tnn.ModuleList([
            tnn.Sequential(_TCC2d(kn[i], kn[i + 1]),
                           tnn.BatchNorm2d(kn[i + 1]), tnn.PReLU())
            for i in range(len(kn) - 1)])
        hidden = fft // (2 ** len(kn))
        rnns = []
        for li in range(rnn_layers):
            rnns.append(_TNCLSTM(
                hidden * kn[-1] if li == 0 else rnn_units, rnn_units,
                projection_dim=hidden * kn[-1] if li == rnn_layers - 1 else None))
        self.enhance = tnn.Sequential(*rnns)
        self.decoder = tnn.ModuleList()
        for idx in range(len(kn) - 1, 0, -1):
            if idx != 1:
                self.decoder.append(tnn.Sequential(
                    _TCCT2d(kn[idx] * 2, kn[idx - 1]),
                    tnn.BatchNorm2d(kn[idx - 1]), tnn.PReLU()))
            else:
                self.decoder.append(tnn.Sequential(_TCCT2d(kn[idx] * 2, 2)))

    def forward(self, wav):
        pad = self.win - self.inc
        x = tF.pad(wav[:, None, :], [pad, pad])
        specs = tF.conv1d(x, self.fwd_k, stride=self.inc)
        fdim = self.fft // 2 + 1
        real, imag = specs[:, :fdim], specs[:, fdim:]
        mags = torch.sqrt(real ** 2 + imag ** 2 + 1e-8)
        phase = torch.atan2(imag, real)
        out = torch.stack([real, imag], 1)[:, :, 1:]
        enc_out = []
        for layer in self.encoder:
            out = layer(out)
            enc_out.append(out)
        b, c, d, t = out.size()
        out = out.permute(3, 0, 1, 2)
        r_in = out[:, :, :c // 2].reshape(t, b, c // 2 * d)
        i_in = out[:, :, c // 2:].reshape(t, b, c // 2 * d)
        r_in, i_in = self.enhance([r_in, i_in])
        r_in = r_in.reshape(t, b, c // 2, d)
        i_in = i_in.reshape(t, b, c // 2, d)
        out = torch.cat([r_in, i_in], 2).permute(1, 2, 3, 0)
        for idx, layer in enumerate(self.decoder):
            skip = enc_out[-1 - idx]
            sr, si = torch.chunk(out, 2, 1)
            kr, ki = torch.chunk(skip, 2, 1)
            out = layer(torch.cat([sr, kr, si, ki], 1))[..., 1:]
        mask_real = tF.pad(out[:, 0], [0, 0, 1, 0])
        mask_imag = tF.pad(out[:, 1], [0, 0, 1, 0])
        mask_mags = (mask_real ** 2 + mask_imag ** 2) ** 0.5
        mask_phase = torch.atan2(mask_imag / (mask_mags + 1e-8),
                                 mask_real / (mask_mags + 1e-8))
        est_mags = torch.tanh(mask_mags) * mags
        est_phase = phase + mask_phase
        real = est_mags * torch.cos(est_phase)
        imag = est_mags * torch.sin(est_phase)
        spec = torch.cat([real, imag], 1)
        wav_out = tF.conv_transpose1d(spec, self.inv_k, stride=self.inc)
        twin = self.win_buf.repeat(1, 1, spec.size(-1)) ** 2
        coff = tF.conv_transpose1d(twin, self.enframe, stride=self.inc)
        wav_out = wav_out / (coff + 1e-8)
        wav_out = wav_out[..., pad:-pad].squeeze(1)
        return torch.clamp(wav_out, -1, 1)


def test_dccrn_torch_import_parity(rng):
    from sonicsim_tpu.models import DCCRN

    torch.manual_seed(5)
    tm = _TDCCRN()
    # populate BatchNorm running stats with a train-mode pass, then eval
    with torch.no_grad():
        tm.train()
        tm(torch.from_numpy(
            rng.standard_normal((4, 960)).astype(np.float32) * 0.3))
        tm.eval()
        x = rng.standard_normal((2, 960)).astype(np.float32) * 0.3
        ref = tm(torch.from_numpy(x)).numpy()

    model = DCCRN(rnn_layers=2, rnn_units=16, win_len=48, win_inc=12,
                  fft_len=64, kernel_num=(8, 16), torch_compat=True)
    _, params = import_torch_checkpoint(
        {"model_name": "DCCRN", "model_args": {},
         "state_dict": {k: v.numpy() for k, v in tm.state_dict().items()}},
        model=model,
    )
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-2)


# --- Fullband / FullSubnet import parity (fullband.py:53-657 naming) --------

class _TSeqModel(tnn.Module):
    def __init__(self, input_size, output_size, hidden, layers, act):
        super().__init__()
        self.sequence_model = tnn.LSTM(input_size, hidden, layers,
                                       batch_first=True)
        if output_size:
            self.fc_output_layer = tnn.Linear(hidden, output_size)
        self.output_size, self.act = output_size, act

    def forward(self, x):  # (B, F, T)
        o, _ = self.sequence_model(x.permute(0, 2, 1))
        if self.output_size:
            o = self.fc_output_layer(o)
        if self.act == "ReLU":
            o = torch.relu(o)
        return o.permute(0, 2, 1)


def _tstft(y, n_fft, hop):
    s = torch.stft(y, n_fft, hop, win_length=n_fft,
                   window=torch.hann_window(n_fft), return_complex=True)
    return s.abs(), s.real, s.imag


def _tlaplace(x):
    return x / (x.mean(dim=list(range(1, x.dim())), keepdim=True) + 1e-5)


def _tunfold(x, n):  # (B, F, T) → (B, F, 2n+1, T)
    if n <= 0:
        return x.unsqueeze(2)
    b, f, t = x.shape
    xp = tF.pad(x.unsqueeze(1), [0, 0, n, n], mode="reflect")[:, 0]
    return xp.unfold(1, 2 * n + 1, 1).permute(0, 1, 3, 2)


class _TFullband(tnn.Module):
    def __init__(self, num_freqs=33, hidden=16, n_fft=64, hop=32, look=2):
        super().__init__()
        self.n_fft, self.hop, self.look = n_fft, hop, look
        self.fullband_model = _TSeqModel(num_freqs, num_freqs * 2, hidden, 3,
                                         False)

    def forward(self, y):
        mag, real, imag = _tstft(y, self.n_fft, self.hop)
        x = tF.pad(mag, [0, self.look])
        b, f, t = x.shape
        out = self.fullband_model(_tlaplace(x.unsqueeze(1)).reshape(b, f, t))
        out = out.reshape(b, 2, f, t)
        return out[..., self.look:], real, imag


class _TFullSubnet(tnn.Module):
    def __init__(self, num_freqs=33, fbh=16, sbh=16, n_fft=64, hop=32,
                 look=2, sb_n=4):
        super().__init__()
        self.n_fft, self.hop, self.look, self.sb_n = n_fft, hop, look, sb_n
        self.fb_model = _TSeqModel(num_freqs, num_freqs, fbh, 2, "ReLU")
        self.sb_model = _TSeqModel(sb_n * 2 + 2, 2, sbh, 2, False)

    def forward(self, y):
        mag, real, imag = _tstft(y, self.n_fft, self.hop)
        x = tF.pad(mag, [0, self.look])
        b, f, t = x.shape
        fb = self.fb_model(_tlaplace(x.unsqueeze(1)).reshape(b, f, t))
        fb_unf = _tunfold(fb, 0)
        mag_unf = _tunfold(x, self.sb_n)
        sb = torch.cat([mag_unf, fb_unf], dim=2)
        sb = _tlaplace(sb)
        sb = sb.reshape(b * f, self.sb_n * 2 + 2, t)
        m = self.sb_model(sb).reshape(b, f, 2, t).permute(0, 2, 1, 3)
        return m[..., self.look:], real, imag


def test_fullband_fullsubnet_torch_import_parity(rng):
    from sonicsim_tpu.models import Fullband, FullSubnet

    x = rng.standard_normal((2, 800)).astype(np.float32) * 0.3

    torch.manual_seed(6)
    tm = _TFullband().eval()
    with torch.no_grad():
        ref = tm(torch.from_numpy(x))[0].numpy()
    model = Fullband(num_freqs=33, hidden_size=16, n_fft=64, hop_length=32,
                     win_length=64)
    _, params = import_torch_checkpoint(
        {"model_name": "Fullband", "model_args": {},
         "state_dict": {k: v.numpy() for k, v in tm.state_dict().items()}},
        model=model)
    got = np.asarray(model.apply(params, jnp.asarray(x))[0])
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)

    torch.manual_seed(7)
    tm2 = _TFullSubnet().eval()
    with torch.no_grad():
        ref2 = tm2(torch.from_numpy(x))[0].numpy()
    model2 = FullSubnet(num_freqs=33, fb_model_hidden_size=16,
                        sb_model_hidden_size=16, sb_num_neighbors=4,
                        n_fft=64, hop_length=32, win_length=64)
    _, params2 = import_torch_checkpoint(
        {"model_name": "FullSubnet", "model_args": {},
         "state_dict": {k: v.numpy() for k, v in tm2.state_dict().items()}},
        model=model2)
    got2 = np.asarray(model2.apply(params2, jnp.asarray(x))[0])
    np.testing.assert_allclose(got2, ref2, atol=5e-4, rtol=1e-3)


# --- GaGNet import parity (gagnet.py:6-630 naming) ---------------------------

class _TIN1d(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.norm = tnn.InstanceNorm1d(c, affine=True)

    def forward(self, x):
        return self.norm(x)


class _TIN2d(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.norm = tnn.InstanceNorm2d(c, affine=True)

    def forward(self, x):
        return self.norm(x)


class _TGateConv2d(tnn.Module):
    def __init__(self, cin, cout, k, stride):
        super().__init__()
        if k[0] > 1:
            self.conv = tnn.Sequential(
                tnn.ConstantPad2d((0, 0, k[0] - 1, 0), 0.0),
                tnn.Conv2d(cin, cout * 2, k, stride))
        else:
            self.conv = tnn.Conv2d(cin, cout * 2, k, stride)

    def forward(self, x):
        out, gate = self.conv(x).chunk(2, 1)
        return out * gate.sigmoid()


class _TConv2dUnit(tnn.Module):
    def __init__(self, c, k):
        super().__init__()
        self.conv = tnn.Sequential(tnn.Conv2d(c, c, k, (1, 2)), _TIN2d(c),
                                   tnn.PReLU(c))

    def forward(self, x):
        return self.conv(x)


class _TDeconv2dUnit(tnn.Module):
    def __init__(self, cin, c, k):
        super().__init__()
        self.deconv = tnn.Sequential(tnn.ConvTranspose2d(cin, c, k, (1, 2)),
                                     _TIN2d(c), tnn.PReLU(c))

    def forward(self, x):
        return self.deconv(x)


class _TEnUnet(tnn.Module):
    def __init__(self, cin, cout, k1, k2, scale):
        super().__init__()
        self.in_conv = tnn.Sequential(_TGateConv2d(cin, cout, k1, (1, 2)),
                                      _TIN2d(cout), tnn.PReLU(cout))
        self.enco = tnn.ModuleList(
            [_TConv2dUnit(cout, k2) for _ in range(scale)])
        self.deco = tnn.ModuleList(
            [_TDeconv2dUnit(cout if i == 0 else cout * 2, cout, k2)
             for i in range(scale)])

    def forward(self, x):
        xr = self.in_conv(x)
        h, hist = xr, []
        for e in self.enco:
            h = e(h)
            hist.append(h)
        for i, d in enumerate(self.deco):
            h = d(h if i == 0 else torch.cat((h, hist[-(i + 1)]), 1))
        return xr + h


class _TSqTCM(tnn.Module):
    def __init__(self, kd1, cd1, d_feat, dila):
        super().__init__()
        self.in_conv = tnn.Conv1d(d_feat, cd1, 1, bias=False)
        self.d_conv = tnn.Sequential(
            tnn.PReLU(cd1), _TIN1d(cd1),
            tnn.ConstantPad1d(((kd1 - 1) * dila, 0), 0.0),
            tnn.Conv1d(cd1, cd1, kd1, dilation=dila, bias=False))
        self.out_conv = tnn.Sequential(
            tnn.PReLU(cd1), _TIN1d(cd1), tnn.Conv1d(cd1, d_feat, 1, bias=False))

    def forward(self, x):
        return x + self.out_conv(self.d_conv(self.in_conv(x)))


class _TTCNGroup(tnn.Module):
    def __init__(self, kd1, cd1, d_feat, dilas):
        super().__init__()
        self.tcns = tnn.Sequential(
            *[_TSqTCM(kd1, cd1, d_feat, d) for d in dilas])

    def forward(self, x):
        return self.tcns(x)


class _TGlance(tnn.Module):
    def __init__(self, kd1, cd1, d_feat, p, dilas, fftn, ci):
        super().__init__()
        self.in_conv_main = tnn.Conv1d(ci, d_feat, 1)
        self.in_conv_gate = tnn.Sequential(tnn.Conv1d(ci, d_feat, 1),
                                           tnn.Sigmoid())
        self.tcn_g = tnn.Sequential(
            *[_TTCNGroup(kd1, cd1, d_feat, dilas) for _ in range(p)])
        self.linear_g = tnn.Sequential(tnn.Conv1d(d_feat, fftn // 2 + 1, 1),
                                       tnn.Sigmoid())

    def forward(self, feat_x, pre_x):
        b = pre_x.shape[0]
        pre = pre_x.reshape(b, -1, pre_x.shape[-1])
        z = torch.cat((feat_x, pre), 1)
        x = self.in_conv_main(z) * self.in_conv_gate(z)
        return self.linear_g(self.tcn_g(x))


class _TGaze(tnn.Module):
    def __init__(self, kd1, cd1, d_feat, p, dilas, fftn, ci):
        super().__init__()
        self.in_conv_main = tnn.Conv1d(ci, d_feat, 1)
        self.in_conv_gate = tnn.Sequential(tnn.Conv1d(ci, d_feat, 1),
                                           tnn.Sigmoid())
        self.tcm_r = tnn.Sequential(
            *[_TTCNGroup(kd1, cd1, d_feat, dilas) for _ in range(p)])
        self.tcm_i = tnn.Sequential(
            *[_TTCNGroup(kd1, cd1, d_feat, dilas) for _ in range(p)])
        self.linear_r = tnn.Conv1d(d_feat, fftn // 2 + 1, 1)
        self.linear_i = tnn.Conv1d(d_feat, fftn // 2 + 1, 1)

    def forward(self, feat_x, pre_x):
        b = pre_x.shape[0]
        pre = pre_x.reshape(b, -1, pre_x.shape[-1])
        z = torch.cat((feat_x, pre), 1)
        x = self.in_conv_main(z) * self.in_conv_gate(z)
        return torch.stack((self.linear_r(self.tcm_r(x)),
                            self.linear_i(self.tcm_i(x))), 1)


class _TGaG(tnn.Module):
    def __init__(self, kd1=3, cd1=8, d_feat=192, p=1, dilas=(1, 2), fftn=256,
                 hop=128, c=8, q=2):
        super().__init__()
        self.fftn, self.hop, self.q = fftn, hop, q
        k1, k2 = (2, 3), (1, 3)
        ci = d_feat + 2 * (fftn // 2 + 1)

        class _En(tnn.Module):
            def __init__(s):
                super().__init__()
                s.meta_unet_list = tnn.ModuleList([
                    _TEnUnet(2, c, (2, 5), k2, 4),
                    _TEnUnet(c, c, k1, k2, 3),
                    _TEnUnet(c, c, k1, k2, 2),
                    _TEnUnet(c, c, k1, k2, 1)])
                s.last_conv = tnn.Sequential(_TGateConv2d(c, 64, k1, (1, 2)),
                                             _TIN2d(64), tnn.PReLU(64))

            def forward(s, x):
                for m in s.meta_unet_list:
                    x = m(x)
                return s.last_conv(x)

        class _GaGMod(tnn.Module):
            def __init__(s):
                super().__init__()
                s.glance_block = _TGlance(kd1, cd1, d_feat, p, dilas, fftn, ci)
                s.gaze_block = _TGaze(kd1, cd1, d_feat, p, dilas, fftn, ci)

            def forward(s, feat_x, pre_x):
                gain = s.glance_block(feat_x, pre_x)
                resi = s.gaze_block(feat_x, pre_x)
                mag = torch.norm(pre_x, dim=1)
                ph = torch.atan2(pre_x[:, -1], pre_x[:, 0])
                filt = mag * gain.squeeze(1) if gain.dim() == 4 else mag * gain
                coarse = torch.stack((filt * torch.cos(ph),
                                      filt * torch.sin(ph)), 1)
                return coarse + resi

        self.en = _En()
        self.gags = tnn.ModuleList([_GaGMod() for _ in range(q)])

    def forward(self, x):
        cnorm = torch.sqrt(x.shape[-1] / torch.sum(x ** 2, dim=-1))
        x = x * cnorm.unsqueeze(-1)
        s = torch.stft(x, self.fftn, self.hop, win_length=self.fftn,
                       window=torch.hann_window(self.fftn),
                       return_complex=True)
        sr = torch.view_as_real(s)
        mag = torch.norm(sr, dim=-1) ** 0.5
        ph = torch.atan2(sr[..., 1], sr[..., 0])
        sr = torch.stack((mag * torch.cos(ph), mag * torch.sin(ph)), -1)
        sr = sr.permute(0, 3, 2, 1)  # (B, 2, T, F)
        b, _, t, _ = sr.shape
        feat = self.en(sr)
        feat = feat.transpose(-2, -1).reshape(b, -1, t)
        pre = sr.transpose(-2, -1)  # (B, 2, F, T)
        outs = []
        for g in self.gags:
            pre = g(feat, pre)
            outs.append(pre)
        return outs


def test_gagnet_torch_import_parity(rng):
    from sonicsim_tpu.models import GaGNet

    torch.manual_seed(8)
    tm = _TGaG().eval()
    x = rng.standard_normal((2, 800)).astype(np.float32) * 0.3
    with torch.no_grad():
        refs = [o.numpy() for o in tm(torch.from_numpy(x))]

    model = GaGNet(c=8, kd1=3, cd1=8, d_feat=192, p=1, q=2, dilas=(1, 2),
                   fft_num=256, n_fft=256, hop_length=128, win_length=256)
    _, params = import_torch_checkpoint(
        {"model_name": "GaGNet", "model_args": {},
         "state_dict": {k: v.numpy() for k, v in tm.state_dict().items()}},
        model=model)
    outs = model.apply(params, jnp.asarray(x))
    assert len(outs) == len(refs)
    for got, ref in zip(outs, refs):
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-3, rtol=1e-2)


# --- G2Net import parity (g2net.py:7-630 naming) -----------------------------

class _TGate2dconv(tnn.Module):
    def __init__(self, cin, cout, k, stride):
        super().__init__()
        pad = (0, 0, k[0] - 1, 0)
        self.conv = tnn.Sequential(tnn.ConstantPad2d(pad, 0.0),
                                   tnn.Conv2d(cin, cout, k, stride))
        self.gate_conv = tnn.Sequential(tnn.ConstantPad2d(pad, 0.0),
                                        tnn.Conv2d(cin, cout, k, stride),
                                        tnn.Sigmoid())

    def forward(self, x):
        return self.conv(x) * self.gate_conv(x)


class _TG2EnUnet(tnn.Module):
    def __init__(self, cin, cout, k1, k2, scale):
        super().__init__()
        self.in_conv = tnn.Sequential(_TGate2dconv(cin, cout, k1, (1, 2)),
                                      _TIN2d(cout), tnn.PReLU(cout))
        self.enco = tnn.ModuleList(
            [_TConv2dUnit(cout, k2) for _ in range(scale)])
        self.deco = tnn.ModuleList(
            [_TDeconv2dUnit(cout if i == 0 else cout * 2, cout, k2)
             for i in range(scale)])

    def forward(self, x):
        xr = self.in_conv(x)
        h, hist = xr, []
        for e in self.enco:
            h = e(h)
            hist.append(h)
        for i, d in enumerate(self.deco):
            h = d(h if i == 0 else torch.cat((h, hist[-(i + 1)]), 1))
        return xr + h


class _TG2U2En(tnn.Module):
    def __init__(self, cin, c):
        super().__init__()
        k1, k2 = (2, 3), (1, 3)
        self.meta_unet_list = tnn.ModuleList([
            _TG2EnUnet(cin, c, (2, 5), k2, 4),
            _TG2EnUnet(c, c, k1, k2, 3),
            _TG2EnUnet(c, c, k1, k2, 2),
            _TG2EnUnet(c, c, k1, k2, 1)])
        self.last_conv = tnn.Sequential(_TGate2dconv(c, 64, k1, (1, 2)),
                                        _TIN2d(64), tnn.PReLU(64))

    def forward(self, x):
        for m in self.meta_unet_list:
            x = m(x)
        return self.last_conv(x)


class _TGatedTCM(tnn.Module):
    def __init__(self, d_feat, kd1, cd1, dila):
        super().__init__()
        pad = tnn.ConstantPad1d(((kd1 - 1) * dila, 0), 0.0)
        self.in_conv = tnn.Conv1d(d_feat, cd1, 1, bias=False)
        self.dd_conv_main = tnn.Sequential(
            tnn.PReLU(cd1), _TIN1d(cd1), pad,
            tnn.Conv1d(cd1, cd1, kd1, dilation=dila, bias=False))
        self.dd_conv_gate = tnn.Sequential(
            tnn.PReLU(cd1), _TIN1d(cd1), pad,
            tnn.Conv1d(cd1, cd1, kd1, dilation=dila, bias=False), tnn.Sigmoid())
        self.out_conv = tnn.Sequential(
            tnn.PReLU(cd1), _TIN1d(cd1), tnn.Conv1d(cd1, d_feat, 1, bias=False))

    def forward(self, x):
        h = self.in_conv(x)
        h = self.dd_conv_main(h) * self.dd_conv_gate(h)
        return x + self.out_conv(h)


class _TGatedTCNList(tnn.Module):
    def __init__(self, d_feat, kd1, cd1, dilas):
        super().__init__()
        self.tcm_list = tnn.ModuleList(
            [_TGatedTCM(d_feat, kd1, cd1, d) for d in dilas])

    def forward(self, x):
        for m in self.tcm_list:
            x = m(x)
        return x


class _TG2Net(tnn.Module):
    def __init__(self, c=8, d_feat=192, kd1=3, cd1=8, tcn_num=1, dilas=(1, 2),
                 fftn=256, hop=128, stages=2):
        super().__init__()
        self.fftn, self.hop, self.stages, self.tcn_num = fftn, hop, stages, tcn_num
        F = fftn // 2 + 1
        self.ri_en = _TG2U2En(2, c)
        self.mag_en = _TG2U2En(1, c)
        ci_g = F + d_feat * 2
        ci_z = 2 * F + d_feat * 2

        class _GGM(tnn.Module):
            def __init__(s):
                super().__init__()

                class _Glance(tnn.Module):
                    def __init__(ss):
                        super().__init__()
                        ss.in_conv = tnn.Conv1d(ci_g, d_feat, 1)
                        ss.tcn_list = tnn.ModuleList(
                            [_TGatedTCNList(d_feat, kd1, cd1, dilas)
                             for _ in range(tcn_num)])
                        ss.linear_mag = tnn.Conv1d(d_feat, F, 1)

                    def forward(ss, x, mag):
                        h = ss.in_conv(torch.cat((x, mag), 1))
                        acc = torch.zeros_like(h)
                        for t in ss.tcn_list:
                            h = t(h)
                            acc = acc + h
                        return torch.sigmoid(ss.linear_mag(acc))

                class _Gaze(tnn.Module):
                    def __init__(ss):
                        super().__init__()
                        ss.in_conv_r = tnn.Conv1d(ci_z, d_feat, 1)
                        ss.in_conv_i = tnn.Conv1d(ci_z, d_feat, 1)
                        ss.tcn_r = tnn.ModuleList(
                            [_TGatedTCNList(d_feat, kd1, cd1, dilas)
                             for _ in range(tcn_num)])
                        ss.tcn_i = tnn.ModuleList(
                            [_TGatedTCNList(d_feat, kd1, cd1, dilas)
                             for _ in range(tcn_num)])
                        ss.linear_r = tnn.Linear(d_feat, F)
                        ss.linear_i = tnn.Linear(d_feat, F)

                    def forward(ss, x, com):
                        z = torch.cat((x, com), 1)
                        hr, hi = ss.in_conv_r(z), ss.in_conv_i(z)
                        ar, ai = torch.zeros_like(hr), torch.zeros_like(hi)
                        for tr, ti in zip(ss.tcn_r, ss.tcn_i):
                            hr, hi = tr(hr), ti(hi)
                            ar, ai = ar + hr, ai + hi
                        st = torch.stack((ar, ai), 1).transpose(-2, -1)
                        xr = ss.linear_r(st[:, 0]).transpose(-2, -1)
                        xi = ss.linear_i(st[:, 1]).transpose(-2, -1)
                        return torch.stack((xr, xi), 1)

                s.glance_branch = _Glance()
                s.gaze_branch = _Gaze()

            def forward(s, x, pre_x):
                b, _, f, t = pre_x.shape
                mag = torch.norm(pre_x, dim=1)
                ph = torch.atan2(pre_x[:, -1], pre_x[:, 0])
                com = pre_x.reshape(b, -1, t)
                gain = s.glance_branch(x, mag)
                resi = s.gaze_branch(x, com)
                xm = mag * gain
                return torch.stack((xm * torch.cos(ph),
                                    xm * torch.sin(ph)), 1) + resi

        self.ggms = tnn.ModuleList([_GGM() for _ in range(stages)])

    def forward(self, x):
        cnorm = torch.sqrt(x.shape[-1] / torch.sum(x ** 2, dim=-1))
        x = x * cnorm.unsqueeze(-1)
        s = torch.stft(x, self.fftn, self.hop, win_length=self.fftn,
                       window=torch.hann_window(self.fftn), return_complex=True)
        sr = torch.view_as_real(s)
        mag = torch.norm(sr, dim=-1) ** 0.5
        ph = torch.atan2(sr[..., 1], sr[..., 0])
        sr = torch.stack((mag * torch.cos(ph), mag * torch.sin(ph)), -1)
        sr = sr.permute(0, 3, 2, 1)  # (B, 2, T, F)
        b = sr.shape[0]
        t = sr.shape[2]
        inpt_mag = torch.norm(sr, dim=1, keepdim=True)
        ri_x = self.ri_en(sr).transpose(-2, -1).reshape(b, -1, t)
        mag_x = self.mag_en(inpt_mag).transpose(-2, -1).reshape(b, -1, t)
        feat = torch.cat((ri_x, mag_x), 1)
        pre = sr.transpose(-2, -1)
        outs = []
        for g in self.ggms:
            pre = g(feat, pre)
            outs.append(pre)
        return outs


def test_g2net_torch_import_parity(rng):
    from sonicsim_tpu.models import G2Net

    torch.manual_seed(9)
    tm = _TG2Net().eval()
    x = rng.standard_normal((2, 800)).astype(np.float32) * 0.3
    with torch.no_grad():
        refs = [o.numpy() for o in tm(torch.from_numpy(x))]

    model = G2Net(c=8, d_feat=192, cd1=8, tcn_num=1, dilas=(1, 2),
                  stage_num=2, fft_num=256, n_fft=256, hop_length=128,
                  win_length=256)
    _, params = import_torch_checkpoint(
        {"model_name": "G2Net", "model_args": {},
         "state_dict": {k: v.numpy() for k, v in tm.state_dict().items()}},
        model=model)
    outs = model.apply(params, jnp.asarray(x))
    for got, ref in zip(outs, refs):
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-3, rtol=1e-2)


# --- FastFullSubnet / FullSubNet_Plus / Inter_SubNet import parity ----------

class _TSeq0(tnn.Module):
    """SequenceModel with optional fc (output_size=0 → raw LSTM out)."""

    def __init__(self, input_size, output_size, hidden, layers, act):
        super().__init__()
        self.sequence_model = tnn.LSTM(input_size, hidden, layers,
                                       batch_first=True)
        if output_size:
            self.fc_output_layer = tnn.Linear(hidden, output_size)
        self.output_size, self.act = output_size, act

    def forward(self, x):  # (B, F, T)
        o, _ = self.sequence_model(x.permute(0, 2, 1))
        if self.output_size:
            o = self.fc_output_layer(o)
        if self.act == "ReLU":
            o = torch.relu(o)
        return o.permute(0, 2, 1)


class _TFastFSN(tnn.Module):
    def __init__(self, shrink=2, mels=64, look=2, n_fft=512, hop=256):
        super().__init__()
        from sonicsim_tpu.models.fastfullsubnet import mel_filterbank
        self.n_fft, self.hop, self.look, self.shrink = n_fft, hop, look, shrink
        self.mels = mels
        self.encoder = tnn.Sequential(
            _TSeq0(64, 0, 384, 1, None), _TSeq0(384, 64, 257, 1, "ReLU"))
        # torchaudio is unavailable here; MelScale's HTK fb matches our
        # mel_filterbank (same create_fb_matrix math)
        fb = torch.from_numpy(mel_filterbank(257, mels, 16000, 0.0, 8000.0))
        self.mel_scale = lambda x: torch.einsum("bcft,fm->bcmt", x, fb)
        self.bottleneck = _TSeq0(12, 1, 384, 2, "ReLU")
        self.decoder_lstm = tnn.Sequential(
            _TSeq0(128, 0, 512, 1, None), _TSeq0(512, 257 * 2, 512, 1, None))

    def forward(self, y):
        mag, real, imag = _tstft(y, self.n_fft, self.hop)
        x = tF.pad(mag.unsqueeze(1), [0, self.look])
        b, _, f, t = x.shape
        mel = self.mel_scale(x)
        enc_in = _tlaplace(mel).reshape(b, -1, t)
        enc_out = self.encoder(enc_in).reshape(b, 1, -1, t)
        mel_unf = _tunfold(mel[:, 0], 5)
        enc_unf = _tunfold(enc_out[:, 0], 0)
        bn_in = torch.cat([mel_unf, enc_unf], dim=2)  # (B, M, 12, T)
        first = bn_in[..., :1]
        blocks = torch.split(bn_in[..., 1:], self.shrink, dim=-1)
        shrunk = torch.cat(
            [first, torch.stack(blocks[:-1], -1).mean(-2),
             blocks[-1].mean(-1, keepdim=True)], dim=-1)
        shrunk = _tlaplace(shrunk)
        ts = shrunk.shape[-1]
        bn_out = self.bottleneck(shrunk.reshape(b * self.mels, 12, ts))
        bn_out = bn_out.reshape(b, self.mels, ts)
        bn_out = bn_out[..., None].expand(b, self.mels, ts, self.shrink)
        bn_out = bn_out.reshape(b, self.mels, ts * self.shrink)[..., :t]
        dec_in = torch.cat([enc_out[:, 0], bn_out], dim=1).reshape(b, -1, t)
        dec = self.decoder_lstm(dec_in).reshape(b, 2, 257, t)
        return dec[..., self.look:], real, imag


def test_fastfullsubnet_torch_import_parity(rng):
    from sonicsim_tpu.models import FastFullSubnet

    torch.manual_seed(10)
    tm = _TFastFSN().eval()
    x = rng.standard_normal((1, 4096)).astype(np.float32) * 0.3
    with torch.no_grad():
        ref = tm(torch.from_numpy(x))[0].numpy()
    model = FastFullSubnet()
    _, params = import_torch_checkpoint(
        {"model_name": "FastFullSubnet", "model_args": {},
         "state_dict": {k: v.numpy() for k, v in tm.state_dict().items()
                        if "mel_scale" not in k}},
        model=model)
    got = np.asarray(model.apply(params, jnp.asarray(x))[0])
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-2)


class _TSE(tnn.Module):
    def __init__(self, c, r=2):
        super().__init__()
        self.fc1 = tnn.Linear(c, c // r)
        self.fc2 = tnn.Linear(c // r, c)

    def forward(self, x):  # (B, C, T)
        s = torch.relu(self.fc1(x.mean(2)))
        s = torch.sigmoid(self.fc2(s))
        return x * s.unsqueeze(-1)


class _TTCNBlk(tnn.Module):
    def __init__(self, cin, hidden, k=3, dila=1):
        super().__init__()
        self.conv1x1 = tnn.Conv1d(cin, hidden, 1)
        self.prelu1 = tnn.PReLU()
        self.norm1 = tnn.GroupNorm(1, hidden, eps=1e-8)
        pad = dila * (k - 1) // 2
        self.depthwise_conv = tnn.Conv1d(hidden, hidden, k, groups=hidden,
                                         padding=pad, dilation=dila)
        self.prelu2 = tnn.PReLU()
        self.norm2 = tnn.GroupNorm(1, hidden, eps=1e-8)
        self.sconv = tnn.Conv1d(hidden, cin, 1)

    def forward(self, x):
        y = self.norm1(self.prelu1(self.conv1x1(x)))
        y = self.depthwise_conv(y)
        y = self.norm2(self.prelu2(y))
        return x + self.sconv(y)


class _TTCNSeq(tnn.Module):
    def __init__(self, cin, hidden=512):
        super().__init__()
        self.sequence_model = tnn.Sequential(
            *[_TTCNBlk(cin, hidden, dila=d) for d in [1, 2, 5, 9, 1, 2, 5, 9]],
            tnn.ReLU())
        self.fc_output_layer = tnn.Linear(cin, cin)

    def forward(self, x):  # (B, F, T)
        x = self.sequence_model(x)
        o = torch.relu(self.fc_output_layer(x.permute(0, 2, 1)))
        return o.permute(0, 2, 1)


class _TFSNPlus(tnn.Module):
    def __init__(self, F=33, sbh=16, look=2, n_fft=64, hop=32, sb_n=4):
        super().__init__()
        self.n_fft, self.hop, self.look, self.sb_n = n_fft, hop, look, sb_n
        self.channel_attention = _TSE(F)
        self.channel_attention_real = _TSE(F)
        self.channel_attention_imag = _TSE(F)
        self.fb_model = _TTCNSeq(F)
        self.fb_model_real = _TTCNSeq(F)
        self.fb_model_imag = _TTCNSeq(F)
        self.sb_model = _TSeq0(sb_n * 2 + 4, 2, sbh, 2, None)

    def forward(self, y):
        mag, real, imag = _tstft(y, self.n_fft, self.hop)
        pad = [0, self.look]
        magp = tF.pad(mag, pad)
        realp, imagp = tF.pad(real, pad), tF.pad(imag, pad)
        b, f, t = magp.shape
        fb_in = self.channel_attention(_tlaplace(magp.unsqueeze(1))[:, 0])
        fb = self.fb_model(fb_in)
        fbr = self.fb_model_real(
            self.channel_attention_real(_tlaplace(realp.unsqueeze(1))[:, 0]))
        fbi = self.fb_model_imag(
            self.channel_attention_imag(_tlaplace(imagp.unsqueeze(1))[:, 0]))
        sb = torch.cat([
            _tunfold(fb_in, self.sb_n), _tunfold(fb, 0), _tunfold(fbr, 0),
            _tunfold(fbi, 0)], dim=2)
        sb = _tlaplace(sb)
        sb = sb.reshape(b * f, self.sb_n * 2 + 4, t)
        m = self.sb_model(sb).reshape(b, f, 2, t).permute(0, 2, 1, 3)
        return m[..., self.look:], real, imag


def test_fullsubnet_plus_torch_import_parity(rng):
    from sonicsim_tpu.models import FullSubNet_Plus

    torch.manual_seed(11)
    tm = _TFSNPlus().eval()
    x = rng.standard_normal((1, 1600)).astype(np.float32) * 0.3
    with torch.no_grad():
        ref = tm(torch.from_numpy(x))[0].numpy()
    model = FullSubNet_Plus(num_freqs=33, sb_num_neighbors=4,
                            sb_model_hidden_size=16, n_fft=64, hop_length=32,
                            win_length=64)
    _, params = import_torch_checkpoint(
        {"model_name": "FullSubNet_Plus", "model_args": {},
         "state_dict": {k: v.numpy() for k, v in tm.state_dict().items()}},
        model=model)
    got = np.asarray(model.apply(params, jnp.asarray(x))[0])
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-2)


# --- Inter_SubNet import parity (inter_subnet.py:732-1040 naming) ------------

class _TSubInter(tnn.Module):
    def __init__(self, input_size, hidden):
        super().__init__()
        self.input_linear = tnn.Sequential(tnn.Linear(input_size, hidden),
                                           tnn.PReLU())
        self.mean_linear = tnn.Sequential(tnn.Linear(hidden, hidden),
                                          tnn.PReLU())
        self.output_linear = tnn.Sequential(tnn.Linear(hidden * 2, input_size),
                                            tnn.PReLU())
        self.norm = tnn.GroupNorm(1, input_size)

    def forward(self, x):  # (B, G, N, T)
        B, G, N, T = x.shape
        gi = x.permute(0, 3, 1, 2).reshape(-1, N)
        go = self.input_linear(gi).view(B, T, G, -1)
        gm = go.mean(2).view(B * T, -1)
        go = go.view(B * T, G, -1)
        gm = self.mean_linear(gm).unsqueeze(1).expand_as(go)
        go = torch.cat([go, gm], 2)
        go = self.output_linear(go.reshape(-1, go.shape[-1]))
        go = go.view(B, T, G, -1).permute(0, 2, 3, 1)
        go = self.norm(go.reshape(B * G, N, T))
        return x + go.view(x.shape)


class _TSIL(tnn.Module):
    def __init__(self, input_size, tac_hidden, lstm_hidden):
        super().__init__()
        self.SubInter = _TSubInter(input_size, tac_hidden)
        self.RNN = tnn.LSTM(input_size, lstm_hidden, 1, batch_first=True)
        self.norm = tnn.GroupNorm(1, lstm_hidden)

    def forward(self, x):
        B, G, N, T = x.shape
        x = self.SubInter(x)
        h = x.reshape(B * G, N, T).permute(0, 2, 1)
        o, _ = self.RNN(h)
        o = self.norm(o.permute(0, 2, 1))
        return o.reshape(B, G, -1, T)


class _TInterSubNet(tnn.Module):
    def __init__(self, F=33, sb_n=4, hidden=20, look=2, n_fft=64, hop=32):
        super().__init__()
        self.n_fft, self.hop, self.look, self.sb_n = n_fft, hop, look, sb_n
        n_sub = sb_n * 2 + 1

        class _SB(tnn.Module):
            def __init__(s):
                super().__init__()
                s.sequence_list = tnn.ModuleList([
                    _TSIL(n_sub, 3 * n_sub, hidden),
                    _TSIL(hidden, int(0.8 * hidden), hidden)])
                s.fc_output_layer = tnn.Linear(hidden, 2)

            def forward(s, x):
                for blk in s.sequence_list:
                    x = blk(x)
                B, G, H, T = x.shape
                o = s.fc_output_layer(x.reshape(B * G, H, T).permute(0, 2, 1))
                return o.permute(0, 2, 1)

        self.sb_model = _SB()

    def forward(self, y):
        mag, real, imag = _tstft(y, self.n_fft, self.hop)
        x = tF.pad(mag, [0, self.look])
        b, f, t = x.shape
        units = _tunfold(x, self.sb_n)  # (B, F, N, T)
        units = _tlaplace(units)
        m = self.sb_model(units).reshape(b, f, 2, t).permute(0, 2, 1, 3)
        return m[..., self.look:], real, imag


def test_inter_subnet_torch_import_parity(rng):
    from sonicsim_tpu.models import Inter_SubNet

    torch.manual_seed(12)
    tm = _TInterSubNet().eval()
    x = rng.standard_normal((1, 1600)).astype(np.float32) * 0.3
    with torch.no_grad():
        ref = tm(torch.from_numpy(x))[0].numpy()
    model = Inter_SubNet(num_freqs=33, sb_num_neighbors=4,
                         sb_model_hidden_size=20, n_fft=64, hop_length=32,
                         win_length=64)
    _, params = import_torch_checkpoint(
        {"model_name": "Inter_SubNet", "model_args": {},
         "state_dict": {k: v.numpy() for k, v in tm.state_dict().items()}},
        model=model)
    got = np.asarray(model.apply(params, jnp.asarray(x))[0])
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-2)


# --- TFGridNet import parity (TFGNet.py:352-785 naming) ----------------------

class _TAllHeadLN(tnn.Module):
    def __init__(self, H, E, F, eps=1e-5):
        super().__init__()
        self.gamma = tnn.Parameter(torch.ones(1, H, E, 1, F))
        self.beta = tnn.Parameter(torch.zeros(1, H, E, 1, F))
        self.act = tnn.PReLU(num_parameters=H, init=0.25)
        self.H, self.E, self.eps = H, E, eps

    def forward(self, x):  # (B, H*E, T, F)
        B, _, T, F = x.shape
        x = x.view(B, self.H, self.E, T, F)
        x = self.act(x.transpose(1, 0)).transpose(1, 0) if False else \
            torch.where(x >= 0, x, self.act.weight.view(1, self.H, 1, 1, 1) * x)
        mu = x.mean(dim=(2, 4), keepdim=True)
        std = torch.sqrt(x.var(dim=(2, 4), unbiased=False, keepdim=True)
                         + self.eps)
        return (x - mu) / std * self.gamma + self.beta


class _TLN4DCF(tnn.Module):
    def __init__(self, C, F, eps=1e-5):
        super().__init__()
        self.gamma = tnn.Parameter(torch.ones(1, C, 1, F))
        self.beta = tnn.Parameter(torch.zeros(1, C, 1, F))
        self.eps = eps

    def forward(self, x):  # (B, C, T, F)
        mu = x.mean(dim=(1, 3), keepdim=True)
        std = torch.sqrt(x.var(dim=(1, 3), unbiased=False, keepdim=True)
                         + self.eps)
        return (x - mu) / std * self.gamma + self.beta


class _TGridBlock(tnn.Module):
    def __init__(self, C=8, ks=4, hs=1, F=33, hid=16, heads=2, qk=64):
        super().__init__()
        import math as _m
        E = _m.ceil(qk / F)
        self.C, self.ks, self.hs, self.heads, self.E = C, ks, hs, heads, E
        in_ch = C * ks
        self.intra_norm = tnn.LayerNorm(C)
        self.intra_rnn = tnn.LSTM(in_ch, hid, 1, batch_first=True,
                                  bidirectional=True)
        self.intra_linear = tnn.ConvTranspose1d(hid * 2, C, ks, stride=hs)
        self.inter_norm = tnn.LayerNorm(C)
        self.inter_rnn = tnn.LSTM(in_ch, hid, 1, batch_first=True,
                                  bidirectional=True)
        self.inter_linear = tnn.ConvTranspose1d(hid * 2, C, ks, stride=hs)
        self.attn_conv_Q = tnn.Conv2d(C, heads * E, 1)
        self.attn_norm_Q = _TAllHeadLN(heads, E, F)
        self.attn_conv_K = tnn.Conv2d(C, heads * E, 1)
        self.attn_norm_K = _TAllHeadLN(heads, E, F)
        self.attn_conv_V = tnn.Conv2d(C, heads * C // heads, 1)
        self.attn_norm_V = _TAllHeadLN(heads, C // heads, F)
        self.attn_concat_proj = tnn.Sequential(
            tnn.Conv2d(C, C, 1), tnn.PReLU(), _TLN4DCF(C, F))

    def forward(self, x):  # (B, C, T, Q)
        import math as _m
        B, C, oT, oQ = x.shape
        olp = self.ks - self.hs
        T = _m.ceil((oT + 2 * olp - self.ks) / self.hs) * self.hs + self.ks
        Q = _m.ceil((oQ + 2 * olp - self.ks) / self.hs) * self.hs + self.ks
        x = x.permute(0, 2, 3, 1)
        x = tF.pad(x, (0, 0, olp, Q - oQ - olp, olp, T - oT - olp))
        inp = x
        h = self.intra_norm(inp).view(B * T, Q, C).transpose(1, 2)
        h = tF.unfold(h[..., None], (self.ks, 1), stride=(self.hs, 1))
        h = h.transpose(1, 2)
        h, _ = self.intra_rnn(h)
        h = self.intra_linear(h.transpose(1, 2)).view(B, T, C, Q)
        x = inp + h.transpose(-2, -1)
        x = x.transpose(1, 2)
        inp = x
        h = self.inter_norm(inp).reshape(B * Q, T, C).transpose(1, 2)
        h = tF.unfold(h[..., None], (self.ks, 1), stride=(self.hs, 1))
        h = h.transpose(1, 2)
        h, _ = self.inter_rnn(h)
        h = self.inter_linear(h.transpose(1, 2)).view(B, Q, C, T)
        x = inp + h.transpose(-2, -1)
        x = x.permute(0, 3, 2, 1)[..., olp:olp + oT, olp:olp + oQ]
        batch = x
        Qm = self.attn_norm_Q(self.attn_conv_Q(batch))
        Km = self.attn_norm_K(self.attn_conv_K(batch))
        Vm = self.attn_norm_V(self.attn_conv_V(batch))
        Qm = Qm.reshape(-1, *Qm.shape[2:]).transpose(1, 2).flatten(2)
        Km = Km.reshape(-1, *Km.shape[2:]).transpose(2, 3)
        Km = Km.contiguous().view(B * self.heads, -1, oT)
        Vm = Vm.reshape(-1, *Vm.shape[2:]).transpose(1, 2)
        old_shape = Vm.shape
        Vm = Vm.flatten(2)
        att = torch.softmax(torch.matmul(Qm, Km) / Qm.shape[-1] ** 0.5, dim=2)
        Vm = torch.matmul(att, Vm).reshape(old_shape).transpose(1, 2)
        out = Vm.contiguous().view(B, -1, oT, oQ)
        return self.attn_concat_proj(out) + x


class _TTFGrid(tnn.Module):
    def __init__(self, srcs=2, n_fft=64, stride=16, layers=1, emb=8):
        super().__init__()
        self.n_fft, self.stride, self.srcs = n_fft, stride, srcs
        F = n_fft // 2 + 1
        self.conv = tnn.Sequential(tnn.Conv2d(2, emb, (3, 3), padding=(1, 1)),
                                   tnn.GroupNorm(1, emb, eps=1e-5))
        self.blocks = tnn.ModuleList(
            [_TGridBlock(C=emb, F=F) for _ in range(layers)])
        self.deconv = tnn.ConvTranspose2d(emb, srcs * 2, (3, 3), padding=(1, 1))

    def forward(self, x):  # (B, N)
        n = x.shape[-1]
        std = torch.std(x.unsqueeze(2), dim=(1, 2), keepdim=True)[:, :, 0]
        x = x / std
        spec = torch.stft(x, self.n_fft, self.stride, win_length=self.n_fft,
                          window=torch.hann_window(self.n_fft),
                          return_complex=True)  # (B, F, T)
        spec = spec.transpose(1, 2)  # (B, T, F)
        batch = torch.stack((spec.real, spec.imag), 1)  # (B, 2, T, F)
        b, _, t, f = batch.shape
        h = self.conv(batch)
        for blk in self.blocks:
            h = blk(h)
        h = self.deconv(h).view(b, self.srcs, 2, t, f)
        est = torch.complex(h[:, :, 0], h[:, :, 1]).view(-1, t, f)
        wav = torch.istft(est.transpose(1, 2), self.n_fft, self.stride,
                          win_length=self.n_fft,
                          window=torch.hann_window(self.n_fft), length=n)
        return wav.view(b, self.srcs, -1) * std.unsqueeze(1)


def test_tfgridnet_torch_import_parity(rng):
    from sonicsim_tpu.models import TFGridNet

    torch.manual_seed(13)
    tm = _TTFGrid().eval()
    x = rng.standard_normal((2, 800)).astype(np.float32) * 0.3
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()

    model = TFGridNet(n_fft=64, stride=16, n_layers=1, lstm_hidden_units=16,
                      attn_n_head=2, attn_approx_qk_dim=64, emb_dim=8,
                      emb_ks=4, emb_hs=1)
    _, params = import_torch_checkpoint(
        {"model_name": "TFGridNet", "model_args": {},
         "state_dict": {k: v.numpy() for k, v in tm.state_dict().items()}},
        model=model)
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-2)


# --- TaylorSENet import parity (taylorsenet.py:220-960 naming) ---------------

class _TChompT(tnn.Module):
    def __init__(self, t):
        super().__init__()
        self.t = t

    def forward(self, x):
        return x[:, :, :-self.t, :]


class _TTayGateConv(tnn.Module):
    def __init__(self, cin, cout, k, stride, pad):
        super().__init__()
        if k[0] > 1:
            self.conv = tnn.Sequential(tnn.ConstantPad2d(pad, 0.0),
                                       tnn.Conv2d(cin, cout * 2, k, stride))
        else:
            self.conv = tnn.Conv2d(cin, cout * 2, k, stride)

    def forward(self, x):
        o, g = self.conv(x).chunk(2, 1)
        return o * g.sigmoid()


class _TTayGateConvT(tnn.Module):
    def __init__(self, cin, cout, k, stride):
        super().__init__()
        if k[0] > 1:
            self.conv = tnn.Sequential(
                tnn.ConvTranspose2d(cin, cout * 2, k, stride), _TChompT(k[0] - 1))
        else:
            self.conv = tnn.ConvTranspose2d(cin, cout * 2, k, stride)

    def forward(self, x):
        o, g = self.conv(x).chunk(2, 1)
        return o * g.sigmoid()


# TaylorSENet's NormSwitch passes `affine` positionally into torch's eps
# slot (taylorsenet.py:29-33), so every IN is eps=1.0, affine=False —
# replicated here with tnn.InstanceNorm*(c, True).
class _TTayConvUnit(tnn.Module):
    def __init__(self, k, c):
        super().__init__()
        if k[0] > 1:
            self.conv = tnn.Sequential(
                tnn.ConstantPad2d((0, 0, k[0] - 1, 0), 0.0),
                tnn.Conv2d(c, c, k, (1, 2)), tnn.InstanceNorm2d(c, True), tnn.PReLU(c))
        else:
            self.conv = tnn.Sequential(
                tnn.Conv2d(c, c, k, (1, 2)), tnn.InstanceNorm2d(c, True), tnn.PReLU(c))

    def forward(self, x):
        return self.conv(x)


class _TTayDeconvUnit(tnn.Module):
    def __init__(self, k, c, cat):
        super().__init__()
        cin = 2 * c if cat else c
        mods = [tnn.ConvTranspose2d(cin, c, k, (1, 2))]
        if k[0] > 1:
            mods.append(_TChompT(k[0] - 1))
        mods += [tnn.InstanceNorm2d(c, True), tnn.PReLU(c)]
        self.deconv = tnn.Sequential(*mods)

    def forward(self, x):
        return self.deconv(x)


class _TTayEnUnet(tnn.Module):
    def __init__(self, cin, cout, k1, k2, scale, de_flag=False):
        super().__init__()
        gate = (_TTayGateConvT(cin, cout, k1, (1, 2)) if de_flag else
                _TTayGateConv(cin, cout, k1, (1, 2), (0, 0, k1[0] - 1, 0)))
        self.in_conv = tnn.Sequential(gate, tnn.InstanceNorm2d(cout, True), tnn.PReLU(cout))
        self.enco = tnn.ModuleList([_TTayConvUnit(k2, cout)
                                    for _ in range(scale)])
        self.deco = tnn.ModuleList([_TTayDeconvUnit(k2, cout, i != 0)
                                    for i in range(scale)])

    def forward(self, x):
        xr = self.in_conv(x)
        h, hist = xr, []
        for e in self.enco:
            h = e(h)
            hist.append(h)
        for i, d in enumerate(self.deco):
            h = d(h if i == 0 else torch.cat((h, hist[-(i + 1)]), 1))
        return xr + h


class _TTayU2En(tnn.Module):
    def __init__(self, cin, c, k1, k2):
        super().__init__()
        self.meta_unet_list = tnn.ModuleList([
            _TTayEnUnet(cin, c, (1, 5), k2, 4),
            _TTayEnUnet(c, c, k1, k2, 3),
            _TTayEnUnet(c, c, k1, k2, 2),
            _TTayEnUnet(c, c, k1, k2, 1)])
        self.last_conv = tnn.Sequential(
            _TTayGateConv(c, 64, k1, (1, 2), (0, 0, k1[0] - 1, 0)),
            tnn.InstanceNorm2d(64, True), tnn.PReLU(64))

    def forward(self, x):
        hist = []
        for m in self.meta_unet_list:
            x = m(x)
            hist.append(x)
        x = self.last_conv(x)
        hist.append(x)
        return x, hist


class _TTayU2De(tnn.Module):
    def __init__(self, c, k1, k2):
        super().__init__()
        self.meta_unet_list = tnn.ModuleList([
            _TTayEnUnet(64 * 2, c, k1, k2, 1, de_flag=True),
            _TTayEnUnet(c * 2, c, k1, k2, 2, de_flag=True),
            _TTayEnUnet(c * 2, c, k1, k2, 3, de_flag=True),
            _TTayEnUnet(c * 2, c, k1, k2, 4, de_flag=True)])
        self.last_conv = tnn.Sequential(
            _TTayGateConvT(c * 2, 16, (1, 5), (1, 2)), tnn.InstanceNorm2d(16, True),
            tnn.PReLU(16), tnn.Conv2d(16, 1, 1, 1), tnn.Sigmoid())

    def forward(self, x, hist):
        for i, m in enumerate(self.meta_unet_list):
            x = m(torch.cat((x, hist[-(i + 1)]), 1))
        x = torch.cat((x, hist[0]), 1)
        return self.last_conv(x).squeeze(1)


class _TTayTCM(tnn.Module):
    def __init__(self, kd1, cd1, d_feat, dila):
        super().__init__()
        pad = tnn.ConstantPad1d(((kd1 - 1) * dila, 0), 0.0)
        self.in_conv = tnn.Conv1d(d_feat, cd1, 1, bias=False)
        self.left_conv = tnn.Sequential(
            tnn.PReLU(cd1), tnn.InstanceNorm1d(cd1, True), pad,
            tnn.Conv1d(cd1, cd1, kd1, dilation=dila, bias=False))
        self.right_conv = tnn.Sequential(
            tnn.PReLU(cd1), tnn.InstanceNorm1d(cd1, True), pad,
            tnn.Conv1d(cd1, cd1, kd1, dilation=dila, bias=False), tnn.Sigmoid())
        self.out_conv = tnn.Sequential(
            tnn.PReLU(cd1), tnn.InstanceNorm1d(cd1, True), tnn.Conv1d(cd1, d_feat, 1, bias=False))

    def forward(self, x):
        h = self.in_conv(x)
        h = self.left_conv(h) * self.right_conv(h)
        return x + self.out_conv(h)


class _TTayTCMList(tnn.Module):
    def __init__(self, kd1, cd1, d_feat, dilas):
        super().__init__()
        self.tcm_list = tnn.ModuleList(
            [_TTayTCM(kd1, cd1, d_feat, d) for d in dilas])

    def forward(self, x):
        for m in self.tcm_list:
            x = m(x)
        return x


class _TTaylor(tnn.Module):
    def __init__(self, c=8, kd1=5, cd1=8, d_feat=192, dilas=(1, 2), p=1,
                 fftn=256, hop=128, orders=2):
        super().__init__()
        k1, k2 = (1, 3), (2, 3)
        self.fftn, self.hop, self.orders, self.p = fftn, hop, orders, p
        F = fftn // 2 + 1

        class _Zero(tnn.Module):
            def __init__(s):
                super().__init__()
                s.en = _TTayU2En(1, c, k1, k2)
                s.de = _TTayU2De(c, k1, k2)
                s.tcms = tnn.ModuleList(
                    [_TTayTCMList(kd1, cd1, d_feat, dilas) for _ in range(p)])

            def forward(s, mag):
                en_x, hist = s.en(mag.unsqueeze(1))
                b, cc, t, f = en_x.shape
                x = en_x.transpose(-2, -1).reshape(b, cc * f, t)
                feat = x
                for m in s.tcms:
                    x = m(x)
                x = x.view(b, cc, f, t).transpose(-2, -1)
                return s.de(x, hist), feat

        class _High(tnn.Module):
            def __init__(s):
                super().__init__()
                s.in_conv = tnn.Conv1d(2 * F + d_feat, d_feat, 1)
                s.tcms = tnn.ModuleList(
                    [_TTayTCMList(kd1, cd1, d_feat, dilas) for _ in range(p)])
                s.real_resi = tnn.Conv1d(d_feat, F, 1)
                s.imag_resi = tnn.Conv1d(d_feat, F, 1)

            def forward(s, en_x, pre_x):
                b, _, t, f = pre_x.shape
                x1 = pre_x.transpose(-2, -1).reshape(b, -1, t)
                x = s.in_conv(torch.cat((en_x, x1), 1))
                for m in s.tcms:
                    x = m(x)
                xr = s.real_resi(x).transpose(-2, -1)
                xi = s.imag_resi(x).transpose(-2, -1)
                return torch.stack((xr, xi), 1)

        self.zeroorderblock = _Zero()
        self.separate_en = _TTayU2En(2, c, k1, k2)
        self.highorderblock_list = tnn.ModuleList(
            [_High() for _ in range(orders)])

    def forward(self, x):
        import math as _m
        cnorm = torch.sqrt(x.shape[-1] / torch.sum(x ** 2, dim=-1))
        x = x * cnorm.unsqueeze(-1)
        s = torch.stft(x, self.fftn, self.hop, win_length=self.fftn,
                       window=torch.hann_window(self.fftn), return_complex=True)
        sr = torch.view_as_real(s)
        mag = torch.norm(sr, dim=-1) ** 0.5
        ph = torch.atan2(sr[..., 1], sr[..., 0])
        sr = torch.stack((mag * torch.cos(ph), mag * torch.sin(ph)), -1)
        sr = sr.permute(0, 3, 2, 1)  # (B, 2, T, F)
        inputs_mag = torch.norm(sr, dim=1)
        inputs_ph = torch.atan2(sr[:, -1], sr[:, 0])
        gain, _ = self.zeroorderblock(inputs_mag)
        zmag = gain * inputs_mag
        zero = torch.stack((zmag * torch.cos(inputs_ph),
                            zmag * torch.sin(inputs_ph)), 1)
        feat, _ = self.separate_en(sr)
        b, cc, t, f = feat.shape
        feat = feat.transpose(-2, -1).reshape(b, -1, t)
        out, pre = zero, zero
        for k, blk in enumerate(self.highorderblock_list):
            upd = blk(feat, pre) + k * pre
            pre = upd
            out = out + upd / _m.factorial(k + 1)
        return out


def test_taylorsenet_torch_import_parity(rng):
    from sonicsim_tpu.models import TaylorSENet

    torch.manual_seed(14)
    tm = _TTaylor().eval()
    x = rng.standard_normal((1, 800)).astype(np.float32) * 0.3
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()

    model = TaylorSENet(c=8, cd1=8, d_feat=192, p=1, order_num=2,
                        dilations=(1, 2), fft_num=256, n_fft=256,
                        hop_length=128, win_length=256)
    _, params = import_torch_checkpoint(
        {"model_name": "TaylorSENet", "model_args": {},
         "state_dict": {k: v.numpy() for k, v in tm.state_dict().items()}},
        model=model)
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-2)


# --- FRCRN import parity (frcrn.py:12-540 + complex_nn.py naming) ------------

def _stft_kernels_sqrt(win_len, fft_len, invers=False):
    from scipy.signal import get_window
    window = get_window("hann", win_len, fftbins=True) ** 0.5
    basis = np.fft.rfft(np.eye(fft_len))[:win_len]
    kernel = np.concatenate([basis.real, basis.imag], 1).T
    if invers:
        kernel = np.linalg.pinv(kernel).T
    kernel = (kernel * window)[:, None, :]
    return (torch.from_numpy(kernel.astype(np.float32)),
            torch.from_numpy(window[None, :, None].astype(np.float32)))


class _TFsmn(tnn.Module):
    def __init__(self, input_dim, output_dim, lorder=20, hidden=128):
        super().__init__()
        self.linear = tnn.Linear(input_dim, hidden)
        self.project = tnn.Linear(hidden, output_dim, bias=False)
        self.conv1 = tnn.Conv2d(output_dim, output_dim, (lorder, 1), (1, 1),
                                groups=output_dim, bias=False)
        self.lorder = lorder

    def forward(self, x):  # (N, T, h)
        p1 = self.project(torch.relu(self.linear(x)))
        xp = p1.unsqueeze(1).permute(0, 3, 2, 1)  # (N, h, T, 1)
        y = tF.pad(xp, [0, 0, self.lorder - 1, 0])
        out = (xp + self.conv1(y)).permute(0, 3, 2, 1)  # (N, 1, T, h)
        return x + out[:, 0]


class _TCFsmn(tnn.Module):
    """ComplexUniDeepFsmn over time (bottleneck)."""

    def __init__(self, c=128):
        super().__init__()
        self.fsmn_re_L1 = _TFsmn(c, c)
        self.fsmn_im_L1 = _TFsmn(c, c)
        self.fsmn_re_L2 = _TFsmn(c, c)
        self.fsmn_im_L2 = _TFsmn(c, c)

    def forward(self, x):  # (B, C, F, T, 2)
        b, c, h, T, d = x.shape
        z = x.reshape(b, c * h, T, d).transpose(1, 2)  # (B, T, C*F, 2)
        r1 = self.fsmn_re_L1(z[..., 0]) - self.fsmn_im_L1(z[..., 1])
        i1 = self.fsmn_re_L1(z[..., 1]) + self.fsmn_im_L1(z[..., 0])
        r = self.fsmn_re_L2(r1) - self.fsmn_im_L2(i1)
        i = self.fsmn_re_L2(i1) + self.fsmn_im_L2(r1)
        out = torch.stack((r, i), -1).transpose(1, 2)
        return out.reshape(b, c, h, T, d)


class _TCFsmnL1(tnn.Module):
    """ComplexUniDeepFsmn_L1 over frequency."""

    def __init__(self, c=128):
        super().__init__()
        self.fsmn_re_L1 = _TFsmn(c, c)
        self.fsmn_im_L1 = _TFsmn(c, c)

    def forward(self, x):  # (B, C, F, T, 2)
        b, c, h, T, d = x.shape
        z = x.transpose(1, 3).reshape(b * T, h, c, d)
        r = self.fsmn_re_L1(z[..., 0]) - self.fsmn_im_L1(z[..., 1])
        i = self.fsmn_re_L1(z[..., 1]) + self.fsmn_im_L1(z[..., 0])
        out = torch.stack((r, i), -1).reshape(b, T, h, c, d)
        return out.transpose(1, 3)


class _TFrcrnSE(tnn.Module):
    def __init__(self, c, r=8):
        super().__init__()
        self.fc_r = tnn.Sequential(tnn.Linear(c, c // r), tnn.ReLU(),
                                   tnn.Linear(c // r, c), tnn.Sigmoid())
        self.fc_i = tnn.Sequential(tnn.Linear(c, c // r), tnn.ReLU(),
                                   tnn.Linear(c // r, c), tnn.Sigmoid())

    def forward(self, x):  # (B, C, F, T, 2)
        b, c = x.shape[:2]
        xr = x[..., 0].mean((2, 3))
        xi = x[..., 1].mean((2, 3))
        yr = (self.fc_r(xr) - self.fc_i(xi)).view(b, c, 1, 1, 1)
        yi = (self.fc_r(xi) + self.fc_i(xr)).view(b, c, 1, 1, 1)
        return x * torch.cat([yr, yi], 4)


class _TCConv(tnn.Module):
    def __init__(self, cin, cout, k, stride, pad):
        super().__init__()
        self.conv_re = tnn.Conv2d(cin, cout, k, stride, pad)
        self.conv_im = tnn.Conv2d(cin, cout, k, stride, pad)

    def forward(self, x):
        r = self.conv_re(x[..., 0]) - self.conv_im(x[..., 1])
        i = self.conv_re(x[..., 1]) + self.conv_im(x[..., 0])
        return torch.stack((r, i), -1)


class _TCConvT(tnn.Module):
    def __init__(self, cin, cout, k, stride, pad):
        super().__init__()
        self.tconv_re = tnn.ConvTranspose2d(cin, cout, k, stride, pad)
        self.tconv_im = tnn.ConvTranspose2d(cin, cout, k, stride, pad)

    def forward(self, x):
        r = self.tconv_re(x[..., 0]) - self.tconv_im(x[..., 1])
        i = self.tconv_re(x[..., 1]) + self.tconv_im(x[..., 0])
        return torch.stack((r, i), -1)


class _TCBN(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.bn_re = tnn.BatchNorm2d(c)
        self.bn_im = tnn.BatchNorm2d(c)

    def forward(self, x):
        return torch.stack((self.bn_re(x[..., 0]), self.bn_im(x[..., 1])), -1)


class _TFrcrnEnc(tnn.Module):
    def __init__(self, cin, cout, k, stride, pad):
        super().__init__()
        self.conv = _TCConv(cin, cout, k, stride, pad)
        self.bn = _TCBN(cout)

    def forward(self, x):
        return tF.leaky_relu(self.bn(self.conv(x)))


class _TFrcrnDec(tnn.Module):
    def __init__(self, cin, cout, k, stride, pad):
        super().__init__()
        self.transconv = _TCConvT(cin, cout, k, stride, pad)
        self.bn = _TCBN(cout)

    def forward(self, x):
        return tF.leaky_relu(self.bn(self.transconv(x)))


class _TFrcrnUNet(tnn.Module):
    ENC_K = [(5, 2)] * 6 + [(2, 2)]
    DEC_K = [(2, 2), (5, 2), (5, 2), (5, 2), (6, 2), (5, 2), (5, 2)]
    PADS = [(0, 1)] * 7

    def __init__(self):
        super().__init__()
        for i in range(7):
            cin = 1 if i == 0 else 128
            self.add_module(f"fsmn_enc{i}", _TCFsmnL1())
            self.add_module(f"encoder{i}",
                            _TFrcrnEnc(cin, 128, self.ENC_K[i], (2, 1),
                                       self.PADS[i]))
            self.add_module(f"se_layer_enc{i}", _TFrcrnSE(128))
        self.fsmn = _TCFsmn()
        for i in range(7):
            cout = 1 if i == 6 else 128
            self.add_module(f"fsmn_dec{i}", _TCFsmnL1(cout if i == 6 else 128))
            cin_d = 128 if i == 0 else 256  # dec_channels[0]*2 (frcrn.py:336)
            self.add_module(f"decoder{i}",
                            _TFrcrnDec(cin_d, cout, self.DEC_K[i], (2, 1),
                                       self.PADS[i]))
            if i < 6:
                self.add_module(f"se_layer_dec{i}", _TFrcrnSE(128))
        self.linear = _TCConv(1, 1, 1, 1, 0)  # dec_channels[-1]=1

    def forward(self, x):
        xs_se = [x]
        for i in range(7):
            if i > 0:
                x = getattr(self, f"fsmn_enc{i}")(x)
            x = getattr(self, f"encoder{i}")(x)
            xs_se.append(getattr(self, f"se_layer_enc{i}")(x))
        x = self.fsmn(x)
        p = x
        for i in range(7):
            p = getattr(self, f"decoder{i}")(p)
            if i < 6:
                p = getattr(self, f"fsmn_dec{i}")(p)
            if i == 6:
                break
            if i < 5:
                p = getattr(self, f"se_layer_dec{i}")(p)
            p = torch.cat([p, xs_se[6 - i]], dim=1)
        return self.linear(p)


class _TFRCRN(tnn.Module):
    def __init__(self, win=640, inc=320, fft=640):
        super().__init__()
        self.win, self.inc, self.fft = win, inc, fft
        self.feat_dim = fft // 2 + 1
        kf, _ = _stft_kernels_sqrt(win, fft)
        ki, w = _stft_kernels_sqrt(win, fft, invers=True)
        self.register_buffer("fwd_k", kf)
        self.register_buffer("inv_k", ki)
        self.register_buffer("win_buf", w)
        self.register_buffer("enframe", torch.eye(win)[:, None, :])
        self.unet = _TFrcrnUNet()
        self.unet2 = _TFrcrnUNet()

    def _istft(self, spec):
        # frcrn.py:126-143: full reconstruction, no crop
        out = tF.conv_transpose1d(spec, self.inv_k, stride=self.inc)
        t = self.win_buf.repeat(1, 1, spec.size(-1)) ** 2
        coff = tF.conv_transpose1d(t, self.enframe, stride=self.inc)
        return out / (coff + 1e-8)

    def forward(self, x):
        # frcrn.py:80-84: the analysis conv runs with NO signal padding
        # (unlike DCCRN's conv_stft.py)
        spec = tF.conv1d(x[:, None], self.fwd_k, stride=self.inc)
        cs = spec.unsqueeze(1)
        cs = torch.cat([cs[:, :, :self.feat_dim], cs[:, :, self.feat_dim:]], 1)
        cs = cs.unsqueeze(4).transpose(1, 4)  # (B, 1, F, T, 2)
        u1 = self.unet(cs)
        m1 = torch.tanh(u1)
        u2 = self.unet2(u1)
        m2 = torch.tanh(u2) + m1

        def apply(m):
            er = cs[..., 0] * m[..., 0] - cs[..., 1] * m[..., 1]
            ei = cs[..., 0] * m[..., 1] + cs[..., 1] * m[..., 0]
            est = torch.cat([er[:, 0], ei[:, 0]], 1)
            wav = self._istft(est).squeeze(1)
            msk = torch.cat([m[:, 0, :, :, 0], m[:, 0, :, :, 1]], 1)
            return est, wav, msk

        s1 = apply(m1)
        s2 = apply(m2)
        return x, [s1[0], s1[1], s1[2], s2[0], s2[1], s2[2]]


def test_frcrn_torch_import_parity(rng):
    from sonicsim_tpu.models import FRCRN

    torch.manual_seed(15)
    tm = _TFRCRN()
    with torch.no_grad():
        tm.train()
        tm(torch.from_numpy(
            rng.standard_normal((2, 2240)).astype(np.float32) * 0.3))
        tm.eval()
        x = rng.standard_normal((2, 2240)).astype(np.float32) * 0.3
        _, refs = tm(torch.from_numpy(x))
        refs = [r.numpy() for r in refs]

    model = FRCRN(torch_compat=True)
    _, params = import_torch_checkpoint(
        {"model_name": "FRCRN", "model_args": {},
         "state_dict": {k: v.numpy() for k, v in tm.state_dict().items()}},
        model=model)
    _, outs = model.apply(params, jnp.asarray(x))
    for got, ref in zip(outs, refs):
        g = np.asarray(got)
        n = min(g.shape[-1], ref.shape[-1])
        np.testing.assert_allclose(g[..., :n], ref[..., :n], atol=2e-3,
                                   rtol=1e-2)


# --- SkiM import parity (skim.py:15-900 naming; non-causal config) -----------

class _TSkGLN(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.gamma = tnn.Parameter(torch.ones(1, c, 1))
        self.beta = tnn.Parameter(torch.zeros(1, c, 1))

    def forward(self, y):  # shape BTD
        y = y.transpose(1, 2)
        mu = y.mean(dim=(1, 2), keepdim=True)
        var = ((y - mu) ** 2).mean(dim=(1, 2), keepdim=True)
        y = self.gamma * (y - mu) / (var + 1e-8) ** 0.5 + self.beta
        return y.transpose(1, 2)


class _TSingleLSTM(tnn.Module):
    def __init__(self, input_size, hidden, bidir):
        super().__init__()
        self.rnn = tnn.LSTM(input_size, hidden, 1, batch_first=True,
                            bidirectional=bidir)
        self.proj = tnn.Linear(hidden * (2 if bidir else 1), input_size)

    def forward(self, x, state=None):
        o, state = self.rnn(x, state)
        return self.proj(o), state


class _TSegLSTM(tnn.Module):
    def __init__(self, input_size, hidden, bidir):
        super().__init__()
        self.lstm = tnn.LSTM(input_size, hidden, 1, batch_first=True,
                             bidirectional=bidir)
        self.proj = tnn.Linear(hidden * (2 if bidir else 1), input_size)
        self.norm = _TSkGLN(input_size)
        self.hidden, self.d = hidden, 2 if bidir else 1

    def forward(self, x, hc):
        B = x.shape[0]
        if hc is None:
            h = torch.zeros(self.d, B, self.hidden)
            c = torch.zeros(self.d, B, self.hidden)
        else:
            h, c = hc
        o, (h, c) = self.lstm(x, (h, c))
        o = self.proj(o.reshape(-1, o.shape[2])).view(x.shape)
        return x + self.norm(o), (h, c)


class _TMemLSTM(tnn.Module):
    def __init__(self, hidden, bidir):
        super().__init__()
        self.input_size = (2 if bidir else 1) * hidden
        self.h_net = _TSingleLSTM(self.input_size, hidden, bidir)
        self.h_norm = _TSkGLN(self.input_size)
        self.c_net = _TSingleLSTM(self.input_size, hidden, bidir)
        self.c_norm = _TSkGLN(self.input_size)
        self.bidir = bidir

    def forward(self, hc, S):
        h, c = hc
        d, BS, H = h.shape
        B = BS // S
        h = h.transpose(1, 0).reshape(B, S, d * H)
        c = c.transpose(1, 0).reshape(B, S, d * H)
        h = h + self.h_norm(self.h_net(h)[0])
        c = c + self.c_norm(self.c_net(c)[0])
        h = h.view(B * S, d, H).transpose(1, 0).contiguous()
        c = c.view(B * S, d, H).transpose(1, 0).contiguous()
        return (h, c)


def _tsplit(x, seg):  # (B, D, T) → (B, D, K, S), rest
    b, d, t = x.shape
    stride = seg // 2
    rest = seg - (stride + t % seg) % seg
    if rest > 0:
        x = tF.pad(x, (0, rest))
    x = tF.pad(x, (stride, stride))
    s1 = x[:, :, :-stride].reshape(b, d, -1, seg)
    s2 = x[:, :, stride:].reshape(b, d, -1, seg)
    segs = torch.cat([s1, s2], 3).view(b, d, -1, seg).transpose(2, 3)
    return segs.contiguous(), rest


def _tmerge(x, rest):  # (B, D, K, S)
    b, d, seg, _ = x.shape
    stride = seg // 2
    x = x.transpose(2, 3).reshape(b, d, -1, seg * 2)
    x1 = x[:, :, :, :seg].reshape(b, d, -1)[:, :, stride:]
    x2 = x[:, :, :, seg:].reshape(b, d, -1)[:, :, :-stride]
    out = x1 + x2
    return out[:, :, :-rest] if rest > 0 else out


class _TSkiMNet(tnn.Module):
    def __init__(self, D=16, unit=8, layers=2, seg=10, k=8, spk=2):
        super().__init__()
        self.D, self.seg, self.layers, self.spk, self.k = D, seg, layers, spk, k

        class _Enc(tnn.Module):
            def __init__(s):
                super().__init__()
                s.conv1d = tnn.Conv1d(1, D, k, stride=k // 2, bias=False)

            def forward(s, x):
                return torch.relu(s.conv1d(x)).transpose(2, 1)

        class _SkiM(tnn.Module):
            def __init__(s):
                super().__init__()
                s.seg_lstms = tnn.ModuleList(
                    [_TSegLSTM(D, unit, True) for _ in range(layers)])
                s.mem_lstms = tnn.ModuleList(
                    [_TMemLSTM(unit, True) for _ in range(layers - 1)])
                s.output_fc = tnn.Sequential(tnn.PReLU(),
                                             tnn.Conv1d(D, D * spk, 1))

            def forward(s, x):  # (B, T, D)
                B, T, Dd = x.shape
                segs, rest = _tsplit(x.transpose(1, 2), seg)
                segs = segs.permute(0, 3, 2, 1).contiguous()  # B, S, K, D
                _, S, K, _ = segs.shape
                out = segs.view(B * S, K, Dd)
                hc = None
                for i in range(layers):
                    out, hc = s.seg_lstms[i](out, hc)
                    if i < layers - 1:
                        hc = s.mem_lstms[i](hc, S)
                out = out.view(B, S, K, Dd).permute(0, 3, 2, 1)
                out = _tmerge(out, rest)
                return s.output_fc(out).transpose(1, 2)

        class _Sep(tnn.Module):
            def __init__(s):
                super().__init__()
                s.skim = _SkiM()

            def forward(s, e):
                B, T, N = e.shape
                proc = s.skim(e).view(B, T, N, spk)
                masks = torch.relu(proc).unbind(3)
                return [e * m for m in masks], None

        self.encoder = _Enc()
        self.separation = _Sep()
        self.decoder = tnn.ConvTranspose1d(D, 1, k, stride=k // 2, bias=False)

    def forward(self, x):
        n = x.shape[-1]
        e = self.encoder(x[:, None])
        s, _ = self.separation(e)
        outs = []
        for i in range(self.spk):
            o = self.decoder((s[i] * e).transpose(2, 1))[:, 0]
            outs.append(tF.pad(o, (0, n - o.shape[-1])))
        return torch.stack(outs, 1)


def test_skim_torch_import_parity(rng):
    from sonicsim_tpu.models import SkiMNet

    torch.manual_seed(16)
    tm = _TSkiMNet().eval()
    x = rng.standard_normal((2, 800)).astype(np.float32) * 0.3
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()

    model = SkiMNet(input_dim=16, unit=8, layer=2, segment_size=10,
                    kernel_size=8, num_spk=2, causal=False)
    _, params = import_torch_checkpoint(
        {"model_name": "SkiMNet", "model_args": {},
         "state_dict": {k: v.numpy() for k, v in tm.state_dict().items()}},
        model=model)
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-2)


# --- BSRNN-ESPnet import parity (bsrnn_espnet.py:517-880 naming) -------------

class _TEBandSplit(tnn.Module):
    def __init__(self, subbands, ch):
        super().__init__()
        self.subbands = subbands
        self.norm = tnn.ModuleList(
            [tnn.GroupNorm(1, s * 2) for s in subbands])
        self.fc = tnn.ModuleList(
            [tnn.Conv1d(s * 2, ch, 1) for s in subbands])

    def forward(self, x):  # (B, T, F, 2)
        hz, outs = 0, []
        for i, s in enumerate(self.subbands):
            xb = x[:, :, hz:hz + s, :].reshape(x.size(0), x.size(1), -1)
            outs.append(self.fc[i](self.norm[i](xb.transpose(1, 2))))
            hz += s
        return torch.stack(outs, -1)  # (B, N, T, K)


class _TEMaskDec(tnn.Module):
    def __init__(self, subbands, ch):
        super().__init__()
        self.subbands = subbands
        mk = lambda s: tnn.Sequential(
            tnn.GroupNorm(1, ch), tnn.Conv1d(ch, 4 * ch, 1), tnn.Tanh(),
            tnn.Conv1d(4 * ch, s * 4, 1), tnn.GLU(dim=1))
        self.mlp_mask = tnn.ModuleList([mk(s) for s in subbands])
        self.mlp_residual = tnn.ModuleList([mk(s) for s in subbands])

    def forward(self, x):  # (B, N, T, K)
        ms, rs = [], []
        for i, s in enumerate(self.subbands):
            xb = x[:, :, :, i]
            m = self.mlp_mask[i](xb).transpose(1, 2)
            ms.append(m.reshape(m.size(0), m.size(1), -1, 2))
            r = self.mlp_residual[i](xb).transpose(1, 2)
            rs.append(r.reshape(r.size(0), r.size(1), -1, 2))
        return torch.cat(ms, 2), torch.cat(rs, 2)


class _TEBSRNN(tnn.Module):
    def __init__(self, subbands, ch=8, layers=2):
        super().__init__()
        self.layers = layers
        self.band_split = _TEBandSplit(subbands, ch)
        self.mask_decoder = _TEMaskDec(subbands, ch)
        h = 2 * ch
        self.norm_time = tnn.ModuleList(
            [tnn.GroupNorm(1, ch) for _ in range(layers)])
        self.rnn_time = tnn.ModuleList(
            [tnn.LSTM(ch, h, batch_first=True, bidirectional=True)
             for _ in range(layers)])
        self.fc_time = tnn.ModuleList(
            [tnn.Linear(h * 2, ch) for _ in range(layers)])
        self.norm_freq = tnn.ModuleList(
            [tnn.GroupNorm(1, ch) for _ in range(layers)])
        self.rnn_freq = tnn.ModuleList(
            [tnn.LSTM(ch, h, batch_first=True, bidirectional=True)
             for _ in range(layers)])
        self.fc_freq = tnn.ModuleList(
            [tnn.Linear(4 * ch, ch) for _ in range(layers)])

    def forward(self, x):  # (B, T, F, 2)
        z = self.band_split(x)
        B, N, T, K = z.shape
        skip = z
        for i in range(self.layers):
            o = self.norm_time[i](skip).transpose(1, 3).reshape(B * K, T, N)
            o, _ = self.rnn_time[i](o)
            o = self.fc_time[i](o).reshape(B, K, T, N).transpose(1, 3)
            skip = skip + o
            o = self.norm_freq[i](skip).permute(0, 2, 3, 1).reshape(B * T, K, N)
            o, _ = self.rnn_freq[i](o)
            o = self.fc_freq[i](o).reshape(B, T, K, N).permute(0, 3, 1, 2)
            skip = skip + o
        m, r = self.mask_decoder(skip)
        m = torch.view_as_complex(m.contiguous())
        r = torch.view_as_complex(r.contiguous())
        xc = torch.view_as_complex(x.contiguous())
        m, r = m[..., :xc.size(-1)], r[..., :xc.size(-1)]
        return torch.view_as_real(m * xc + r)


class _TEBSRNNNet(tnn.Module):
    def __init__(self, n_fft=96, hop=48, ch=8, layers=2, subbands=None):
        super().__init__()
        self.n_fft, self.hop = n_fft, hop
        self.separator = tnn.Module()
        self.separator.bsrnn = _TEBSRNN(subbands, ch, layers)

    def forward(self, x):
        n = x.shape[-1]
        s = torch.stft(x, self.n_fft, self.hop, win_length=self.n_fft,
                       window=torch.hann_window(self.n_fft),
                       return_complex=True).transpose(1, 2)  # (B, T, F)
        feat = torch.view_as_real(s)
        out = self.separator.bsrnn(feat)
        est = torch.view_as_complex(out.contiguous()).transpose(1, 2)
        return torch.istft(est, self.n_fft, self.hop, win_length=self.n_fft,
                           window=torch.hann_window(self.n_fft), length=n)


def test_bsrnn_espnet_torch_import_parity(rng, monkeypatch):
    import sonicsim_tpu.models.bsrnn_espnet as mod
    from sonicsim_tpu.models import BSRNNESPNet

    # tiny subband layout for n_fft=96 → F=49
    tiny = tuple([10, 10, 10, 19])
    monkeypatch.setattr(
        mod, "subband_layout", lambda d, fs: tiny
    )
    import sonicsim_tpu.models.torch_import as ti
    torch.manual_seed(17)
    tm = _TEBSRNNNet(subbands=tiny).eval()
    x = rng.standard_normal((2, 960)).astype(np.float32) * 0.3
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()

    model = BSRNNESPNet(n_fft=96, hop_length=48, num_channels=8, num_layers=2)
    _, params = import_torch_checkpoint(
        {"model_name": "BSRNNESPNet", "model_args": {},
         "state_dict": {k: v.numpy() for k, v in tm.state_dict().items()}},
        model=model)
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-2)


# --- DPTNet import parity (dptnet.py:323-735 naming) -------------------------

class _TDPGLN(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.gamma = tnn.Parameter(torch.ones(1, c, 1))
        self.beta = tnn.Parameter(torch.zeros(1, c, 1))

    def forward(self, y):  # (B, C, T)
        mu = y.mean(dim=(1, 2), keepdim=True)
        var = ((y - mu) ** 2).mean(dim=(1, 2), keepdim=True)
        eps = torch.finfo(torch.float32).eps
        return self.gamma * (y - mu) / (var + eps) ** 0.5 + self.beta


class _TITL(tnn.Module):
    def __init__(self, c, heads, hidden, bidir):
        super().__init__()
        self.self_attn = tnn.MultiheadAttention(c, heads)
        self.norm_attn = _TDPGLN(c)
        self.rnn = tnn.LSTM(c, hidden, 1, batch_first=True,
                            bidirectional=bidir)
        hdim = hidden * (2 if bidir else 1)
        self.feed_forward = tnn.Sequential(tnn.ReLU(), tnn.Dropout(0.0),
                                           tnn.Linear(hdim, c))
        self.norm_ff = _TDPGLN(c)

    def forward(self, x):  # (B, S, C)
        src = x.permute(1, 0, 2)
        out = self.self_attn(src, src, src)[0].permute(1, 0, 2) + x
        out = self.norm_attn(out.transpose(-1, -2)).transpose(-1, -2)
        out2 = self.feed_forward(self.rnn(out)[0]) + out
        return self.norm_ff(out2.transpose(-1, -2)).transpose(-1, -2)


class _TDPTNet(tnn.Module):
    def __init__(self, c=16, k=8, stride=4, layers=2, unit=8, heads=2,
                 seg=10, spk=2):
        super().__init__()
        self.c, self.seg, self.spk, self.layers = c, seg, spk, layers

        class _Enc(tnn.Module):
            def __init__(s):
                super().__init__()
                s.conv1d = tnn.Conv1d(1, c, k, stride, bias=False)

            def forward(s, x):
                return torch.relu(s.conv1d(x[:, None])).transpose(1, 2)

        class _Core(tnn.Module):
            def __init__(s):
                super().__init__()
                s.row_transformer = tnn.ModuleList(
                    [_TITL(c, heads, unit, True) for _ in range(layers)])
                s.col_transformer = tnn.ModuleList(
                    [_TITL(c, heads, unit, True) for _ in range(layers)])
                s.output = tnn.Sequential(tnn.PReLU(),
                                          tnn.Conv2d(c, c * spk, 1))

            def forward(s, x):  # (B, N, L, K)
                for i in range(layers):
                    b, n, l, kk = x.shape
                    h = x.transpose(1, -1).reshape(b * kk, l, n)
                    h = s.row_transformer[i](h)
                    x = h.reshape(b, kk, l, n).permute(0, 3, 2, 1)
                    b, n, l, kk = x.shape
                    h = x.permute(0, 2, 3, 1).reshape(b * l, kk, n)
                    h = s.col_transformer[i](h)
                    x = h.reshape(b, l, kk, n).permute(0, 3, 1, 2)
                return s.output(x)

        class _Sep(tnn.Module):
            def __init__(s):
                super().__init__()
                s.enc_LN = _TDPGLN(c)
                s.dptnet = _Core()
                s.output = tnn.Sequential(tnn.Conv1d(c, c, 1), tnn.Tanh())
                s.output_gate = tnn.Sequential(tnn.Conv1d(c, c, 1),
                                               tnn.Sigmoid())

            def forward(s, feat):  # (B, T, N)
                B, T, N = feat.shape
                x = torch.relu(feat)
                x = s.enc_LN(x.transpose(1, 2))  # (B, N, T)
                unf = tF.unfold(x.unsqueeze(-1).transpose(2, 3)
                                if False else x.unsqueeze(-1),
                                kernel_size=(seg, 1), padding=(seg, 0),
                                stride=(seg // 2, 1))
                segd = unf.reshape(B, N, seg, -1)
                proc = s.dptnet(segd)  # (B, N*spk, L, K)
                proc = proc.reshape(B * spk, N, seg, -1)
                L = proc.shape[2]
                nchunks = proc.shape[3]
                seqs = proc.reshape(B * spk, N * L, nchunks)
                folded = tF.fold(seqs, output_size=(1, T),
                                 kernel_size=(1, L), padding=(0, L),
                                 stride=(1, seg // 2))
                ones = tF.fold(torch.ones_like(seqs), output_size=(1, T),
                               kernel_size=(1, L), padding=(0, L),
                               stride=(1, seg // 2))
                proc = (folded / ones).reshape(B * spk, N, T)
                m = s.output(proc) * s.output_gate(proc)
                masks = torch.relu(
                    m.reshape(B, spk, N, T).transpose(-1, -2)).unbind(1)
                return [feat * mm for mm in masks]

        class _Dec(tnn.Module):
            def __init__(s):
                super().__init__()
                s.convtrans1d = tnn.ConvTranspose1d(c, 1, k, stride,
                                                    bias=False)

            def forward(s, x, length):
                o = s.convtrans1d(x.transpose(1, 2))[:, 0]
                return tF.pad(o, (0, length - o.shape[-1]))

        self.encoder = _Enc()
        self.separator = _Sep()
        self.decoder = _Dec()

    def forward(self, x):
        n = x.shape[-1]
        feat = self.encoder(x)
        masked = self.separator(feat)
        return torch.stack([self.decoder(m, n) for m in masked], 1)


def test_dptnet_torch_import_parity(rng):
    from sonicsim_tpu.models import DPTNetModel

    torch.manual_seed(18)
    tm = _TDPTNet().eval()
    x = rng.standard_normal((2, 800)).astype(np.float32) * 0.3
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()

    model = DPTNetModel(channel=16, kernel_size=8, stride=4, layer=2, unit=8,
                        att_heads=2, segment_size=10, num_spk=2)
    _, params = import_torch_checkpoint(
        {"model_name": "DPTNetModel", "model_args": {},
         "state_dict": {k: v.numpy() for k, v in tm.state_dict().items()}},
        model=model)
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-2)


# --- MossFormer import parity (mossformer.py + mossformer_block.py) ----------

class _TScaleNorm(tnn.Module):
    def __init__(self, dim, eps=1e-5):
        super().__init__()
        self.scale = dim ** -0.5
        self.eps = eps
        self.g = tnn.Parameter(torch.ones(1))

    def forward(self, x):
        n = torch.norm(x, dim=-1, keepdim=True) * self.scale
        return x / n.clamp(min=self.eps) * self.g


class _TConvModule(tnn.Module):
    def __init__(self, c, k=17):
        super().__init__()

        class _DW(tnn.Module):
            def __init__(s):
                super().__init__()
                s.conv = tnn.Conv1d(c, c, k, padding=(k - 1) // 2, groups=c,
                                    bias=False)

            def forward(s, x):
                return s.conv(x)

        class _Tr(tnn.Module):
            def forward(s, x):
                return x.transpose(1, 2)

        self.sequential = tnn.Sequential(_Tr(), _DW())

    def forward(self, x):
        return x + self.sequential(x).transpose(1, 2)


class _TFFConvM(tnn.Module):
    def __init__(self, din, dout):
        super().__init__()
        self.mdl = tnn.Sequential(_TScaleNorm(din), tnn.Linear(din, dout),
                                  tnn.SiLU(), _TConvModule(dout),
                                  tnn.Dropout(0.0))

    def forward(self, x):
        return self.mdl(x)


def _trotary(t, rot_dim):
    n = t.shape[-2]
    inv = 1.0 / (10000 ** (torch.arange(0, rot_dim, 2).float() / rot_dim))
    ang = torch.arange(n).float()[:, None] * inv[None, :]
    cos = ang.cos().repeat_interleave(2, -1)
    sin = ang.sin().repeat_interleave(2, -1)
    tr = t[..., :rot_dim]
    x1, x2 = tr[..., 0::2], tr[..., 1::2]
    rh = torch.stack((-x2, x1), dim=-1).reshape(tr.shape)
    return torch.cat([tr * cos + rh * sin, t[..., rot_dim:]], dim=-1)


class _TFlash(tnn.Module):
    def __init__(self, dim, group, qk_dim, exp=4.0):
        super().__init__()
        hidden = int(dim * exp)
        self.group, self.qk_dim = group, qk_dim
        self.to_hidden = _TFFConvM(dim, hidden)
        self.to_qk = _TFFConvM(dim, qk_dim)

        class _OS(tnn.Module):
            def __init__(s):
                super().__init__()
                s.gamma = tnn.Parameter(torch.ones(4, qk_dim))
                s.beta = tnn.Parameter(torch.zeros(4, qk_dim))

        self.qk_offset_scale = _OS()
        self.to_out = _TFFConvM(dim * 2, dim)

    def forward(self, x):
        b, n, _ = x.shape
        x_shift, x_pass = x.chunk(2, dim=-1)
        x_shift = tF.pad(x_shift, (0, 0, 1, -1))
        normed = torch.cat((x_shift, x_pass), dim=-1)
        v, u = self.to_hidden(normed).chunk(2, dim=-1)
        qk = self.to_qk(normed)
        heads = (qk.unsqueeze(-2) * self.qk_offset_scale.gamma
                 + self.qk_offset_scale.beta)
        qq, lq, qkk, lk = heads.unbind(dim=-2)
        rot = min(32, self.qk_dim)
        qq, lq, qkk, lk = (_trotary(t, rot) for t in (qq, lq, qkk, lk))
        g = self.group
        pad = (-n) % g
        if pad:
            qq, qkk, lq, lk, vp, up = (
                tF.pad(t, (0, 0, 0, pad)) for t in (qq, qkk, lq, lk, v, u))
        else:
            vp, up = v, u
        ng = (n + pad) // g
        shp = lambda t: t.reshape(b, ng, g, t.shape[-1])
        qq, qkk, lq, lk, vg, ug = map(shp, (qq, qkk, lq, lk, vp, up))
        sim = torch.einsum("bgid,bgjd->bgij", qq, qkk) / g
        attn = torch.relu(sim) ** 2
        quad_v = torch.einsum("bgij,bgjd->bgid", attn, vg)
        quad_u = torch.einsum("bgij,bgjd->bgid", attn, ug)
        lin_kv = torch.einsum("bgnd,bgne->bde", lk, vg) / n
        lin_v = torch.einsum("bgnd,bde->bgne", lq, lin_kv)
        lin_ku = torch.einsum("bgnd,bgne->bde", lk, ug) / n
        lin_u = torch.einsum("bgnd,bde->bgne", lq, lin_ku)
        att_v = (quad_v + lin_v).reshape(b, n + pad, -1)[:, :n]
        att_u = (quad_u + lin_u).reshape(b, n + pad, -1)[:, :n]
        out = (att_u * v) * torch.sigmoid(att_v * u)
        return x + self.to_out(out)


class _TMossFormer(tnn.Module):
    def __init__(self, N=16, k=16, stride=8, blocks=2, qk=8, group=10, spk=2):
        super().__init__()
        self.spk, self.k, self.stride = spk, k, stride

        class _Enc(tnn.Module):
            def __init__(s):
                super().__init__()
                s.conv1d = tnn.Conv1d(1, N, k, stride, bias=False)

            def forward(s, x):
                return torch.relu(s.conv1d(x[:, None]))

        class _SbLN(tnn.Module):
            def __init__(s):
                super().__init__()
                s.norm = tnn.LayerNorm(N, eps=1e-6)

            def forward(s, x):
                return s.norm(x)

        class _AttMdl(tnn.Module):
            def __init__(s):
                super().__init__()

                class _Core(tnn.Module):
                    def __init__(ss):
                        super().__init__()
                        ss.layers = tnn.ModuleList(
                            [_TFlash(N, group, qk) for _ in range(blocks)])

                    def forward(ss, x):
                        for f in ss.layers:
                            x = f(x)
                        return x

                s.mossformerM = _Core()
                s.norm = _SbLN()

            def forward(s, x):
                return s.norm(s.mossformerM(x))

        class _Mdl(tnn.Module):
            def __init__(s):
                super().__init__()
                s.att_mdl = _AttMdl()
                s.att_norm = tnn.GroupNorm(1, N, eps=1e-8)

            def forward(s, x):  # (B, N, S)
                a = s.att_mdl(x.permute(0, 2, 1)).permute(0, 2, 1)
                return s.att_norm(a) + x

        class _MaskNet(tnn.Module):
            def __init__(s):
                super().__init__()
                s.norm = tnn.GroupNorm(1, N, eps=1e-8)
                s.conv1d_encoder = tnn.Conv1d(N, N, 1, bias=False)

                class _Pos(tnn.Module):
                    def __init__(ss):
                        super().__init__()
                        ss.scale = tnn.Parameter(torch.ones(1))
                        ss.register_buffer(
                            "inv_freq",
                            1.0 / (10000 ** (torch.arange(0, N, 2).float() / N)))

                    def forward(ss, x):
                        t = torch.arange(x.shape[1]).float()
                        sinu = torch.einsum("i,j->ij", t, ss.inv_freq)
                        return torch.cat((sinu.sin(), sinu.cos()), -1) * ss.scale

                s.pos_enc = _Pos()
                s.mdl = _Mdl()
                s.conv1d_out = tnn.Conv1d(N, N * spk, 1)
                s.conv1_decoder = tnn.Conv1d(N, N, 1, bias=False)
                s.prelu = tnn.PReLU()
                s.output = tnn.Sequential(tnn.Conv1d(N, N, 1), tnn.Tanh())
                s.output_gate = tnn.Sequential(tnn.Conv1d(N, N, 1),
                                               tnn.Sigmoid())

            def forward(s, x):  # (B, N, S)
                x = s.norm(x)
                x = s.conv1d_encoder(x)
                emb = s.pos_enc(x.transpose(1, -1)).t()
                x = x + emb
                x = s.mdl(x)
                x = s.prelu(x)
                x = s.conv1d_out(x)
                b, _, ss_ = x.shape
                x = x.view(b * spk, -1, ss_)
                x = s.output(x) * s.output_gate(x)
                x = s.conv1_decoder(x)
                _, n_, L = x.shape
                x = torch.relu(x.view(b, spk, n_, L))
                return x.transpose(0, 1)

        self.encoder = _Enc()
        self.mask_net = _MaskNet()
        self.decoder = tnn.ConvTranspose1d(N, 1, k, stride, bias=False)

    def forward(self, x):
        n = x.shape[-1]
        w = self.encoder(x)
        m = self.mask_net(w)
        sep = torch.stack([w] * self.spk) * m
        outs = [self.decoder(sep[i]).squeeze(1) for i in range(self.spk)]
        est = torch.stack(outs, -1)
        est = tF.pad(est, (0, 0, 0, n - est.shape[1]))
        return est.permute(0, 2, 1)


def test_mossformer_torch_import_parity(rng):
    from sonicsim_tpu.models import MossFormer

    torch.manual_seed(19)
    tm = _TMossFormer().eval()
    x = rng.standard_normal((2, 800)).astype(np.float32) * 0.3
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()

    model = MossFormer(kernel_size=16, stride=8, out_channels=16,
                       in_channels=16, num_blocks=2, d_model=16,
                       query_key_dim=8, group_size=10, num_spks=2)
    _, params = import_torch_checkpoint(
        {"model_name": "MossFormer", "model_args": {},
         "state_dict": {k: v.numpy() for k, v in tm.state_dict().items()}},
        model=model)
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-2)


# --- MossFormer2 import parity (adds gated dilated-FSMN blocks) --------------

class _TDilatedDense(tnn.Module):
    def __init__(self, depth, lorder, c):
        super().__init__()
        self.depth = depth
        tw = lorder * 2 - 1
        for i in range(depth):
            dil = 2 ** i
            pl = lorder + (dil - 1) * (lorder - 1) - 1
            setattr(self, f"pad{i + 1}", tnn.ConstantPad2d((0, 0, pl, pl), 0.0))
            setattr(self, f"conv{i + 1}",
                    tnn.Conv2d(c * (i + 1), c, (tw, 1), dilation=(dil, 1),
                               groups=c, bias=False))
            setattr(self, f"norm{i + 1}", tnn.InstanceNorm2d(c, affine=True))
            setattr(self, f"prelu{i + 1}", tnn.PReLU(c))

    def forward(self, x):  # (B, C, T, 1)
        skip = x
        for i in range(self.depth):
            out = getattr(self, f"pad{i + 1}")(skip)
            out = getattr(self, f"conv{i + 1}")(out)
            out = getattr(self, f"norm{i + 1}")(out)
            out = getattr(self, f"prelu{i + 1}")(out)
            skip = torch.cat([out, skip], dim=1)
        return out


class _TUniFsmnDil(tnn.Module):
    def __init__(self, c, hidden, lorder=20, depth=2):
        super().__init__()
        self.linear = tnn.Linear(c, hidden)
        self.project = tnn.Linear(hidden, c, bias=False)
        self.conv = _TDilatedDense(depth, lorder, c)

    def forward(self, x):  # (B, T, C)
        p1 = self.project(torch.relu(self.linear(x)))
        xp = p1.unsqueeze(1).permute(0, 3, 2, 1)  # (B, C, T, 1)
        out = self.conv(xp).permute(0, 3, 2, 1)
        return x + out[:, 0]


class _TCLN(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.ln = tnn.LayerNorm(c)

    def forward(self, x):  # (B, C, T)
        return self.ln(x.transpose(1, 2)).transpose(1, 2)

    def state_dict(self, *a, **kw):
        # match reference CLayerNorm (subclass of LayerNorm: weight/bias)
        sd = super().state_dict(*a, **kw)
        return {k.replace("ln.", ""): v for k, v in sd.items()}


class _TGatedFSMNBlk(tnn.Module):
    def __init__(self, dim, inner=16):
        super().__init__()
        self.conv1 = tnn.Sequential(tnn.Conv1d(dim, inner, 1), tnn.PReLU())
        self.norm1 = tnn.LayerNorm(inner)

        class _Gated(tnn.Module):
            def __init__(s):
                super().__init__()

                class _FF(tnn.Module):
                    def __init__(ss):
                        super().__init__()
                        ss.mdl = tnn.Sequential(
                            tnn.LayerNorm(inner), tnn.Linear(inner, inner),
                            tnn.SiLU(), _TConvModule(inner), tnn.Dropout(0.0))

                    def forward(ss, x):
                        return ss.mdl(x)

                s.to_u = _FF()
                s.to_v = _FF()
                s.fsmn = _TUniFsmnDil(inner, inner)

            def forward(s, x):
                return s.to_v(x) * s.fsmn(s.to_u(x)) + x

        self.gated_fsmn = _Gated()
        self.norm2 = tnn.LayerNorm(inner)
        self.conv2 = tnn.Conv1d(inner, dim, 1)

    def forward(self, x):  # (B, T, C)
        h = self.conv1(x.transpose(2, 1))
        h = self.norm1(h.transpose(1, 2)).transpose(1, 2)  # CLayerNorm
        h = self.gated_fsmn(h.transpose(2, 1))
        h = self.norm2(h).transpose(2, 1)
        return self.conv2(h).transpose(2, 1) + x


class _TMossFormer2(_TMossFormer):
    def __init__(self, **kw):
        super().__init__(**kw)
        N = 16

        class _Core2(tnn.Module):
            def __init__(s, layers, fsmn):
                super().__init__()
                s.layers = layers
                s.fsmn = fsmn

            def forward(s, x):
                for f, m in zip(s.layers, s.fsmn):
                    x = f(x)
                    x = m(x)
                return x

        old = self.mask_net.mdl.att_mdl.mossformerM
        fsmn = tnn.ModuleList([_TGatedFSMNBlk(N) for _ in old.layers])
        self.mask_net.mdl.att_mdl.mossformerM = _Core2(old.layers, fsmn)


def test_mossformer2_torch_import_parity(rng):
    from sonicsim_tpu.models import MossFormer2

    torch.manual_seed(20)
    tm = _TMossFormer2().eval()
    x = rng.standard_normal((2, 800)).astype(np.float32) * 0.3
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()

    model = MossFormer2(kernel_size=16, stride=8, out_channels=16,
                        in_channels=16, num_blocks=2, d_model=16,
                        query_key_dim=8, group_size=10, num_spks=2,
                        fsmn_inner=16)

    # The replica reuses v1's module tree; rename to v2's actual layout
    # (mossformer2.py:543-561: enc/dec, ComputationBlock intra_mdl/
    # intra_norm, plain-LayerNorm final norm) which the converter — and
    # test_reference_source_parity.py against the real source — expects.
    def _v2_key(k):
        if k.startswith("encoder."):
            k = "enc." + k[len("encoder."):]
        if k.startswith("decoder."):
            k = "dec." + k[len("decoder."):]
        k = k.replace(".mdl.att_mdl.", ".mdl.intra_mdl.")
        k = k.replace(".mdl.att_norm.", ".mdl.intra_norm.")
        return k.replace("intra_mdl.norm.norm.", "intra_mdl.norm.")

    _, params = import_torch_checkpoint(
        {"model_name": "MossFormer2", "model_args": {},
         "state_dict": {_v2_key(k): v.numpy()
                        for k, v in tm.state_dict().items()}},
        model=model)
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-2)
