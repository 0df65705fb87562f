"""Forward parity against the reference's OWN model code.

Round-2 verdict: every torch-import parity test builds a hand-written
replica, so a shared misreading of the reference would pass while
breaking real ``best_model.pth`` import. These tests close that hole by
importing /root/reference/{separation,enhancement}/look2hear/models/*
directly (torch is installed), instantiating each architecture at a tiny
config, exporting ``state_dict()`` → ``import_torch_checkpoint`` →
asserting forward parity vs the flax model.

Import strategy: the reference trees aren't importable as-is (their
``look2hear.utils`` package __init__ pulls pytorch_lightning / soundfile
/ omegaconf, and some models need torch_complex / rotary_embedding_torch
/ modelscope / torchaudio / librosa that this image lacks), so each tree
is loaded under a synthetic package (``refsep`` / ``refenh``) whose
``utils``/``layers``/``models`` subpackages are pre-seeded in sys.modules
with real ``__path__`` entries — submodules load from the reference
sources verbatim while the heavyweight package __init__ files never run.
Missing third-party deps are stubbed:

* ``torch_complex``      — import-only (tests pass use_builtin_complex
                           so ComplexTensor never runs);
* ``librosa``            — import-only (old-torch fallback branch);
* ``torchaudio``         — MelScale backed by our mel_filterbank, which
                           is itself torchaudio-parity-tested;
* ``rotary_embedding_torch`` — faithful partial interleaved RoPE (the
                           one numeric stub; matches the library's
                           default 'lang' convention).

MossFormer (v1) imports its blocks from ``modelscope``
(mossformer.py:11-14), which is absent — but the reference tree VENDORS
the same block code in mossformer_block.py (MossformerBlock:491 is the
v1 FLASH stack), so the modelscope stub aliases the reference's own
source and only the tiny speechbrain LayerNorm wrapper is synthetic
(see _install_mossformer_v1_stubs).
"""

from __future__ import annotations

import importlib
import sys
import types
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402
import torch.nn as tnn  # noqa: E402

from sonicsim_tpu.models.torch_import import import_torch_checkpoint  # noqa: E402

REF = Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not (REF / "separation" / "look2hear" / "models").is_dir(),
    reason="reference checkout not present",
)


# --------------------------------------------------------------------------
# Third-party stubs
# --------------------------------------------------------------------------

def _mk_module(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    sys.modules[name] = mod
    return mod


def _install_stubs() -> None:
    if "rotary_embedding_torch" in sys.modules:
        return

    # --- torch_complex: import-only (runtime paths use builtin complex) ---
    tc = _mk_module("torch_complex")
    tct = _mk_module("torch_complex.tensor")
    tcf = _mk_module("torch_complex.functional")

    class ComplexTensor:  # constructed only when use_builtin_complex=False
        def __init__(self, *a, **k):
            raise NotImplementedError(
                "torch_complex stub: pass use_builtin_complex=True"
            )

    tct.ComplexTensor = ComplexTensor
    tc.tensor = tct
    tc.functional = tcf

    # --- librosa: import-only (pre-1.6-torch stft fallback branch) --------
    lb = _mk_module("librosa")
    lb.filters = _mk_module("librosa.filters")
    lb.util = _mk_module("librosa.util")

    # --- torchaudio: MelScale over our (torchaudio-parity-tested) fbank ---
    ta = _mk_module("torchaudio")
    ta.transforms = _mk_module("torchaudio.transforms")

    class MelScale(tnn.Module):
        def __init__(self, n_mels, sample_rate=16000, f_min=0.0,
                     f_max=None, n_stft=201, **kw):
            super().__init__()
            from sonicsim_tpu.models.fastfullsubnet import mel_filterbank

            fb = mel_filterbank(
                n_stft, n_mels, sample_rate, f_min,
                f_max if f_max is not None else sample_rate / 2,
            )
            self.register_buffer("fb", torch.from_numpy(fb.astype(np.float32)))

        def forward(self, specgram):
            return torch.matmul(
                specgram.transpose(-1, -2), self.fb
            ).transpose(-1, -2)

    ta.transforms.MelScale = MelScale

    # --- rotary_embedding_torch: partial interleaved RoPE ('lang') --------
    re_mod = _mk_module("rotary_embedding_torch")

    class RotaryEmbedding(tnn.Module):
        """Default-config subset of the public library: theta=10000,
        freqs_for='lang', interleaved (GPT-J) rotation of the first
        ``dim`` features, remainder passed through."""

        def __init__(self, dim, **kw):
            super().__init__()
            self.dim = dim

        def rotate_queries_or_keys(self, t, seq_dim=-2):
            n = t.shape[-2]
            inv = 1.0 / (
                10000 ** (torch.arange(0, self.dim, 2).float() / self.dim)
            )
            ang = torch.arange(n, device=t.device).float()[:, None] * inv[None, :]
            cos = ang.cos().repeat_interleave(2, -1)
            sin = ang.sin().repeat_interleave(2, -1)
            tr = t[..., : self.dim]
            x1, x2 = tr[..., 0::2], tr[..., 1::2]
            rot = torch.stack((-x2, x1), dim=-1).reshape(tr.shape)
            return torch.cat(
                [tr * cos + rot * sin, t[..., self.dim:]], dim=-1
            )

    re_mod.RotaryEmbedding = RotaryEmbedding


# --------------------------------------------------------------------------
# Synthetic-package loader for the reference trees
# --------------------------------------------------------------------------

def _mk_pkg(name: str, path: Path | None) -> types.ModuleType:
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    mod.__package__ = name
    if path is not None:
        mod.__path__ = [str(path)]
    sys.modules[name] = mod
    return mod


_BASES: dict[str, str] = {"separation": "refsep", "enhancement": "refenh"}


def _install_tree(tree: str) -> str:
    """Seed synthetic packages for one reference tree; return base name."""
    _install_stubs()
    base = _BASES[tree]
    if f"{base}.models" in sys.modules:
        return base
    root = REF / tree / "look2hear"
    _mk_pkg(base, root)
    _mk_pkg(f"{base}.models", root / "models")
    utils_pkg = _mk_pkg(f"{base}.utils", root / "utils")
    layers_pkg = _mk_pkg(f"{base}.layers", root / "layers")
    # `from ..layers import Stft` reads an attribute off the package
    # object; bind it from the one submodule that's needed, without
    # running the layers __init__ (which would pull librosa-backed stft).
    stft_mod = importlib.import_module(f"{base}.layers.stft_tfgn")
    layers_pkg.Stft = stft_mod.Stft
    utils_pkg.complex_utils = importlib.import_module(
        f"{base}.utils.complex_utils"
    )
    if tree == "separation":
        # dptnet.py uses absolute `look2hear.*` imports
        # (separation/look2hear/models/dptnet.py:9-10).
        sys.modules.setdefault("look2hear", sys.modules[base])
        sys.modules.setdefault("look2hear.utils", utils_pkg)
        sys.modules.setdefault(
            "look2hear.utils.complex_utils", utils_pkg.complex_utils
        )
        sys.modules.setdefault("look2hear.models", sys.modules[f"{base}.models"])
        sys.modules.setdefault(
            "look2hear.models.base_model",
            importlib.import_module(f"{base}.models.base_model"),
        )
    return base


def ref_model_module(tree: str, modname: str):
    base = _install_tree(tree)
    return importlib.import_module(f"{base}.models.{modname}")


def _sd(tm) -> dict:
    return {k: v.detach().numpy() for k, v in tm.state_dict().items()}


def _parity(tm, our_model, x, name, atol=1e-3, rtol=1e-2, pick=None,
            train_warmup=None):
    """state_dict-import round trip + forward comparison.

    pick: optional fn mapping each side's raw forward output to the
    tensor(s) compared. train_warmup: input for a train-mode pass that
    populates BatchNorm running stats before eval.
    """
    if train_warmup is not None:
        with torch.no_grad():
            tm.train()
            tm(torch.from_numpy(train_warmup))
    tm.eval()
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x))
    _, params = import_torch_checkpoint(
        {"model_name": name, "model_args": {}, "state_dict": _sd(tm)},
        model=our_model,
    )
    got_out = our_model.apply(params, jnp.asarray(x))
    if pick is not None:
        ref_out, got_out = pick(ref_out), pick(got_out)
    refs = ref_out if isinstance(ref_out, (list, tuple)) else [ref_out]
    gots = got_out if isinstance(got_out, (list, tuple)) else [got_out]
    assert len(refs) == len(gots)
    for r, g in zip(refs, gots):
        r = r.numpy() if torch.is_tensor(r) else np.asarray(r)
        g = np.asarray(g)
        assert g.shape == r.shape, (g.shape, r.shape)
        np.testing.assert_allclose(g, r, atol=atol, rtol=rtol)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


# --------------------------------------------------------------------------
# Separation zoo (reference: separation/look2hear/models/)
# --------------------------------------------------------------------------

def test_ref_convtasnet(rng):
    mod = ref_model_module("separation", "ConvTasnet")
    from sonicsim_tpu.models import ConvTasNet

    kw = dict(N=16, L=8, B=8, H=16, P=3, X=2, R=1, num_spks=2)
    torch.manual_seed(0)
    tm = mod.ConvTasNet(**kw)
    x = rng.standard_normal((2, 400)).astype(np.float32)
    _parity(tm, ConvTasNet(**kw), x, "ConvTasNet", atol=1e-4, rtol=1e-3)


def test_ref_dprnn(rng):
    mod = ref_model_module("separation", "dprnn")
    from sonicsim_tpu.models import DPRNNTasNet

    kw = dict(in_channels=16, out_channels=8, hidden_channels=12,
              kernel_size=4, num_layers=2, K=10, num_spks=2)
    torch.manual_seed(1)
    tm = mod.DPRNNTasNet(**kw)
    x = rng.standard_normal((2, 400)).astype(np.float32) * 0.2
    _parity(tm, DPRNNTasNet(**kw), x, "DPRNNTasNet", atol=5e-4, rtol=1e-3)


def test_ref_sudormrf(rng):
    mod = ref_model_module("separation", "sudormrf")
    from sonicsim_tpu.models import SuDORMRF

    kw = dict(out_channels=8, in_channels=16, num_blocks=2,
              upsampling_depth=3, enc_kernel_size=9, enc_num_basis=16,
              num_sources=2)
    torch.manual_seed(2)
    tm = mod.SuDORMRF(**kw)
    x = rng.standard_normal((2, 1600)).astype(np.float32) * 0.2
    _parity(tm, SuDORMRF(**kw), x, "SuDORMRF", atol=5e-4, rtol=1e-3)


def test_ref_afrcnn(rng):
    mod = ref_model_module("separation", "afrcnn")
    from sonicsim_tpu.models import AFRCNN

    kw = dict(out_channels=8, in_channels=16, num_blocks=2,
              upsampling_depth=3, enc_kernel_size=9, enc_num_basis=16,
              num_sources=2)
    torch.manual_seed(3)
    tm = mod.AFRCNN(**kw)
    x = rng.standard_normal((2, 1600)).astype(np.float32) * 0.2
    _parity(tm, AFRCNN(**kw), x, "AFRCNN", atol=5e-4, rtol=1e-3)


def test_ref_tdanet(rng):
    mod = ref_model_module("separation", "TDANet")
    from sonicsim_tpu.models import TDANet

    kw = dict(out_channels=8, in_channels=16, num_blocks=2,
              upsampling_depth=3, enc_kernel_size=1, num_sources=2)
    torch.manual_seed(4)
    tm = mod.TDANet(**kw)
    x = rng.standard_normal((1, 1600)).astype(np.float32) * 0.2
    _parity(tm, TDANet(torch_compat=True, **kw), x, "TDANet",
            atol=5e-4, rtol=1e-3)


def test_ref_bsrnn(rng):
    mod = ref_model_module("separation", "bsrnn")
    from sonicsim_tpu.models import BSRNN

    kw = dict(feature_dim=8, num_repeat=1, num_output=2, win=512,
              stride=128, sample_rate=16000)
    torch.manual_seed(5)
    tm = mod.BSRNN(**kw)
    x = rng.standard_normal((2, 1600)).astype(np.float32) * 0.2
    _parity(tm, BSRNN(**kw), x, "BSRNN", atol=5e-4, rtol=1e-3)


def test_ref_tfgridnet(rng):
    mod = ref_model_module("separation", "TFGNet")
    from sonicsim_tpu.models import TFGridNet

    kw = dict(n_fft=64, stride=16, n_layers=1, lstm_hidden_units=16,
              attn_n_head=2, attn_approx_qk_dim=64, emb_dim=8, emb_ks=4,
              emb_hs=1)
    torch.manual_seed(6)
    tm = mod.TFGridNet(None, use_builtin_complex=True, **kw)
    x = rng.standard_normal((2, 800)).astype(np.float32) * 0.3
    _parity(tm, TFGridNet(**kw), x, "TFGridNet")


def test_ref_skim(rng):
    mod = ref_model_module("separation", "skim")
    from sonicsim_tpu.models import SkiMNet

    kw = dict(input_dim=16, causal=False, num_spk=2, nonlinear="relu",
              layer=2, unit=8, segment_size=10, dropout=0.0,
              mem_type="hc", seg_overlap=True, kernel_size=8)
    torch.manual_seed(7)
    tm = mod.SkiMNet(**kw)
    x = rng.standard_normal((2, 800)).astype(np.float32) * 0.3
    _parity(tm, SkiMNet(**kw), x, "SkiMNet")


def test_ref_dptnet(rng):
    mod = ref_model_module("separation", "dptnet")
    from sonicsim_tpu.models import DPTNetModel

    torch.manual_seed(8)
    tm = mod.DPTNetModel(
        encoder=mod.ConvEncoder(channel=16, kernel_size=8, stride=4),
        separator=mod.DPTNetSeparator(
            input_dim=16, num_spk=2, layer=2, rnn_type="lstm",
            bidirectional=True, unit=8, att_heads=2, dropout=0.0,
            activation="relu", norm_type="gLN", segment_size=10,
            nonlinear="relu",
        ),
        decoder=mod.ConvDecoder(channel=16, kernel_size=8, stride=4),
    )
    ours = DPTNetModel(channel=16, kernel_size=8, stride=4, layer=2,
                       unit=8, att_heads=2, segment_size=10, num_spk=2)
    x = rng.standard_normal((2, 800)).astype(np.float32) * 0.3
    _parity(tm, ours, x, "DPTNetModel")


def test_ref_mossformer2(rng):
    mod = ref_model_module("separation", "mossformer2")
    from sonicsim_tpu.models import MossFormer2

    kw = dict(in_channels=16, out_channels=16, num_blocks=2,
              kernel_size=16, num_spks=2)
    torch.manual_seed(9)
    tm = mod.MossFormer2(**kw)
    # block hyperparameters are fixed inside the reference
    # (mossformer2.py:289-296: group 256, qk 128; GatedFSMNBlockDilated
    # inner 256, mossformer_block.py:396-417)
    ours = MossFormer2(kernel_size=16, stride=8, out_channels=16,
                       in_channels=16, num_blocks=2, d_model=16,
                       query_key_dim=128, group_size=256, num_spks=2,
                       fsmn_inner=256)
    x = rng.standard_normal((2, 800)).astype(np.float32) * 0.3
    _parity(tm, ours, x, "MossFormer2")


def _install_mossformer_v1_stubs() -> None:
    """Seed `modelscope` / `speechbrain` for mossformer.py (v1).

    mossformer.py:11-16 imports MossFormerModule / ScaledSinuEmbedding
    from modelscope and the layer norms from its conv module; the image
    has neither package. The reference tree, however, VENDORS the same
    block code: `MossformerBlock` (mossformer_block.py:491) is the v1
    FLASH stack (`self.layers` of FLASH_ShareA_FFConvM — identical
    attribute path and math to modelscope's MossFormerModule), and
    conv_module.py:11/83 carry the layer norms. So every numeric path
    here is the reference's own source; the only synthetic code is the
    speechbrain LayerNorm wrapper (norm.norm nesting, eps pass-through),
    mirroring speechbrain.nnet.normalization.LayerNorm.
    """
    if "modelscope" in sys.modules:
        return
    blk = ref_model_module("separation", "mossformer_block")
    conv = ref_model_module("separation", "conv_module")

    ms = _mk_module("modelscope")
    ms_models = _mk_module("modelscope.models")
    ms_audio = _mk_module("modelscope.models.audio")
    ms_sep = _mk_module("modelscope.models.audio.separation")
    ms_blk = _mk_module("modelscope.models.audio.separation.mossformer_block")
    ms_cnv = _mk_module(
        "modelscope.models.audio.separation.mossformer_conv_module")
    ms_base = _mk_module("modelscope.models.base")
    ms.models = ms_models
    ms_models.audio = ms_audio
    ms_models.base = ms_base
    ms_audio.separation = ms_sep
    ms_sep.mossformer_block = ms_blk
    ms_sep.mossformer_conv_module = ms_cnv
    ms_blk.MossFormerModule = blk.MossformerBlock
    ms_blk.ScaledSinuEmbedding = blk.ScaledSinuEmbedding
    ms_cnv.CumulativeLayerNorm = conv.CumulativeLayerNorm
    ms_cnv.GlobalLayerNorm = conv.GlobalLayerNorm
    ms_base.Tensor = torch.Tensor

    sb_mod = _mk_module("speechbrain")
    sb_nnet = _mk_module("speechbrain.nnet")
    sb_norm = _mk_module("speechbrain.nnet.normalization")
    sb_mod.nnet = sb_nnet
    sb_nnet.normalization = sb_norm

    class LayerNorm(tnn.Module):
        def __init__(self, input_size=None, input_shape=None, eps=1e-05,
                     elementwise_affine=True):
            super().__init__()
            if input_shape is not None:
                input_size = input_shape[-1]
            self.norm = tnn.LayerNorm(
                input_size, eps=eps, elementwise_affine=elementwise_affine)

        def forward(self, x):
            return self.norm(x)

    sb_norm.LayerNorm = LayerNorm


def test_ref_mossformer(rng):
    _install_mossformer_v1_stubs()
    mod = ref_model_module("separation", "mossformer")
    from sonicsim_tpu.models import MossFormer

    torch.manual_seed(19)
    tm = mod.MossFormer(
        kernel_size=16, stride=8, bias=False, out_channels=16,
        in_channels=16, num_blocks=2, d_model=16, attn_dropout=0.0,
        group_size=10, query_key_dim=8, expansion_factor=4.0,
        causal=False, norm="ln", num_spks=2,
    )
    ours = MossFormer(kernel_size=16, stride=8, out_channels=16,
                      in_channels=16, num_blocks=2, d_model=16,
                      query_key_dim=8, group_size=10, num_spks=2)
    x = rng.standard_normal((2, 800)).astype(np.float32) * 0.3
    _parity(tm, ours, x, "MossFormer")


# --------------------------------------------------------------------------
# Enhancement zoo (reference: enhancement/look2hear/models/)
# --------------------------------------------------------------------------

def test_ref_dccrn(rng):
    mod = ref_model_module("enhancement", "dccrn")
    from sonicsim_tpu.models import DCCRN

    kw = dict(rnn_layers=2, rnn_units=16, win_len=48, win_inc=12,
              fft_len=64, use_clstm=True, kernel_num=(8, 16))
    torch.manual_seed(10)
    tm = mod.DCCRN(**{**kw, "kernel_num": list(kw["kernel_num"])})
    warm = rng.standard_normal((4, 960)).astype(np.float32) * 0.3
    x = rng.standard_normal((2, 960)).astype(np.float32) * 0.3
    _parity(tm, DCCRN(torch_compat=True, **kw), x, "DCCRN",
            train_warmup=warm)


def test_ref_frcrn(rng):
    mod = ref_model_module("enhancement", "frcrn")
    from sonicsim_tpu.models import FRCRN

    kw = dict(complex=True, model_complexity=45, model_depth=14,
              log_amp=False, padding_mode="zeros", win_len=640,
              win_inc=320, fft_len=640, win_type="hann")
    torch.manual_seed(11)
    tm = mod.FRCRN(**kw)
    warm = rng.standard_normal((2, 2240)).astype(np.float32) * 0.3
    x = rng.standard_normal((2, 2240)).astype(np.float32) * 0.3

    def pick(out):
        # forward returns (inputs, out_list) (frcrn.py:510); compare the
        # six spec/wav/mask outputs on overlapping length
        return list(out[1])

    with torch.no_grad():
        tm.train()
        tm(torch.from_numpy(warm))
    tm.eval()
    with torch.no_grad():
        refs = pick(tm(torch.from_numpy(x)))
    ours = FRCRN(torch_compat=True)
    _, params = import_torch_checkpoint(
        {"model_name": "FRCRN", "model_args": {}, "state_dict": _sd(tm)},
        model=ours,
    )
    gots = pick(ours.apply(params, jnp.asarray(x)))
    assert len(refs) == len(gots)
    for r, g in zip(refs, gots):
        r, g = r.numpy(), np.asarray(g)
        n = min(r.shape[-1], g.shape[-1])
        np.testing.assert_allclose(g[..., :n], r[..., :n], atol=2e-3,
                                   rtol=1e-2)


def test_ref_fullband(rng):
    mod = ref_model_module("enhancement", "fullband")
    from sonicsim_tpu.models import Fullband

    kw = dict(num_freqs=33, hidden_size=16, sequence_model="LSTM",
              output_activate_function=False, look_ahead=2, n_fft=64,
              hop_length=32, win_length=64)
    torch.manual_seed(12)
    tm = mod.Fullband(**kw)
    x = rng.standard_normal((2, 800)).astype(np.float32) * 0.3
    _parity(tm, Fullband(**kw), x, "Fullband", atol=5e-4, rtol=1e-3,
            pick=lambda o: o[0])


def test_ref_fullsubnet(rng):
    mod = ref_model_module("enhancement", "fullsubnet")
    from sonicsim_tpu.models import FullSubnet

    kw = dict(num_freqs=33, look_ahead=2, sequence_model="LSTM",
              fb_num_neighbors=0, sb_num_neighbors=4,
              fb_output_activate_function="ReLU",
              sb_output_activate_function=False,
              fb_model_hidden_size=16, sb_model_hidden_size=16,
              n_fft=64, hop_length=32, win_length=64,
              num_groups_in_drop_band=1, weight_init=False)
    torch.manual_seed(13)
    tm = mod.FullSubnet(**kw)
    x = rng.standard_normal((2, 800)).astype(np.float32) * 0.3
    _parity(tm, FullSubnet(**kw), x, "FullSubnet", atol=5e-4, rtol=1e-3,
            pick=lambda o: o[0])


def test_ref_fastfullsubnet(rng):
    mod = ref_model_module("enhancement", "fastfullsubnet")
    from sonicsim_tpu.models import FastFullSubnet

    kw = dict(look_ahead=2, shrink_size=2, sequence_model="LSTM",
              num_mels=64, encoder_input_size=257,
              bottleneck_hidden_size=384, bottleneck_num_layers=2,
              noisy_input_num_neighbors=5, encoder_output_num_neighbors=0,
              n_fft=512, hop_length=256, win_length=512, weight_init=False)
    torch.manual_seed(14)
    tm = mod.FastFullSubnet(**kw)
    x = rng.standard_normal((1, 4096)).astype(np.float32) * 0.3
    _parity(tm, FastFullSubnet(**kw), x, "FastFullSubnet",
            pick=lambda o: o[0])


def test_ref_fullsubnet_plus(rng):
    mod = ref_model_module("enhancement", "fullsubnet_plus")
    from sonicsim_tpu.models import FullSubNet_Plus

    kw = dict(num_freqs=33, look_ahead=2, sequence_model="LSTM",
              fb_num_neighbors=0, sb_num_neighbors=4,
              fb_output_activate_function="ReLU",
              sb_output_activate_function=False,
              fb_model_hidden_size=32, sb_model_hidden_size=16,
              n_fft=64, hop_length=32, win_length=64,
              channel_attention_model="SE", num_groups_in_drop_band=2,
              output_size=2, subband_num=1, kersize=(3, 5, 10))
    torch.manual_seed(15)
    tm = mod.FullSubNet_Plus(**{**kw, "kersize": list(kw["kersize"])})
    x = rng.standard_normal((1, 1600)).astype(np.float32) * 0.3
    _parity(tm, FullSubNet_Plus(**kw), x, "FullSubNet_Plus",
            pick=lambda o: o[0])


def test_ref_inter_subnet(rng):
    mod = ref_model_module("enhancement", "inter_subnet")
    from sonicsim_tpu.models import Inter_SubNet

    kw = dict(num_freqs=33, look_ahead=2, sequence_model="LSTM",
              sb_num_neighbors=4, sb_output_activate_function=False,
              sb_model_hidden_size=20, n_fft=64, hop_length=32,
              win_length=64, num_groups_in_drop_band=2,
              sbinter_middle_hidden_times=0.8)
    torch.manual_seed(16)
    tm = mod.Inter_SubNet(**kw)
    x = rng.standard_normal((1, 1600)).astype(np.float32) * 0.3
    _parity(tm, Inter_SubNet(**kw), x, "Inter_SubNet",
            pick=lambda o: o[0])


def test_ref_gagnet(rng):
    mod = ref_model_module("enhancement", "gagnet")
    from sonicsim_tpu.models import GaGNet

    kw = dict(cin=2, k1=(2, 3), k2=(1, 3), c=8, kd1=3, cd1=8,
              d_feat=192, p=1, q=2, dilas=(1, 2), fft_num=256,
              is_u2=True, is_causal=True, is_squeezed=False,
              acti_type="sigmoid", intra_connect="cat", norm_type="IN",
              n_fft=256, hop_length=128, win_length=256)
    torch.manual_seed(17)
    tm = mod.GaGNet(**{**kw, "k1": list(kw["k1"]), "k2": list(kw["k2"]),
                       "dilas": list(kw["dilas"])})
    x = rng.standard_normal((2, 800)).astype(np.float32) * 0.3
    _parity(tm, GaGNet(**kw), x, "GaGNet")


def test_ref_taylorsenet(rng):
    mod = ref_model_module("enhancement", "taylorsenet")
    from sonicsim_tpu.models import TaylorSENet

    kw = dict(cin=2, k1=(1, 3), k2=(2, 3), c=8, kd1=5, cd1=8,
              d_feat=192, dilations=(1, 2), p=1, fft_num=256,
              order_num=2, n_fft=256, hop_length=128, win_length=256,
              intra_connect="cat", inter_connect="cat", norm_type="IN",
              is_causal=True, is_u2=True, is_param_share=False,
              is_encoder_share=False)
    torch.manual_seed(18)
    tm = mod.TaylorSENet(**{**kw, "k1": list(kw["k1"]),
                            "k2": list(kw["k2"]),
                            "dilations": list(kw["dilations"])})
    x = rng.standard_normal((1, 800)).astype(np.float32) * 0.3
    _parity(tm, TaylorSENet(**kw), x, "TaylorSENet")


def test_ref_g2net(rng):
    mod = ref_model_module("enhancement", "g2net")
    from sonicsim_tpu.models import G2Net

    kw = dict(k1=(2, 3), k2=(1, 3), c=8, intra_connect="cat",
              d_feat=192, kd1=3, cd1=8, tcn_num=1, dilas=(1, 2),
              fft_num=256, is_causal=True, acti_type="sigmoid",
              crm_type="crm1", stage_num=2, u_type="u2",
              head_type="RI+MAG", norm_type="IN", n_fft=256,
              hop_length=128, win_length=256)
    torch.manual_seed(19)
    tm = mod.G2Net(**{**kw, "k1": list(kw["k1"]), "k2": list(kw["k2"]),
                      "dilas": list(kw["dilas"])})
    x = rng.standard_normal((2, 800)).astype(np.float32) * 0.3
    _parity(tm, G2Net(**kw), x, "G2Net")


def test_ref_bsrnn_espnet(rng):
    mod = ref_model_module("enhancement", "bsrnn_espnet")
    from sonicsim_tpu.models import BSRNNESPNet

    kw = dict(n_fft=320, hop_length=160, num_spk=1, num_channels=8,
              num_layers=1, target_fs=16000, causal=False)
    torch.manual_seed(20)
    tm = mod.BSRNNESPNet(use_builtin_complex=True, **kw)
    x = rng.standard_normal((2, 960)).astype(np.float32) * 0.3
    _parity(tm, BSRNNESPNet(**kw), x, "BSRNNESPNet")
