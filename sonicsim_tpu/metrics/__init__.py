from .dnsmos import DNSMOS, audio_melspec, librosa_mel_fb
from .onnx_jax import OnnxJaxModel, parse_onnx
from .sigmos import SigMOS, sigmos_features, sigmos_stft, sigmos_window
from .composite import composite_measures, llr, ssnr, wss
from .sidecars import (
    make_dnsmos,
    make_pesq,
    make_sigmos,
    make_sigmos_all,
    make_whisper_asr,
    wer,
)
from .sisdr import (
    bss_sdr,
    sdr_improvement,
    si_sdr,
    si_sdr_improvement,
    snr,
)
from .pesq import pesq
from .stoi import stoi
from .tracker import MetricsTracker
from .variants import MetricsTrackerNoASR, SplitMetricsTracker

__all__ = [
    "DNSMOS",
    "MetricsTracker",
    "OnnxJaxModel",
    "SigMOS",
    "audio_melspec",
    "librosa_mel_fb",
    "parse_onnx",
    "MetricsTrackerNoASR",
    "SplitMetricsTracker",
    "composite_measures",
    "llr",
    "ssnr",
    "wss",
    "bss_sdr",
    "make_dnsmos",
    "make_pesq",
    "make_sigmos",
    "make_sigmos_all",
    "make_whisper_asr",
    "sigmos_features",
    "sigmos_stft",
    "sigmos_window",
    "wer",
    "sdr_improvement",
    "si_sdr",
    "si_sdr_improvement",
    "snr",
    "pesq",
    "stoi",
]
