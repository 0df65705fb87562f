from .sidecars import make_dnsmos, make_pesq, make_sigmos, make_whisper_asr
from .sisdr import (
    bss_sdr,
    sdr_improvement,
    si_sdr,
    si_sdr_improvement,
    snr,
)
from .stoi import stoi
from .tracker import MetricsTracker

__all__ = [
    "MetricsTracker",
    "bss_sdr",
    "make_dnsmos",
    "make_pesq",
    "make_sigmos",
    "make_whisper_asr",
    "sdr_improvement",
    "si_sdr",
    "si_sdr_improvement",
    "snr",
    "stoi",
]
