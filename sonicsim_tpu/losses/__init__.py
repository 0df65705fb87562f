from .cirm import (
    FullbandEval,
    FullbandLoss,
    apply_cirm,
    build_cirm,
    cirm_inference,
    compress_cirm,
    decompress_cirm,
)
from .enhancement import DCCRNEval, DCCRNLoss
from .bsrnn_espnet import BSRNNESPNetEval, BSRNNESPNetLoss
from .frcrn import FRCRNEval, FRCRNLoss
from .gagnet import GaGNetEval, GaGNetLoss, gagnet_wav
from .taylorsenet import TaylorSENetEval, TaylorSENetLoss, taylor_wav
from .mixit import MixITLossWrapper
from .pit import PITLossWrapper, find_best_perm, reorder_sources
from .sisnri import SISNRi
from .sdr import (
    EPS,
    FreqMAE,
    FreqMAEWavL1,
    MultiSrcNegSDR,
    PairwiseNegSDR,
    SingleSrcNegSDR,
    multisrc_neg_sdr,
    pairwise_neg_sdr,
    singlesrc_neg_sdr,
)

__all__ = [
    "SISNRi",
    "DCCRNEval",
    "DCCRNLoss",
    "EPS",
    "FreqMAE",
    "FullbandEval",
    "BSRNNESPNetEval",
    "BSRNNESPNetLoss",
    "FRCRNEval",
    "FRCRNLoss",
    "GaGNetEval",
    "TaylorSENetEval",
    "TaylorSENetLoss",
    "taylor_wav",
    "GaGNetLoss",
    "gagnet_wav",
    "FullbandLoss",
    "apply_cirm",
    "build_cirm",
    "cirm_inference",
    "compress_cirm",
    "decompress_cirm",
    "FreqMAEWavL1",
    "MixITLossWrapper",
    "MultiSrcNegSDR",
    "PITLossWrapper",
    "PairwiseNegSDR",
    "SingleSrcNegSDR",
    "find_best_perm",
    "multisrc_neg_sdr",
    "pairwise_neg_sdr",
    "reorder_sources",
    "singlesrc_neg_sdr",
]