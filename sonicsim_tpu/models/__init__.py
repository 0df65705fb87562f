from .base import (
    MODELS,
    BaseModel,
    from_pretrain,
    get,
    register_model,
    save_model,
    serialize,
)
from .afrcnn import AFRCNN
from .bsrnn import BSRNN
from .bsrnn_espnet import BSRNNESPNet
from .conv_tasnet import ConvTasNet
from .dccrn import DCCRN
from .dprnn import DPRNNTasNet
from .ecapa import EcapaTdnn, ecapa_fbank, make_ecapa_embedder
from .pyannet import PyanNet, binarize_activations, make_neural_vad
from .whisper import Whisper, WhisperConfig, make_whisper_transcriber
from .enc_dec import FreeDecoder, FreeEncoder, make_enc_dec
from .dptnet import DPTNetModel
from .fullsubnet import Fullband, FullSubnet
from .fullsubnet_plus import FullSubNet_Plus
from .fastfullsubnet import FastFullSubnet
from .frcrn import FRCRN
from .g2net import G2Net
from .gagnet import GaGNet
from .inter_subnet import Inter_SubNet
from .mossformer import MossFormer
from .mossformer2 import MossFormer2
from .skim import SkiMNet
from .sudormrf import SuDORMRF
from .taylorsenet import TaylorSENet
from .tdanet import TDANet
from .tfgridnet import TFGridNet

__all__ = [
    "AFRCNN",
    "BSRNN",
    "MODELS",
    "BaseModel",
    "ConvTasNet",
    "EcapaTdnn",
    "ecapa_fbank",
    "make_ecapa_embedder",
    "Whisper",
    "WhisperConfig",
    "make_whisper_transcriber",
    "PyanNet",
    "binarize_activations",
    "make_neural_vad",
    "DCCRN",
    "DPRNNTasNet",
    "DPTNetModel",
    "FullSubnet",
    "Fullband",
    "FreeDecoder",
    "FreeEncoder",
    "make_enc_dec",
    "BSRNNESPNet",
    "FRCRN",
    "FastFullSubnet",
    "FullSubNet_Plus",
    "G2Net",
    "Inter_SubNet",
    "GaGNet",
    "MossFormer",
    "MossFormer2",
    "SkiMNet",
    "SuDORMRF",
    "TDANet",
    "TaylorSENet",
    "TFGridNet",
    "from_pretrain",
    "get",
    "register_model",
    "save_model",
    "serialize",
]
