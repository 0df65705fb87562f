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
from .conv_tasnet import ConvTasNet
from .dccrn import DCCRN
from .dprnn import DPRNNTasNet
from .dptnet import DPTNetModel
from .fullsubnet import Fullband, FullSubnet
from .frcrn import FRCRN
from .gagnet import GaGNet
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
    "DCCRN",
    "DPRNNTasNet",
    "DPTNetModel",
    "FullSubnet",
    "Fullband",
    "FRCRN",
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
