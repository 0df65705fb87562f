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
from .dprnn import DPRNNTasNet
from .sudormrf import SuDORMRF
from .tdanet import TDANet

__all__ = [
    "AFRCNN",
    "BSRNN",
    "MODELS",
    "BaseModel",
    "ConvTasNet",
    "DPRNNTasNet",
    "SuDORMRF",
    "TDANet",
    "from_pretrain",
    "get",
    "register_model",
    "save_model",
    "serialize",
]
