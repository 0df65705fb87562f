from .base import (
    MODELS,
    BaseModel,
    from_pretrain,
    get,
    register_model,
    save_model,
    serialize,
)
from .conv_tasnet import ConvTasNet

__all__ = [
    "MODELS",
    "BaseModel",
    "ConvTasNet",
    "from_pretrain",
    "get",
    "register_model",
    "save_model",
    "serialize",
]
