from .schedulers import DPTNetScheduler, EarlyStopping, ReduceLROnPlateau
from .trainer import (
    Trainer,
    TrainState,
    make_eval_step,
    make_optimizer,
    make_train_step,
    set_learning_rate,
)

__all__ = [
    "DPTNetScheduler",
    "EarlyStopping",
    "ReduceLROnPlateau",
    "Trainer",
    "TrainState",
    "make_eval_step",
    "make_optimizer",
    "make_train_step",
    "set_learning_rate",
]
