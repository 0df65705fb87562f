from .schedulers import (CustomExponentialLR, DPTNetScheduler,
                         EarlyStopping, ReduceLROnPlateau)
from .trainer import (
    Trainer,
    TrainState,
    make_eval_step,
    make_optimizer,
    make_train_step,
    set_learning_rate,
)

__all__ = [
    "CustomExponentialLR",
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
