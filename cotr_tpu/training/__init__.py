from cotr_tpu.training.loss import cotr_loss, masked_mse
from cotr_tpu.training.optim import build_optimizer, param_labels
from cotr_tpu.training.train_step import (TrainState, create_train_state,
                                          make_eval_step, make_train_step)
from cotr_tpu.training.trainer import Trainer

__all__ = [
    "cotr_loss",
    "masked_mse",
    "build_optimizer",
    "param_labels",
    "TrainState",
    "create_train_state",
    "make_eval_step",
    "make_train_step",
    "Trainer",
]
