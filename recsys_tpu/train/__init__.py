"""Training layer: optimizer, jit-compiled SPMD trainer, checkpointing."""

from recsys_tpu.train.optimizer import Optimizer, adagrad, adam
from recsys_tpu.train.trainer import Trainer, TrainState

__all__ = ["Optimizer", "adagrad", "adam", "Trainer", "TrainState"]
