from visiontransformer_tpu.train.optim import PlateauScheduler, build_optimizer
from visiontransformer_tpu.train.state import TrainState
from visiontransformer_tpu.train.tasks import (
    ce_loss_fn,
    paed_binary_loss_fn,
    paed_multiclass_loss_fn,
)
from visiontransformer_tpu.train.trainer import Trainer

__all__ = [
    "PlateauScheduler",
    "build_optimizer",
    "TrainState",
    "ce_loss_fn",
    "paed_binary_loss_fn",
    "paed_multiclass_loss_fn",
    "Trainer",
]
