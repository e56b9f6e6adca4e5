from visiontransformer_tpu.losses.basic import (
    binary_cross_entropy,
    cross_entropy_loss,
    dice_loss,
)
from visiontransformer_tpu.losses.paed import (
    paed_binary_total_loss,
    paed_loss_multiclass_soft,
    paed_loss_soft,
)

__all__ = [
    "binary_cross_entropy",
    "cross_entropy_loss",
    "dice_loss",
    "paed_binary_total_loss",
    "paed_loss_multiclass_soft",
    "paed_loss_soft",
]
