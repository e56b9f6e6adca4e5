from visiontransformer_tpu.models.vit import vit_apply, vit_init
from visiontransformer_tpu.models.vitseg import (
    vitseg_apply,
    vitseg_init,
    vitseg_logits_nchw,
)

__all__ = [
    "vit_apply",
    "vit_init",
    "vitseg_apply",
    "vitseg_init",
    "vitseg_logits_nchw",
]
