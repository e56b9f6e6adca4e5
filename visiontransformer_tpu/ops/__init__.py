from visiontransformer_tpu.ops.resize import (
    resize_bilinear,
    resize_nearest_pil,
    resize_nearest_torch,
)
from visiontransformer_tpu.ops.attention import multi_head_attention

__all__ = [
    "resize_bilinear",
    "resize_nearest_pil",
    "resize_nearest_torch",
    "multi_head_attention",
]
