from visiontransformer_tpu.nn.layers import (
    conv2d,
    conv2d_init,
    dropout,
    gelu_exact,
    layer_norm,
    layer_norm_init,
    linear,
    linear_init,
)

__all__ = [
    "conv2d",
    "conv2d_init",
    "dropout",
    "gelu_exact",
    "layer_norm",
    "layer_norm_init",
    "linear",
    "linear_init",
]
