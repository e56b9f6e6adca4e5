"""Model family registry: name -> (init, apply, config type).

Three families, matching the reference's capability surface:
- "vitseg" — ViT backbone + conv head (the primary network,
  reference model/CE/classes.py:221-262);
- "unet"   — encoder-decoder conv net (the smp alternate,
  reference model/CE/classes.py:105-219);
- "fpn"    — feature-pyramid decoder on the same encoder (the reference's
  smp.create_model accepts any smp arch string, classes.py:110).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

from visiontransformer_tpu.configs import ViTSegConfig
from visiontransformer_tpu.models.fpn import FPNConfig, fpn_apply, fpn_init
from visiontransformer_tpu.models.unet import UNetConfig, unet_apply, unet_init
from visiontransformer_tpu.models.vitseg import vitseg_apply, vitseg_init


class ModelFamily(NamedTuple):
    init: Callable
    apply: Callable
    config_cls: type


MODEL_FAMILIES = {
    "vitseg": ModelFamily(vitseg_init, vitseg_apply, ViTSegConfig),
    "unet": ModelFamily(unet_init, unet_apply, UNetConfig),
    "fpn": ModelFamily(fpn_init, fpn_apply, FPNConfig),
}


def get_model_family(name: str) -> ModelFamily:
    try:
        return MODEL_FAMILIES[name]
    except KeyError:
        raise KeyError(f"unknown model family {name!r}; "
                       f"known: {sorted(MODEL_FAMILIES)}")
