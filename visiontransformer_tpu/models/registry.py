"""Model family registry: name -> (init, apply, config type).

The families match the reference's capability surface: "vitseg" is the
primary network (ViT backbone + conv head, reference
model/CE/classes.py:221-262); every other entry is a natively implemented
smp architecture behind the reference's generic
`StructuralDamageModel(arch, encoder_name, ...)` wrapper — its
`smp.create_model` accepts any smp arch string (classes.py:106-110). The
conv families share one residual GroupNorm encoder (models/unet.py) and
differ in decoder topology; see each module's docstring. MODEL_FAMILIES
below is the single source of truth for what exists (the CLI, the serving
registry, and the benchmarks all enumerate it)."""

from __future__ import annotations

from typing import Callable, NamedTuple

from visiontransformer_tpu.configs import ViTSegConfig, sweep_by_name
from visiontransformer_tpu.models.deeplab import (
    DeepLabV3Config,
    DeepLabV3PlusConfig,
    deeplabv3_apply,
    deeplabv3_init,
    deeplabv3plus_apply,
    deeplabv3plus_init,
)
from visiontransformer_tpu.models.fpn import FPNConfig, fpn_apply, fpn_init
from visiontransformer_tpu.models.linknet import (
    LinkNetConfig,
    linknet_apply,
    linknet_init,
)
from visiontransformer_tpu.models.manet import (
    MAnetConfig,
    manet_apply,
    manet_init,
)
from visiontransformer_tpu.models.pan import PANConfig, pan_apply, pan_init
from visiontransformer_tpu.models.pspnet import (
    PSPNetConfig,
    pspnet_apply,
    pspnet_init,
)
from visiontransformer_tpu.models.segformer import (
    SegformerConfig,
    segformer_apply,
    segformer_init,
)
from visiontransformer_tpu.models.unet import UNetConfig, unet_apply, unet_init
from visiontransformer_tpu.models.unetpp import (
    UNetPlusPlusConfig,
    unetplusplus_apply,
    unetplusplus_init,
)
from visiontransformer_tpu.models.upernet import (
    UPerNetConfig,
    upernet_apply,
    upernet_init,
)
from visiontransformer_tpu.models.vitseg import vitseg_apply, vitseg_init


class ModelFamily(NamedTuple):
    init: Callable
    apply: Callable
    config_cls: type


MODEL_FAMILIES = {
    "vitseg": ModelFamily(vitseg_init, vitseg_apply, ViTSegConfig),
    "unet": ModelFamily(unet_init, unet_apply, UNetConfig),
    "fpn": ModelFamily(fpn_init, fpn_apply, FPNConfig),
    "linknet": ModelFamily(linknet_init, linknet_apply, LinkNetConfig),
    "pspnet": ModelFamily(pspnet_init, pspnet_apply, PSPNetConfig),
    "deeplabv3": ModelFamily(deeplabv3_init, deeplabv3_apply, DeepLabV3Config),
    "deeplabv3plus": ModelFamily(deeplabv3plus_init, deeplabv3plus_apply,
                                 DeepLabV3PlusConfig),
    "unetplusplus": ModelFamily(unetplusplus_init, unetplusplus_apply,
                                UNetPlusPlusConfig),
    "pan": ModelFamily(pan_init, pan_apply, PANConfig),
    "manet": ModelFamily(manet_init, manet_apply, MAnetConfig),
    "upernet": ModelFamily(upernet_init, upernet_apply, UPerNetConfig),
    "segformer": ModelFamily(segformer_init, segformer_apply,
                             SegformerConfig),
}


def get_model_family(name: str) -> ModelFamily:
    try:
        return MODEL_FAMILIES[name]
    except KeyError:
        raise KeyError(f"unknown model family {name!r}; "
                       f"known: {sorted(MODEL_FAMILIES)}")


def resolve_model(family: str, config_name: str, *, num_classes: int,
                  input_size: int = 224, compute_dtype: str = "bfloat16",
                  checkpoint_path: str = ""):
    """(cfg, params) for a named model of any family — the shared loader
    behind the serving worker (serve/worker.py ModelRunner) and the
    ``export-hlo`` CLI. ``config_name`` is a sweep config for vitseg
    (e.g. "P16H768A12") and an encoder preset for the conv
    families (unet/fpn/linknet/pspnet/deeplabv3).
    checkpoint_path: Orbax directory, reference Lightning ``.ckpt``
    (vitseg only), or empty for random init (smoke tests)."""
    import os

    import jax

    fam = get_model_family(family)
    if family == "vitseg":
        try:
            vit_cfg = sweep_by_name(config_name).vit_config(
                image_size=input_size)
        except KeyError:
            # Named size presets (vit_b_16 / vit_l_16 / vit_h_14) beyond
            # the reference's sweep — the ViT-L/16 serving stretch config.
            from visiontransformer_tpu.configs import vit_config_by_name

            vit_cfg = vit_config_by_name(config_name, image_size=input_size)
        if input_size % vit_cfg.patch_size:
            raise ValueError(
                f"input_size {input_size} is not divisible by "
                f"{config_name}'s patch size {vit_cfg.patch_size}")
        cfg = ViTSegConfig(vit=vit_cfg,
                           num_classes=num_classes,
                           compute_dtype=compute_dtype)
    else:
        cfg = fam.config_cls(encoder_name=config_name,
                             num_classes=num_classes,
                             compute_dtype=compute_dtype)

    if (family == "segformer" and checkpoint_path
            and os.path.isfile(os.path.join(checkpoint_path, "config.json"))):
        # HF save_pretrained layout: load real pretrained SegFormer
        # weights (SegformerForSemanticSegmentation) straight into the
        # native family — geometry, class count, and decode width come
        # from the HF config; the decode head's BatchNorm folds to the
        # affine form (ckpt/torch_convert.convert_hf_segformer_seg_state).
        import dataclasses

        import transformers

        from visiontransformer_tpu.ckpt.torch_convert import (
            convert_hf_segformer_seg_state,
        )
        from visiontransformer_tpu.models.mit import MIT_PRESETS

        hf = transformers.SegformerForSemanticSegmentation.from_pretrained(
            checkpoint_path)
        geometry = (tuple(hf.config.hidden_sizes), tuple(hf.config.depths))
        matches = [n for n, (dims, depths, _, _) in MIT_PRESETS.items()
                   if (dims, depths) == geometry]
        if not matches:
            raise ValueError(
                f"HF checkpoint geometry {geometry} matches no MiT preset "
                f"(known: {sorted(MIT_PRESETS)})")
        cfg = dataclasses.replace(
            cfg, encoder_name=matches[0], head_norm="affine",
            num_classes=hf.config.num_labels,
            embed_channels=hf.config.decoder_hidden_size)
        params = convert_hf_segformer_seg_state(hf.state_dict(), cfg)
    elif checkpoint_path and os.path.isdir(checkpoint_path):
        from visiontransformer_tpu.ckpt.io import restore_checkpoint

        restored = restore_checkpoint(checkpoint_path)
        params = restored["params"] if "params" in restored else restored
        if family == "vitseg":
            # Checkpoints written in pipeline-parallel training store
            # backbone.layers stacked (train/trainer.py init_state);
            # serving/eval consume the per-layer list form.
            from visiontransformer_tpu.parallel.pipeline import (
                maybe_unstack_params,
            )

            params = maybe_unstack_params(params)
    elif checkpoint_path and checkpoint_path.endswith(".ckpt"):
        if family != "vitseg":
            raise ValueError(
                "Lightning .ckpt conversion is defined for the vitseg "
                "family only; load conv families from Orbax checkpoints")
        from visiontransformer_tpu.ckpt.torch_convert import (
            load_lightning_checkpoint,
        )

        params = load_lightning_checkpoint(checkpoint_path, cfg)
    else:
        params = fam.init(jax.random.PRNGKey(0), cfg)
    return cfg, params
