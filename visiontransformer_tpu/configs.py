"""Typed configuration objects.

The reference scatters hyperparameters as module-level constants across scripts
(reference model/CE/createViTmodel.py:63, model/PAED/ViTscript.py:66) and
duplicates its 9-config sweep table in four files
(model/CE/datasetTestViTmodel.py:97-107, model/CE/testViTModel.py:72-82,
model/CE/compareModels.py:12-22, model/PAED/ViTscriptTest.py:97-108).
Here there is one typed config and the sweep is data (`SWEEP_CONFIGS`).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    """ViT backbone hyperparameters.

    Field defaults mirror the reference's HF ViTConfig instantiation
    (reference model/CE/classes.py:224-236): image 224, intermediate 3072,
    qkv_bias True, dropout 0.1, initializer_range 0.02, layer_norm_eps 1e-12
    (HF default).
    """

    image_size: int = 224
    patch_size: int = 16
    num_channels: int = 3
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    qkv_bias: bool = True
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    initializer_range: float = 0.02
    layer_norm_eps: float = 1e-12
    # Rematerialize each encoder block on the backward pass (jax.checkpoint):
    # trades ~30% extra forward FLOPs for O(layers) -> O(1) activation
    # memory, the standard TPU recipe for large batches / long sequences.
    remat: bool = False
    # Token merging (ToMe-style, ops/token_merge.py): merge this many
    # most-similar token pairs after every encoder block — an opt-in
    # accuracy/throughput knob for inference. 0 (default) = exact model.
    token_merge_r: int = 0

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def seq_len(self) -> int:
        """Token count including the CLS token (197/785/3137 at 224px)."""
        return self.num_patches + 1

    @property
    def head_dim(self) -> int:
        assert self.hidden_size % self.num_attention_heads == 0
        return self.hidden_size // self.num_attention_heads

    @property
    def grid_size(self) -> int:
        return self.image_size // self.patch_size


@dataclasses.dataclass(frozen=True)
class ViTSegConfig:
    """Full segmentation model = ViT backbone + conv seg head.

    Head shape mirrors reference model/CE/classes.py:240-244:
    Conv3x3(hidden->256) + ReLU + Conv1x1(256->num_classes), bilinear upsample
    back to the input resolution (align_corners=False).
    """

    vit: ViTConfig = dataclasses.field(default_factory=ViTConfig)
    num_classes: int = 17
    head_channels: int = 256
    # Computation dtype for the forward pass. Params are always stored fp32;
    # bf16 compute feeds the MXU at full rate and is the TPU-native default.
    compute_dtype: str = "float32"

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)


@dataclasses.dataclass(frozen=True)
class SweepEntry:
    """One row of the reference's 9-config sweep
    (reference model/CE/datasetTestViTmodel.py:97-107)."""

    id: int
    patch_size: int
    hidden_size: int
    hidden_layers: int
    attention_heads: int

    @property
    def name(self) -> str:
        # Naming convention from reference model/CE/datasetTestViTmodel.py:141.
        return f"P{self.patch_size}H{self.hidden_size}A{self.attention_heads}"

    def vit_config(self, **overrides) -> ViTConfig:
        return ViTConfig(
            patch_size=self.patch_size,
            hidden_size=self.hidden_size,
            num_hidden_layers=self.hidden_layers,
            num_attention_heads=self.attention_heads,
            **overrides,
        )

    def seg_config(self, num_classes: int = 17, **overrides) -> ViTSegConfig:
        return ViTSegConfig(vit=self.vit_config(), num_classes=num_classes, **overrides)


# The 9-config sweep, single source of truth
# (reference model/CE/datasetTestViTmodel.py:97-107; ID order preserved).
SWEEP_CONFIGS: Tuple[SweepEntry, ...] = (
    SweepEntry(0, 16, 768, 12, 12),
    SweepEntry(1, 16, 512, 8, 8),
    SweepEntry(2, 16, 1024, 16, 16),
    SweepEntry(3, 8, 512, 8, 8),
    SweepEntry(4, 8, 768, 12, 12),
    SweepEntry(5, 8, 1024, 16, 16),
    SweepEntry(6, 4, 512, 8, 8),
    SweepEntry(7, 4, 768, 12, 12),
    SweepEntry(8, 4, 1024, 16, 16),
)


def sweep_by_name(name: str) -> SweepEntry:
    for entry in SWEEP_CONFIGS:
        if entry.name == name:
            return entry
    raise KeyError(f"unknown sweep config {name!r}")


# Standard ViT size presets beyond the reference's sweep (ViT paper table 1
# naming). vit_l_16 is the serving stretch target (BASELINE.json config 5:
# "dynamic-batched TPU worker with ViT-L/16"). Unlike the sweep rows — which
# pin intermediate_size=3072 regardless of width, mirroring the reference's
# ViTConfig instantiation (reference model/CE/classes.py:228) — these use
# the paper's 4*hidden MLP widths.
VIT_PRESETS = {
    "vit_b_16": dict(patch_size=16, hidden_size=768, num_hidden_layers=12,
                     num_attention_heads=12, intermediate_size=3072),
    "vit_l_16": dict(patch_size=16, hidden_size=1024, num_hidden_layers=24,
                     num_attention_heads=16, intermediate_size=4096),
    "vit_h_14": dict(patch_size=14, hidden_size=1280, num_hidden_layers=32,
                     num_attention_heads=16, intermediate_size=5120),
}


def vit_config_by_name(name: str, **overrides) -> ViTConfig:
    """ViTConfig from a sweep row name ("P16H768A12") or a named size
    preset ("vit_b_16" / "vit_l_16" / "vit_h_14")."""
    try:
        return sweep_by_name(name).vit_config(**overrides)
    except KeyError:
        pass
    if name in VIT_PRESETS:
        return ViTConfig(**{**VIT_PRESETS[name], **overrides})
    known = [e.name for e in SWEEP_CONFIGS] + sorted(VIT_PRESETS)
    raise KeyError(f"unknown ViT config {name!r}; known: {known}")


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters.

    Defaults mirror the CE driver (reference model/CE/createViTmodel.py:57-77):
    Adam lr=1e-5, max_epochs=100, EarlyStopping(valid_loss, patience=3).
    The reference runs loader batch 4 with accumulate_grad_batches=4
    (effective optimizer batch 16); here ``batch_size`` is the effective
    optimizer batch and ``accumulate_grad_batches`` the number of
    micro-batches it is scanned in — batch_size=16, accumulate=4 reproduces
    the reference's schedule exactly. The PAED binary trainer overrides
    (reference model/PAED/classes.py:536-548): AdamW lr=1e-4 +
    ReduceLROnPlateau(patience=30) monitoring val_IoU.
    """

    batch_size: int = 16
    learning_rate: float = 1e-5
    optimizer: str = "adam"  # "adam" | "adamw"
    weight_decay: float = 0.01  # torch AdamW default, used when optimizer="adamw"
    accumulate_grad_batches: int = 4
    # Rematerialize ViT blocks during training (see ViTConfig.remat).
    # Default off: micro-batch accumulation already bounds activation
    # memory, and jax.checkpoint measured a pathological slowdown on the
    # current remote-PJRT runtime (use for very large micro-batches only).
    remat: bool = False
    max_epochs: int = 100
    early_stopping_monitor: Optional[str] = "valid_loss"
    early_stopping_patience: int = 3
    early_stopping_mode: str = "min"
    plateau_patience: Optional[int] = None  # ReduceLROnPlateau patience, None = off
    plateau_monitor: str = "val_IoU"
    plateau_mode: str = "max"
    plateau_factor: float = 0.1  # torch ReduceLROnPlateau default
    seed: int = 42
    log_every_n_steps: int = 50
    checkpoint_dir: Optional[str] = None
    mesh_shape: Optional[Tuple[int, ...]] = None  # (dp,) or (dp, tp); None = 1 chip
    # ZeRO-3 / fully-sharded data parallelism: shard params, gradients and
    # optimizer moments over the "data" mesh axis too (XLA all-gathers
    # weights at use and reduce-scatters gradients). Composes with tensor
    # parallelism — a leaf can be sharded on both mesh axes. fsdp_min_size
    # overrides parallel.mesh.FSDP_MIN_SIZE (smallest element count worth
    # sharding); None keeps the library default.
    fsdp: bool = False
    fsdp_min_size: Optional[int] = None
    # Sequence parallelism (needs a "model" axis > 1): keep the residual
    # stream token-sharded over the TP axis so LayerNorm/dropout/residual
    # regions compute on N/tp tokens per device (models/vit.py act_sharding).
    seq_parallel: bool = False
    # GPipe pipeline parallelism (vitseg only): run the encoder stack as an
    # S-stage pipeline over a ("data", "stage") mesh — each stage stores 1/S
    # of the transformer weights and Adam moments (parallel/pipeline.py).
    # mesh_shape is then read as (dp, stages); stages must divide the layer
    # count. pipeline_microbatches (default = stages) is the number of
    # in-flight microbatches per forward; bubble = (S-1)/(M+S-1).
    pipeline_stages: int = 1
    pipeline_microbatches: Optional[int] = None


CE_TRAIN_DEFAULTS = TrainConfig()

PAED_TRAIN_DEFAULTS = TrainConfig(
    learning_rate=1e-4,
    optimizer="adamw",
    early_stopping_monitor="val_loss",
    early_stopping_patience=6,  # reference model/PAED/ViTscript.py:70
    plateau_patience=30,
    plateau_monitor="val_IoU",
    plateau_mode="max",
)
