"""Optimizers and LR scheduling.

Replicates the reference's three optimizer setups with optax:
- CE:   Adam lr=1e-5 (reference model/CE/classes.py:296-297)
- PAED multiclass: Adam lr=1e-4 (reference model/PAED/classes.py:486-487)
- PAED binary: AdamW lr=1e-4 + ReduceLROnPlateau(patience=30) on val_IoU
  (reference model/PAED/classes.py:536-548)

torch and optax Adam/AdamW share update arithmetic at default betas/eps;
torch AdamW's decoupled weight decay (default 1e-2, applied to every param)
maps to optax.adamw with no mask.

``PlateauScheduler`` reimplements torch.optim.lr_scheduler.ReduceLROnPlateau
semantics (mode min/max, relative threshold 1e-4, cooldown 0, factor 0.1) as
a host-side object producing an LR *scale*; the scale is injected into the
jitted step as a plain scalar argument, so LR drops never trigger a recompile.
"""

from __future__ import annotations

from typing import Optional

import optax

from visiontransformer_tpu.configs import TrainConfig


def build_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """Gradient accumulation is NOT handled here: optax.MultiSteps carries
    the accumulator through a lax.cond over the full optimizer state, which
    measured catastrophically on v5e at the 171M-param P16H1024A16 config (HBM copies/spill).
    The Trainer instead scans micro-batches inside the train step
    (train/trainer.py) — same averaged-gradient semantics as Lightning's
    accumulate_grad_batches (reference model/CE/createViTmodel.py:74)."""
    if cfg.optimizer == "adam":
        return optax.inject_hyperparams(optax.adam)(
            learning_rate=cfg.learning_rate)
    if cfg.optimizer == "adamw":
        return optax.inject_hyperparams(optax.adamw)(
            learning_rate=cfg.learning_rate, weight_decay=cfg.weight_decay)
    raise ValueError(f"unknown optimizer {cfg.optimizer!r}")


def set_learning_rate(opt_state, learning_rate: float):
    """Update the injected learning rate without recompiling anything."""
    if hasattr(opt_state, "hyperparams"):
        import jax.numpy as jnp
        old = opt_state.hyperparams["learning_rate"]
        opt_state.hyperparams["learning_rate"] = jnp.asarray(
            learning_rate, dtype=getattr(old, "dtype", jnp.float32))
    return opt_state


class PlateauScheduler:
    """torch ReduceLROnPlateau: shrink LR by `factor` after `patience`
    epochs without `threshold`-relative improvement of the monitored metric."""

    def __init__(self, initial_lr: float, mode: str = "min",
                 factor: float = 0.1, patience: int = 10,
                 threshold: float = 1e-4, min_lr: float = 0.0):
        assert mode in ("min", "max")
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.lr = initial_lr
        self.best: Optional[float] = None
        self.num_bad_epochs = 0

    def _is_better(self, current: float) -> bool:
        if self.best is None:
            return True
        if self.mode == "min":
            return current < self.best * (1.0 - self.threshold)
        return current > self.best * (1.0 + self.threshold)

    def step(self, metric: float) -> float:
        """Feed one epoch's monitored value; returns the (possibly reduced) LR."""
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
            if self.num_bad_epochs > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad_epochs = 0
        return self.lr


class EarlyStopping:
    """Lightning-style EarlyStopping(monitor, patience) with min_delta=0
    (reference model/CE/createViTmodel.py:65, model/PAED/ViTscript.py:70)."""

    def __init__(self, patience: int = 3, mode: str = "min"):
        assert mode in ("min", "max")
        self.patience = patience
        self.mode = mode
        self.best: Optional[float] = None
        self.num_bad_epochs = 0

    def step(self, metric: float) -> bool:
        """Returns True when training should stop."""
        improved = (self.best is None
                    or (self.mode == "min" and metric < self.best)
                    or (self.mode == "max" and metric > self.best))
        if improved:
            self.best = metric
            self.num_bad_epochs = 0
            return False
        self.num_bad_epochs += 1
        return self.num_bad_epochs >= self.patience
