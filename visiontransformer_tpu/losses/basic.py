"""Cross-entropy / BCE / Dice losses matching torch arithmetic.

- ``cross_entropy_loss``: torch nn.CrossEntropyLoss over per-pixel class
  logits (reference model/CE/classes.py:268,280) — mean over every pixel of
  -log softmax[target].
- ``binary_cross_entropy``: torch F.binary_cross_entropy *on probabilities*
  (reference model/PAED/classes.py:679), including torch's clamp of each log
  term at -100.
- ``dice_loss``: PAEDTrainer.dice_loss (reference model/PAED/classes.py:608-620)
  — flatten everything, 1 - (2I + s)/(sum_p + sum_t + s).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy_loss(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Mean CE. logits: (..., num_classes) float; targets: (...) int."""
    logits = logits.astype(jnp.float32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, targets[..., None], axis=-1)
    return jnp.mean(nll)


def binary_cross_entropy(probs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """torch F.binary_cross_entropy on probabilities, log terms clamped at
    -100 (torch's documented behavior for p=0 or p=1)."""
    probs = probs.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    log_p = jnp.maximum(jnp.log(probs), -100.0)
    log_1p = jnp.maximum(jnp.log1p(-probs), -100.0)
    return -jnp.mean(targets * log_p + (1.0 - targets) * log_1p)


def dice_loss(preds: jnp.ndarray, targets: jnp.ndarray,
              smooth: float = 1e-6) -> jnp.ndarray:
    """Global (all pixels, all batch) soft Dice loss
    (reference model/PAED/classes.py:608-620)."""
    preds = preds.astype(jnp.float32).reshape(-1)
    targets = targets.astype(jnp.float32).reshape(-1)
    inter = jnp.sum(preds * targets)
    return 1.0 - (2.0 * inter + smooth) / (jnp.sum(preds) + jnp.sum(targets) + smooth)
