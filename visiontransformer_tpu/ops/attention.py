"""Multi-head self-attention dispatch.

Two implementations behind one interface:

- ``"xla"``   — straightforward jnp einsum attention. XLA fuses the softmax
  chain; this is the parity/training-with-dropout path (the reference trains
  with attention_probs_dropout_prob=0.1, reference model/CE/classes.py:234).
- ``"flash"`` — Pallas blockwise flash attention (ops/flash_attention.py):
  never materializes the N×N matrix, which is what makes the patch-4 configs
  (3137 tokens, reference model/ViT_configuraciones_segmentacion.ods) fast and
  memory-light on TPU.

Inputs are (batch, heads, seq, head_dim).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _xla_attention(q, k, v, *, dropout_rate: float = 0.0,
                   dropout_key: Optional[jax.Array] = None,
                   deterministic: bool = True):
    head_dim = q.shape[-1]
    scale = 1.0 / jnp.sqrt(head_dim).astype(q.dtype)
    # fp32 softmax accumulation regardless of activation dtype.
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits * scale.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    if not deterministic and dropout_rate > 0.0:
        keep = 1.0 - dropout_rate
        mask = jax.random.bernoulli(dropout_key, keep, probs.shape)
        probs = jnp.where(mask, probs / keep, 0.0)
    probs = probs.astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                      preferred_element_type=q.dtype)


def multi_head_attention(q, k, v, *, implementation: str = "auto",
                         dropout_rate: float = 0.0,
                         dropout_key: Optional[jax.Array] = None,
                         deterministic: bool = True):
    """Scaled dot-product attention over (B, H, N, D) tensors.

    implementation: "auto" picks flash on TPU when there is no attention
    dropout (the flash kernel is deterministic), else the XLA path.
    """
    if implementation == "auto":
        # Flash wins on v5e once the score matrix is big enough to pay for
        # the streaming — measured across all sweep lengths
        # (scripts/tune_flash.py, chained-in-jit best-of-N): 1.70x at N=3137,
        # 1.47x at N=1025, 1.21x at N=785, 1.00x (tie) at N=197. Threshold
        # 512 takes flash everywhere it wins and leaves P16@224 (197) on the
        # simpler XLA path. The kernel carries attention-probs dropout
        # in-chip (per-tile PRNG), so it also serves the training path —
        # where it additionally avoids storing B·H·N² probs + masks for the
        # backward pass.
        use_flash = (_on_tpu() and q.shape[-2] >= 512 and _flash_available())
        implementation = "flash" if use_flash else "xla"

    if implementation == "flash":
        from visiontransformer_tpu.ops.flash_attention import flash_attention
        # `deterministic` distinguishes serving/eval forwards from training
        # forwards that will be differentiated — the two dispatch different
        # tuned block tables (inference optima differ from grad optima at
        # N=1025; ops/flash_attention._TUNED_BLOCKS_*).
        path = "infer" if deterministic else "train"
        if deterministic or dropout_rate == 0.0:
            return flash_attention(q, k, v, path=path)
        # Seed rides through a float32 carrier (custom-vjp plumbing); stay
        # within f32-exact integer range.
        seed = jax.random.randint(dropout_key, (), 0, 2**23)
        return flash_attention(q, k, v, dropout_rate=dropout_rate,
                               dropout_seed=seed, path=path)
    if implementation == "xla":
        return _xla_attention(q, k, v, dropout_rate=dropout_rate,
                              dropout_key=dropout_key,
                              deterministic=deterministic)
    raise ValueError(f"unknown attention implementation {implementation!r}")


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _flash_available() -> bool:
    try:
        from visiontransformer_tpu.ops import flash_attention  # noqa: F401
        return True
    except ImportError:
        return False
