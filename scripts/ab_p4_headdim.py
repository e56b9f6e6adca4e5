"""Does d=128 lift the P4 train-step MFU past the d=64 flash ceiling?

Round-4 closed P4H512A8 training at 46% MFU with an *argument*: the flash
kernel family's QK^T/dV contractions reduce over d=64 lanes (half the
MXU), and attention dominates the 3137-token step. This runs the
experiment that argument skipped: the same model FLOPs with heads merged
to d=128 — P4 H512 with 4 heads instead of 8 (identical parameter count
and per-layer FLOPs; head count does not change matmul volume) — full CE
train step, dropout on, interleaved A/B in ONE process (pool rules per
CLAUDE.md). If d=128 wins materially, the 46% ceiling is a head-layout
choice (a model change could buy it back); if it ties or loses, the
ceiling is structural for the reference-parity 8-head config.

Usage: python scripts/ab_p4_headdim.py  [batch]
"""

import os
import sys
import time

import numpy as np

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from visiontransformer_tpu.configs import (  # noqa: E402
    TrainConfig,
    ViTConfig,
    ViTSegConfig,
)
from visiontransformer_tpu.train import Trainer  # noqa: E402

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 16
STEPS = 6
ROUNDS = int(os.environ.get("HD_ROUNDS", 3))


def measure(num_heads: int) -> float:
    cfg = ViTSegConfig(
        vit=ViTConfig(image_size=224, patch_size=4, hidden_size=512,
                      num_hidden_layers=8, num_attention_heads=num_heads),
        num_classes=17, compute_dtype="bfloat16")
    tcfg = TrainConfig(batch_size=BATCH, accumulate_grad_batches=1,
                       early_stopping_monitor=None)
    trainer = Trainer(cfg, tcfg, task="ce")
    state = trainer.init_state()
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.random((BATCH, 224, 224, 3)).astype(np.float32),
        "mask": rng.integers(0, 17, (BATCH, 224, 224)).astype(np.int32),
    }
    key = jax.random.PRNGKey(0)
    state, _ = trainer.train_step(state, batch, key)  # compile
    jax.block_until_ready(state.params)
    best = float("inf")
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        for i in range(STEPS):
            state, metrics = trainer.train_step(
                state, batch, jax.random.fold_in(key, i))
        _ = float(metrics["loss"])  # sync through the tunnel
        best = min(best, (time.perf_counter() - t0) / STEPS)
    return best


def main():
    results = {}
    for heads in (8, 4, 8, 4):  # interleave to ride out pool drift
        dt = measure(heads)
        results[heads] = min(results.get(heads, float("inf")), dt)
        print(f"P4H512 heads={heads} (d={512 // heads}): "
              f"{dt * 1e3:7.1f} ms/step ({BATCH / dt:5.1f} imgs/s)",
              flush=True)
    r = results[8] / results[4]
    print(f"BEST d=64: {BATCH / results[8]:5.1f} imgs/s | "
          f"d=128: {BATCH / results[4]:5.1f} imgs/s | "
          f"d=128 speedup {r:5.3f}x", flush=True)


if __name__ == "__main__":
    main()
