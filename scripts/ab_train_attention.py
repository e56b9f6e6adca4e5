"""A/B: training step time at N=785 (P8@224) with flash vs XLA attention.

The round-2 auto rule dispatches flash at N>=512 based on FORWARD timings
(1.21x at 785). Training also takes the flash custom-VJP backward — this
measures the full train step both ways in one process (pool rules:
chained-in-jit not possible for optimizer steps, so amortize over steps and
take best-of)."""

import time

import numpy as np

import jax

import visiontransformer_tpu.ops.attention as attn
from visiontransformer_tpu.configs import TrainConfig, sweep_by_name
from visiontransformer_tpu.train import Trainer

BATCH = 16
STEPS = 8
ROUNDS = 3


def measure(implementation: str) -> float:
    orig = attn.multi_head_attention

    def forced(q, k, v, **kw):
        kw["implementation"] = implementation
        return orig(q, k, v, **kw)

    attn.multi_head_attention = forced
    # attention is imported at call sites via the module attr? verify:
    # models/vit.py imports the function directly, so patch there too.
    import visiontransformer_tpu.models.vit as vit_mod

    vit_orig = vit_mod.multi_head_attention
    vit_mod.multi_head_attention = forced
    try:
        entry = sweep_by_name("P8H512A8")
        cfg = entry.seg_config(num_classes=17, compute_dtype="bfloat16")
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
    finally:
        attn.multi_head_attention = orig
        vit_mod.multi_head_attention = vit_orig


def main():
    for impl in ("xla", "flash", "xla", "flash"):
        dt = measure(impl)
        print(f"{impl:>6s}: {dt * 1e3:7.1f} ms/step "
              f"({BATCH / dt:.1f} imgs/s)", flush=True)


if __name__ == "__main__":
    main()
