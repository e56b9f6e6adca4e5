"""In-process A/B: round-3 accumulation (standalone pytree add x3 + scale
dispatches) vs round-4 fused (add in the grad epilogue, 1/N scale in the
update). Cross-run wall comparisons are invalid on the pooled chip
(CLAUDE.md), so this interleaves both full-step variants in ONE process.

Env: CONFIG (default P16H1024A16), BATCH (32), ACCUM (4), SIZE (224),
     ROUNDS (6).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from visiontransformer_tpu.configs import TrainConfig, sweep_by_name
from visiontransformer_tpu.train.trainer import Trainer

CONFIG = os.environ.get("CONFIG", "P16H1024A16")
BATCH = int(os.environ.get("BATCH", "32"))
ACCUM = int(os.environ.get("ACCUM", "4"))
SIZE = int(os.environ.get("SIZE", "224"))
ROUNDS = int(os.environ.get("ROUNDS", "6"))


def main():
    print(f"backend={jax.default_backend()} config={CONFIG} batch={BATCH} "
          f"accum={ACCUM} size={SIZE}", flush=True)
    seg_cfg = sweep_by_name(CONFIG).seg_config(
        num_classes=17, compute_dtype="bfloat16")
    tcfg = TrainConfig(batch_size=BATCH, accumulate_grad_batches=ACCUM,
                       early_stopping_monitor=None)
    trainer = Trainer(seg_cfg, tcfg, task="ce")
    state = trainer.init_state(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    micro = BATCH // ACCUM
    batch = {
        "image": jnp.asarray(rng.random((BATCH, SIZE, SIZE, 3)), jnp.float32),
        "mask": jnp.asarray(rng.integers(0, 17, (BATCH, 256, 256)), jnp.int32),
    }
    micros = [{k: v[i * micro:(i + 1) * micro] for k, v in batch.items()}
              for i in range(ACCUM)]
    key = jax.random.PRNGKey(1)
    keys = [jax.random.fold_in(key, i) for i in range(ACCUM)]

    grad_step = trainer._build_grad_step()
    grad_acc_step = trainer._build_grad_step(accumulate=True)
    update_fused = trainer._build_update_step()  # /ACCUM inside

    # round-3 structure rebuilt verbatim
    import optax
    optimizer = trainer.optimizer
    add_step = jax.jit(lambda acc, g: jax.tree.map(jnp.add, acc, g))
    scale_step = jax.jit(lambda acc: jax.tree.map(lambda g: g / ACCUM, acc))

    def update_plain(state, grads):
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        from visiontransformer_tpu.train.state import TrainState
        return TrainState(params=optax.apply_updates(state.params, updates),
                          opt_state=opt_state, step=state.step + 1)
    update_plain = jax.jit(update_plain)

    def step_old(state):
        acc = None
        last = None
        for i in range(ACCUM):
            grads, m = grad_step(state.params, micros[i], keys[i])
            last = m
            acc = grads if acc is None else add_step(acc, grads)
        new_state = update_plain(state, scale_step(acc))
        return new_state, last

    def step_new(state):
        acc = None
        last = None
        for i in range(ACCUM):
            if acc is None:
                acc, last = grad_step(state.params, micros[i], keys[i])
            else:
                acc, last = grad_acc_step(state.params, acc, micros[i],
                                          keys[i])
        return update_fused(state, acc), last

    def timed(step, state, k=3):
        t0 = time.perf_counter()
        for _ in range(k):
            state, m = step(state)
        # Sync on the FINAL program of the chain (the optimizer update's
        # step counter), not m["loss"]: the loss is an output of the last
        # grad program, so reading only it would leave the trailing
        # scale/update dispatches outside the timed window — and the old
        # variant trails strictly more work (the standalone scale dispatch
        # this A/B exists to measure).
        _ = int(state.step)
        _ = float(m["loss"])
        return (time.perf_counter() - t0) / k

    # warm both
    timed(step_old, state, k=1)
    timed(step_new, state, k=1)

    old_best, new_best = float("inf"), float("inf")
    for r in range(ROUNDS):
        o = timed(step_old, state)
        n = timed(step_new, state)
        old_best, new_best = min(old_best, o), min(new_best, n)
        print(f"round {r}: old {o*1e3:7.2f} ms | fused {n*1e3:7.2f} ms "
              f"({o/n:.3f}x)", flush=True)
    print(f"\nbest-of-{ROUNDS}: old {old_best*1e3:.2f} ms "
          f"({BATCH/old_best:.1f} imgs/s) | fused {new_best*1e3:.2f} ms "
          f"({BATCH/new_best:.1f} imgs/s) | speedup {old_best/new_best:.3f}x",
          flush=True)


if __name__ == "__main__":
    main()
