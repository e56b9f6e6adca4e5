"""Per-stage profile of the CE TRAIN step (VERDICT r2 directive 4).

The inference side has a full profile (profile_stages2.py / PERFORMANCE.md);
the train side only ever published end-to-end imgs/s. This script splits one
optimizer step into the exact programs the Trainer dispatches —
grad (fwd+bwd per micro-batch), fused grad+accumulate (micro-batches 2..N;
the standalone add/scale dispatches were folded away in round 4), optimizer
update (with the 1/accum scale inside) — plus the full `Trainer.train_step`
wall time, and reports sustained TFLOPS per stage from XLA's own cost
analysis of each compiled program.

Measurement rules per CLAUDE.md: single process, best-of-N back-to-back,
scalar-readback sync (block_until_ready doesn't sync the tunnel), and k
PIPELINED dispatches per timing — a lone dispatch over the axon tunnel
carries ~27 ms of round-trip latency (a first cut of this script measured
"sum of device programs" ABOVE the pipelined step wall because every
sub-30 ms program absorbed a full round trip).

Env: CONFIG (default P16H1024A16; also P4H512A8), BATCH (default 32),
     ACCUM (default 4), SIZE (default 224), ROUNDS (default 5).
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
ROUNDS = int(os.environ.get("ROUNDS", "5"))


def program_flops(jitted, *args):
    """XLA's own FLOP count for the compiled program (None if the runtime
    doesn't expose cost analysis)."""
    try:
        compiled = jitted.lower(*args).compile()
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", 0.0)) or None
    except Exception:
        return None


def sync(tree):
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return float(jnp.sum(jnp.ravel(leaf)[:1].astype(jnp.float32)))


def bench(name, fn, *args, flops=None, k=8):
    """k pipelined dispatches per timing, one sync: a SINGLE dispatch over
    the axon tunnel carries ~27 ms of round-trip latency (measured,
    docs/PERFORMANCE.md), which swamps sub-30 ms programs; back-to-back
    dispatches overlap it exactly like the Trainer's own step loop does."""
    out = fn(*args)
    sync(out)
    best = float("inf")
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / k)
    tf = f"  {flops / best / 1e12:6.1f} TFLOPS" if flops else ""
    print(f"{name:<44s} {best * 1e3:9.2f} ms{tf}", flush=True)
    return best


def main():
    print(f"backend={jax.default_backend()} config={CONFIG} "
          f"batch={BATCH} accum={ACCUM} size={SIZE}", flush=True)
    seg_cfg = sweep_by_name(CONFIG).seg_config(
        num_classes=17, compute_dtype="bfloat16")
    train_cfg = TrainConfig(batch_size=BATCH,
                            accumulate_grad_batches=ACCUM,
                            early_stopping_monitor=None)
    trainer = Trainer(seg_cfg, train_cfg, task="ce")
    state = trainer.init_state(jax.random.PRNGKey(0))
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(state.params))
    print(f"params: {n_params / 1e6:.1f} M", flush=True)

    rng = np.random.default_rng(0)
    micro = BATCH // ACCUM
    batch = {
        "image": jnp.asarray(rng.random((BATCH, SIZE, SIZE, 3)), jnp.float32),
        "mask": jnp.asarray(rng.integers(0, 17, (BATCH, 256, 256)), jnp.int32),
    }
    micro_batch = {k: v[:micro] for k, v in batch.items()}
    key = jax.random.PRNGKey(1)

    grad_step = trainer._build_grad_step()
    grad_acc_step = trainer._build_grad_step(accumulate=True)
    update_step = trainer._build_update_step()
    eval_step = trainer._build_eval_step()

    fwd_flops = program_flops(eval_step, state.params, micro_batch)
    grad_flops = program_flops(grad_step, state.params, micro_batch, key)
    upd_flops = program_flops(update_step, state,
                              jax.tree.map(jnp.zeros_like, state.params))

    t_fwd = bench(f"fwd only (eval program, micro={micro})",
                  eval_step, state.params, micro_batch, flops=fwd_flops)
    t_grad = bench(f"grad = fwd+bwd (micro={micro}, dropout)",
                   grad_step, state.params, micro_batch, key,
                   flops=grad_flops)
    grads, _ = grad_step(state.params, micro_batch, key)
    sync(grads)
    t_grad_acc = bench(f"grad+accumulate fused (micro={micro})",
                       grad_acc_step, state.params, grads, micro_batch, key,
                       flops=grad_flops)
    t_upd = bench("optimizer update (Adam + /accum + apply)", update_step,
                  state, grads, flops=upd_flops)

    # Full Trainer.train_step wall: 1 grad dispatch + (ACCUM-1) fused
    # grad+add dispatches + update (scale folded in) + host-side
    # micro-batch slicing + metric stacking.
    def full(state, batch, key):
        new_state, metrics = trainer.train_step(state, batch, key)
        # Sync on the update program's output (step counter), not just the
        # loss: the loss comes from the last grad program, so reading only
        # it would exclude the trailing optimizer-update dispatch (~11 ms
        # at P16H1024A16) from the wall.
        sync(new_state.step)
        sync(metrics["loss"])
        return new_state

    full(state, batch, key)  # warm metrics-mean program
    best = float("inf")
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        for _ in range(2):
            full(state, batch, key)
        best = min(best, (time.perf_counter() - t0) / 2)
    device_sum = t_grad + (ACCUM - 1) * t_grad_acc + t_upd
    print(f"{'full train_step (wall, incl. host)':<44s} {best * 1e3:9.2f} ms"
          f"  -> {BATCH / best:6.1f} imgs/s", flush=True)
    print(f"{'  sum of device programs':<44s} {device_sum * 1e3:9.2f} ms")
    print(f"{'  host gap (wall - device sum)':<44s} "
          f"{(best - device_sum) * 1e3:9.2f} ms")
    if grad_flops:
        step_flops = ACCUM * grad_flops + (upd_flops or 0)
        print(f"step FLOPs (XLA count): {step_flops / 1e12:.2f} TF  "
              f"sustained over wall: {step_flops / best / 1e12:.1f} TFLOPS")
        # bf16 MXU peak on v5e ~394 TFLOPS; fp32-accum matmul realistic
        # ceiling measured on this chip ~57 TF (PERFORMANCE.md roofline).
        print(f"MFU vs the chip's measured 57 TF sustained ceiling: "
              f"{step_flops / best / 57e12 * 100:.0f}%")


if __name__ == "__main__":
    main()
