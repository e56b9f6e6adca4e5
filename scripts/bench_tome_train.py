"""Token merging as a TRAINING accelerator: A/B the full fwd+bwd step.

ToMe's merge/unmerge is one-hot matmuls end to end (ops/token_merge.py),
so it is differentiable and works inside jax.grad — unlike the original
ToMe (inference-only), the exact-unmerge design here lets the dense seg
head train with merged backbones. This measures the CE train step
(value_and_grad of the CE loss through vitseg_apply) with r=0 vs r=16
interleaved in one process (pool rules per CLAUDE.md), and sanity-checks
that r=16 gradients are finite and nonzero everywhere.

Usage: python scripts/bench_tome_train.py
"""

import dataclasses
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from visiontransformer_tpu.configs import ViTConfig, ViTSegConfig
from visiontransformer_tpu.models import vitseg_apply, vitseg_init

BATCH = 8
IMG = 512
ITERS = 10
ROUNDS = 3


def make_step(cfg):
    def loss_fn(params, x, y, rng):
        logits = vitseg_apply(params, x, cfg, deterministic=False, rng=rng)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, y).mean()

    @jax.jit
    def step(params, x, y, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y, rng)
        # One scalar per leaf, reduced on device — reading leaves back
        # individually costs hundreds of tunnel round-trips.
        leaf_sums = jnp.stack([jnp.abs(g).sum().astype(jnp.float32)
                               for g in jax.tree.leaves(grads)])
        return loss, jnp.sum(leaf_sums == 0), jnp.isfinite(leaf_sums).all()

    return step


def main():
    base = ViTSegConfig(
        vit=ViTConfig(image_size=IMG, patch_size=16, hidden_size=768,
                      num_hidden_layers=12, num_attention_heads=12),
        num_classes=17, compute_dtype="bfloat16")
    params = vitseg_init(jax.random.PRNGKey(0), base)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((BATCH, IMG, IMG, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 17, (BATCH, IMG, IMG)), jnp.int32)
    key = jax.random.PRNGKey(1)

    steps = {}
    for r in (0, 16):
        cfg = dataclasses.replace(
            base, vit=dataclasses.replace(base.vit, token_merge_r=r))
        steps[r] = make_step(cfg)
        loss, n_dead, finite = steps[r](params, x, y, key)  # compile + sync
        print(f"r={r}: loss={float(loss):.4f}  dead grad leaves="
              f"{int(n_dead)}  finite={bool(finite)}", flush=True)
        assert np.isfinite(float(loss))
        assert int(n_dead) == 0, "token merging killed gradients somewhere"
        assert bool(finite)

    results = {0: [], 16: []}
    for _ in range(ROUNDS):
        for r in (0, 16):  # interleaved A/B
            t0 = time.perf_counter()
            for _ in range(ITERS):
                loss, _, _ = steps[r](params, x, y, key)
            float(loss)  # scalar readback sync
            results[r].append(BATCH * ITERS / (time.perf_counter() - t0))

    base_best, tome_best = max(results[0]), max(results[16])
    print(f"\ntrain fwd+bwd imgs/s (ViT-B/16 @512², bf16, batch {BATCH}):")
    print(f"  r=0  : {base_best:.1f}  (rounds: "
          + ", ".join(f"{v:.1f}" for v in results[0]) + ")")
    print(f"  r=16 : {tome_best:.1f}  (rounds: "
          + ", ".join(f"{v:.1f}" for v in results[16]) + ")")
    print(f"  speedup: {tome_best / base_best:.2f}x")


if __name__ == "__main__":
    main()
