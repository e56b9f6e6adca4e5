"""PSPNet family: pooling math, shapes, gradients, trainer, serving.

The reference's StructuralDamageModel passes an arbitrary smp arch string
to smp.create_model (reference model/CE/classes.py:106-110); "pspnet" is
the fourth natively implemented arch behind that surface
(models/pspnet.py), on the same shared residual GroupNorm encoder as the
other conv families, with smp's pyramid-pooling decoder shape.
"""

import numpy as np

import jax
import jax.numpy as jnp

from visiontransformer_tpu.configs import TrainConfig
from visiontransformer_tpu.models.pspnet import (
    PSPNetConfig,
    adaptive_avg_pool,
    pspnet_apply,
    pspnet_init,
)
from visiontransformer_tpu.train import Trainer


def test_adaptive_pool_matches_torch_semantics(rng):
    """The matmul-form pooling reproduces torch AdaptiveAvgPool2d exactly,
    including non-divisible bin splits (7→3)."""
    import torch

    x = rng.random((2, 7, 10, 4)).astype(np.float32)
    ours = np.asarray(adaptive_avg_pool(jnp.asarray(x), 3))
    theirs = (
        torch.nn.functional.adaptive_avg_pool2d(
            torch.from_numpy(x).permute(0, 3, 1, 2), 3)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_adaptive_pool_global_bin(rng):
    x = rng.random((1, 8, 8, 3)).astype(np.float32)
    pooled = np.asarray(adaptive_avg_pool(jnp.asarray(x), 1))
    np.testing.assert_allclose(pooled[0, 0, 0], x[0].mean(axis=(0, 1)),
                               rtol=1e-5)


def test_pspnet_shapes(rng):
    cfg = PSPNetConfig(encoder_name="small", num_classes=7)
    params = pspnet_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    logits = pspnet_apply(params, x, cfg)
    assert logits.shape == (2, 64, 64, 7)
    assert logits.dtype == jnp.float32
    assert len(params["psp"]) == len(cfg.pool_sizes)


def test_pspnet_gradients_flow(rng):
    cfg = PSPNetConfig(encoder_name="small", num_classes=3,
                       normalize=False)
    params = pspnet_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)

    def loss(p):
        return jnp.mean(pspnet_apply(p, x, cfg) ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree.leaves(
        {k: v for k, v in grads.items() if k not in ("norm_mean", "norm_std")})
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    nonzero = sum(float(jnp.abs(g).sum()) > 0 for g in leaves)
    assert nonzero > len(leaves) * 0.9


def test_pspnet_trains_via_trainer(rng):
    """Full smp-style train steps through the Trainer lower the loss.

    Unlike the skip-connected families, PSPNet's logits come entirely
    from stride-16 pyramid features, so a per-pixel random mask is
    unlearnable (CE stays pinned at ln(num_classes)); the target here is
    block-structured (half-image classes) so the coarse decoder can fit
    it."""
    cfg = PSPNetConfig(encoder_name="small", num_classes=4,
                       normalize=False)
    tcfg = TrainConfig(batch_size=4, accumulate_grad_batches=1,
                       learning_rate=1e-3, early_stopping_monitor=None)
    trainer = Trainer(cfg, tcfg, task="smp_multiclass", model="pspnet",
                      use_mesh=False)
    state = trainer.init_state()
    images = rng.random((4, 32, 32, 3)).astype(np.float32)
    mask = np.zeros((4, 32, 32), np.int32)
    mask[:, :, 16:] = 1  # right half class 1
    mask[:, 16:, :16] = 2  # lower-left quadrant class 2
    images[..., 0] += mask / 4.0  # correlate input with target
    batch = {"image": images, "mask": mask}
    losses = []
    for i in range(10):
        state, metrics = trainer.train_step(state, batch,
                                            jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert min(losses[-3:]) < losses[0]
