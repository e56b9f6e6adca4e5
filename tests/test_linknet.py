"""LinkNet family: shapes, gradients, trainer integration, serving.

The reference's StructuralDamageModel passes an arbitrary smp arch string
to smp.create_model (reference model/CE/classes.py:106-110); "linknet" is
the third natively implemented arch behind that surface
(models/linknet.py), on the same shared residual GroupNorm encoder as
"unet" and "fpn", with LinkNet's additive (not concatenated) skip merge.
"""

import numpy as np

import jax
import jax.numpy as jnp

from visiontransformer_tpu.configs import TrainConfig
from visiontransformer_tpu.models.linknet import (
    LinkNetConfig,
    linknet_apply,
    linknet_init,
)
from visiontransformer_tpu.train import Trainer


def test_linknet_shapes(rng):
    cfg = LinkNetConfig(encoder_name="small", num_classes=7)
    params = linknet_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    logits = linknet_apply(params, x, cfg)
    assert logits.shape == (2, 64, 64, 7)
    assert logits.dtype == jnp.float32
    # One decoder block per encoder stage; each projects onto its skip's
    # width so the additive merge type-checks.
    assert len(params["decoder"]) == len(cfg.stage_blocks)


def test_linknet_decoder_narrower_than_unet(rng):
    """LinkNet's defining property vs UNet: additive skips keep the
    decoder at the skip width — fewer decoder params than unet's
    concat-then-convolve on the same encoder."""
    from visiontransformer_tpu.models.unet import UNetConfig, unet_init

    lcfg = LinkNetConfig(encoder_name="small", num_classes=5)
    ucfg = UNetConfig(encoder_name="small", num_classes=5)
    lp = linknet_init(jax.random.PRNGKey(0), lcfg)
    up = unet_init(jax.random.PRNGKey(0), ucfg)

    def n_params(tree):
        return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))

    assert n_params(lp["decoder"]) < n_params(up["decoder"])


def test_linknet_gradients_flow(rng):
    cfg = LinkNetConfig(encoder_name="small", num_classes=3,
                        normalize=False)
    params = linknet_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)

    def loss(p):
        return jnp.mean(linknet_apply(p, x, cfg) ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree.leaves(
        {k: v for k, v in grads.items() if k not in ("norm_mean", "norm_std")})
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    nonzero = sum(float(jnp.abs(g).sum()) > 0 for g in leaves)
    assert nonzero > len(leaves) * 0.9


def test_linknet_trains_via_trainer(rng):
    """Full smp-style train steps through the Trainer lower the loss."""
    cfg = LinkNetConfig(encoder_name="small", num_classes=4,
                        normalize=False)
    tcfg = TrainConfig(batch_size=4, accumulate_grad_batches=1,
                       learning_rate=3e-3, early_stopping_monitor=None)
    trainer = Trainer(cfg, tcfg, task="smp_multiclass", model="linknet",
                      use_mesh=False)
    state = trainer.init_state()
    batch = {
        "image": rng.random((4, 32, 32, 3)).astype(np.float32),
        "mask": rng.integers(0, 4, (4, 32, 32)).astype(np.int32),
    }
    losses = []
    for i in range(6):
        state, metrics = trainer.train_step(state, batch,
                                            jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert "dataset_iou" in metrics
