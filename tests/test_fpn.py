"""FPN family: shapes, gradients, trainer integration, unet non-regression.

The reference's StructuralDamageModel passes an arbitrary smp arch string to
smp.create_model (reference model/CE/classes.py:106-110); "fpn" is the
second natively implemented arch behind that surface (models/fpn.py), on
the same shared residual GroupNorm encoder as "unet".
"""

import numpy as np

import jax
import jax.numpy as jnp

from visiontransformer_tpu.configs import TrainConfig
from visiontransformer_tpu.models.fpn import FPNConfig, fpn_apply, fpn_init
from visiontransformer_tpu.models.unet import UNetConfig, unet_apply, unet_init
from visiontransformer_tpu.train import Trainer


def test_fpn_shapes(rng):
    cfg = FPNConfig(encoder_name="small", num_classes=7,
                    pyramid_channels=32, segmentation_channels=16)
    params = fpn_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    logits = fpn_apply(params, x, cfg)
    assert logits.shape == (2, 64, 64, 7)
    assert logits.dtype == jnp.float32
    # One lateral + seg branch per encoder stage.
    n_stages = len(cfg.stage_blocks)
    assert len(params["laterals"]) == n_stages
    assert len(params["seg_blocks"]) == n_stages


def test_fpn_gradients_flow(rng):
    cfg = FPNConfig(encoder_name="small", num_classes=3, normalize=False,
                    pyramid_channels=32, segmentation_channels=16)
    params = fpn_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)

    def loss(p):
        return jnp.mean(fpn_apply(p, x, cfg) ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree.leaves(
        {k: v for k, v in grads.items() if k not in ("norm_mean", "norm_std")})
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    nonzero = sum(float(jnp.abs(g).sum()) > 0 for g in leaves)
    assert nonzero > len(leaves) * 0.9


def test_fpn_trains_via_trainer(rng):
    """Full smp-style train steps through the Trainer lower the loss."""
    cfg = FPNConfig(encoder_name="small", num_classes=4, normalize=False,
                    pyramid_channels=32, segmentation_channels=16)
    tcfg = TrainConfig(batch_size=4, accumulate_grad_batches=1,
                       learning_rate=3e-3, early_stopping_monitor=None)
    trainer = Trainer(cfg, tcfg, task="smp_multiclass", model="fpn",
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


def test_unet_encoder_refactor_unchanged(rng):
    """The shared-encoder refactor keeps unet outputs identical in
    structure and finite (same init keys → same param tree shapes)."""
    cfg = UNetConfig(encoder_name="small", num_classes=5)
    params = unet_init(jax.random.PRNGKey(0), cfg)
    assert set(params) == {"stem", "stem_gn", "stages", "decoder", "head",
                           "norm_mean", "norm_std"}
    x = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    logits = unet_apply(params, x, cfg)
    assert logits.shape == (1, 64, 64, 5)
    assert np.isfinite(np.asarray(logits)).all()
