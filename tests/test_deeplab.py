"""DeepLabV3 family: atrous conv semantics, shapes, gradients, trainer,
serving.

The reference's StructuralDamageModel passes an arbitrary smp arch string
to smp.create_model (reference model/CE/classes.py:106-110); "deeplabv3"
is the fifth natively implemented arch behind that surface
(models/deeplab.py), on the same shared residual GroupNorm encoder as the
other conv families, with the ASPP multi-rate atrous pyramid.
"""

import numpy as np

import jax
import jax.numpy as jnp

from visiontransformer_tpu.configs import TrainConfig
from visiontransformer_tpu.models.deeplab import (
    DeepLabV3Config,
    deeplabv3_apply,
    deeplabv3_init,
)
from visiontransformer_tpu.train import Trainer


def test_dilated_conv_matches_torch(rng):
    """conv2d(dilation=r) reproduces torch's atrous Conv2d exactly
    (SAME padding at odd kernel = torch padding=dilation)."""
    import torch

    from visiontransformer_tpu.nn.layers import conv2d

    x = rng.random((2, 16, 16, 5)).astype(np.float32)
    w = rng.standard_normal((3, 3, 5, 7)).astype(np.float32) * 0.1
    b = rng.standard_normal(7).astype(np.float32)
    params = {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}
    ours = np.asarray(conv2d(params, jnp.asarray(x), dilation=2))
    theirs = (
        torch.nn.functional.conv2d(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            torch.from_numpy(w).permute(3, 2, 0, 1),
            torch.from_numpy(b), padding=2, dilation=2)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_deeplab_shapes(rng):
    cfg = DeepLabV3Config(encoder_name="small", num_classes=7)
    params = deeplabv3_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    logits = deeplabv3_apply(params, x, cfg)
    assert logits.shape == (2, 64, 64, 7)
    assert logits.dtype == jnp.float32
    assert len(params["aspp"]["atrous"]) == len(cfg.atrous_rates)


def test_deeplab_image_level_branch_sees_whole_image(rng):
    """The image-pool branch makes logits depend on far-away pixels even
    at init: perturbing one corner changes outputs everywhere (global
    receptive field, ASPP's defining property)."""
    cfg = DeepLabV3Config(encoder_name="small", num_classes=3,
                          normalize=False)
    params = deeplabv3_init(jax.random.PRNGKey(0), cfg)
    x = rng.random((1, 64, 64, 3)).astype(np.float32)
    base = np.asarray(deeplabv3_apply(params, jnp.asarray(x), cfg))
    x2 = x.copy()
    x2[0, :4, :4, :] += 10.0  # corner perturbation
    out = np.asarray(deeplabv3_apply(params, jnp.asarray(x2), cfg))
    # Opposite corner logits move.
    assert np.abs(out[0, -4:, -4:] - base[0, -4:, -4:]).max() > 1e-6


def test_deeplab_atrous_rates_rescale_and_branches_alive(rng):
    """Rates are declared on the paper's 33×33 canvas and rescaled to the
    actual feature map; at 224² (14×14 features) every atrous branch's
    OFF-CENTER taps must touch real pixels (nonzero gradient) — with
    fixed rates (6,12,18) the rate-18 branch would be a dead center-tap
    conv (all ±18 taps in SAME padding)."""
    cfg = DeepLabV3Config(encoder_name="small", num_classes=3,
                          normalize=False)
    params = deeplabv3_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.random((1, 224, 224, 3)), jnp.float32)

    def loss(p):
        return jnp.sum(deeplabv3_apply(p, x, cfg) ** 2)

    grads = jax.grad(loss)(params)
    for i in range(len(cfg.atrous_rates)):
        k = np.asarray(grads["aspp"]["atrous"][i]["conv"]["kernel"])
        off_center = np.abs(k).sum() - np.abs(k[1, 1]).sum()
        assert off_center > 0, f"atrous branch {i} off-center taps dead"


def test_deeplab_gradients_flow(rng):
    cfg = DeepLabV3Config(encoder_name="small", num_classes=3,
                          normalize=False)
    params = deeplabv3_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)

    def loss(p):
        return jnp.mean(deeplabv3_apply(p, x, cfg) ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree.leaves(
        {k: v for k, v in grads.items() if k not in ("norm_mean", "norm_std")})
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    nonzero = sum(float(jnp.abs(g).sum()) > 0 for g in leaves)
    assert nonzero > len(leaves) * 0.9


def test_deeplab_trains_via_trainer(rng):
    """Full smp-style train steps through the Trainer lower the loss
    (block-structured target — like PSPNet, the decoder is stride-16)."""
    cfg = DeepLabV3Config(encoder_name="small", num_classes=4,
                          normalize=False)
    tcfg = TrainConfig(batch_size=4, accumulate_grad_batches=1,
                       learning_rate=1e-3, early_stopping_monitor=None)
    trainer = Trainer(cfg, tcfg, task="smp_multiclass", model="deeplabv3",
                      use_mesh=False)
    state = trainer.init_state()
    images = rng.random((4, 32, 32, 3)).astype(np.float32)
    mask = np.zeros((4, 32, 32), np.int32)
    mask[:, :, 16:] = 1
    mask[:, 16:, :16] = 2
    images[..., 0] += mask / 4.0
    batch = {"image": images, "mask": mask}
    losses = []
    for i in range(10):
        state, metrics = trainer.train_step(state, batch,
                                            jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert min(losses[-3:]) < losses[0]
