"""DeepLabV3+, UNet++, PAN and MAnet families: shapes, gradients,
architecture-defining properties, trainer integration, registry/CLI sync.

The reference's StructuralDamageModel passes an arbitrary smp arch string
to smp.create_model (reference model/CE/classes.py:106-110); these four
modules complete the native implementations of smp's architecture list
behind that surface (models/registry.py), on the same shared residual
GroupNorm encoder as the other conv families.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visiontransformer_tpu.configs import TrainConfig
from visiontransformer_tpu.models.deeplab import (
    DeepLabV3PlusConfig,
    deeplabv3plus_apply,
    deeplabv3plus_init,
)
from visiontransformer_tpu.models.manet import (
    MAnetConfig,
    _pab_apply,
    manet_apply,
    manet_init,
)
from visiontransformer_tpu.models.pan import PANConfig, pan_apply, pan_init
from visiontransformer_tpu.models.registry import MODEL_FAMILIES
from visiontransformer_tpu.models.unetpp import (
    UNetPlusPlusConfig,
    unetplusplus_apply,
    unetplusplus_init,
)
from visiontransformer_tpu.train import Trainer

NEW_FAMILIES = ("deeplabv3plus", "unetplusplus", "pan", "manet",
                "upernet", "segformer")


def test_registry_and_cli_choices_in_sync():
    """cli.py keeps a static mirror of the registry (it must parse args
    without importing jax); this pins the two lists together."""
    from visiontransformer_tpu.cli import MODEL_FAMILY_CHOICES

    assert MODEL_FAMILY_CHOICES == sorted(MODEL_FAMILIES)


@pytest.mark.parametrize("family", NEW_FAMILIES)
def test_family_shapes_and_dtype(rng, family):
    fam = MODEL_FAMILIES[family]
    cfg = fam.config_cls(encoder_name="small", num_classes=7)
    params = fam.init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    logits = fam.apply(params, x, cfg)
    assert logits.shape == (2, 64, 64, 7)
    assert logits.dtype == jnp.float32


@pytest.mark.parametrize("family", NEW_FAMILIES)
def test_family_gradients_flow(rng, family):
    fam = MODEL_FAMILIES[family]
    cfg = fam.config_cls(encoder_name="small", num_classes=3,
                         normalize=False)
    params = fam.init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)

    def loss(p):
        return jnp.mean(fam.apply(p, x, cfg) ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree.leaves(
        {k: v for k, v in grads.items() if k not in ("norm_mean", "norm_std")})
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    nonzero = sum(float(jnp.abs(g).sum()) > 0 for g in leaves)
    # PAB's gamma gate starts at 0, so its q/k/v grads are legitimately
    # zero at init; everything else must be live.
    assert nonzero > len(leaves) * 0.85


def test_deeplabv3plus_decoder_recovers_resolution(rng):
    """V3+ vs V3: the low-level skip path must make the pre-upsample
    decoder output quarter-resolution (OS-4), not stride-16 — the whole
    point of the '+' (boundary recovery)."""
    cfg = DeepLabV3PlusConfig(encoder_name="small", num_classes=3,
                              normalize=False)
    params = deeplabv3plus_init(jax.random.PRNGKey(0), cfg)
    # The low-level projection sees the OS-4 skip: its kernel input width
    # equals stage_channels[2].
    k = params["low_proj"]["conv"]["kernel"]
    assert k.shape[2] == cfg.stage_channels[2]
    x = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    logits = deeplabv3plus_apply(params, x, cfg)
    assert logits.shape == (1, 64, 64, 3)


def test_deeplabv3plus_differs_from_v3_on_same_seed(rng):
    """Same encoder + ASPP seed, but the decoder path must change the
    function: V3+ is not V3 with extra dead params."""
    from visiontransformer_tpu.models.deeplab import (
        DeepLabV3Config,
        deeplabv3_apply,
        deeplabv3_init,
    )

    x = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    cfg3 = DeepLabV3Config(encoder_name="small", num_classes=3,
                           normalize=False)
    cfgp = DeepLabV3PlusConfig(encoder_name="small", num_classes=3,
                               normalize=False)
    out3 = deeplabv3_apply(deeplabv3_init(jax.random.PRNGKey(0), cfg3),
                           x, cfg3)
    outp = deeplabv3plus_apply(deeplabv3plus_init(jax.random.PRNGKey(0),
                                                  cfgp), x, cfgp)
    assert np.abs(np.asarray(out3) - np.asarray(outp)).max() > 1e-6


def test_unetplusplus_grid_is_dense(rng):
    """The nested grid has n(n-1)/2 decoder nodes for n encoder levels
    (10 for 5 levels), and each node X[i][j] consumes all j same-level
    predecessors (dense skips — UNet++'s defining property): its kernel
    input width matches the declared fan-in."""
    from visiontransformer_tpu.models.unetpp import _node_in_channels

    cfg = UNetPlusPlusConfig(encoder_name="small", num_classes=3)
    params = unetplusplus_init(jax.random.PRNGKey(0), cfg)
    n = len(cfg.stage_channels)
    assert len(params["nodes"]) == n * (n - 1) // 2
    for j in range(1, n):
        for i in range(n - j):
            k = params["nodes"][f"x{i}_{j}"]["conv1"]["kernel"]
            assert k.shape[2] == _node_in_channels(cfg, i, j), (i, j)


def test_unetplusplus_all_columns_contribute(rng):
    """Gradients reach the FIRST decoder column's nodes (x0_1..x3_1) from
    the head — the dense chain is wired through, not just the last
    column."""
    cfg = UNetPlusPlusConfig(encoder_name="small", num_classes=3,
                             normalize=False)
    params = unetplusplus_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)

    def loss(p):
        return jnp.mean(unetplusplus_apply(p, x, cfg) ** 2)

    grads = jax.grad(loss)(params)
    for i in range(4):
        g = np.asarray(grads["nodes"][f"x{i}_1"]["conv1"]["kernel"])
        assert np.abs(g).sum() > 0, f"x{i}_1 dead"


def test_pan_fpa_global_branch_sees_whole_image(rng):
    """PAN's FPA global-pool branch gives the decoder a full-image
    receptive field even at init: a corner perturbation moves logits at
    the opposite corner."""
    cfg = PANConfig(encoder_name="small", num_classes=3, normalize=False)
    params = pan_init(jax.random.PRNGKey(0), cfg)
    x = rng.random((1, 64, 64, 3)).astype(np.float32)
    base = np.asarray(pan_apply(params, jnp.asarray(x), cfg))
    x2 = x.copy()
    x2[0, :4, :4, :] += 10.0
    out = np.asarray(pan_apply(params, jnp.asarray(x2), cfg))
    assert np.abs(out[0, -4:, -4:] - base[0, -4:, -4:]).max() > 1e-6


def test_manet_pab_is_identity_at_init_then_opens(rng):
    """The PAB residual gate (gamma) starts at 0 — attention is an exact
    identity at init (stable start) — and gradients reach gamma so
    training can open it."""
    cfg = MAnetConfig(encoder_name="small", num_classes=3, normalize=False)
    params = manet_init(jax.random.PRNGKey(0), cfg)
    h = jnp.asarray(rng.random((1, 4, 4, cfg.stage_channels[-1])),
                    jnp.float32)
    np.testing.assert_allclose(np.asarray(_pab_apply(params["pab"], h)),
                               np.asarray(h), rtol=0, atol=0)
    x = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)

    def loss(p):
        return jnp.mean(manet_apply(p, x, cfg) ** 2)

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["pab"]["gamma"])) > 0


def test_manet_pab_attention_mixes_positions(rng):
    """With the gate open, PAB output at one position depends on inputs
    at every other position (softmax over the full spatial grid)."""
    cfg = MAnetConfig(encoder_name="small", num_classes=3)
    params = manet_init(jax.random.PRNGKey(0), cfg)
    pab = dict(params["pab"], gamma=jnp.asarray(1.0))
    h = rng.random((1, 4, 4, cfg.stage_channels[-1])).astype(np.float32)
    base = np.asarray(_pab_apply(pab, jnp.asarray(h)))
    h2 = h.copy()
    h2[0, 0, 0, :] += 5.0
    out = np.asarray(_pab_apply(pab, jnp.asarray(h2)))
    assert np.abs(out[0, 3, 3] - base[0, 3, 3]).max() > 1e-6


def test_upernet_ppm_matches_torch_adaptive_pool(rng):
    """UPerNet reuses pspnet's matmul-form adaptive pooling; pin its
    torch AdaptiveAvgPool2d semantics at a non-divisible size (7→3)."""
    import torch

    from visiontransformer_tpu.models.pspnet import adaptive_avg_pool

    x = rng.random((2, 7, 7, 5)).astype(np.float32)
    ours = np.asarray(adaptive_avg_pool(jnp.asarray(x), 3))
    theirs = (torch.nn.functional.adaptive_avg_pool2d(
        torch.from_numpy(x).permute(0, 3, 1, 2), 3)
        .permute(0, 2, 3, 1).numpy())
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_upernet_fuses_all_pyramid_levels(rng):
    """Gradients reach every lateral and every PPM branch from the head —
    the full-pyramid fusion is wired, not just the finest level."""
    from visiontransformer_tpu.models.upernet import (
        UPerNetConfig,
        upernet_apply,
        upernet_init,
    )

    cfg = UPerNetConfig(encoder_name="small", num_classes=3,
                        normalize=False)
    params = upernet_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.random((1, 48, 48, 3)), jnp.float32)

    def loss(p):
        return jnp.mean(upernet_apply(p, x, cfg) ** 2)

    grads = jax.grad(loss)(params)
    for i, lat in enumerate(grads["lateral"]):
        assert float(jnp.abs(lat["conv"]["kernel"]).sum()) > 0, f"lat {i}"
    for i, br in enumerate(grads["ppm"]["branches"]):
        assert float(jnp.abs(br["conv"]["kernel"]).sum()) > 0, f"ppm {i}"


def test_segformer_projections_match_stage_widths(rng):
    """The per-stage linear projections consume the OS-4/8/16 stages."""
    from visiontransformer_tpu.models.segformer import (
        SegformerConfig,
        segformer_init,
    )

    cfg = SegformerConfig(encoder_name="small", num_classes=3)
    params = segformer_init(jax.random.PRNGKey(0), cfg)
    widths = [p["kernel"].shape[2] for p in params["proj"]]
    assert widths == [cfg.stage_channels[2], cfg.stage_channels[3],
                      cfg.stage_channels[4]]
    assert all(p["kernel"].shape[:2] == (1, 1) for p in params["proj"])


def test_bottleneck_encoder_resnet50(rng):
    """The shared encoder's bottleneck preset: torchvision-style channel
    plan (expansion 4), stride on the 3×3, and a working forward/backward
    through a family that consumes every stage (unet)."""
    from visiontransformer_tpu.models.unet import (
        UNetConfig,
        unet_apply,
        unet_init,
    )

    cfg = UNetConfig(encoder_name="resnet50", num_classes=3,
                     normalize=False)
    assert cfg.stage_channels == (64, 256, 512, 1024, 2048)
    params = unet_init(jax.random.PRNGKey(0), cfg)
    blk = params["stages"][0][0]
    assert "conv3" in blk  # bottleneck, not basic
    assert blk["conv1"]["kernel"].shape == (1, 1, 64, 64)   # 256 // 4
    assert blk["conv2"]["kernel"].shape == (3, 3, 64, 64)
    assert blk["conv3"]["kernel"].shape == (1, 1, 64, 256)
    x = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    logits = unet_apply(params, x, cfg)
    assert logits.shape == (1, 64, 64, 3)

    def loss(p):
        return jnp.mean(unet_apply(p, x, cfg) ** 2)

    g = jax.grad(loss)(params)
    deep = g["stages"][3][0]["conv2"]["kernel"]
    assert float(jnp.abs(deep).sum()) > 0  # grads reach the deepest stage


@pytest.mark.parametrize("family", ["deeplabv3plus", "manet"])
def test_new_families_train_via_trainer(rng, family):
    """Full smp-style train steps through the Trainer lower the loss."""
    fam = MODEL_FAMILIES[family]
    cfg = fam.config_cls(encoder_name="small", num_classes=4,
                         normalize=False)
    tcfg = TrainConfig(batch_size=4, accumulate_grad_batches=1,
                       learning_rate=1e-3, early_stopping_monitor=None)
    trainer = Trainer(cfg, tcfg, task="smp_multiclass", model=family,
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
