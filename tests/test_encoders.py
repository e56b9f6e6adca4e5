"""Inverted-residual encoder presets (mobilenetv2 / efficientnet_b0).

smp's `create_model(arch, encoder_name, ...)` surface (reference
model/CE/classes.py:106-110) accepts timm/torchvision encoder names —
mobilenet_v2 and efficientnet-b0 are its most common lightweight picks.
These presets reproduce the block structure (expand→depthwise→project,
linear bottleneck; +SE/SiLU for MBConv) on the shared GroupNorm encoder,
so every conv family in models/registry.py can use them.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visiontransformer_tpu.models.registry import MODEL_FAMILIES
from visiontransformer_tpu.models.unet import (
    ENCODER_PRESETS,
    UNetConfig,
    _inverted_init,
    _inverted_apply,
    unet_apply,
    unet_init,
)


@pytest.mark.parametrize("encoder", ["mobilenetv2", "efficientnet_b0"])
@pytest.mark.parametrize("family", ["unet", "fpn"])
def test_inverted_encoders_run_all_families(encoder, family, rng):
    fam = MODEL_FAMILIES[family]
    cfg = fam.config_cls(encoder_name=encoder, num_classes=4)
    params = fam.init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    logits = fam.apply(params, x, cfg)
    assert logits.shape == (1, 64, 64, 4)
    assert np.isfinite(np.asarray(logits)).all()


def test_inverted_block_linear_bottleneck(rng):
    """Residual only at stride 1 / equal width; no activation after the
    projection (outputs can go negative — a ReLU there would be a bug)."""
    params = _inverted_init(jax.random.PRNGKey(0), 16, 16)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 16)), jnp.float32)
    out1 = _inverted_apply(params, x, groups=8, stride=1)
    assert out1.shape == x.shape
    assert float(jnp.min(out1)) < 0  # linear bottleneck, not ReLU-capped
    out2 = _inverted_apply(params, x, groups=8, stride=2)
    assert out2.shape == (1, 4, 4, 16)


def test_mbconv_has_se_and_it_gates(rng):
    """The SE branch exists for the mbconv kind and actually modulates the
    output (zeroing fc2 weights forces the gate to sigmoid(0)=0.5)."""
    params = _inverted_init(jax.random.PRNGKey(0), 8, 8, se=True)
    assert "se" in params
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 8)), jnp.float32)
    base = _inverted_apply(params, x, groups=8, stride=1)
    gated = dict(params)
    gated["se"] = jax.tree.map(jnp.zeros_like, params["se"])
    half = _inverted_apply(gated, x, groups=8, stride=1)
    assert not np.allclose(np.asarray(base), np.asarray(half))


def test_inverted_unet_trains(rng):
    cfg = UNetConfig(encoder_name="mobilenetv2", num_classes=3,
                     normalize=False)
    params = unet_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)

    def loss(p):
        return jnp.mean(unet_apply(p, x, cfg) ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree.leaves(
        {k: v for k, v in grads.items() if k not in ("norm_mean", "norm_std")})
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    nonzero = sum(float(jnp.abs(g).sum()) > 0 for g in leaves)
    assert nonzero > len(leaves) * 0.9


def test_preset_table_kinds():
    kinds = {name: preset[2] for name, preset in ENCODER_PRESETS.items()}
    assert kinds["mobilenetv2"] == "inverted"
    assert kinds["efficientnet_b0"] == "mbconv"
    assert kinds["resnet50"] == "bottleneck"
