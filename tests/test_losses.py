"""Loss parity vs fresh torch oracles implementing the published formulas."""

import numpy as np
import pytest

import jax.numpy as jnp

from visiontransformer_tpu.losses.basic import (
    binary_cross_entropy,
    cross_entropy_loss,
    dice_loss,
)
from visiontransformer_tpu.losses.paed import (
    paed_binary_total_loss,
    paed_loss_multiclass_soft,
    paed_loss_soft,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def test_cross_entropy_matches_torch(rng):
    logits = rng.standard_normal((2, 5, 8, 8)).astype(np.float32)  # NCHW
    targets = rng.integers(0, 5, (2, 8, 8))
    expected = F.cross_entropy(torch.from_numpy(logits),
                               torch.from_numpy(targets)).item()
    # Ours takes NHWC logits.
    got = float(cross_entropy_loss(jnp.asarray(logits.transpose(0, 2, 3, 1)),
                                   jnp.asarray(targets)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_bce_matches_torch(rng):
    probs = rng.random((2, 1, 16, 16)).astype(np.float32)
    targets = (rng.random((2, 1, 16, 16)) > 0.5).astype(np.float32)
    expected = F.binary_cross_entropy(torch.from_numpy(probs),
                                      torch.from_numpy(targets)).item()
    got = float(binary_cross_entropy(jnp.asarray(probs), jnp.asarray(targets)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_bce_extreme_probs():
    probs = jnp.asarray([0.0, 1.0, 0.5])
    targets = jnp.asarray([1.0, 0.0, 0.5])
    expected = F.binary_cross_entropy(
        torch.tensor([0.0, 1.0, 0.5]), torch.tensor([1.0, 0.0, 0.5])).item()
    got = float(binary_cross_entropy(probs, targets))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_dice_loss_matches_reference_formula(rng):
    preds = rng.random((2, 1, 16, 16)).astype(np.float32)
    targets = (rng.random((2, 1, 16, 16)) > 0.5).astype(np.float32)
    p, t = preds.reshape(-1), targets.reshape(-1)
    smooth = 1e-6
    expected = 1 - (2 * (p * t).sum() + smooth) / (p.sum() + t.sum() + smooth)
    got = float(dice_loss(jnp.asarray(preds), jnp.asarray(targets)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def _torch_paed_soft(sdf_ext, sdf_int, preds):
    """Oracle for the soft PAED loss (reference model/PAED/classes.py:623-661),
    written directly from the published formula in torch."""
    b = preds.shape[0]
    h, w = preds.shape[2:]
    ext = F.interpolate(sdf_ext.unsqueeze(1), size=(h, w), mode="bilinear",
                        align_corners=False)
    inner = F.interpolate(sdf_int.unsqueeze(1), size=(h, w), mode="bilinear",
                          align_corners=False)
    sobel_x = torch.tensor([[1., 0., -1.], [2., 0., -2.], [1., 0., -1.]]
                           ).view(1, 1, 3, 3)
    sobel_y = sobel_x.transpose(2, 3)
    gx = F.conv2d(preds, sobel_x, padding=1)
    gy = F.conv2d(preds, sobel_y, padding=1)
    edge = torch.sqrt(gx ** 2 + gy ** 2 + 1e-6)
    mx = edge.view(b, -1).max(dim=1)[0].view(b, 1, 1, 1) + 1e-6
    edge = edge / mx
    return (1.0 * (ext * edge).mean() - 0.5 * (inner * preds).mean()).item()


def test_paed_soft_matches_oracle(rng):
    preds = rng.random((2, 1, 32, 32)).astype(np.float32)
    sdf_ext = rng.random((2, 28, 28)).astype(np.float32)
    sdf_int = rng.random((2, 28, 28)).astype(np.float32)
    expected = _torch_paed_soft(torch.from_numpy(sdf_ext),
                                torch.from_numpy(sdf_int),
                                torch.from_numpy(preds))
    got = float(paed_loss_soft(jnp.asarray(sdf_ext), jnp.asarray(sdf_int),
                               jnp.asarray(preds.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-6)


def test_paed_binary_total_composition(rng):
    preds = rng.random((2, 1, 32, 32)).astype(np.float32)
    masks = (rng.random((2, 1, 32, 32)) > 0.7).astype(np.float32)
    sdf_ext = rng.random((2, 32, 32)).astype(np.float32)
    sdf_int = rng.random((2, 32, 32)).astype(np.float32)
    preds_j = jnp.asarray(preds.transpose(0, 2, 3, 1))
    masks_j = jnp.asarray(masks.transpose(0, 2, 3, 1))
    total, parts = paed_binary_total_loss(preds_j, masks_j,
                                          jnp.asarray(sdf_ext),
                                          jnp.asarray(sdf_int))
    expected = (float(parts["bce"]) + 0.1 * float(parts["dice"])
                + 5.0 * abs(float(parts["paed"])))
    np.testing.assert_allclose(float(total), expected, rtol=1e-5)


def _torch_paed_multiclass(msk, pred, sigma=3, class_penalty=True):
    """Oracle for paed_loss_multiclass_soft (reference classes.py:336-369),
    written from the formula with the full 2-D Gaussian conv."""
    c = msk.shape[1]
    size = int(6 * sigma + 1)
    x = torch.arange(size).float() - size // 2
    g = torch.exp(-(x ** 2) / (2 * sigma ** 2))
    k2 = g[:, None] * g[None, :]
    k2 = (k2 / k2.sum()).view(1, 1, size, size).repeat(c, 1, 1, 1)
    ms = F.conv2d(msk, k2, padding=size // 2, groups=c)
    ps = F.conv2d(pred, k2, padding=size // 2, groups=c)
    base = (ms - ps).abs()
    if class_penalty:
        dist = (msk * (1 - pred) * base * 2).mean(dim=[2, 3])
    else:
        dist = base.mean(dim=[2, 3])
    return dist.mean(dim=1).mean().item()


@pytest.mark.parametrize("class_penalty", [True, False])
def test_paed_multiclass_matches_oracle(rng, class_penalty):
    num_classes = 4
    gt = rng.integers(0, num_classes, (2, 32, 32))
    msk = np.eye(num_classes, dtype=np.float32)[gt]  # (B, H, W, C) one-hot
    logits = rng.standard_normal((2, 32, 32, num_classes)).astype(np.float32)
    pred = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)

    expected = _torch_paed_multiclass(
        torch.from_numpy(msk.transpose(0, 3, 1, 2)),
        torch.from_numpy(pred.transpose(0, 3, 1, 2)),
        class_penalty=class_penalty)
    got = float(paed_loss_multiclass_soft(jnp.asarray(msk), jnp.asarray(pred),
                                          class_penalty=class_penalty))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-7)


def test_paed_anchored_task(rng):
    """CE-anchored multiclass PAED task: loss decomposes into its parts,
    the hard (argmax) IoU metric is well-formed, and gradients flow."""
    import jax

    from visiontransformer_tpu.configs import ViTConfig, ViTSegConfig
    from visiontransformer_tpu.models.vitseg import vitseg_init
    from visiontransformer_tpu.train.tasks import get_task

    vit = ViTConfig(image_size=32, patch_size=16, hidden_size=32,
                    num_hidden_layers=1, num_attention_heads=2,
                    intermediate_size=64)
    cfg = ViTSegConfig(vit=vit, num_classes=3)
    params = vitseg_init(jax.random.PRNGKey(0), cfg)
    batch = {
        "image": jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32),
        "mask": jnp.asarray(rng.integers(0, 3, (2, 32, 32)), jnp.int32),
    }
    fn = get_task("paed_anchored")
    (loss, metrics), grads = jax.value_and_grad(
        lambda p: fn(p, batch, cfg, deterministic=True), has_aux=True)(params)

    np.testing.assert_allclose(float(loss),
                               float(metrics["ce"]) + float(metrics["paed"]),
                               rtol=1e-6)
    assert 0.0 <= float(metrics["hard_iou"]) <= 1.0
    assert 0.0 <= float(metrics["iou"]) <= 1.0
    # The CE anchor keeps gradients alive even where the PAED term saturates.
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0.0
