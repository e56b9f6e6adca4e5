"""Numeric parity of the JAX ViT-segmentation model vs the reference network.

The reference's network is `ViTSegmentationModel` = HF ViTModel backbone +
conv head + bilinear upsample (reference model/CE/classes.py:221-262). This
builds that exact torch module from HF transformers, converts its random-init
weights through ckpt/torch_convert.py, and asserts fp32 logits agree — the
strongest form of the SURVEY.md §7 "parity harness" requirement.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from visiontransformer_tpu.configs import ViTConfig, ViTSegConfig
from visiontransformer_tpu.ckpt.torch_convert import (
    convert_hf_vit_state,
    convert_vitseg_state,
)
from visiontransformer_tpu.models.vit import vit_apply
from visiontransformer_tpu.models.vitseg import vitseg_logits_nchw

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


# Small config: fast on the single-core CI CPU, same structure as the sweep's.
CFG = ViTConfig(image_size=32, patch_size=8, hidden_size=64,
                num_hidden_layers=2, num_attention_heads=4,
                intermediate_size=128)


def _hf_backbone():
    hf_cfg = transformers.ViTConfig(
        image_size=CFG.image_size, patch_size=CFG.patch_size, num_channels=3,
        hidden_size=CFG.hidden_size, num_hidden_layers=CFG.num_hidden_layers,
        num_attention_heads=CFG.num_attention_heads,
        intermediate_size=CFG.intermediate_size, qkv_bias=True,
        hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1,
        initializer_range=0.02)
    torch.manual_seed(0)
    return transformers.ViTModel(hf_cfg)


def test_backbone_matches_hf(rng):
    model = _hf_backbone().eval()
    params = convert_hf_vit_state(
        {k: v for k, v in model.state_dict().items()}, CFG)

    x = rng.standard_normal((2, 3, CFG.image_size, CFG.image_size)).astype(np.float32)
    with torch.no_grad():
        expected = model(torch.from_numpy(x)).last_hidden_state.numpy()

    got = np.asarray(vit_apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                               CFG, deterministic=True, attn_impl="xla"))
    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=1e-4)


class _TorchViTSeg(torch.nn.Module):
    """The reference network, assembled from HF + the same head shape
    (fresh construction — layer sizes per reference model/CE/classes.py:240-244)."""

    def __init__(self, backbone, num_classes):
        super().__init__()
        self.backbone = backbone
        hidden = backbone.config.hidden_size
        self.seg_head = torch.nn.Sequential(
            torch.nn.Conv2d(hidden, 256, kernel_size=3, padding=1),
            torch.nn.ReLU(),
            torch.nn.Conv2d(256, num_classes, kernel_size=1),
        )

    def forward(self, x):
        hidden_states = self.backbone(x).last_hidden_state[:, 1:, :]
        b, n, h = hidden_states.shape
        g = int(n ** 0.5)
        feats = hidden_states.transpose(1, 2).reshape(b, h, g, g)
        out = self.seg_head(feats)
        return torch.nn.functional.interpolate(
            out, size=x.shape[2:], mode="bilinear", align_corners=False)


def test_full_model_matches_reference_network(rng):
    num_classes = 5
    torch_model = _TorchViTSeg(_hf_backbone(), num_classes).eval()
    seg_cfg = ViTSegConfig(vit=CFG, num_classes=num_classes)
    params = convert_vitseg_state(
        {k: v for k, v in torch_model.state_dict().items()}, seg_cfg,
        backbone_prefix="backbone.", head_prefix="seg_head.")

    x = rng.standard_normal((2, 3, CFG.image_size, CFG.image_size)).astype(np.float32)
    with torch.no_grad():
        expected = torch_model(torch.from_numpy(x)).numpy()

    got = np.asarray(vitseg_logits_nchw(params, jnp.asarray(x), seg_cfg,
                                        deterministic=True, attn_impl="xla"))
    np.testing.assert_allclose(got, expected, atol=5e-5, rtol=1e-4)
    # And the argmax masks — the serving deliverable — must agree exactly.
    np.testing.assert_array_equal(got.argmax(axis=1), expected.argmax(axis=1))


def test_gradient_parity_with_torch(rng):
    """CE loss AND parameter gradients match the torch reference network
    (deterministic mode) — training dynamics parity, not just forward."""
    import torch.nn.functional as TF

    num_classes = 5
    # eval() disables every dropout (incl. HF's functional attention-probs
    # dropout, which ignores the nn.Dropout module's p); autograd still runs.
    torch_model = _TorchViTSeg(_hf_backbone(), num_classes).eval()
    seg_cfg = ViTSegConfig(vit=CFG, num_classes=num_classes)
    params = convert_vitseg_state(
        {k: v for k, v in torch_model.state_dict().items()}, seg_cfg,
        backbone_prefix="backbone.", head_prefix="seg_head.")

    x = rng.standard_normal((2, 3, CFG.image_size, CFG.image_size)).astype(np.float32)
    y = rng.integers(0, num_classes, (2, CFG.image_size, CFG.image_size))

    # torch loss + grads
    xt = torch.from_numpy(x).requires_grad_(False)
    yt = torch.from_numpy(y)
    logits_t = torch_model(xt)
    loss_t = TF.cross_entropy(logits_t, yt)
    loss_t.backward()

    # jax loss + grads
    import jax
    from visiontransformer_tpu.losses.basic import cross_entropy_loss

    def loss_fn(p):
        logits = vitseg_logits_nchw(p, jnp.asarray(x), seg_cfg,
                                    deterministic=True, attn_impl="xla")
        return cross_entropy_loss(jnp.transpose(logits, (0, 2, 3, 1)),
                                  jnp.asarray(y))

    loss_j, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss_j), float(loss_t.detach()),
                               rtol=1e-4)

    # compare a representative set of gradient tensors
    tg = {k: v.grad.numpy() for k, v in torch_model.named_parameters()
          if v.grad is not None}
    checks = [
        (grads["head_conv2"]["bias"], tg["seg_head.2.bias"]),
        (grads["head_conv1"]["kernel"],
         tg["seg_head.0.weight"].transpose(2, 3, 1, 0)),
        (grads["backbone"]["final_ln"]["scale"],
         tg["backbone.layernorm.weight"]),
        (grads["backbone"]["cls_token"], tg["backbone.embeddings.cls_token"]),
        (grads["backbone"]["layers"][0]["mlp_in"]["kernel"],
         tg["backbone.encoder.layer.0.intermediate.dense.weight"].T),
        (grads["backbone"]["layers"][1]["attn_out"]["kernel"],
         tg["backbone.encoder.layer.1.attention.output.dense.weight"].T),
        (grads["backbone"]["patch_embed"]["bias"],
         tg["backbone.embeddings.patch_embeddings.projection.bias"]),
    ]
    def assert_grad_close(got, expected):
        got = np.asarray(got, np.float64).reshape(-1)
        expected = np.asarray(expected, np.float64).reshape(-1)
        # Tensor-level relative error: robust to fp32 noise on the handful
        # of near-zero entries that defeat elementwise rtol.
        rel = (np.linalg.norm(got - expected)
               / max(np.linalg.norm(expected), 1e-12))
        assert rel < 1e-3, f"gradient relative error {rel:.2e}"

    for got, expected in checks:
        assert_grad_close(got, expected)

    # fused-QKV gradient vs the three separate torch grads
    qkv_grad = np.asarray(grads["backbone"]["layers"][0]["qkv"]["kernel"])
    h = CFG.hidden_size
    assert_grad_close(
        qkv_grad[:, :h],
        tg["backbone.encoder.layer.0.attention.attention.query.weight"].T)
    assert_grad_close(
        qkv_grad[:, 2 * h:],
        tg["backbone.encoder.layer.0.attention.attention.value.weight"].T)
