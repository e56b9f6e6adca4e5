"""MiT (Mix Transformer) encoder: SegFormer's backbone (models/mit.py).

smp 0.4.0 canonically pairs the "segformer" arch with mit_b* encoders
(reference requirements.txt:58 pins smp 0.4.0; model/CE/classes.py:106-110
exposes the arch/encoder_name surface); these tests pin the native
implementation's stage geometry, attention math, and integration with the
segformer decode head.
"""

import numpy as np

import jax
import jax.numpy as jnp

from visiontransformer_tpu.models.mit import (
    MIT_PRESETS,
    _attn_apply,
    _attn_init,
    mit_encoder_apply,
    mit_encoder_init,
)
from visiontransformer_tpu.models.segformer import (
    SegformerConfig,
    segformer_apply,
    segformer_init,
)


def test_mit_stage_geometry(rng):
    """Four stages at OS-4/8/16/32 with the preset's embed dims."""
    keys = iter(jax.random.split(jax.random.PRNGKey(0), 2048))
    params = mit_encoder_init(keys, "mit_b0")
    x = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    feats = mit_encoder_apply(params, x, "mit_b0")
    dims = MIT_PRESETS["mit_b0"][0]
    assert [f.shape for f in feats] == [
        (2, 16, 16, dims[0]), (2, 8, 8, dims[1]),
        (2, 4, 4, dims[2]), (2, 2, 2, dims[3])]


def test_mit_attention_matches_naive_softmax(rng):
    """_attn_apply at sr=1, heads=1 is exactly softmax(QKᵀ/√d)V + proj —
    checked against a numpy oracle."""
    d = 16
    keys = iter(jax.random.split(jax.random.PRNGKey(1), 16))
    params = _attn_init(keys, d, sr_ratio=1)
    x = rng.random((1, 3, 3, d)).astype(np.float32)
    ours = np.asarray(_attn_apply(params, jnp.asarray(x), heads=1,
                                  sr_ratio=1))

    def lin(p, v):
        return v @ np.asarray(p["kernel"]) + np.asarray(p["bias"])

    t = x.reshape(1, 9, d)
    q, k, v = lin(params["q"], t), lin(params["k"], t), lin(params["v"], t)
    logits = (q @ k.transpose(0, 2, 1)) / np.sqrt(d)
    attn = np.exp(logits - logits.max(-1, keepdims=True))
    attn /= attn.sum(-1, keepdims=True)
    expect = lin(params["proj"], attn @ v).reshape(1, 3, 3, d)
    np.testing.assert_allclose(ours, expect, rtol=2e-4, atol=2e-5)


def test_mit_spatial_reduction_shrinks_kv(rng):
    """sr_ratio=2 keeps the output shape but the params carry the strided
    reduction conv (kernel = stride = sr), and the op still runs."""
    d = 16
    keys = iter(jax.random.split(jax.random.PRNGKey(2), 16))
    params = _attn_init(keys, d, sr_ratio=2)
    assert params["sr"]["kernel"].shape == (2, 2, d, d)
    x = jnp.asarray(rng.random((1, 6, 6, d)), jnp.float32)
    out = _attn_apply(params, x, heads=2, sr_ratio=2)
    assert out.shape == (1, 6, 6, d)


def test_mit_no_position_embedding_any_input_size(rng):
    """MiT's positional signal is the Mix-FFN depthwise conv, not a
    learned table — the same params must serve two different input sizes
    (the property that makes it serving-friendly)."""
    keys = iter(jax.random.split(jax.random.PRNGKey(0), 2048))
    params = mit_encoder_init(keys, "mit_b0")
    for size in (32, 64):
        x = jnp.asarray(rng.random((1, size, size, 3)), jnp.float32)
        feats = mit_encoder_apply(params, x, "mit_b0")
        assert feats[0].shape[1] == size // 4


def test_segformer_with_mit_encoder(rng):
    """segformer + mit_b0 end-to-end: full-resolution logits, finite
    gradients everywhere, four decode projections (OS-4..32)."""
    cfg = SegformerConfig(encoder_name="mit_b0", num_classes=5,
                          normalize=False)
    assert cfg.is_mit and len(cfg.level_channels) == 4
    params = segformer_init(jax.random.PRNGKey(0), cfg)
    assert len(params["proj"]) == 4
    x = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    logits = segformer_apply(params, x, cfg)
    assert logits.shape == (2, 64, 64, 5)
    assert logits.dtype == jnp.float32

    def loss(p):
        return jnp.mean(segformer_apply(p, x, cfg) ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree.leaves(
        {k: v for k, v in grads.items() if k not in ("norm_mean", "norm_std")})
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    nonzero = sum(float(jnp.abs(g).sum()) > 0 for g in leaves)
    assert nonzero > len(leaves) * 0.9


def test_segformer_conv_encoder_unchanged(rng):
    """The resnet path still works after the mit integration."""
    cfg = SegformerConfig(encoder_name="small", num_classes=4)
    assert not cfg.is_mit and len(cfg.level_channels) == 3
    params = segformer_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    assert segformer_apply(params, x, cfg).shape == (1, 64, 64, 4)


def test_mit_matches_hf_segformer(rng):
    """fp32 parity of all four stage outputs vs a live HF SegformerModel
    (mit_b0 geometry, random-init weights converted through
    convert_hf_segformer_state) — the same strongest-form parity evidence
    test_model_parity.py provides for the ViT backbone."""
    import pytest
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from visiontransformer_tpu.ckpt.torch_convert import (
        convert_hf_segformer_state,
    )

    dims, depths, heads, srs = MIT_PRESETS["mit_b0"]
    hf_cfg = transformers.SegformerConfig(
        num_channels=3, num_encoder_blocks=4, depths=list(depths),
        sr_ratios=list(srs), hidden_sizes=list(dims),
        num_attention_heads=list(heads), patch_sizes=[7, 3, 3, 3],
        strides=[4, 2, 2, 2], mlp_ratios=[4, 4, 4, 4],
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        drop_path_rate=0.0, reshape_last_stage=True)
    torch.manual_seed(0)
    model = transformers.SegformerModel(hf_cfg).eval()

    params = convert_hf_segformer_state(model.state_dict(), "mit_b0")
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        expected = model(torch.from_numpy(x),
                         output_hidden_states=True).hidden_states

    feats = mit_encoder_apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                              "mit_b0")
    assert len(expected) == len(feats) == 4
    for hf_nchw, ours_nhwc in zip(expected, feats):
        np.testing.assert_allclose(
            np.asarray(ours_nhwc).transpose(0, 3, 1, 2), hf_nchw.numpy(),
            atol=3e-5, rtol=1e-4)


def test_mit_preset_zoo(rng):
    """All six presets (b0-b5) init and run; params grow monotonically
    with the preset index (the paper's scaling axis is depth)."""
    counts = []
    for name in ("mit_b0", "mit_b1", "mit_b2", "mit_b3", "mit_b4", "mit_b5"):
        keys = iter(jax.random.split(jax.random.PRNGKey(0), 4096))
        params = mit_encoder_init(keys, name)
        counts.append(sum(int(np.prod(p.shape))
                          for p in jax.tree.leaves(params)))
    assert counts == sorted(counts) and len(set(counts)) == len(counts)
    x = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)
    feats = mit_encoder_apply(params, x, "mit_b5")
    assert feats[-1].shape == (1, 1, 1, 512)


def test_segformer_full_model_matches_hf(rng):
    """Full-model fp32 parity: HF SegformerForSemanticSegmentation
    (mit_b0 geometry) vs our segformer family with head_norm="affine"
    (folded inference BatchNorm) — encoder, all-MLP decode head, and the
    final bilinear upsample all agree, so real pretrained SegFormer
    checkpoints serve on TPU with exact numerics."""
    import pytest
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from visiontransformer_tpu.ckpt.torch_convert import (
        convert_hf_segformer_seg_state,
    )

    dims, depths, heads, srs = MIT_PRESETS["mit_b0"]
    hf_cfg = transformers.SegformerConfig(
        num_channels=3, num_encoder_blocks=4, depths=list(depths),
        sr_ratios=list(srs), hidden_sizes=list(dims),
        num_attention_heads=list(heads), patch_sizes=[7, 3, 3, 3],
        strides=[4, 2, 2, 2], mlp_ratios=[4, 4, 4, 4],
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        classifier_dropout_prob=0.0, drop_path_rate=0.0,
        decoder_hidden_size=64, num_labels=5)
    torch.manual_seed(0)
    model = transformers.SegformerForSemanticSegmentation(hf_cfg).eval()
    # Random running stats so the BatchNorm fold is actually exercised.
    with torch.no_grad():
        model.decode_head.batch_norm.running_mean.normal_(0, 0.5)
        model.decode_head.batch_norm.running_var.uniform_(0.5, 2.0)

    cfg = SegformerConfig(encoder_name="mit_b0", num_classes=5,
                          embed_channels=64, head_norm="affine",
                          normalize=False)
    params = convert_hf_segformer_seg_state(model.state_dict(), cfg)

    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(x)).logits  # OS-4
        expected = torch.nn.functional.interpolate(
            hf_logits, size=(64, 64), mode="bilinear",
            align_corners=False).numpy()

    got = np.asarray(segformer_apply(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)), cfg))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), expected,
                               atol=5e-5, rtol=1e-4)
    np.testing.assert_array_equal(got.argmax(-1),
                                  expected.argmax(1))


def test_resolve_model_loads_hf_pretrained_dir(rng, tmp_path):
    """resolve_model('segformer', ..., checkpoint_path=<HF save_pretrained
    dir>) loads real pretrained SegFormer weights: geometry/classes/width
    come from the HF config, the loaded params reproduce the direct
    converter output exactly."""
    import pytest
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from visiontransformer_tpu.ckpt.torch_convert import (
        convert_hf_segformer_seg_state,
    )
    from visiontransformer_tpu.models.registry import resolve_model

    dims, depths, heads, srs = MIT_PRESETS["mit_b0"]
    hf_cfg = transformers.SegformerConfig(
        num_channels=3, num_encoder_blocks=4, depths=list(depths),
        sr_ratios=list(srs), hidden_sizes=list(dims),
        num_attention_heads=list(heads), patch_sizes=[7, 3, 3, 3],
        strides=[4, 2, 2, 2], mlp_ratios=[4, 4, 4, 4],
        decoder_hidden_size=64, num_labels=7)
    torch.manual_seed(0)
    model = transformers.SegformerForSemanticSegmentation(hf_cfg).eval()
    model.save_pretrained(tmp_path / "hf_segformer")

    cfg, params = resolve_model("segformer", "mit_b0", num_classes=3,
                                checkpoint_path=str(tmp_path / "hf_segformer"))
    assert cfg.head_norm == "affine"
    assert cfg.num_classes == 7  # HF config wins over the CLI arg
    assert cfg.embed_channels == 64

    direct = convert_hf_segformer_seg_state(model.state_dict(), cfg)
    for got, want in zip(jax.tree.leaves(params), jax.tree.leaves(direct)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    x = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    logits = segformer_apply(params, x, cfg)
    assert logits.shape == (1, 64, 64, 7)
