"""W8A8 int8 quantization (ops/quant.py + the linear dispatch in
nn/layers.py): numerics, pytree form, registry validation, and the
serving opt-in end to end.

The reference has no quantization (fp32 eager torch serving,
model/CE/testViTModel.py:117-126); this is a beyond-reference serving
knob, registered per model like token_merge_r.
"""

import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visiontransformer_tpu.configs import ViTConfig, ViTSegConfig
from visiontransformer_tpu.models import vitseg_apply, vitseg_init
from visiontransformer_tpu.nn.layers import linear, linear_init
from visiontransformer_tpu.nn.layers import conv2d, conv2d_init
from visiontransformer_tpu.ops.quant import (
    QUANTIZED_LAYER_KEYS,
    is_quantized,
    quantize_conv_params,
    quantize_linear_params,
    quantize_params_tree,
    quantize_vitseg_params,
    tree_is_quantized,
)

TINY = ViTSegConfig(
    vit=ViTConfig(image_size=32, patch_size=8, hidden_size=64,
                  num_hidden_layers=2, num_attention_heads=2,
                  intermediate_size=128),
    num_classes=5, compute_dtype="float32")


def test_quantized_linear_matches_fp32_within_tolerance():
    key = jax.random.PRNGKey(0)
    p = linear_init(key, 64, 96, std=0.05)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 7, 64))
    ref = linear(p, x)
    q = linear(quantize_linear_params(p), x)
    # 8-bit symmetric weights + 8-bit per-token activations: relative error
    # bounded by the two quantization steps (~1/127 each).
    err = float(jnp.max(jnp.abs(ref - q)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    assert err < 0.05, err
    assert q.dtype == ref.dtype


def test_quantized_linear_bf16_activations():
    p = quantize_linear_params(linear_init(jax.random.PRNGKey(0), 32, 32))
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 32), jnp.bfloat16)
    y = linear(p, x)
    assert y.dtype == jnp.bfloat16


def test_quantize_vitseg_params_form_and_forward_agreement():
    params = vitseg_init(jax.random.PRNGKey(0), TINY)
    qparams = quantize_vitseg_params(params)
    assert is_quantized(qparams) and not is_quantized(params)
    # Original pytree untouched; quantized layers swap kernel -> kernel_q.
    for layer, qlayer in zip(params["backbone"]["layers"],
                             qparams["backbone"]["layers"]):
        for k in QUANTIZED_LAYER_KEYS:
            assert "kernel" in layer[k] and "kernel_q" in qlayer[k]
            assert qlayer[k]["kernel_q"].dtype == jnp.int8
            assert (qlayer[k]["kernel_scale"].shape
                    == (layer[k]["kernel"].shape[1],))
        assert "kernel_q" not in qlayer.get("ln1", {})
    assert "kernel_q" not in qparams["backbone"]["patch_embed"]

    x = jnp.asarray(np.random.default_rng(0).random((2, 32, 32, 3)),
                    jnp.float32)
    ref = vitseg_apply(params, x, TINY)
    q = jax.jit(lambda p, x: vitseg_apply(p, x, TINY))(qparams, x)
    err = float(jnp.max(jnp.abs(ref - q)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    assert err < 0.05, err
    # Random init is the argmax worst case (near-tie logits everywhere);
    # trained models measure >=0.995 (scripts/quant_quality.py).
    agree = float(jnp.mean(jnp.argmax(ref, -1) == jnp.argmax(q, -1)))
    assert agree > 0.9, agree


def test_quantized_conv_matches_fp32_within_tolerance():
    key = jax.random.PRNGKey(0)
    p = conv2d_init(key, 32, 48, 3, std=0.05)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 32))
    ref = conv2d(p, x, stride=2)
    q = conv2d(quantize_conv_params(p), x, stride=2)
    err = float(jnp.max(jnp.abs(ref - q)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    assert err < 0.05, err
    assert q.dtype == ref.dtype and q.shape == ref.shape


def test_quantized_conv_dilation_matches_fp32():
    """Atrous convs (DeepLab ASPP) go through the same int8 dispatch."""
    p = conv2d_init(jax.random.PRNGKey(2), 16, 24, 3, std=0.05)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 16))
    ref = conv2d(p, x, dilation=2)
    q = conv2d(quantize_conv_params(p), x, dilation=2)
    err = float(jnp.max(jnp.abs(ref - q)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    assert err < 0.05, err


def test_quantize_params_tree_unet_policy_and_agreement():
    """Generic walk on a conv family: stem/head stay fp (skip keys),
    depthwise-free interior convs quantize, forward stays close."""
    from visiontransformer_tpu.models.unet import (
        UNetConfig,
        unet_apply,
        unet_init,
    )

    cfg = UNetConfig(encoder_name="small", num_classes=5,
                     decoder_channels=(64, 32, 16, 8))
    params = unet_init(jax.random.PRNGKey(0), cfg)
    qparams = quantize_params_tree(params)
    assert tree_is_quantized(qparams) and not tree_is_quantized(params)
    # Policy: stem and head untouched; an interior encoder conv quantized.
    assert "kernel" in qparams["stem"] and "kernel_q" not in qparams["stem"]
    assert "kernel" in qparams["head"] and "kernel_q" not in qparams["head"]
    stage0 = qparams["stages"][0][0] if "stages" in qparams else None
    flat_q = [d for d in jax.tree.leaves(
        jax.tree.map(lambda x: x, qparams),
        is_leaf=lambda n: isinstance(n, dict) and "kernel_q" in n)
        if isinstance(d, dict)]
    assert flat_q, "no interior conv was quantized"
    del stage0

    x = jnp.asarray(np.random.default_rng(0).random((1, 64, 64, 3)),
                    jnp.float32)
    ref = unet_apply(params, x, cfg)
    q = jax.jit(lambda p, x: unet_apply(p, x, cfg))(qparams, x)
    err = float(jnp.max(jnp.abs(ref - q)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    assert err < 0.08, err
    agree = float(jnp.mean(jnp.argmax(ref, -1) == jnp.argmax(q, -1)))
    assert agree > 0.85, agree  # random-init worst case


def test_quantize_params_tree_skips_depthwise_and_input_convs():
    """MiT/segformer: depthwise (I==1) and RGB-facing convs stay fp,
    linears quantize, the forward still runs."""
    from visiontransformer_tpu.models.segformer import (
        SegformerConfig,
        segformer_apply,
        segformer_init,
    )

    cfg = SegformerConfig(encoder_name="mit_b0", num_classes=4)
    params = segformer_init(jax.random.PRNGKey(0), cfg)
    qparams = quantize_params_tree(params)
    assert tree_is_quantized(qparams)
    enc = qparams["encoder"] if "encoder" in qparams else qparams
    stages = enc["stages"]
    # Stage 1 embed conv sees RGB (cin=3): must stay fp.
    assert "kernel" in stages[0]["embed"]
    # Later-stage embeds are interior convs: quantized.
    assert "kernel_q" in stages[1]["embed"]
    # Mix-FFN depthwise keeps its fp kernel; its linears quantize.
    blk = stages[0]["blocks"][0]
    assert "kernel" in blk["ffn"]["dw"]
    assert "kernel_q" in blk["ffn"]["fc1"]

    x = jnp.asarray(np.random.default_rng(1).random((1, 64, 64, 3)),
                    jnp.float32)
    out = jax.jit(lambda p, x: segformer_apply(p, x, cfg))(qparams, x)
    assert out.shape == (1, 64, 64, 4)


def test_quantize_rejects_stacked_pipeline_params():
    params = vitseg_init(jax.random.PRNGKey(0), TINY)
    stacked = dict(params)
    stacked["backbone"] = dict(params["backbone"])
    stacked["backbone"]["layers"] = jax.tree.map(
        lambda *xs: jnp.stack(xs), *params["backbone"]["layers"])
    with pytest.raises(ValueError, match="per-layer list"):
        quantize_vitseg_params(stacked)


def test_is_quantized_layout_independent():
    """is_quantized answers for conv-family trees too (it delegates to the
    generic tree walk), not just the vitseg backbone layout."""
    from visiontransformer_tpu.models.unet import UNetConfig, unet_init

    cfg = UNetConfig(encoder_name="small", num_classes=5,
                     decoder_channels=(64, 32, 16, 8))
    params = unet_init(jax.random.PRNGKey(0), cfg)
    assert not is_quantized(params)
    assert is_quantized(quantize_params_tree(params))


def test_trainer_rejects_quantized_params():
    """W8A8 kernels have zero gradient (round/clip) — the Trainer must
    refuse to train them rather than silently learn nothing."""
    from visiontransformer_tpu.configs import TrainConfig
    from visiontransformer_tpu.train.state import TrainState
    from visiontransformer_tpu.train.trainer import Trainer

    trainer = Trainer(TINY, TrainConfig(batch_size=2, max_epochs=1,
                                        accumulate_grad_batches=1),
                      use_mesh=False)
    state = trainer.init_state()
    qstate = TrainState(params=quantize_vitseg_params(state.params),
                        opt_state=state.opt_state, step=state.step)
    batch = {"image": jnp.zeros((2, 32, 32, 3), jnp.float32),
             "mask": jnp.zeros((2, 32, 32), jnp.int32)}
    with pytest.raises(ValueError, match="inference-only"):
        trainer.train_step(qstate, batch, jax.random.PRNGKey(0))


def test_registry_validation_and_serving_opt_in(tmp_path):
    """quantize='int8' persists through the registry for any family, and
    the runner serves a job end to end on quantized params (mirrors the
    ToMe opt-in test)."""
    from PIL import Image

    from visiontransformer_tpu.serve.store import JobStore
    from visiontransformer_tpu.serve.worker import InferenceWorker, ModelRunner

    store = JobStore(":memory:", media_root=str(tmp_path / "media"))
    with pytest.raises(ValueError, match="quantize"):
        store.register_model("bad2", num_classes=4, config_name="P16H512A8",
                             quantize="int4")

    mid = store.register_model("vit-int8", num_classes=4,
                               config_name="P16H512A8", input_size=32,
                               quantize="int8")
    row = store.get_model(mid)
    assert row["quantize"] == "int8"
    runner = ModelRunner(row, compute_dtype="float32", buckets=(1,))
    assert is_quantized(runner.params)

    img = tmp_path / "in.png"
    Image.fromarray(np.full((32, 32, 3), 120, np.uint8)).save(img)
    worker = InferenceWorker(store, compute_dtype="float32",
                             poll_interval=0.005, linger=0.0)
    try:
        job = store.create_job(None, mid, str(img))
        worker.start()
        deadline = time.time() + 120
        while time.time() < deadline:
            detail = store.get_job(job["id"])
            if detail["status"] in ("DONE", "FAILED"):
                break
            time.sleep(0.1)
        assert detail["status"] == "DONE", detail
    finally:
        worker.stop()
