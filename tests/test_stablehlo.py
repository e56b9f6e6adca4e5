"""StableHLO serving-artifact export (ckpt/stablehlo.py, export-hlo CLI).

The artifact bakes trained weights into a serialized, platform-checked
serving program — the portable replacement for the reference's opaque
external model server (SURVEY §3.1)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visiontransformer_tpu.ckpt.stablehlo import (
    export_serving,
    load_serving,
)
from visiontransformer_tpu.configs import ViTConfig, ViTSegConfig
from visiontransformer_tpu.models import vitseg_apply, vitseg_init

TINY = ViTSegConfig(
    vit=ViTConfig(image_size=32, patch_size=16, hidden_size=64,
                  num_hidden_layers=2, num_attention_heads=4,
                  intermediate_size=128),
    num_classes=5)


def test_roundtrip_matches_direct_apply(tmp_path):
    params = vitseg_init(jax.random.PRNGKey(0), TINY)
    path = str(tmp_path / "model.stablehlo")
    meta = export_serving(params, TINY, out_path=path, batch_size=2)
    assert meta["input_size"] == 32 and meta["batch_size"] == 2
    assert meta["num_classes"] == 5 and meta["platforms"] == ["cpu"]

    art = load_serving(path)
    assert art.meta == meta
    images = jnp.asarray(
        np.random.default_rng(0).random((2, 32, 32, 3)), jnp.float32)
    got = np.asarray(art.call(images))

    logits = vitseg_apply(params, images, TINY, deterministic=True)
    expected = np.asarray(jnp.argmax(logits, -1).astype(jnp.uint8))
    np.testing.assert_array_equal(got, expected)
    assert got.dtype == np.uint8


def test_artifact_survives_without_params(tmp_path):
    """Weights are baked in: deleting the in-memory params doesn't matter,
    and two different param sets produce different artifacts."""
    p1 = vitseg_init(jax.random.PRNGKey(1), TINY)
    p2 = vitseg_init(jax.random.PRNGKey(2), TINY)
    a1, a2 = str(tmp_path / "a1.hlo"), str(tmp_path / "a2.hlo")
    export_serving(p1, TINY, out_path=a1, batch_size=1)
    export_serving(p2, TINY, out_path=a2, batch_size=1)
    del p1, p2
    images = jnp.asarray(
        np.random.default_rng(3).random((1, 32, 32, 3)), jnp.float32)
    m1 = np.asarray(load_serving(a1).call(images))
    m2 = np.asarray(load_serving(a2).call(images))
    assert m1.shape == m2.shape == (1, 32, 32)
    assert not np.array_equal(m1, m2)


def test_shape_mismatch_rejected(tmp_path):
    params = vitseg_init(jax.random.PRNGKey(0), TINY)
    path = str(tmp_path / "model.stablehlo")
    export_serving(params, TINY, out_path=path, batch_size=2)
    art = load_serving(path)
    with pytest.raises(ValueError, match="exported for shape"):
        art.call(jnp.zeros((4, 32, 32, 3), jnp.float32))


def test_bad_magic_rejected(tmp_path):
    path = str(tmp_path / "junk.bin")
    with open(path, "wb") as f:
        f.write(b"not an artifact")
    with pytest.raises(ValueError, match="bad magic"):
        load_serving(path)


def test_unet_family_requires_input_size(tmp_path):
    from visiontransformer_tpu.models.unet import UNetConfig, unet_init

    cfg = UNetConfig(encoder_name="resnet18", num_classes=3)
    params = unet_init(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="input_size"):
        export_serving(params, cfg, out_path=str(tmp_path / "u.hlo"),
                       family="unet", batch_size=1)
    path = str(tmp_path / "u.hlo")
    meta = export_serving(params, cfg, out_path=path, family="unet",
                          batch_size=1, input_size=32)
    assert meta["input_size"] == 32
    out = load_serving(path).call(
        jnp.zeros((1, 32, 32, 3), jnp.float32))
    assert np.asarray(out).shape == (1, 32, 32)


def test_export_hlo_cli(tmp_path):
    """export-hlo CLI end-to-end from an Orbax checkpoint, verified
    against the checkpoint's own forward."""
    from visiontransformer_tpu.ckpt.io import save_checkpoint
    from visiontransformer_tpu.cli import main as cli_main
    from visiontransformer_tpu.configs import sweep_by_name

    seg_cfg = sweep_by_name("P16H512A8").seg_config(num_classes=4)
    seg_cfg = dataclasses.replace(
        seg_cfg, vit=dataclasses.replace(seg_cfg.vit, image_size=32))
    params = vitseg_init(jax.random.PRNGKey(0), seg_cfg)
    ckpt_dir = str(tmp_path / "orbax")
    save_checkpoint(ckpt_dir, {"params": params, "step": np.asarray(5)},
                    epoch=1, step=5)

    out = str(tmp_path / "model.stablehlo")
    rc = cli_main(["export-hlo", "--ckpt", ckpt_dir,
                   "--config", "P16H512A8", "--num-classes", "4",
                   "--input-size", "32", "--batch", "2",
                   "--compute-dtype", "float32", "--out", out])
    assert rc == 0

    art = load_serving(out)
    images = jnp.asarray(
        np.random.default_rng(7).random((2, 32, 32, 3)), jnp.float32)
    got = np.asarray(art.call(images))
    cfg_f32 = dataclasses.replace(seg_cfg, compute_dtype="float32")
    logits = vitseg_apply(params, images, cfg_f32, deterministic=True)
    np.testing.assert_array_equal(
        got, np.asarray(jnp.argmax(logits, -1).astype(jnp.uint8)))
