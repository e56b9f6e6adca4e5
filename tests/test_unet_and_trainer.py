"""UNet family, smp-style task, trainer resume, plateau wiring."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visiontransformer_tpu.configs import TrainConfig
from visiontransformer_tpu.models.unet import UNetConfig, unet_apply, unet_init
from visiontransformer_tpu.train import Trainer
from visiontransformer_tpu.train.tasks import smp_multiclass_loss_fn


def test_unet_shapes(rng):
    cfg = UNetConfig(encoder_name="small", num_classes=7)
    params = unet_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    logits = unet_apply(params, x, cfg)
    assert logits.shape == (2, 64, 64, 7)
    assert logits.dtype == jnp.float32


def test_unet_gradients_flow(rng):
    cfg = UNetConfig(encoder_name="small", num_classes=3, normalize=False)
    params = unet_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)

    def loss(p):
        return jnp.mean(unet_apply(p, x, cfg) ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree.leaves(
        {k: v for k, v in grads.items() if k not in ("norm_mean", "norm_std")})
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # every trainable leaf receives gradient signal somewhere
    nonzero = sum(float(jnp.abs(g).sum()) > 0 for g in leaves)
    assert nonzero > len(leaves) * 0.9


def test_smp_task_metrics(rng):
    cfg = UNetConfig(encoder_name="small", num_classes=4, normalize=False)
    params = unet_init(jax.random.PRNGKey(0), cfg)
    batch = {"image": jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32),
             "mask": jnp.asarray(rng.integers(0, 4, (2, 48, 48)), jnp.int32)}
    loss, metrics = smp_multiclass_loss_fn(params, batch, cfg,
                                           deterministic=True,
                                           apply_fn=unet_apply)
    assert np.isfinite(float(loss))
    for key in ("per_image_iou", "dataset_iou", "accuracy", "recall",
                "f1_score"):
        assert 0.0 <= float(metrics[key]) <= 1.0


class _ArrayDataset:
    def __init__(self, rng, n=8, size=32, num_classes=4):
        self.images = rng.random((n, size, size, 3)).astype(np.float32)
        self.masks = rng.integers(0, num_classes, (n, size, size)).astype(np.int32)

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i):
        return self.images[i], self.masks[i]


def test_trainer_unet_family_and_resume(rng, tmp_path):
    ds = _ArrayDataset(rng)
    cfg = UNetConfig(encoder_name="small", num_classes=4, normalize=False)
    tcfg = TrainConfig(batch_size=8, max_epochs=1, accumulate_grad_batches=1,
                       early_stopping_monitor=None, learning_rate=1e-3)
    ckpt_dir = str(tmp_path / "ckpts")
    trainer = Trainer(cfg, tcfg, task="smp_multiclass", model="unet")
    state = trainer.fit(ds, checkpoint_dir=ckpt_dir)
    assert int(state.step) == 1
    saved = os.listdir(ckpt_dir)
    assert any(name.startswith("epoch=0-step=1") for name in saved)

    # resume from the checkpoint directory: starts at epoch 1, keeps step
    trainer2 = Trainer(cfg, tcfg, task="smp_multiclass", model="unet")
    state2 = trainer2.fit(ds, checkpoint_dir=None, resume_from=ckpt_dir,
                          max_epochs=2)
    assert int(state2.step) == 2  # 1 restored + 1 new epoch of 1 step

    # restored params actually came from disk
    p_saved = np.asarray(state.params["head"]["kernel"])
    trainer3 = Trainer(cfg, tcfg, task="smp_multiclass", model="unet")
    s3 = trainer3.init_state()
    from visiontransformer_tpu.ckpt.io import (
        get_latest_checkpoint,
        restore_checkpoint,
    )
    restored = restore_checkpoint(get_latest_checkpoint(ckpt_dir),
                                  {"params": s3.params,
                                   "step": np.zeros((), np.int32)})
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["head"]["kernel"]), p_saved)


def test_vit_remat_grads_match(rng):
    """jax.checkpoint'd encoder must give identical grads to the plain one."""
    import dataclasses

    from visiontransformer_tpu.configs import ViTConfig, ViTSegConfig
    from visiontransformer_tpu.models.vitseg import vitseg_apply, vitseg_init

    base_vit = ViTConfig(image_size=32, patch_size=16, hidden_size=64,
                         num_hidden_layers=2, num_attention_heads=4,
                         intermediate_size=64)
    cfg = ViTSegConfig(vit=base_vit, num_classes=3)
    cfg_remat = dataclasses.replace(
        cfg, vit=dataclasses.replace(base_vit, remat=True))

    import jax
    import jax.numpy as jnp
    params = vitseg_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)

    def loss(p, c):
        return jnp.mean(vitseg_apply(p, x, c, deterministic=True,
                                     attn_impl="xla") ** 2)

    g_plain = jax.grad(lambda p: loss(p, cfg))(params)
    g_remat = jax.grad(lambda p: loss(p, cfg_remat))(params)
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_remat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)


def test_accumulation_is_mean_of_micro_gradients(rng):
    """train_step with accumulate_grad_batches=N applies Adam to the MEAN
    of the per-micro-batch gradients (Lightning's accumulate_grad_batches
    semantics, reference model/CE/createViTmodel.py:74) — pinned explicitly
    now that the add rides in the grad program's epilogue and the 1/N scale
    inside the update program."""
    import optax

    cfg = UNetConfig(encoder_name="small", num_classes=4, normalize=False)
    tcfg = TrainConfig(batch_size=8, accumulate_grad_batches=2,
                       early_stopping_monitor=None, learning_rate=1e-3)
    trainer = Trainer(cfg, tcfg, task="smp_multiclass", model="unet",
                      use_mesh=False)
    state = trainer.init_state()
    images = rng.random((8, 32, 32, 3)).astype(np.float32)
    masks = rng.integers(0, 4, (8, 32, 32)).astype(np.int32)
    batch = {"image": images, "mask": masks}
    key = jax.random.PRNGKey(5)

    # manual reference: mean of the two micro-batch grads -> one Adam step
    grad_step = trainer._build_grad_step()
    micro = {k: v[:4] for k, v in batch.items()}
    micro2 = {k: v[4:] for k, v in batch.items()}
    g0, _ = grad_step(state.params, micro, jax.random.fold_in(key, 0))
    g1, _ = grad_step(state.params, micro2, jax.random.fold_in(key, 1))
    mean_g = jax.tree.map(lambda a, b: (a + b) / 2, g0, g1)
    updates, _ = trainer.optimizer.update(mean_g, state.opt_state,
                                          state.params)
    want = optax.apply_updates(state.params, updates)

    got_state, _ = trainer.train_step(state, batch, key)
    for a, b in zip(jax.tree.leaves(got_state.params), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
