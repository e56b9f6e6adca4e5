"""FSDP (ZeRO-3) tests on the 8-virtual-device backend.

The reference trains strictly single-device (devices=1, reference
model/CE/createViTmodel.py:73); fully-sharded data parallelism is part of
the TPU-native scaling layer: params, Adam moments and gradients sharded
over the "data" mesh axis (parallel/mesh.py:_fsdp_spec), with XLA inserting
the weight all-gathers and the trainer pinning gradient out_shardings so
the backward psum lowers to a reduce-scatter.
"""

import numpy as np
import pytest

import jax
from jax.sharding import PartitionSpec as P

from visiontransformer_tpu.configs import TrainConfig, ViTConfig, ViTSegConfig
from visiontransformer_tpu.models import vitseg_init
from visiontransformer_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    create_mesh,
    param_shardings,
)
from visiontransformer_tpu.train import Trainer

TINY = ViTSegConfig(
    vit=ViTConfig(image_size=32, patch_size=16, hidden_size=64,
                  num_hidden_layers=2, num_attention_heads=4,
                  intermediate_size=128),
    num_classes=5)


def _train_cfg(mesh_shape=None, **kw):
    return TrainConfig(batch_size=16, accumulate_grad_batches=2,
                       early_stopping_monitor=None, mesh_shape=mesh_shape,
                       **kw)


def _batch(bs=16):
    rng = np.random.default_rng(7)
    return {
        "image": rng.random((bs, 32, 32, 3)).astype(np.float32),
        "mask": rng.integers(0, 5, (bs, 48, 48)).astype(np.int32),
    }


def _one_step(trainer):
    state = trainer.init_state()
    state, metrics = trainer.train_step(state, _batch(),
                                        jax.random.PRNGKey(3))
    jax.block_until_ready(state.params)
    return state, metrics


def _named_leaves(tree):
    return {"/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                     for k in path): leaf
            for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]}


def test_fsdp_spec_layout(eight_devices):
    """Large leaves take DATA_AXIS on their largest free dp-divisible axis,
    composing with the Megatron TP layout; small leaves stay replicated."""
    mesh = create_mesh((4, 2), devices=eight_devices)
    params = vitseg_init(jax.random.PRNGKey(0), TINY)
    shardings = _named_leaves(param_shardings(mesh, params, fsdp=True,
                                              fsdp_min_size=0))
    # qkv kernel (64, 192): TP takes the output axis, FSDP the input axis.
    assert shardings["backbone/layers/0/qkv/kernel"].spec == P(DATA_AXIS, MODEL_AXIS)
    # attn_out kernel (64, 64): TP already took axis 0, FSDP takes axis 1.
    assert shardings["backbone/layers/0/attn_out/kernel"].spec == P(MODEL_AXIS,
                                                               DATA_AXIS)
    # LayerNorm scale (64,): 64 % 4 == 0, sharded when min_size=0 ...
    assert shardings["backbone/layers/0/ln1/scale"].spec == P(DATA_AXIS)
    # ... but replicated at the default threshold.
    default = _named_leaves(param_shardings(mesh, params, fsdp=True))
    assert default["backbone/layers/0/ln1/scale"].spec == P()
    # fsdp=False reproduces the pure-TP layout.
    tp_only = _named_leaves(param_shardings(mesh, params))
    assert tp_only["backbone/layers/0/qkv/kernel"].spec == P(None, MODEL_AXIS)


@pytest.mark.parametrize("shape", [(8, 1), (4, 2)], ids=["fsdp8", "fsdp4xtp2"])
def test_fsdp_step_matches_single_device(eight_devices, shape):
    """A full FSDP train step (grad accumulation ×2, dropout, Adam) computes
    the same math as the unsharded single-device step."""
    ref_trainer = Trainer(TINY, _train_cfg(), task="ce", use_mesh=False)
    ref_state, ref_metrics = _one_step(ref_trainer)

    mesh = create_mesh(shape, devices=eight_devices)
    trainer = Trainer(TINY, _train_cfg(shape, fsdp=True, fsdp_min_size=0),
                      task="ce", mesh=mesh)
    state, metrics = _one_step(trainer)

    assert float(metrics["loss"]) == pytest.approx(
        float(ref_metrics["loss"]), rel=1e-5)
    ref_leaves = jax.tree.leaves(ref_state.params)
    got_leaves = jax.tree.leaves(state.params)
    assert len(ref_leaves) == len(got_leaves)
    for ref, got in zip(ref_leaves, got_leaves):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)


def test_fsdp_state_stays_sharded_across_steps(eight_devices):
    """Params AND Adam moments live dp-sharded (each device holds 1/dp of
    every large leaf) and remain so after two optimizer steps — the ZeRO
    memory law, not just a transient initial placement."""
    dp = 8
    mesh = create_mesh((dp, 1), devices=eight_devices)
    trainer = Trainer(TINY, _train_cfg((dp, 1), fsdp=True, fsdp_min_size=0),
                      task="ce", mesh=mesh)
    state = trainer.init_state()
    for i in range(2):
        state, metrics = trainer.train_step(state, _batch(),
                                            jax.random.PRNGKey(i))
    jax.block_until_ready(state.params)
    assert np.isfinite(float(metrics["loss"]))

    kernel = _named_leaves(state.params)["backbone/layers/0/qkv/kernel"]
    assert kernel.sharding.spec[0] == DATA_AXIS
    shard = kernel.addressable_shards[0]
    assert shard.data.shape[0] == kernel.shape[0] // dp

    # Adam moments mirror the param placement (ZeRO-3 optimizer sharding).
    mu_leaves = [leaf for leaf in jax.tree.leaves(state.opt_state)
                 if hasattr(leaf, "sharding") and leaf.shape == kernel.shape]
    assert mu_leaves, "no Adam moment with the qkv kernel's shape found"
    for m in mu_leaves:
        assert m.sharding.spec[0] == DATA_AXIS
        assert m.addressable_shards[0].data.shape[0] == kernel.shape[0] // dp
