"""Sequence-parallelism tests on the 8-virtual-device backend.

Megatron-style SP in the GSPMD formulation: the (B, N, H) residual stream is
constrained to P("data", "model") — tokens sharded over the TP axis — after
the embedding and after every encoder block (models/vit.py act_sharding),
so LayerNorm/dropout/residual regions compute on N/tp tokens per device and
XLA inserts the token all-gathers only where attention needs full sequence.
The reference has no distributed execution at all (SURVEY.md §2.6).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from visiontransformer_tpu.configs import TrainConfig, ViTConfig, ViTSegConfig
from visiontransformer_tpu.models import vitseg_apply, vitseg_init
from visiontransformer_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    create_mesh,
)
from visiontransformer_tpu.train import Trainer

TINY = ViTSegConfig(
    vit=ViTConfig(image_size=32, patch_size=16, hidden_size=64,
                  num_hidden_layers=2, num_attention_heads=4,
                  intermediate_size=128),
    num_classes=5)


def _batch(bs=16):
    rng = np.random.default_rng(7)
    return {
        "image": rng.random((bs, 32, 32, 3)).astype(np.float32),
        "mask": rng.integers(0, 5, (bs, 48, 48)).astype(np.int32),
    }


def test_act_sharding_forward_parity(eight_devices):
    """vitseg_apply with the SP residual-stream constraint is numerically
    identical to the unconstrained forward, and the constraint actually
    lands in the lowered program."""
    mesh = create_mesh((4, 2), devices=eight_devices)
    params = vitseg_init(jax.random.PRNGKey(0), TINY)
    x = jnp.asarray(np.random.default_rng(1).random((8, 32, 32, 3)),
                    jnp.float32)
    ref = jax.jit(lambda p, x: vitseg_apply(p, x, TINY))(params, x)

    sp = NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS))
    fn = jax.jit(lambda p, x: vitseg_apply(p, x, TINY, act_sharding=sp))
    np.testing.assert_allclose(np.asarray(fn(params, x)), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # The constraint survives into the lowered program: one
    # sharding-constraint op per re-assertion site (embed + 2 blocks),
    # tokens on the "model" axis. (Shardy spells it sdy.sharding_constraint;
    # pre-Shardy XLA used a Sharding custom-call.)
    lowered = fn.lower(params, x).as_text()
    n_constraints = lowered.count("sharding_constraint") + lowered.count(
        'custom_call_target = "Sharding"')
    assert n_constraints >= 1 + TINY.vit.num_hidden_layers, lowered[:2000]


def test_seq_parallel_train_step_matches_single_device(eight_devices):
    """A full dp4×tp2 train step with seq_parallel=True matches the
    unsharded single-device step (same loss and post-update params)."""
    cfg = TrainConfig(batch_size=16, accumulate_grad_batches=2,
                      early_stopping_monitor=None)
    ref_trainer = Trainer(TINY, cfg, task="ce", use_mesh=False)
    ref_state = ref_trainer.init_state()
    ref_state, ref_metrics = ref_trainer.train_step(
        ref_state, _batch(), jax.random.PRNGKey(3))

    mesh = create_mesh((4, 2), devices=eight_devices)
    sp_cfg = TrainConfig(batch_size=16, accumulate_grad_batches=2,
                         early_stopping_monitor=None, mesh_shape=(4, 2),
                         seq_parallel=True)
    trainer = Trainer(TINY, sp_cfg, task="ce", mesh=mesh)
    state = trainer.init_state()
    state, metrics = trainer.train_step(state, _batch(),
                                        jax.random.PRNGKey(3))

    assert float(metrics["loss"]) == pytest.approx(
        float(ref_metrics["loss"]), rel=1e-5)
    for ref, got in zip(jax.tree.leaves(ref_state.params),
                        jax.tree.leaves(state.params)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)


def test_seq_parallel_composes_with_fsdp(eight_devices):
    """SP + FSDP + TP in one mesh: the step still matches single-device."""
    cfg = TrainConfig(batch_size=16, accumulate_grad_batches=1,
                      early_stopping_monitor=None)
    ref_trainer = Trainer(TINY, cfg, task="ce", use_mesh=False)
    ref_state = ref_trainer.init_state()
    ref_state, ref_metrics = ref_trainer.train_step(
        ref_state, _batch(), jax.random.PRNGKey(3))

    mesh = create_mesh((4, 2), devices=eight_devices)
    all_cfg = TrainConfig(batch_size=16, accumulate_grad_batches=1,
                          early_stopping_monitor=None, mesh_shape=(4, 2),
                          seq_parallel=True, fsdp=True, fsdp_min_size=0)
    trainer = Trainer(TINY, all_cfg, task="ce", mesh=mesh)
    state = trainer.init_state()
    state, metrics = trainer.train_step(state, _batch(),
                                        jax.random.PRNGKey(3))
    assert float(metrics["loss"]) == pytest.approx(
        float(ref_metrics["loss"]), rel=1e-5)
    for ref, got in zip(jax.tree.leaves(ref_state.params),
                        jax.tree.leaves(state.params)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)
