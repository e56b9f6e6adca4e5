"""Multi-device mesh tests on the 8-virtual-CPU-device backend.

The reference trains strictly single-device (devices=1, reference
model/CE/createViTmodel.py:73; no collective anywhere — SURVEY.md §2.6);
these tests validate the TPU-native SPMD layer it lacks: the dp×tp
("data","model") mesh produces bit-comparable training to single-device,
the Megatron-style tensor-parallel param layout is what parallel/mesh.py
documents, and the multi-host helpers reject invalid topologies.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from visiontransformer_tpu.configs import TrainConfig, ViTConfig, ViTSegConfig
from visiontransformer_tpu.models import vitseg_init
from visiontransformer_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    create_mesh,
    param_shardings,
)
from visiontransformer_tpu.parallel.multihost import pod_mesh
from visiontransformer_tpu.train import Trainer

TINY = ViTSegConfig(
    vit=ViTConfig(image_size=32, patch_size=16, hidden_size=64,
                  num_hidden_layers=2, num_attention_heads=4,
                  intermediate_size=128),
    num_classes=5)


def _train_cfg(mesh_shape=None):
    # micro-batch 16/2 = 8 divides both the dp=4 and dp=8 data axes
    return TrainConfig(batch_size=16, accumulate_grad_batches=2,
                       early_stopping_monitor=None, mesh_shape=mesh_shape)


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


@pytest.fixture(scope="module")
def single_device_step():
    """Reference result: one full CE train step (grad accumulation ×2,
    dropout on, Adam update) without any mesh."""
    trainer = Trainer(TINY, _train_cfg(), task="ce", use_mesh=False)
    return _one_step(trainer)


@pytest.mark.parametrize("shape", [(4, 2), (8, 1)], ids=["dp4xtp2", "dp8"])
def test_mesh_step_matches_single_device(eight_devices, single_device_step,
                                         shape):
    """The sharded train step computes the same math as single-device: same
    loss and the same post-update params to fp32 reduction tolerance."""
    ref_state, ref_metrics = single_device_step
    mesh = create_mesh(shape, devices=eight_devices)
    trainer = Trainer(TINY, _train_cfg(shape), task="ce", mesh=mesh)
    state, metrics = _one_step(trainer)

    assert float(metrics["loss"]) == pytest.approx(
        float(ref_metrics["loss"]), rel=1e-5)
    ref_leaves = jax.tree.leaves(ref_state.params)
    got_leaves = jax.tree.leaves(state.params)
    assert len(ref_leaves) == len(got_leaves)
    for ref, got in zip(ref_leaves, got_leaves):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)


def test_second_step_with_sharded_moments(eight_devices):
    """Two consecutive steps on a dp×tp mesh: Adam moments stay sharded and
    the loss stays finite (exercises optimizer state placement end-to-end)."""
    mesh = create_mesh((4, 2), devices=eight_devices)
    trainer = Trainer(TINY, _train_cfg((4, 2)), task="ce", mesh=mesh)
    state = trainer.init_state()
    for i in range(2):
        state, metrics = trainer.train_step(state, _batch(),
                                            jax.random.PRNGKey(i))
    assert int(state.step) == 2
    assert np.isfinite(float(metrics["loss"]))


def test_param_shardings_megatron_layout(eight_devices):
    """QKV/MLP-in kernels split on the output axis, attn-out/MLP-out on the
    input axis (parallel/mesh.py:54-71); everything else replicated."""
    mesh = create_mesh((4, 2), devices=eight_devices)
    params = vitseg_init(jax.random.PRNGKey(0), TINY)
    shardings = param_shardings(mesh, params)

    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    checked = {"qkv_k": 0, "qkv_b": 0, "mlp_in_k": 0, "mlp_in_b": 0,
               "attn_out_k": 0, "mlp_out_k": 0, "other": 0}
    for path, sharding in flat:
        names = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
        spec = sharding.spec
        if "qkv" in names and names[-1] == "kernel":
            assert spec == P(None, MODEL_AXIS); checked["qkv_k"] += 1
        elif "qkv" in names and names[-1] == "bias":
            assert spec == P(MODEL_AXIS); checked["qkv_b"] += 1
        elif "mlp_in" in names and names[-1] == "kernel":
            assert spec == P(None, MODEL_AXIS); checked["mlp_in_k"] += 1
        elif "mlp_in" in names and names[-1] == "bias":
            # output-split layers shard their bias along with the kernel
            assert spec == P(MODEL_AXIS); checked["mlp_in_b"] += 1
        elif "attn_out" in names and names[-1] == "kernel":
            assert spec == P(MODEL_AXIS, None); checked["attn_out_k"] += 1
        elif "mlp_out" in names and names[-1] == "kernel":
            assert spec == P(MODEL_AXIS, None); checked["mlp_out_k"] += 1
        else:
            assert spec == P(); checked["other"] += 1
    # Both layers contributed and non-transformer params exist.
    n_layers = TINY.vit.num_hidden_layers
    for key in ("qkv_k", "qkv_b", "mlp_in_k", "mlp_in_b", "attn_out_k",
                "mlp_out_k"):
        assert checked[key] == n_layers, (key, checked)
    assert checked["other"] > 0


def test_batch_divisibility_error(eight_devices):
    mesh = create_mesh((8, 1), devices=eight_devices)
    with pytest.raises(ValueError, match="divisible"):
        Trainer(TINY,
                TrainConfig(batch_size=6, accumulate_grad_batches=1,
                            early_stopping_monitor=None),
                task="ce", mesh=mesh)


def test_create_mesh_shape_mismatch(eight_devices):
    with pytest.raises(ValueError, match="devices"):
        create_mesh((3, 2), devices=eight_devices)


def test_pod_mesh(eight_devices):
    mesh, dp = pod_mesh(tp=2)
    assert dict(mesh.shape) == {DATA_AXIS: 4, MODEL_AXIS: 2}
    assert dp == 4
    with pytest.raises(ValueError, match="divide"):
        pod_mesh(tp=3)
