"""Checkpoint resume restores optimizer state (Lightning fit(ckpt_path=...)
semantics, reference model/CE/trainCurrentViTmodel.py:73 — Lightning restores
Adam moments; params-only checkpoints from older saves degrade gracefully to
fresh moments)."""

import numpy as np

import jax

from visiontransformer_tpu.ckpt.io import (
    get_latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from visiontransformer_tpu.configs import TrainConfig
from visiontransformer_tpu.models.unet import UNetConfig
from visiontransformer_tpu.train import Trainer


class _ArrayDataset:
    def __init__(self, rng, n=8, size=32, num_classes=4):
        self.images = rng.random((n, size, size, 3)).astype(np.float32)
        self.masks = rng.integers(0, num_classes,
                                  (n, size, size)).astype(np.int32)

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i):
        return self.images[i], self.masks[i]


def _cfgs():
    cfg = UNetConfig(encoder_name="small", num_classes=4, normalize=False)
    tcfg = TrainConfig(batch_size=8, max_epochs=1, accumulate_grad_batches=1,
                       early_stopping_monitor=None, learning_rate=1e-3)
    return cfg, tcfg


def test_resume_restores_adam_moments(rng, tmp_path):
    ds = _ArrayDataset(rng)
    cfg, tcfg = _cfgs()
    ckpt_dir = str(tmp_path / "ckpts")
    trainer = Trainer(cfg, tcfg, task="smp_multiclass", model="unet")
    state = trainer.fit(ds, checkpoint_dir=ckpt_dir)

    # Resume into a FRESH trainer: fit with max_epochs=1 restores and exits
    # the loop immediately (start_epoch == max_epochs), returning the
    # restored state untouched.
    trainer2 = Trainer(cfg, tcfg, task="smp_multiclass", model="unet")
    state2 = trainer2.fit(ds, resume_from=ckpt_dir, max_epochs=1)
    assert int(state2.step) == int(state.step) == 1

    saved_leaves = jax.tree.leaves(state.opt_state)
    restored_leaves = jax.tree.leaves(state2.opt_state)
    assert len(saved_leaves) == len(restored_leaves)
    moments_restored = 0
    for saved, got in zip(saved_leaves, restored_leaves):
        np.testing.assert_allclose(np.asarray(got), np.asarray(saved),
                                   rtol=1e-6, atol=0)
        if float(np.abs(np.asarray(saved)).sum()) > 0:
            moments_restored += 1
    # After one real step the Adam mu/nu moments are nonzero — proving the
    # comparison above is not vacuous.
    assert moments_restored > 2


def test_resume_params_only_checkpoint_keeps_fresh_moments(rng, tmp_path):
    """Old-format checkpoints ({params, step} without opt_state) still load;
    moments fall back to zeros instead of crashing."""
    ds = _ArrayDataset(rng)
    cfg, tcfg = _cfgs()
    trainer = Trainer(cfg, tcfg, task="smp_multiclass", model="unet")
    state = trainer.init_state()
    save_checkpoint(str(tmp_path), {"params": state.params,
                                    "step": np.asarray(7, np.int32)},
                    epoch=3, step=7)

    trainer2 = Trainer(cfg, tcfg, task="smp_multiclass", model="unet")
    state2 = trainer2.fit(ds, resume_from=str(tmp_path), max_epochs=1)
    assert int(state2.step) == 7
    # inner Adam moments are fresh zeros
    inner = state2.opt_state.inner_state if hasattr(
        state2.opt_state, "inner_state") else state2.opt_state
    mus = [leaf for leaf in jax.tree.leaves(inner)
           if hasattr(leaf, "shape") and np.asarray(leaf).ndim > 0]
    assert all(float(np.abs(np.asarray(m)).sum()) == 0 for m in mus)


def test_restore_is_shard_aware_under_mesh(rng, tmp_path):
    """Restoring under an FSDP mesh lands every leaf directly on its target
    sharding — Orbax reads per-device shards from the zarr store; no leaf is
    materialized fully replicated (VERDICT r2 item 6). Exercises the PARTIAL
    path (target has a key absent on disk) — the path that used to
    host-materialize everything."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from visiontransformer_tpu.parallel.mesh import create_mesh

    mesh = create_mesh((8, 1))
    sh = NamedSharding(mesh, P("data"))
    big = jax.device_put(
        jnp.asarray(rng.random((16, 64), np.float32)), sh)
    assert not big.sharding.is_fully_replicated
    save_checkpoint(str(tmp_path), {"params": {"w": big}}, epoch=0, step=1)

    target_big = jax.device_put(jnp.zeros((16, 64), jnp.float32), sh)
    restored = restore_checkpoint(
        get_latest_checkpoint(str(tmp_path)),
        {"params": {"w": target_big},
         "opt_state": {"mu": target_big}})  # absent on disk -> partial path

    got = restored["params"]["w"]
    assert got.sharding == sh and not got.sharding.is_fully_replicated
    # Each device holds exactly its 1/8 row-shard, never the full array.
    assert got.addressable_shards[0].data.shape == (2, 64)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(big))
    assert restored["opt_state"]["mu"] is target_big  # kept, not restored


def test_partial_restore_new_ckpt_old_target(rng, tmp_path):
    """The reverse direction: a {params, opt_state, step} checkpoint loads
    onto a params-only target (eval-only consumers)."""
    cfg, tcfg = _cfgs()
    trainer = Trainer(cfg, tcfg, task="smp_multiclass", model="unet")
    state = trainer.fit(_ArrayDataset(rng),
                        checkpoint_dir=str(tmp_path / "c"))
    path = get_latest_checkpoint(str(tmp_path / "c"))
    fresh = trainer.init_state()
    restored = restore_checkpoint(path, {"params": fresh.params,
                                         "step": np.zeros((), np.int32)})
    assert int(restored["step"]) == 1
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["head"]["kernel"]),
        np.asarray(state.params["head"]["kernel"]))


def test_non_dict_rooted_checkpoint_clear_error(tmp_path):
    """A non-dict-rooted checkpoint with a dict target fails with the
    explicit 'not a dict-rooted tree' ValueError, not an AttributeError
    from metadata introspection."""
    import pytest

    from visiontransformer_tpu.ckpt.io import (
        restore_checkpoint as _restore,
        save_checkpoint as _save,
    )

    path = _save(str(tmp_path), [np.zeros((2,), np.float32)], epoch=0, step=0)
    with pytest.raises(ValueError, match="dict-rooted"):
        _restore(path, {"params": np.zeros((2,), np.float32)})
