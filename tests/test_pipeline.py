"""Pipeline-parallelism tests on the 8-virtual-device backend.

The reference trains strictly single-device (devices=1, reference
model/CE/createViTmodel.py:73); parallel/pipeline.py is part of the
TPU-native scaling layer it lacks: a GPipe schedule written with
shard_map + ppermute over a ("data","stage") mesh. These tests pin the
schedule's correctness — bit-exact forward vs the sequential layer loop,
gradient parity through scan/ppermute transposes, and dp×pp composition.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visiontransformer_tpu.configs import ViTConfig, ViTSegConfig
from visiontransformer_tpu.models import vitseg_apply, vitseg_init
from visiontransformer_tpu.models.vitseg import vitseg_apply_pipelined
from visiontransformer_tpu.parallel.pipeline import (
    create_pipeline_mesh,
    pipeline_apply,
    stack_stage_params,
)

TINY = ViTSegConfig(
    vit=ViTConfig(image_size=32, patch_size=16, hidden_size=64,
                  num_hidden_layers=4, num_attention_heads=4,
                  intermediate_size=128),
    num_classes=5)


def _toy_layers(n=8, d=16):
    rng = np.random.default_rng(0)
    return [{"w": jnp.asarray(rng.normal(0, 0.3, (d, d)), jnp.float32),
             "b": jnp.asarray(rng.normal(0, 0.1, (d,)), jnp.float32)}
            for _ in range(n)]


def _toy_layer_fn(lp, y):
    return jnp.tanh(y @ lp["w"] + lp["b"])


def _toy_ref(layers, x):
    for lp in layers:
        x = _toy_layer_fn(lp, x)
    return x


@pytest.mark.parametrize("shape,m", [((1, 8), 4), ((2, 4), 6), ((4, 2), 3)],
                         ids=["pp8", "dp2xpp4", "dp4xpp2"])
def test_pipeline_forward_matches_sequential(eight_devices, shape, m):
    """The GPipe schedule computes exactly the sequential layer stack for
    every dp×pp split of 8 devices and microbatch counts ≥/=/< stages."""
    layers = _toy_layers()
    x = jnp.asarray(np.random.default_rng(1).normal(0, 1, (12, 5, 16)),
                    jnp.float32)
    mesh = create_pipeline_mesh(shape, devices=eight_devices)
    out = jax.jit(lambda s, x: pipeline_apply(
        x, s, _toy_layer_fn, mesh=mesh, n_microbatches=m))(
            stack_stage_params(layers), x)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(_toy_ref(layers, x)))


def test_pipeline_gradients_match(eight_devices):
    """jax.grad through the pipeline (scan + ppermute + where transposes)
    equals the sequential gradients, including the cross-"data" psum for
    the stage-sharded params."""
    layers = _toy_layers()
    x = jnp.asarray(np.random.default_rng(1).normal(0, 1, (12, 5, 16)),
                    jnp.float32)
    mesh = create_pipeline_mesh((2, 4), devices=eight_devices)
    stacked = stack_stage_params(layers)

    g_pipe = jax.jit(jax.grad(lambda s: jnp.sum(pipeline_apply(
        x, s, _toy_layer_fn, mesh=mesh, n_microbatches=6) ** 2)))(stacked)
    g_ref = stack_stage_params(jax.grad(
        lambda ls: jnp.sum(_toy_ref(ls, x) ** 2))(layers))
    for a, b in zip(jax.tree.leaves(g_pipe), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_vitseg_pipelined_matches_plain(eight_devices):
    """The full segmentation model with a pipelined backbone reproduces
    vitseg_apply bit-for-bit, and a CE-style gradient matches too."""
    params = vitseg_init(jax.random.PRNGKey(0), TINY)
    x = jnp.asarray(np.random.default_rng(1).random((8, 32, 32, 3)),
                    jnp.float32)
    mesh = create_pipeline_mesh((2, 4), devices=eight_devices)

    ref = jax.jit(lambda p, x: vitseg_apply(p, x, TINY))(params, x)
    out = jax.jit(lambda p, x: vitseg_apply_pipelined(
        p, x, TINY, mesh=mesh, n_microbatches=4))(params, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    y = jnp.asarray(np.random.default_rng(2).integers(0, 5, (8, 32, 32)),
                    jnp.int32)

    def ce(logits):
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(logp, y[..., None], -1))

    g_ref = jax.grad(lambda p: ce(vitseg_apply(p, x, TINY)))(params)
    g_pipe = jax.jit(jax.grad(lambda p: ce(vitseg_apply_pipelined(
        p, x, TINY, mesh=mesh, n_microbatches=4))))(params)
    for a, b in zip(jax.tree.leaves(g_pipe), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


NODROP = ViTSegConfig(
    vit=ViTConfig(image_size=32, patch_size=16, hidden_size=64,
                  num_hidden_layers=4, num_attention_heads=4,
                  intermediate_size=128, hidden_dropout_prob=0.0,
                  attention_probs_dropout_prob=0.0),
    num_classes=5)


def _ce_batch(n=16):
    r = np.random.default_rng(0)
    return {"image": r.random((n, 32, 32, 3)).astype(np.float32),
            "mask": r.integers(0, 5, (n, 32, 32)).astype(np.int32)}


def test_pipeline_trainer_full_step_matches_single_device(eight_devices):
    """`--pipeline S` is a REAL training mode: the full CE step (loss,
    Adam update, ×2 gradient accumulation) through the Trainer on a
    ("data","stage") mesh reproduces the single-device step — loss AND
    updated params — with params/moments stored stage-sharded."""
    from visiontransformer_tpu.configs import TrainConfig
    from visiontransformer_tpu.train import Trainer

    batch = _ce_batch()
    tcfg = TrainConfig(batch_size=16, accumulate_grad_batches=2,
                       early_stopping_monitor=None, learning_rate=1e-3)
    ref_tr = Trainer(NODROP, tcfg, task="ce", use_mesh=False)
    ref_state = ref_tr.init_state()
    ref_state, ref_m = ref_tr.train_step(ref_state, batch,
                                         jax.random.PRNGKey(1))

    import dataclasses
    pcfg = dataclasses.replace(tcfg, mesh_shape=(4, 2), pipeline_stages=2)
    pipe_tr = Trainer(NODROP, pcfg, task="ce")
    pipe_state = pipe_tr.init_state()
    # storage really is stacked + stage-sharded (1/S weights per stage)
    leaf = pipe_state.params["backbone"]["layers"]["mlp_in"]["kernel"]
    assert leaf.shape[0] == 4 and not leaf.sharding.is_fully_replicated
    pipe_state, pipe_m = pipe_tr.train_step(pipe_state, batch,
                                            jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(pipe_m["loss"]), float(ref_m["loss"]),
                               rtol=1e-5)
    # updated encoder params match the single-device run layer-for-layer
    stacked = pipe_state.params["backbone"]["layers"]
    for i, ref_layer in enumerate(ref_state.params["backbone"]["layers"]):
        got = jax.tree.map(lambda a: np.asarray(a[i]), stacked)
        for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(ref_layer)):
            np.testing.assert_allclose(a, np.asarray(b), rtol=2e-4,
                                       atol=1e-6)
    # head (outside the pipeline) matches too
    np.testing.assert_allclose(
        np.asarray(pipe_state.params["head_conv1"]["kernel"]),
        np.asarray(ref_state.params["head_conv1"]["kernel"]),
        rtol=2e-4, atol=1e-6)


def test_pipeline_trainer_with_dropout_trains(eight_devices):
    """Training mode with the reference's dropout on: per-(layer,
    microbatch, shard) keys thread through the stage ring; two steps run
    and the loss stays finite."""
    from visiontransformer_tpu.configs import TrainConfig
    from visiontransformer_tpu.train import Trainer

    tcfg = TrainConfig(batch_size=16, accumulate_grad_batches=1,
                       early_stopping_monitor=None, mesh_shape=(2, 4),
                       pipeline_stages=4, pipeline_microbatches=2)
    tr = Trainer(TINY, tcfg, task="ce")
    state = tr.init_state()
    batch = _ce_batch()
    state, m1 = tr.train_step(state, batch, jax.random.PRNGKey(1))
    state, m2 = tr.train_step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
    assert int(state.step) == 2
    # dropout actually fired: same batch, different keys -> different losses
    # would also hold without dropout (params moved); instead check the
    # eval (deterministic) loss differs from the train loss at step 2.
    ev = tr.eval_step(state.params, batch)
    assert float(ev["loss"]) != float(m2["loss"])


def test_pipeline_shape_errors(eight_devices):
    layers = _toy_layers(n=6)  # 6 layers don't divide over 4 stages
    x = jnp.zeros((12, 5, 16), jnp.float32)
    mesh = create_pipeline_mesh((2, 4), devices=eight_devices)
    with pytest.raises(ValueError, match="stages"):
        pipeline_apply(x, stack_stage_params(layers), _toy_layer_fn,
                       mesh=mesh, n_microbatches=6)
    layers = _toy_layers(n=8)
    with pytest.raises(ValueError, match="microbatches"):
        pipeline_apply(x, stack_stage_params(layers), _toy_layer_fn,
                       mesh=mesh, n_microbatches=5)
    with pytest.raises(ValueError, match="data axis"):
        pipeline_apply(jnp.zeros((3, 5, 16), jnp.float32),
                       stack_stage_params(layers), _toy_layer_fn,
                       mesh=mesh, n_microbatches=3)
    with pytest.raises(ValueError, match="devices"):
        create_pipeline_mesh((3, 2), devices=eight_devices)


def test_pipeline_checkpoint_restores_for_plain_serving(eight_devices,
                                                        tmp_path):
    """Train with --pipeline, then serve/resume WITHOUT it: pipeline-mode
    checkpoints store backbone.layers stacked (leading layer axis); every
    plain restore path must unstack them (and a pipeline resume must accept
    a plain checkpoint by stacking) — previously both directions raised a
    misleading 'different model configuration' error."""
    import dataclasses

    from visiontransformer_tpu.ckpt.io import (
        restore_checkpoint,
        save_checkpoint,
    )
    from visiontransformer_tpu.configs import TrainConfig
    from visiontransformer_tpu.parallel.pipeline import maybe_unstack_params
    from visiontransformer_tpu.train import Trainer

    batch = _ce_batch()
    tcfg = TrainConfig(batch_size=16, accumulate_grad_batches=1,
                       early_stopping_monitor=None, learning_rate=1e-3,
                       mesh_shape=(4, 2), pipeline_stages=2)
    pipe_tr = Trainer(NODROP, tcfg, task="ce")
    state = pipe_tr.init_state()
    state, _ = pipe_tr.train_step(state, batch, jax.random.PRNGKey(0))
    ckpt = save_checkpoint(str(tmp_path), {"params": state.params},
                           epoch=0, step=1)

    plain_tr = Trainer(NODROP, tcfg.__class__(
        batch_size=16, accumulate_grad_batches=1,
        early_stopping_monitor=None), task="ce", use_mesh=False)
    plain_target = plain_tr.init_state().params

    # (a) targeted restore with a plain (list-form) params target
    restored = restore_checkpoint(ckpt, {"params": plain_target})["params"]
    layers = restored["backbone"]["layers"]
    assert isinstance(layers, list) and len(layers) == 4
    stacked = np.asarray(state.params["backbone"]["layers"]["mlp_in"]["kernel"])
    for i, layer in enumerate(layers):
        np.testing.assert_array_equal(np.asarray(layer["mlp_in"]["kernel"]),
                                      stacked[i])
    # the unstacked params drive the plain model identically
    out = vitseg_apply(restored, jnp.asarray(batch["image"]), NODROP,
                       deterministic=True)
    out_ref = vitseg_apply(
        maybe_unstack_params(jax.tree.map(np.asarray, dict(state.params))),
        jnp.asarray(batch["image"]), NODROP, deterministic=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)

    # (b) no-target restore + maybe_unstack_params (the resolve_model path)
    raw = restore_checkpoint(ckpt)["params"]
    assert isinstance(raw["backbone"]["layers"], dict)
    unstacked = maybe_unstack_params(raw)
    assert isinstance(unstacked["backbone"]["layers"], list)

    # (c) reverse: a PLAIN checkpoint restores onto a pipeline target
    plain_ckpt = save_checkpoint(str(tmp_path / "plain"),
                                 {"params": plain_target}, epoch=0, step=1)
    pipe_target = pipe_tr.init_state().params
    host_pipe_target = jax.tree.map(np.asarray, dict(pipe_target))
    back = restore_checkpoint(plain_ckpt,
                              {"params": host_pipe_target})["params"]
    assert not isinstance(back["backbone"]["layers"], list)
    np.testing.assert_array_equal(
        np.asarray(back["backbone"]["layers"]["mlp_in"]["kernel"])[2],
        np.asarray(plain_target["backbone"]["layers"][2]["mlp_in"]["kernel"]))

    # a genuinely mismatched config still fails loudly
    wrong = dataclasses.replace(
        NODROP, vit=dataclasses.replace(NODROP.vit, hidden_size=32))
    wrong_params = vitseg_init(jax.random.PRNGKey(0), wrong)
    with pytest.raises(ValueError, match="different model configuration"):
        restore_checkpoint(ckpt, {"params": wrong_params})


def test_pipeline_checkpoint_resume_keeps_adam_moments(eight_devices,
                                                       tmp_path):
    """Cross-mode resume (pipeline -> plain) must carry the Adam moments:
    the opt_state mu/nu trees hold layers in the same stacked form as the
    params, so the targeted restore fails structurally — restore_checkpoint
    grafts the raw on-disk tree onto the plain target (converting at the
    layers node) instead of silently resetting the optimizer."""
    from visiontransformer_tpu.ckpt.io import (
        restore_checkpoint,
        save_checkpoint,
    )
    from visiontransformer_tpu.configs import TrainConfig
    from visiontransformer_tpu.train import Trainer

    batch = _ce_batch()
    pcfg = TrainConfig(batch_size=16, accumulate_grad_batches=1,
                       early_stopping_monitor=None, learning_rate=1e-3,
                       mesh_shape=(4, 2), pipeline_stages=2)
    pipe_tr = Trainer(NODROP, pcfg, task="ce")
    state = pipe_tr.init_state()
    state, _ = pipe_tr.train_step(state, batch, jax.random.PRNGKey(0))
    ckpt = save_checkpoint(str(tmp_path), {"params": state.params,
                                           "opt_state": state.opt_state,
                                           "step": state.step},
                           epoch=0, step=1)

    plain_tr = Trainer(NODROP, TrainConfig(
        batch_size=16, accumulate_grad_batches=1,
        early_stopping_monitor=None, learning_rate=1e-3),
        task="ce", use_mesh=False)
    fresh = plain_tr.init_state()
    restored = restore_checkpoint(ckpt, {"params": fresh.params,
                                         "opt_state": fresh.opt_state,
                                         "step": fresh.step})

    # structure matches the plain target (layers back to the list form)
    assert isinstance(restored["params"]["backbone"]["layers"], list)
    mu = restored["opt_state"].inner_state[0].mu
    assert isinstance(mu["backbone"]["layers"], list)

    # and the values are the pipeline run's moments, not fresh zeros:
    # compare against the stacked on-disk mu layer-by-layer
    saved_mu = state.opt_state.inner_state[0].mu
    stacked = np.asarray(saved_mu["backbone"]["layers"]["mlp_in"]["kernel"])
    assert float(np.abs(stacked).sum()) > 0  # non-vacuous
    for i, layer in enumerate(mu["backbone"]["layers"]):
        np.testing.assert_allclose(
            np.asarray(layer["mlp_in"]["kernel"]), stacked[i],
            rtol=1e-6, atol=0)

    # reverse direction: plain checkpoint -> pipeline target keeps moments
    plain_state = fresh
    plain_state, _ = plain_tr.train_step(plain_state, batch,
                                         jax.random.PRNGKey(1))
    plain_ckpt = save_checkpoint(str(tmp_path / "plain"),
                                 {"params": plain_state.params,
                                  "opt_state": plain_state.opt_state,
                                  "step": plain_state.step},
                                 epoch=0, step=1)
    pipe_fresh = pipe_tr.init_state()
    host_target = {
        "params": jax.tree.map(np.asarray, dict(pipe_fresh.params)),
        "opt_state": jax.tree.map(np.asarray, pipe_fresh.opt_state),
        "step": np.asarray(pipe_fresh.step),
    }
    back = restore_checkpoint(plain_ckpt, host_target)
    back_mu = back["opt_state"].inner_state[0].mu
    assert not isinstance(back_mu["backbone"]["layers"], list)
    want = np.asarray(plain_state.opt_state.inner_state[0]
                      .mu["backbone"]["layers"][2]["mlp_in"]["kernel"])
    np.testing.assert_allclose(
        np.asarray(back_mu["backbone"]["layers"]["mlp_in"]["kernel"])[2],
        want, rtol=1e-6, atol=0)
