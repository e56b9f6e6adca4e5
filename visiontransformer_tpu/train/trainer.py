"""Jit/SPMD trainer.

The TPU-native replacement for the reference's Lightning Trainer usage
(reference model/CE/createViTmodel.py:63-86, model/PAED/ViTscript.py:66-79):
one compiled XLA program per (train|eval) step, gradient accumulation via
optax.MultiSteps, batch-axis data parallelism over a ("data","model") mesh
with XLA-inserted psum, Lightning-compatible CSV logs, Orbax checkpoints with
the reference's epoch=N-step=M naming, EarlyStopping and ReduceLROnPlateau
with torch semantics.

Everything data-dependent (early stop, LR drops) happens on host between
steps; nothing inside jit branches on data, so there is exactly one compile
per shape.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Iterable, Optional

import numpy as np

import jax
import jax.numpy as jnp

from visiontransformer_tpu.configs import TrainConfig
from visiontransformer_tpu.data.pipeline import batch_iterator
from visiontransformer_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    create_mesh,
    param_shardings,
    replicated,
)
from visiontransformer_tpu.train.optim import (
    EarlyStopping,
    PlateauScheduler,
    build_optimizer,
    set_learning_rate,
)
from visiontransformer_tpu.train.state import TrainState
from visiontransformer_tpu.train.tasks import get_task
from visiontransformer_tpu.utils.csvlog import CSVLogger


class Trainer:
    def __init__(self, seg_cfg, train_cfg: TrainConfig,
                 task: str = "ce", *, model: str = "vitseg", mesh=None,
                 use_mesh: bool = True, logger: Optional[CSVLogger] = None):
        from functools import partial

        import dataclasses

        from visiontransformer_tpu.models.registry import get_model_family

        if (train_cfg.remat and model == "vitseg"
                and hasattr(seg_cfg, "vit") and not seg_cfg.vit.remat):
            seg_cfg = dataclasses.replace(
                seg_cfg, vit=dataclasses.replace(seg_cfg.vit, remat=True))
        self.seg_cfg = seg_cfg
        self.train_cfg = train_cfg
        if train_cfg.batch_size % train_cfg.accumulate_grad_batches != 0:
            raise ValueError(
                f"batch_size={train_cfg.batch_size} must be divisible by "
                f"accumulate_grad_batches={train_cfg.accumulate_grad_batches} "
                f"(the step scans that many micro-batches)")
        self.task_name = task
        self.model_family = get_model_family(model)
        apply_fn = self.model_family.apply
        self.optimizer = build_optimizer(train_cfg)
        self.logger = logger

        # Pipeline parallelism (GPipe over a ("data","stage") mesh): the
        # encoder stack runs as an S-stage pipeline, params["layers"] is
        # stored STACKED and stage-sharded (1/S of the transformer weights
        # and Adam moments per stage — parallel/pipeline.py).
        self.pipeline = train_cfg.pipeline_stages > 1
        if self.pipeline:
            from visiontransformer_tpu.models.vitseg import (
                vitseg_apply_pipelined)
            from visiontransformer_tpu.parallel.pipeline import (
                create_pipeline_mesh)

            if model != "vitseg":
                raise ValueError(
                    "pipeline parallelism is implemented for the vitseg "
                    f"model family, not {model!r}")
            if train_cfg.fsdp or train_cfg.seq_parallel:
                raise ValueError(
                    "pipeline_stages does not compose with fsdp/seq_parallel")
            stages = train_cfg.pipeline_stages
            if seg_cfg.vit.num_hidden_layers % stages:
                raise ValueError(
                    f"{seg_cfg.vit.num_hidden_layers} encoder layers must "
                    f"divide over {stages} pipeline stages")
            if mesh is None:
                shape = train_cfg.mesh_shape
                if shape is None:
                    n = len(jax.devices())
                    if n % stages:
                        raise ValueError(
                            f"{n} devices do not divide into {stages} "
                            "pipeline stages; pass mesh_shape=(dp, stages)")
                    shape = (n // stages, stages)
                if len(shape) != 2 or shape[1] != stages:
                    raise ValueError(
                        f"pipeline mesh_shape must be (dp, {stages}); got "
                        f"{shape}")
                mesh = create_pipeline_mesh(shape)
            self.mesh = mesh
            micro = train_cfg.batch_size // train_cfg.accumulate_grad_batches
            m = train_cfg.pipeline_microbatches or stages
            dp = mesh.shape.get(DATA_AXIS, 1)
            if micro % m or (micro // m) % dp:
                raise ValueError(
                    f"micro-batch {micro} must divide into "
                    f"{m} pipeline microbatches of a multiple of the data "
                    f"axis ({dp} devices)")
            apply_fn = partial(vitseg_apply_pipelined, mesh=mesh,
                               n_microbatches=m)
            self.task_fn = partial(get_task(task), apply_fn=apply_fn)
            self._train_step = None
            self._eval_step = None
            self._tb_writer = None
            return

        if mesh is None and use_mesh:
            mesh = create_mesh(train_cfg.mesh_shape)
        if mesh is not None and mesh.size == 1:
            # A trivial 1-device mesh buys nothing and NamedSharding
            # placement is a measured 60x slowdown per dispatch on the
            # remote-PJRT runtime — use plain single-device placement.
            mesh = None
        self.mesh = mesh
        if self.mesh is not None:
            dp = self.mesh.shape[  # noqa: E501 — clear error beats XLA's divisibility traceback
                "data"] if "data" in self.mesh.shape else 1
            micro = train_cfg.batch_size // train_cfg.accumulate_grad_batches
            if micro % dp != 0:
                raise ValueError(
                    f"micro-batch {micro} (batch_size="
                    f"{train_cfg.batch_size} / accumulate_grad_batches="
                    f"{train_cfg.accumulate_grad_batches}) must be divisible "
                    f"by the data-parallel mesh axis ({dp} devices); pick a "
                    f"larger batch or a smaller mesh (TrainConfig.mesh_shape)")

        if (self.mesh is not None and train_cfg.seq_parallel
                and self.mesh.shape.get(MODEL_AXIS, 1) > 1
                and model == "vitseg"):
            # Sequence parallelism: residual stream token-sharded over the
            # TP axis (models/vit.py act_sharding docs).
            from jax.sharding import NamedSharding, PartitionSpec as P
            apply_fn = partial(apply_fn, act_sharding=NamedSharding(
                self.mesh, P(DATA_AXIS, MODEL_AXIS)))
        self.task_fn = partial(get_task(task), apply_fn=apply_fn)

        self._train_step = None
        self._eval_step = None
        self._tb_writer = None

    # ------------------------------------------------------------------ init
    def _param_shardings(self, params):
        """Sharding pytree for params on self.mesh, honoring the FSDP config."""
        if self.pipeline:
            from visiontransformer_tpu.parallel.pipeline import (
                pipeline_param_shardings)
            return pipeline_param_shardings(self.mesh, params)
        kwargs = {"fsdp": self.train_cfg.fsdp}
        if self.train_cfg.fsdp_min_size is not None:
            kwargs["fsdp_min_size"] = self.train_cfg.fsdp_min_size
        return param_shardings(self.mesh, params, **kwargs)

    def init_state(self, rng: Optional[jax.Array] = None) -> TrainState:
        if rng is None:
            rng = jax.random.PRNGKey(self.train_cfg.seed)
        params = self.model_family.init(rng, self.seg_cfg)
        if self.pipeline:
            # Stack the per-layer param list leaf-wise (leading layer axis)
            # so the leaves can shard over "stage": each stage device stores
            # 1/S of the encoder weights and, by inheritance, 1/S of the
            # Adam moments. Checkpoints written in pipeline mode carry the
            # stacked form.
            from visiontransformer_tpu.parallel.pipeline import (
                stack_stage_params)
            params = dict(params)
            params["backbone"] = dict(params["backbone"])
            params["backbone"]["layers"] = stack_stage_params(
                params["backbone"]["layers"])
        if self.mesh is not None:
            # Shard params first; optimizer moments initialized from sharded
            # params inherit the same placement, scalars replicate.
            params = jax.device_put(params, self._param_shardings(params))
            return TrainState(
                params=params,
                opt_state=self.optimizer.init(params),
                step=jax.device_put(jnp.zeros((), jnp.int32),
                                    replicated(self.mesh)),
            )
        return TrainState.create(params, self.optimizer)

    def state_from_params(self, params) -> TrainState:
        if self.pipeline and isinstance(
                params.get("backbone", {}).get("layers"), (list, tuple)):
            from visiontransformer_tpu.parallel.pipeline import (
                stack_stage_params)
            params = dict(params)
            params["backbone"] = dict(params["backbone"])
            params["backbone"]["layers"] = stack_stage_params(
                params["backbone"]["layers"])
        if self.mesh is not None:
            params = jax.device_put(params, self._param_shardings(params))
        return TrainState.create(params, self.optimizer)

    # ----------------------------------------------------------------- steps
    #
    # The train step is deliberately TWO compiled programs — gradients, then
    # the optimizer update — not one. Fusing them keeps params + moments +
    # gradients + backward activations live in a single program; at the
    # largest (171M-param) sweep configs that exceeds HBM and this runtime silently
    # spills (measured 30+ s/step fused vs ~0.2 s split). The extra dispatch
    # costs ~2 ms. Gradient accumulation folds INTO those two programs
    # (same averaged-gradient semantics as Lightning's
    # accumulate_grad_batches; reference createViTmodel.py:74): micro-batch
    # i>0 dispatches a grad program whose epilogue adds into the running
    # accumulator, and the 1/accum scale rides inside the optimizer update —
    # the round-3 profile measured the standalone add×3 + scale dispatches
    # as 24 ms/step (10.8%) of pure HBM pytree traffic
    # (docs/PERFORMANCE.md train profile).
    def _build_grad_step(self, grad_shardings=None, *, accumulate=False):
        task_fn, cfg = self.task_fn, self.seg_cfg

        def gradients(params, batch, rng):
            def loss_fn(p):
                return task_fn(p, batch, cfg, rng=rng, deterministic=False)
            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            return grads, metrics

        def gradients_acc(params, acc, batch, rng):
            grads, metrics = gradients(params, batch, rng)
            # Accumulate in the SAME program: XLA fuses the add into the
            # gradient finalization, replacing a standalone pytree-add
            # dispatch that re-reads both operand trees from HBM.
            return jax.tree.map(jnp.add, acc, grads), metrics

        fn = gradients_acc if accumulate else gradients
        if grad_shardings is None:
            return jax.jit(fn)
        # FSDP: pin gradient outputs to the params' sharded layout so XLA
        # lowers the data-axis gradient psum to a reduce-scatter and the
        # accumulated/stored gradients stay dp-sharded (ZeRO memory law).
        return jax.jit(fn, out_shardings=(
            grad_shardings, replicated(self.mesh)))

    def _build_update_step(self):
        import optax

        optimizer = self.optimizer
        accum = self.train_cfg.accumulate_grad_batches

        def update(state: TrainState, grads):
            if accum > 1:
                # The accumulated sum -> mean scale lives here (one fused
                # program) instead of a standalone pytree-scale dispatch.
                grads = jax.tree.map(lambda g: g / accum, grads)
            updates, opt_state = optimizer.update(
                grads, state.opt_state, state.params)
            return TrainState(
                params=optax.apply_updates(state.params, updates),
                opt_state=opt_state, step=state.step + 1)

        return jax.jit(update)

    def _build_eval_step(self):
        task_fn, cfg = self.task_fn, self.seg_cfg

        def step(params, batch):
            _, metrics = task_fn(params, batch, cfg, rng=None,
                                 deterministic=True)
            return metrics

        return jax.jit(step)

    def _place_batch(self, batch: Dict[str, np.ndarray]):
        if self.mesh is None:
            return batch
        if jax.process_count() > 1:
            # Multi-host: each process holds the full host batch (the data
            # pipeline is deterministic and identical per process); hand the
            # global-array constructor this process's rows only.
            from visiontransformer_tpu.parallel.multihost import (
                global_batch, local_shard)
            return global_batch(self.mesh, local_shard(
                {k: np.asarray(v) for k, v in batch.items()}))
        sharding = batch_sharding(self.mesh)
        return {k: jax.device_put(v, sharding) for k, v in batch.items()}

    def train_step(self, state: TrainState, batch, rng) -> tuple:
        """One optimizer step: accumulate gradients over
        ``accumulate_grad_batches`` micro-batches (separate dispatches of one
        small compiled program each — in-program lax.scan over the micro axis
        measured pathologically slow on this runtime; the add rides in the
        grad program's epilogue and the 1/accum scale in the update, so no
        standalone pytree-traffic dispatches remain), then apply the update."""
        if self._train_step is None:
            from visiontransformer_tpu.ops.quant import tree_is_quantized

            # W8A8 kernels (ops/quant.py) round/clip to int8 — zero gradient
            # everywhere. Training such a tree would silently learn nothing
            # (e.g. fine-tuning params loaded from a quantized serving
            # registry entry), so reject it up front.
            if tree_is_quantized(state.params):
                raise ValueError(
                    "params contain W8A8-quantized kernels (kernel_q); "
                    "quantization is inference-only (round/clip has zero "
                    "gradient). Train from the fp32 checkpoint and quantize "
                    "at serving-load time (ops/quant.py).")
            grad_shardings = None
            if self.mesh is not None and (self.train_cfg.fsdp
                                          or self.pipeline):
                # Pin gradients to the params' sharded layout (FSDP: dp-
                # sharded ZeRO grads; pipeline: stage-sharded layer grads).
                grad_shardings = self._param_shardings(state.params)
            grad_acc_step = None
            if self.train_cfg.accumulate_grad_batches > 1:
                grad_acc_step = self._build_grad_step(grad_shardings,
                                                      accumulate=True)
            self._train_step = (self._build_grad_step(grad_shardings),
                                grad_acc_step,
                                self._build_update_step())
        grad_step, grad_acc_step, update_step = self._train_step
        accum = self.train_cfg.accumulate_grad_batches

        if accum == 1:
            grads, metrics = grad_step(state.params,
                                       self._place_batch(batch), rng)
            return update_step(state, grads), metrics

        total = next(iter(batch.values())).shape[0]
        if total % accum:
            raise ValueError(
                f"batch size {total} is not divisible by "
                f"accumulate_grad_batches={accum}; the trailing "
                f"{total % accum} samples would be silently dropped")
        micro_size = total // accum
        acc = None
        metric_list = []
        for i in range(accum):
            micro = {k: v[i * micro_size:(i + 1) * micro_size]
                     for k, v in batch.items()}
            micro_rng = jax.random.fold_in(rng, i)
            if acc is None:
                acc, metrics = grad_step(state.params,
                                         self._place_batch(micro), micro_rng)
            else:
                acc, metrics = grad_acc_step(state.params, acc,
                                             self._place_batch(micro),
                                             micro_rng)
            metric_list.append(metrics)
        mean_metrics = {k: jnp.mean(jnp.stack([m[k] for m in metric_list]))
                        for k in metric_list[0]}
        return update_step(state, acc), mean_metrics

    def eval_step(self, params, batch) -> Dict[str, jnp.ndarray]:
        if self._eval_step is None:
            self._eval_step = self._build_eval_step()
        return self._eval_step(params, self._place_batch(batch))

    # ------------------------------------------------------------------- fit
    def fit(self, train_dataset, val_dataset=None, *,
            state: Optional[TrainState] = None,
            max_epochs: Optional[int] = None,
            checkpoint_dir: Optional[str] = None,
            resume_from: Optional[str] = None,
            profile_dir: Optional[str] = None,
            on_epoch_end: Optional[Callable[[int, Dict[str, float]], None]] = None
            ) -> TrainState:
        """Train. resume_from: an Orbax checkpoint path (or a directory of
        epoch=N-step=M checkpoints, latest picked) — the Trainer-native
        replacement for Lightning's fit(ckpt_path=...) resume
        (reference model/CE/trainCurrentViTmodel.py:67-73). profile_dir:
        capture a jax.profiler trace of epoch 0 steps 2-6 for TensorBoard."""
        cfg = self.train_cfg
        max_epochs = max_epochs if max_epochs is not None else cfg.max_epochs
        checkpoint_dir = checkpoint_dir or cfg.checkpoint_dir

        start_epoch = 0
        if state is None:
            state = self.init_state()
        if resume_from:
            import os as _os

            from visiontransformer_tpu.ckpt.io import (
                get_latest_checkpoint,
                parse_epoch,
                restore_checkpoint,
            )
            path = resume_from
            if _os.path.isdir(path) and get_latest_checkpoint(path):
                path = get_latest_checkpoint(path)
            # Full resume restores optimizer moments too (Lightning's
            # fit(ckpt_path=...) semantics, reference
            # model/CE/trainCurrentViTmodel.py:73); params-only checkpoints
            # from older saves keep fresh moments (partial restore).
            target_opt = state.opt_state
            if self.mesh is not None:
                # Orbax restores onto the target leaves' shardings; the
                # fresh opt_state's scalars (Adam count, injected LR) are
                # uncommitted and would come back pinned to one device,
                # clashing with mesh-wide params in the update step —
                # commit them replicated first (sharded moments already
                # carry their mesh placement and pass through unchanged).
                rep = replicated(self.mesh)
                target_opt = jax.tree.map(
                    lambda x: x if (isinstance(x, jax.Array) and x.committed)
                    else jax.device_put(x, rep), target_opt)
            restored = restore_checkpoint(
                path, {"params": state.params,
                       "opt_state": target_opt,
                       "step": np.zeros((), np.int32)})
            state = TrainState(params=restored["params"],
                               opt_state=restored["opt_state"],
                               step=jnp.asarray(restored["step"]))
            ckpt_epoch = parse_epoch(path)
            start_epoch = (ckpt_epoch + 1) if ckpt_epoch is not None else 0

        root_rng = jax.random.PRNGKey(cfg.seed)

        stopper = None
        if cfg.early_stopping_monitor:
            stopper = EarlyStopping(cfg.early_stopping_patience,
                                    cfg.early_stopping_mode)
        plateau = None
        if cfg.plateau_patience:
            plateau = PlateauScheduler(cfg.learning_rate,
                                       mode=cfg.plateau_mode,
                                       factor=cfg.plateau_factor,
                                       patience=cfg.plateau_patience)

        global_step = int(state.step)
        for epoch in range(start_epoch, max_epochs):
            # ---- train ----
            t0 = time.time()
            train_metrics = []
            from visiontransformer_tpu.data.pipeline import prefetch
            for batch in prefetch(batch_iterator(
                    train_dataset, cfg.batch_size, shuffle=True,
                    seed=cfg.seed, epoch=epoch)):
                if profile_dir and epoch == start_epoch and global_step == 2:
                    jax.profiler.start_trace(profile_dir)
                rng = jax.random.fold_in(root_rng, global_step)
                state, metrics = self.train_step(state, batch, rng)
                train_metrics.append(metrics)
                global_step += 1
                if profile_dir and epoch == start_epoch and global_step == 6:
                    jax.block_until_ready(state.params)
                    jax.profiler.stop_trace()
                if self.logger and global_step % cfg.log_every_n_steps == 0:
                    self.logger.log(
                        {f"train_{k}_step": float(v) for k, v in metrics.items()},
                        epoch=epoch, step=global_step)

            epoch_metrics = _mean_metrics(train_metrics, prefix="train_")
            epoch_metrics["epoch_time_s"] = time.time() - t0

            # ---- validate ----
            if val_dataset is not None:
                val_metrics = []
                for batch in batch_iterator(val_dataset, cfg.batch_size):
                    val_metrics.append(self.eval_step(state.params, batch))
                prefix = "val_" if self.task_name == "paed_binary" else "valid_"
                epoch_metrics.update(_mean_metrics(val_metrics, prefix=prefix))

            if self.logger:
                self.logger.log(epoch_metrics, epoch=epoch, step=global_step)
                # tfevents sibling of the CSV log, like the reference's
                # Lightning runs (tfevents next to metrics.csv).
                if self._tb_writer is None:
                    from visiontransformer_tpu.utils.tbevents import (
                        EventFileWriter)
                    self._tb_writer = EventFileWriter(self.logger.log_dir)
                for key, value in epoch_metrics.items():
                    self._tb_writer.add_scalar(key, value, global_step)
                self._tb_writer.flush()
            if on_epoch_end:
                on_epoch_end(epoch, epoch_metrics)

            if checkpoint_dir:
                from visiontransformer_tpu.ckpt.io import save_checkpoint
                save_checkpoint(checkpoint_dir,
                                {"params": state.params,
                                 "opt_state": state.opt_state,
                                 "step": np.asarray(global_step)},
                                epoch=epoch, step=global_step)

            # ---- schedules (host-side, no recompiles) ----
            if plateau is not None:
                monitored = epoch_metrics.get(plateau_key(cfg))
                if monitored is not None:
                    new_lr = plateau.step(monitored)
                    state = TrainState(
                        params=state.params,
                        opt_state=set_learning_rate(state.opt_state, new_lr),
                        step=state.step)

            if stopper is not None:
                monitored = epoch_metrics.get(cfg.early_stopping_monitor)
                if monitored is not None and stopper.step(monitored):
                    break

        return state

    def evaluate(self, dataset, params, *, batch_size: Optional[int] = None
                 ) -> Dict[str, float]:
        batch_size = batch_size or self.train_cfg.batch_size
        all_metrics = [self.eval_step(params, b)
                       for b in batch_iterator(dataset, batch_size)]
        return _mean_metrics(all_metrics, prefix="")


def plateau_key(cfg: TrainConfig) -> str:
    return cfg.plateau_monitor


def _mean_metrics(metric_dicts: Iterable[Dict], prefix: str) -> Dict[str, float]:
    out: Dict[str, float] = {}
    metric_dicts = list(metric_dicts)
    if not metric_dicts:
        return out
    for key in metric_dicts[0]:
        out[prefix + key] = float(
            np.mean([float(m[key]) for m in metric_dicts]))
    return out
