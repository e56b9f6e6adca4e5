"""GPipe-style pipeline parallelism over a ("data", "stage") mesh.

The reference trains strictly single-device (devices=1, reference
model/CE/createViTmodel.py:73); this is part of the TPU-native scaling layer
it lacks. Unlike tensor parallelism (parallel/mesh.py) — which XLA derives
from parameter shardings — a pipeline is an explicitly scheduled program, so
it is written with shard_map + ppermute (the collective rides the ICI ring):

- the L encoder layers are stacked leaf-wise and split over the "stage" mesh
  axis (L/S contiguous layers per stage, each stage holding 1/S of the
  transformer weights — pipeline model-memory scaling);
- the batch is split into M microbatches and fed through the classic GPipe
  schedule: T = M + S - 1 ticks of lax.scan, each tick computing every
  stage's current microbatch and ppermute-ing activations one hop along the
  stage ring. Bubble fraction = (S-1)/T, so M >> S amortizes it;
- the "data" axis composes orthogonally: activations stay batch-sharded over
  "data" inside the shard_map, and the gradient psum over "data" for the
  stage-local (data-axis-unmentioned) parameters is inserted by shard_map's
  replication checker on the transpose — dp×pp in one mesh.

Everything inside is differentiable (scan / ppermute / where transposes), so
jax.grad through pipeline_apply yields exact pipeline-parallel training.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from visiontransformer_tpu.parallel.mesh import DATA_AXIS

STAGE_AXIS = "stage"


def pipeline_param_shardings(mesh: Mesh, params) -> dict:
    """NamedSharding pytree for pipeline-mode params: leaves under a
    "layers" key (the STACKED encoder layers, leading axis = layer) are
    sharded over "stage" — each stage device stores 1/S of the transformer
    weights, and by inheritance 1/S of the Adam moments (pipeline
    model-memory scaling). Everything else (embeddings, final LN, heads)
    replicates."""
    def spec_for(path, leaf):
        names = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
        if "layers" in names:
            return NamedSharding(mesh, P(STAGE_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def create_pipeline_mesh(shape: Sequence[int],
                         devices=None) -> Mesh:
    """Build a ("data", "stage") mesh. shape=(dp, pp)."""
    if devices is None:
        devices = jax.devices()
    dp, pp = shape
    if dp * pp != len(devices):
        raise ValueError(f"mesh shape {tuple(shape)} != {len(devices)} devices")
    return Mesh(np.asarray(devices).reshape(dp, pp), (DATA_AXIS, STAGE_AXIS))


def stack_stage_params(layers: Sequence[dict]):
    """Stack a list of per-layer param dicts into one pytree whose leaves
    carry a leading layer axis — the form pipeline_apply shards over
    "stage" (models/vit.py keeps params["layers"] as a Python list)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def unstack_stage_params(stacked):
    """Inverse of stack_stage_params: split the leading layer axis back into
    the per-layer list form models/vit.py consumes. Used when a checkpoint
    written in pipeline mode (stacked layers) is restored for plain
    serving/eval or a non-pipeline Trainer resume."""
    n = jax.tree.leaves(stacked)[0].shape[0]
    return [jax.tree.map(lambda x, i=i: x[i], stacked) for i in range(n)]


def maybe_unstack_params(params):
    """Normalize a restored vitseg param tree: if backbone.layers came back
    in the pipeline-stacked form (one mapping with a leading layer axis
    instead of a per-layer list), unstack it. No-op otherwise."""
    backbone = params.get("backbone") if isinstance(params, dict) else None
    layers = backbone.get("layers") if isinstance(backbone, dict) else None
    if isinstance(layers, dict) and jax.tree.leaves(layers):
        params = dict(params)
        params["backbone"] = dict(backbone)
        params["backbone"]["layers"] = unstack_stage_params(layers)
    return params


def pipeline_apply(x: jnp.ndarray, stacked_layers, layer_fn: Callable,
                   *, mesh: Mesh, n_microbatches: int,
                   rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """Run ``layer_fn`` over the stacked layer params as an S-stage pipeline.

    x: (B, ...) activations (batch leading). stacked_layers: pytree with a
    leading layer axis L on every leaf. layer_fn(layer_params, x) -> x
    applies ONE layer — or, when ``rng`` is given, layer_fn(layer_params, x,
    layer_key) with a per-(layer, microbatch, data-shard) PRNG key for
    dropout: keys are folded from (rng, global layer index, microbatch
    index, data-shard index), so every dropout mask is independent across
    layers/microbatches/shards (distribution matches the single-device
    trainer; the bitstream is this schedule's own). Returns the (B, ...)
    output of the full L-layer stack, replicated over "stage" and
    batch-sharded over "data".
    """
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # pragma: no cover — older jax
        from jax.experimental.shard_map import shard_map

    n_stages = mesh.shape[STAGE_AXIS]
    dp = mesh.shape.get(DATA_AXIS, 1)
    n_layers = jax.tree.leaves(stacked_layers)[0].shape[0]
    batch = x.shape[0]
    m = n_microbatches

    if n_layers % n_stages:
        raise ValueError(f"{n_layers} layers must divide over "
                         f"{n_stages} pipeline stages")
    if batch % m:
        raise ValueError(f"batch {batch} must divide into {m} microbatches")
    if (batch // m) % dp:
        raise ValueError(f"microbatch {batch // m} must divide over the "
                         f"data axis ({dp} devices)")
    layers_per_stage = n_layers // n_stages

    def stage_fn(xm, local_layers, key):
        # xm: (M, b_local, ...) this data-shard's microbatches;
        # local_layers: leaves (L/S, ...) — this stage's layer slice;
        # key: replicated base PRNG key (or a dummy zero when rng is None).
        stage = jax.lax.axis_index(STAGE_AXIS)
        shard = (jax.lax.axis_index(DATA_AXIS)
                 if DATA_AXIS in mesh.shape else 0)

        def apply_local(y, mb):
            for j in range(layers_per_stage):
                lp = jax.tree.map(lambda a: a[j], local_layers)
                if rng is None:
                    y = layer_fn(lp, y)
                else:
                    gl = stage * layers_per_stage + j
                    lk = jax.random.fold_in(
                        jax.random.fold_in(jax.random.fold_in(key, gl), mb),
                        shard)
                    y = layer_fn(lp, y, lk)
            return y

        ticks = m + n_stages - 1
        # Stage 0 consumes microbatch t at tick t; later ticks (t >= M) feed
        # it a repeat of the last microbatch whose outputs never land in the
        # result (pipeline drain bubble).
        stream = xm[jnp.minimum(jnp.arange(ticks), m - 1)]
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        # Every tick emits its stage output into scan's stacked ys; the
        # carry holds ONLY the one in-flight microbatch activation
        # (lax.scan with large carries is a measured 70× pathology on this
        # runtime, CLAUDE.md — the full output buffer must not live there).
        def tick(recv, tick_in):
            xt, t = tick_in
            # This stage processes the microbatch that entered the ring at
            # tick t - stage (clamped: warm-up/drain ticks compute garbage
            # that never lands in the result).
            mb = jnp.clip(t - stage, 0, m - 1)
            y = apply_local(jnp.where(stage == 0, xt, recv), mb)
            send = jax.lax.ppermute(y, STAGE_AXIS, perm)
            return send, y

        # The zero init carry is a stage-invariant value, but the scan body
        # makes it stage-varying (ppermute / axis_index) — mark it so the
        # varying-manual-axes checker accepts the carry (shard_map scan rule).
        init = jax.lax.pcast(jnp.zeros_like(xm[0]), (STAGE_AXIS,),
                             to="varying")
        _, ys = jax.lax.scan(tick, init, (stream, jnp.arange(ticks)))
        # The last stage finishes microbatch i at tick i + (S-1): a static
        # slice of ys picks the M real outputs. Only the last stage holds
        # them; the psum broadcasts them around the stage ring (and proves
        # replication to the checker).
        out = jnp.where(stage == n_stages - 1, ys[n_stages - 1:],
                        jnp.zeros_like(xm))
        return jax.lax.psum(out, STAGE_AXIS)

    xm = x.reshape(m, batch // m, *x.shape[1:])
    key = rng if rng is not None else jax.random.PRNGKey(0)
    data_spec = P(None, DATA_AXIS)
    out = shard_map(
        stage_fn, mesh=mesh,
        in_specs=(data_spec, P(STAGE_AXIS), P()),
        out_specs=data_spec,
    )(xm, stacked_layers, key)
    return out.reshape(batch, *x.shape[1:])
