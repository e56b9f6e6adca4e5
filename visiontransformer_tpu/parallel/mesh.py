"""Device mesh and sharding layout.

The reference trains strictly single-device (`devices=1`,
reference model/CE/createViTmodel.py:73; no collective anywhere — SURVEY.md
§2.6). Scaling here is TPU-native SPMD: a ("data", "model") mesh, batch
sharded over "data", and optional tensor parallelism over "model" for the
MLP/QKV contractions; XLA inserts the psum/all-gather collectives over ICI.

At the reference's scale (≤171M params; largest sweep config P16H1024A16) pure data parallelism is the right
layout — "model" defaults to 1 — but the TP axis is real and exercised by
__graft_entry__.dryrun_multichip on a virtual mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(shape: Optional[Sequence[int]] = None,
                devices=None) -> Mesh:
    """Build a ("data", "model") mesh. shape=None → all devices on the data
    axis; shape=(dp,) → dp×1; shape=(dp, tp) → dp×tp."""
    if devices is None:
        devices = jax.devices()
    if shape is None:
        shape = (len(devices), 1)
    elif len(shape) == 1:
        shape = (shape[0], 1)
    dp, tp = shape
    if dp * tp != len(devices):
        raise ValueError(f"mesh shape {shape} != {len(devices)} devices")
    mesh_devices = np.asarray(devices).reshape(dp, tp)
    return Mesh(mesh_devices, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over "data", rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _param_spec(path: tuple, leaf) -> P:
    """Tensor-parallel layout for the transformer params.

    Megatron-style pairing along "model": QKV and MLP-in kernels split on
    their output axis, attention-out and MLP-out kernels on their input axis,
    so each block needs exactly one psum (inserted by XLA) per matmul pair.
    Everything else (LNs, embeddings, head convs) is replicated.
    """
    names = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
    if "qkv" in names or "mlp_in" in names:
        if names[-1] == "kernel":
            return P(None, MODEL_AXIS)
        if names[-1] == "bias":
            return P(MODEL_AXIS)
    if "attn_out" in names or "mlp_out" in names:
        if names[-1] == "kernel":
            return P(MODEL_AXIS, None)
    return P()


# Leaves below this element count stay replicated under FSDP: sharding a
# few-KB LayerNorm scale buys nothing and costs an all-gather dispatch.
FSDP_MIN_SIZE = 2 ** 15


def _fsdp_spec(spec: P, leaf, dp: int, min_size: int) -> P:
    """Add DATA_AXIS sharding to a leaf's spec (ZeRO-3 weight sharding).

    Picks the largest dp-divisible axis not already taken by tensor
    parallelism, so FSDP composes with the Megatron layout (a QKV kernel on
    a (4, 2) mesh becomes P("data", "model"): 8-way sharded weight).
    """
    if dp <= 1 or leaf.size < min_size:
        return spec
    entries = list(spec) + [None] * (leaf.ndim - len(spec))
    candidates = [i for i in range(leaf.ndim)
                  if entries[i] is None and leaf.shape[i] % dp == 0
                  and leaf.shape[i] >= dp]
    if not candidates:
        return spec
    axis = max(candidates, key=lambda i: leaf.shape[i])
    entries[axis] = DATA_AXIS
    return P(*entries)


def param_shardings(mesh: Mesh, params, *, fsdp: bool = False,
                    fsdp_min_size: int = FSDP_MIN_SIZE) -> dict:
    """NamedSharding pytree for a models/vitseg.py param pytree.

    fsdp=True additionally shards every large leaf over the "data" axis
    (fully-sharded data parallelism: params, and by inheritance the Adam
    moments initialized from them, are split dp-ways; XLA inserts the
    all-gather at each use and — with the trainer's gradient out_shardings —
    a reduce-scatter on the backward pass)."""
    dp = mesh.shape.get(DATA_AXIS, 1)

    def spec_for(path, leaf):
        spec = _param_spec(path, leaf)
        if fsdp:
            spec = _fsdp_spec(spec, leaf, dp, fsdp_min_size)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(spec_for, params)
