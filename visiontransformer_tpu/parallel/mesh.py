"""Device mesh and sharding layout.

The reference trains strictly single-device (`devices=1`,
reference model/CE/createViTmodel.py:73; no collective anywhere — SURVEY.md
§2.6). Scaling here is TPU-native SPMD: a ("data", "model") mesh, batch
sharded over "data", and optional tensor parallelism over "model" for the
MLP/QKV contractions; XLA inserts the psum/all-gather collectives over ICI.

At the reference's scale (≤0.33B params) pure data parallelism is the right
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


def param_shardings(mesh: Mesh, params) -> dict:
    """NamedSharding pytree for a models/vitseg.py param pytree."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _param_spec(path, leaf)), params)
