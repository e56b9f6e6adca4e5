"""Orbax checkpointing with the reference's naming convention.

Write cadence and layout mirror Lightning's ModelCheckpoint
(`epoch=N-step=M.ckpt` filenames, reference model/CE/trainCurrentViTmodel.py:69;
"latest" selection parses the epoch number out of the name, reference
model/CE/datasetTestViTmodel.py:38-54) — but the payload is an Orbax-saved
JAX pytree (params + optimizer state + step), which restores directly onto a
sharded mesh.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import numpy as np

import orbax.checkpoint as ocp


def _ckpt_name(epoch: int, step: int) -> str:
    return f"epoch={epoch}-step={step}"


def save_checkpoint(directory: str, tree: Any, *, epoch: int, step: int) -> str:
    path = os.path.abspath(os.path.join(directory, _ckpt_name(epoch, step)))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree)
    return path


def _abstract_like(leaf):
    """ShapeDtypeStruct carrying the target leaf's shape/dtype/sharding —
    the form Orbax restores DIRECTLY onto (each device reads only its own
    shard from disk; no leaf is ever fully materialized on host)."""
    import jax

    if isinstance(leaf, jax.ShapeDtypeStruct):
        return leaf
    if isinstance(leaf, jax.Array):
        return jax.ShapeDtypeStruct(leaf.shape, leaf.dtype,
                                    sharding=leaf.sharding)
    arr = np.asarray(leaf)
    return jax.ShapeDtypeStruct(arr.shape, arr.dtype)


def _disk_keys(path: str):
    """Top-level keys of the on-disk pytree, from metadata only (no reads)."""
    with ocp.StandardCheckpointer() as ckptr:
        meta = ckptr.metadata(path).item_metadata
    try:
        # The orbax metadata wrapper exposes .keys() even for list-rooted
        # trees and only fails inside the call — normalize to a clear error.
        return list(meta.keys())
    except (AttributeError, TypeError) as e:
        raise ValueError(
            f"checkpoint at {path} is not a dict-rooted tree; cannot "
            "partially restore (pass partial=False or a matching target)"
        ) from e


def _try_pipeline_layer_convert(ptc, path: str, target_params):
    """Restore params whose on-disk backbone.layers form differs from the
    target's by pipeline stacking (train/trainer.py stores layers STACKED
    with a leading layer axis in pipeline mode; plain models keep a
    per-layer list). Returns the params in the TARGET's form, or None if
    this is not a stacking mismatch. Sharding hints are dropped on the
    converted subtree (callers re-place params via state_from_params /
    resolve_model)."""
    import jax

    backbone = (target_params.get("backbone")
                if isinstance(target_params, dict) else None)
    layers = backbone.get("layers") if isinstance(backbone, dict) else None

    if isinstance(layers, (list, tuple)) and layers:
        # Target wants the list form; try the stacked on-disk layout.
        from visiontransformer_tpu.parallel.pipeline import (
            unstack_stage_params)
        n = len(layers)

        def stacked_leaf(x):
            a = _abstract_like(x)
            return jax.ShapeDtypeStruct((n,) + a.shape, a.dtype)

        alt_layers = jax.tree.map(stacked_leaf, layers[0])
        unstack = unstack_stage_params
    elif isinstance(layers, dict) and jax.tree.leaves(layers):
        # Target wants the stacked form (pipeline resume); try the list
        # layout a plain trainer wrote.
        from visiontransformer_tpu.parallel.pipeline import (
            stack_stage_params)

        def layer_leaf(x):
            a = _abstract_like(x)
            return jax.ShapeDtypeStruct(a.shape[1:], a.dtype)

        per_layer = jax.tree.map(layer_leaf, layers)
        n = jax.tree.leaves(layers)[0].shape[0]
        alt_layers = [per_layer] * n
        unstack = stack_stage_params
    else:
        return None

    alt = dict(target_params)
    alt["backbone"] = dict(backbone)
    alt["backbone"]["layers"] = alt_layers
    # Restore to host numpy (the stacked<->list shapes can't reuse the
    # target's shardings), convert, then place each leaf exactly like its
    # target counterpart — the converted tree matches the target structure.
    abs_alt = {"params": jax.tree.map(_abstract_like, alt)}
    host_args = jax.tree.map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), abs_alt)
    try:
        restored = ptc.restore(path, args=ocp.args.PyTreeRestore(
            item=abs_alt, restore_args=host_args,
            partial_restore=True))["params"]
    except (TypeError, ValueError):
        return None
    # Host-numpy RestoreArgs don't enforce shapes — a genuinely mismatched
    # config (different widths) would otherwise slip through here.
    for got, want in zip(jax.tree.leaves(restored),
                         jax.tree.leaves(abs_alt["params"])):
        if tuple(np.shape(got)) != tuple(want.shape):
            return None
    restored = dict(restored)
    restored["backbone"] = dict(restored["backbone"])
    restored["backbone"]["layers"] = unstack(restored["backbone"]["layers"])

    def place(x, t):
        if isinstance(t, jax.Array):
            return jax.device_put(x, t.sharding)
        return x

    return jax.tree.map(place, restored, target_params)


def _graft_convert(raw, target):
    """Graft an Orbax raw-restored tree (namedtuples come back as dicts
    keyed by field name, tuples as lists, leaves as host/device arrays)
    onto ``target``'s structure, converting pipeline-stacked backbone
    layers (stacked dict <-> per-layer list, train/trainer.py pipeline
    mode) wherever the two forms disagree — this is what lets a plain
    resume recover the Adam moments from a pipeline-mode checkpoint and
    vice versa. Returns values in the TARGET's structure, placed on the
    target leaves' shardings. Raises ValueError on any non-stacking
    mismatch."""
    import jax

    if target is None or raw is None:
        # Orbax saves leafless subtrees (optax EmptyState, empty dicts) as
        # None; keep the target's empty container in that case.
        if raw is None and not jax.tree.leaves(target):
            return target
        if target is None and (raw is None or not jax.tree.leaves(raw)):
            return None
        raise ValueError("None vs non-None subtree")
    is_namedtuple = hasattr(target, "_fields")
    # Pipeline stacking conversion points (a namedtuple is a tuple — skip).
    if (isinstance(target, (list, tuple)) and not is_namedtuple
            and isinstance(raw, dict) and raw):
        from visiontransformer_tpu.parallel.pipeline import (
            unstack_stage_params)
        raw = unstack_stage_params(raw)
    elif isinstance(target, dict) and isinstance(raw, (list, tuple)) and raw:
        from visiontransformer_tpu.parallel.pipeline import (
            stack_stage_params)
        raw = stack_stage_params(list(raw))
    if is_namedtuple:
        if not isinstance(raw, dict) or set(raw) != set(target._fields):
            raise ValueError(
                f"cannot graft onto {type(target).__name__}: on-disk keys "
                f"{sorted(raw) if isinstance(raw, dict) else type(raw)}")
        return type(target)(**{f: _graft_convert(raw[f], getattr(target, f))
                               for f in target._fields})
    if isinstance(target, dict):
        if not isinstance(raw, dict) or set(raw) != set(target):
            raise ValueError(
                f"dict keys mismatch: disk "
                f"{sorted(raw) if isinstance(raw, dict) else type(raw)} vs "
                f"target {sorted(target)}")
        return {k: _graft_convert(raw[k], target[k]) for k in target}
    if isinstance(target, (list, tuple)):
        if not isinstance(raw, (list, tuple)) or len(raw) != len(target):
            raise ValueError("sequence length/type mismatch")
        vals = [_graft_convert(r, t) for r, t in zip(raw, target)]
        return tuple(vals) if isinstance(target, tuple) else vals
    want = _abstract_like(target)
    got = np.asarray(raw)
    if tuple(got.shape) != tuple(want.shape):
        raise ValueError(f"leaf shape {got.shape} vs target {want.shape}")
    got = got.astype(want.dtype, copy=False)
    if isinstance(target, jax.Array):
        return jax.device_put(got, target.sharding)
    return got


def restore_checkpoint(path: str, target: Optional[Any] = None, *,
                       partial: bool = True) -> Any:
    """Restore a checkpoint onto ``target``.

    Every restore is shard-aware: target leaves' shardings are forwarded to
    Orbax as abstract arrays, so under an FSDP/tensor-parallel mesh each
    device reads only its own shard from the zarr store — no leaf is ever
    fully replicated on host (tests/test_resume_optstate.py asserts this
    under an 8-device mesh).

    Orbax's strict path demands an exact structure match; with
    ``partial=True`` (default) dict-rooted targets are instead intersected
    with the on-disk tree at the top level: keys present on disk are
    restored (to the target leaves' shardings/dtypes), keys absent on disk
    keep the target's values. This lets new code that checkpoints
    {params, opt_state, step} load older params-only checkpoints and vice
    versa (the reference's Lightning resume is similarly tolerant of
    strict=False loads)."""
    import jax

    path = os.path.abspath(path)
    if target is None:
        with ocp.StandardCheckpointer() as ckptr:
            return ckptr.restore(path)
    if not (partial and isinstance(target, dict)):
        with ocp.StandardCheckpointer() as ckptr:
            return ckptr.restore(path, target)

    on_disk = set(_disk_keys(path))
    out = {key: tval for key, tval in target.items()
           if key not in on_disk}  # e.g. step/opt_state missing on old saves
    present = {key: tval for key, tval in target.items() if key in on_disk}
    with ocp.PyTreeCheckpointer() as ptc:
        # Fast path: ONE PyTreeRestore over every key present on disk (the
        # per-key loop below re-opens the zarr store once per key); fall
        # back per-key only when the whole-tree restore raises, so a
        # mismatched opt_state still degrades gracefully.
        try:
            abs_all = {key: jax.tree.map(_abstract_like, tval)
                       for key, tval in present.items()}
            restored = ptc.restore(path, args=ocp.args.PyTreeRestore(
                item=abs_all,
                restore_args=ocp.checkpoint_utils.construct_restore_args(
                    abs_all),
                partial_restore=True))
            out.update({key: restored[key] for key in present})
            return out
        except (TypeError, ValueError):
            pass
        raw_tree = None
        for key, tval in present.items():
            abs_sub = {key: jax.tree.map(_abstract_like, tval)}
            try:
                restored = ptc.restore(path, args=ocp.args.PyTreeRestore(
                    item=abs_sub,
                    restore_args=ocp.checkpoint_utils.construct_restore_args(
                        abs_sub),
                    partial_restore=True))
                out[key] = restored[key]
            except (TypeError, ValueError) as e:
                if key == "params":
                    # A pipeline-mode checkpoint stores backbone.layers
                    # STACKED (leading layer axis); plain targets expect a
                    # per-layer list (and vice versa on pipeline resume).
                    # Convert between the two forms before giving up.
                    converted = _try_pipeline_layer_convert(ptc, path, tval)
                    if converted is not None:
                        out[key] = converted
                        continue
                    # Same tree structure, different tensor shapes — e.g.
                    # resuming a 5-class run from a 17-class checkpoint.
                    # Param mismatch is never recoverable.
                    raise ValueError(
                        f"checkpoint at {path} does not match the target "
                        "model's parameter structure/shapes — it was "
                        "written by a different model configuration (note: "
                        "pipeline-mode checkpoints store layers stacked; "
                        f"both forms were tried) ({e})") from e
                # Non-params keys (opt_state): the mismatch is usually the
                # pipeline stacked<->list layer form inside the Adam moment
                # trees — graft the raw on-disk tree onto the target,
                # converting at the mismatch points, so a cross-mode resume
                # keeps its optimizer moments instead of silently resetting
                # them.
                try:
                    if raw_tree is None:
                        raw_tree = ptc.restore(path)
                    out[key] = _graft_convert(raw_tree[key], tval)
                except (TypeError, ValueError, KeyError):
                    import warnings

                    warnings.warn(
                        f"checkpoint key {key!r} at {path} does not match "
                        "the target structure and could not be converted; "
                        f"keeping the freshly-initialized value ({e})",
                        stacklevel=2)
                    out[key] = tval  # e.g. opt_state from another optimizer
    return out


def get_latest_checkpoint(directory: str) -> Optional[str]:
    """Highest-epoch checkpoint in `directory`, by filename convention
    (the reference's selection rule, datasetTestViTmodel.py:50)."""
    if not os.path.isdir(directory):
        return None
    best, best_epoch = None, -1
    for name in os.listdir(directory):
        m = re.match(r"epoch=(\d+)-step=(\d+)", name)
        if m and int(m.group(1)) > best_epoch:
            best_epoch = int(m.group(1))
            best = os.path.join(directory, name)
    return best


def parse_epoch(path: str) -> Optional[int]:
    m = re.search(r"epoch=(\d+)", os.path.basename(path))
    return int(m.group(1)) if m else None
