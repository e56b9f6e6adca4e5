"""Ahead-of-time serving artifacts: the fused serving step as StableHLO.

``jax.export`` lowers the jitted serving forward (images in [0,1] →
argmax class mask, the same program the serving worker dispatches,
serve/worker.py) once, bakes the trained weights in as module constants,
and serializes a platform-checked artifact. A deployment host then runs
inference with deserialize + call — no model code, no Python config
resolution, no re-trace, and a hard error (instead of silent retracing)
if the input shape or platform doesn't match what was exported.

This is the TPU-native answer to the reference platform's "external model
server" contract (SURVEY §3.1: the backend ships images to an opaque model
process whose code is not in the repo): here the model itself ships as one
portable file.

File format: magic, 8-byte big-endian JSON-header length, JSON metadata
(family, shapes, platforms), then the ``jax.export`` blob.
"""

from __future__ import annotations

import json
import struct
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export

from visiontransformer_tpu.models.registry import get_model_family

_MAGIC = b"VTSHLO1\n"


def serving_input_size(cfg, family: str, input_size: Optional[int]) -> int:
    """The static image side the artifact is exported for. vitseg is fixed
    by its patch grid; conv families accept any size,
    so the caller picks one (required — StableHLO artifacts are
    static-shape)."""
    if family == "vitseg":
        return cfg.vit.image_size
    if input_size is None:
        raise ValueError(
            f"family {family!r} is shape-polymorphic in Python but the "
            "exported artifact is static — pass input_size")
    return input_size


def export_serving(params, cfg, *, out_path: str, batch_size: int = 8,
                   family: str = "vitseg",
                   input_size: Optional[int] = None,
                   platforms: Optional[Sequence[str]] = None) -> Dict[str, Any]:
    """Serialize the serving forward with ``params`` baked in.

    platforms: lowering targets (e.g. ("tpu", "cpu")); default = the
    current default backend. Returns the metadata dict written to the
    header.
    """
    size = serving_input_size(cfg, family, input_size)
    apply_fn = get_model_family(family).apply

    def serve_fn(images):
        logits = apply_fn(params, images, cfg, deterministic=True)
        return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

    spec = jax.ShapeDtypeStruct((batch_size, size, size, 3), jnp.float32)
    exported = jax_export.export(
        jax.jit(serve_fn),
        platforms=tuple(platforms) if platforms else None)(spec)
    blob = exported.serialize()

    meta = {
        "family": family,
        "num_classes": int(cfg.num_classes),
        "batch_size": int(batch_size),
        "input_size": int(size),
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
    }
    header = json.dumps(meta, sort_keys=True).encode("utf-8")
    with open(out_path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack(">Q", len(header)))
        f.write(header)
        f.write(blob)
    return meta


class ServingArtifact:
    """A deserialized serving program: ``call(images)`` → uint8 masks."""

    def __init__(self, meta: Dict[str, Any], exported):
        self.meta = meta
        self._exported = exported

    def call(self, images) -> jax.Array:
        b, s = self.meta["batch_size"], self.meta["input_size"]
        if tuple(images.shape) != (b, s, s, 3):
            raise ValueError(
                f"artifact was exported for shape {(b, s, s, 3)}, "
                f"got {tuple(images.shape)}")
        return self._exported.call(images)


def load_serving(path: str) -> ServingArtifact:
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path}: not a serving artifact "
                             f"(bad magic {magic!r})")
        (hlen,) = struct.unpack(">Q", f.read(8))
        meta = json.loads(f.read(hlen).decode("utf-8"))
        blob = f.read()
    return ServingArtifact(meta, jax_export.deserialize(blob))
