"""Dynamic-batching TPU inference worker.

Replaces the reference's job dispatch — a daemon thread HTTP-POSTing each
image to an external model server, one request per image, job left PENDING
forever on failure (reference backend/core/views.py:91-114) — with an
in-process worker loop:

  claim PENDING jobs atomically (store.claim_pending_jobs)
    → group by vision model → decode + resize on host
    → pad the batch to a fixed bucket size (one compiled XLA program per
      (model, bucket), no shape churn)
    → jitted forward + argmax on TPU
    → colorized mask PNG + connected-component detections
    → DONE (or FAILED with error_message — a transition the reference
      defines but never exercises, SURVEY.md §5)

Bucketing: batch sizes pad up to the next of BUCKETS; at most one program
per model config stays hot (the 9-config sweep would otherwise compile 9×N
programs, SURVEY.md §7 hard part 4).
"""

from __future__ import annotations

import io
import json
import os
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from visiontransformer_tpu.evaluation.visualize import (
    class_color_table,
    colorize,
)
from visiontransformer_tpu.models.registry import (
    get_model_family,
    resolve_model,
)
from visiontransformer_tpu.native import detections as native_detections
from visiontransformer_tpu.serve.store import JobStore

BUCKETS = (1, 2, 4, 8, 16, 32)


class ModelRunner:
    """One loaded model: params + a single jitted bucketed forward.

    mesh_shape=(dp,) shards each inference batch over the "data" axis of a
    device mesh — multi-chip serving (the reference's model server is
    single-device by construction). Params replicate; XLA partitions the
    forward. Trivial 1-device meshes collapse to plain placement (the
    NamedSharding-on-1-device pathology, CLAUDE.md)."""

    def __init__(self, model_row: Dict, *, compute_dtype: str = "bfloat16",
                 buckets: Sequence[int] = BUCKETS, mesh_shape=None):
        self.buckets = tuple(sorted(buckets))
        self.input_size = model_row["input_size"]
        self.family = model_row.get("model_family") or "vitseg"
        # conv-family rows carry an encoder preset in config_name
        # (store.register_model docstring; models/registry.py).
        self.cfg, self.params = resolve_model(
            self.family, model_row["config_name"],
            num_classes=model_row["num_classes"],
            input_size=self.input_size, compute_dtype=compute_dtype,
            checkpoint_path=model_row.get("checkpoint_path") or "")
        merge_r = int(model_row.get("token_merge_r") or 0)
        if merge_r:
            # Per-model ToMe opt-in (vitseg only — store validates):
            # near-lossless on trained models, ~1.2x (docs/PERFORMANCE.md).
            import dataclasses

            self.cfg = dataclasses.replace(
                self.cfg, vit=dataclasses.replace(self.cfg.vit,
                                                  token_merge_r=merge_r))
        if model_row.get("quantize") == "int8":
            # Per-model W8A8 opt-in (any family): weights quantize once at
            # load; the forward dispatches on the params form
            # (nn/layers.py linear/conv2d). vitseg uses the encoder-layer
            # allowlist; conv/MiT families the generic tree walk.
            # Measured ~1.18x the vitseg serving pipeline, near-lossless
            # on trained models (scripts/quant_quality.py).
            from visiontransformer_tpu.ops.quant import (
                quantize_params_tree,
                quantize_vitseg_params,
            )

            if self.family == "vitseg":
                self.params = quantize_vitseg_params(self.params)
            else:
                self.params = quantize_params_tree(self.params)
        self.color_table = class_color_table(None, self.cfg.num_classes)

        self.mesh = None
        if mesh_shape:
            from visiontransformer_tpu.parallel.mesh import (
                batch_sharding,
                create_mesh,
                replicated,
            )
            mesh = create_mesh(tuple(mesh_shape))
            if mesh.size > 1:
                self.mesh = mesh
                self._batch_sharding = batch_sharding(mesh)
                self.params = jax.device_put(self.params, replicated(mesh))
                dp = mesh.shape["data"]
                if any(b % dp for b in self.buckets):
                    raise ValueError(
                        f"every bucket size {self.buckets} must be "
                        f"divisible by the data-parallel axis ({dp})")

        cfg = self.cfg
        apply_fn = get_model_family(self.family).apply
        # uint8 in / uint8 out: host<->device traffic is 4x smaller than the
        # f32-in/int32-out it replaces (602->150 KB up, 200->50 KB down per
        # 224² job). Measured: the worker path was moving ~0.8 MB/job, which
        # at this runtime's ~36 MB/s tunnel IS the 41.9 jobs/s bound — the
        # /255 runs on-device (bit-identical math: uint8->f32 then /255).
        # Masks fit uint8 whenever num_classes <= 256 (PNG palettes cap
        # there anyway); wider heads keep int32.
        mask_dtype = jnp.uint8 if self.cfg.num_classes <= 256 else jnp.int32

        @jax.jit
        def forward(params, images_u8):
            images = images_u8.astype(jnp.float32) / 255.0
            logits = apply_fn(params, images, cfg, deterministic=True)
            return jnp.argmax(logits, axis=-1).astype(mask_dtype)

        self._forward = forward

    def dispatch(self, images: np.ndarray):
        """(B, H, W, 3) uint8 -> async device masks handle (padded to a
        bucket). Call resolve() on the handle to get (B, H, W) class ids."""
        if images.dtype != np.uint8:
            # The jitted forward divides by 255 on-device; a caller passing
            # the old pre-normalized [0,1] floats would get a second /255
            # and near-black inputs with no error.
            raise TypeError(
                f"ModelRunner.dispatch expects uint8 images (0..255, the "
                f"/255 normalization runs on-device), got {images.dtype}")
        b = images.shape[0]
        bucket = next((s for s in self.buckets if s >= b), self.buckets[-1])
        if b < bucket:
            pad = np.zeros((bucket - b,) + images.shape[1:], images.dtype)
            images = np.concatenate([images, pad])
        if self.mesh is not None:
            images = jax.device_put(images, self._batch_sharding)
        device_masks = self._forward(self.params, jnp.asarray(images))
        return _PendingMasks(device_masks, b)

    def predict(self, images: np.ndarray) -> np.ndarray:
        return self.dispatch(images).resolve()

    def warmup(self) -> None:
        """Compile every batch bucket up front: each bucket size is its own
        XLA program, and compiling lazily mid-traffic stalls live jobs for
        tens of seconds."""
        for bucket in self.buckets:
            dummy = np.zeros((bucket, self.input_size, self.input_size, 3),
                             np.uint8)
            self.predict(dummy)


class _PendingMasks:
    """Handle for an in-flight forward; resolve() blocks on the readback."""

    def __init__(self, device_masks, n: int):
        self._device_masks = device_masks
        self._n = n

    def resolve(self) -> np.ndarray:
        return np.asarray(self._device_masks)[:self._n]


class InferenceWorker:
    def __init__(self, store: JobStore, *, poll_interval: float = 0.02,
                 max_batch: int = BUCKETS[-1], linger: float = 0.005,
                 compute_dtype: str = "bfloat16", warmup: bool = True,
                 io_threads: int = 8, buckets: Sequence[int] = BUCKETS,
                 mesh_shape=None):
        self.warmup = warmup
        # Multi-chip serving: shard every batch over the "data" axis of a
        # (dp,) or (dp, 1) mesh; validated on the virtual CPU mesh
        # (tests/test_serving.py) the same way the trainer's mesh is.
        self.mesh_shape = mesh_shape
        # Fewer buckets = fewer compiled programs (faster cold start, the
        # dominant serving-startup cost on a remote-TPU runtime) at the
        # price of more batch padding; the full ladder minimizes padding.
        self.buckets = tuple(sorted(buckets))
        self.store = store
        self.poll_interval = poll_interval
        # Never claim more jobs than the largest bucket holds: a claim
        # above it would dispatch unpadded (un-warmed shape at best; with a
        # mesh, a batch the dp axis can't divide — every job in it FAILED).
        self.max_batch = min(max_batch, self.buckets[-1])
        # Dynamic-batching linger: when fewer than max_batch jobs are
        # pending, wait this long for more to arrive before dispatching a
        # partial bucket — classic latency/throughput knob.
        self.linger = linger
        self.compute_dtype = compute_dtype
        self._runners: Dict[int, ModelRunner] = {}
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        # Image decode and mask postprocess (PNG encode, connected
        # components) run on this pool, overlapping device compute — PIL and
        # zlib release the GIL for the heavy parts. The worker loop thread
        # only claims jobs and dispatches batches.
        self._io_pool = ThreadPoolExecutor(max_workers=io_threads,
                                           thread_name_prefix="worker-io")
        self._processed_lock = threading.Lock()
        self.processed = 0

    # ----------------------------------------------------------- lifecycle
    def preload_models(self) -> None:
        """Load + warm every registered model now (all bucket programs
        compiled) instead of lazily on the first claimed batch — a cold
        model otherwise stalls live jobs for the full multi-bucket XLA
        compile (minutes through a remote-TPU tunnel). Load failures are
        left for the per-job path to report."""
        for row in self.store.list_models():
            try:
                self._runner(row["id"])
            except Exception:
                pass

    def start(self, preload: bool = True) -> None:
        # Crash recovery: jobs a dead worker left PROCESSING go back to the
        # queue (any age — at startup no other worker can own them).
        self.store.requeue_stale_processing(older_than_s=0.0)
        if preload and self.warmup:
            self.preload_models()
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="tpu-inference-worker")
        self._thread.start()

    def stop(self, timeout: float = 10.0) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout)
        self._io_pool.shutdown(wait=True)

    MAX_IN_FLIGHT = 2  # batches dispatched before blocking on a readback

    def _loop(self) -> None:
        # Pipelined loop: dispatch up to MAX_IN_FLIGHT batches to the device
        # before blocking on the oldest readback, so device compute overlaps
        # host postprocessing and (on remote runtimes) dispatch latency.
        from collections import deque

        in_flight = deque()   # (runner, valid_jobs, pending_masks)
        post_futures = deque()  # postprocess work handed to the io pool

        def reap_posts(block: bool = False):
            while post_futures and (block or post_futures[0].done()):
                post_futures.popleft().result()

        def drain_one():
            runner, valid_jobs, pending = in_flight.popleft()
            try:
                masks = pending.resolve()
            except Exception as exc:
                for job in valid_jobs:
                    self.store.fail_job(job["id"], f"inference error: {exc}")
                return
            for job, mask in zip(valid_jobs, masks):
                post_futures.append(self._io_pool.submit(
                    self._finish_job_safe, runner, job, mask))
            reap_posts()

        while not self._stop.is_set():
            jobs = self.store.claim_pending_jobs(self.max_batch)
            if not jobs:
                while in_flight:
                    drain_one()
                reap_posts(block=True)
                self._stop.wait(self.poll_interval)
                continue
            if len(jobs) < self.max_batch and self.linger > 0:
                self._stop.wait(self.linger)
                jobs += self.store.claim_pending_jobs(
                    self.max_batch - len(jobs))
            for model_id, group in _group_by_model(jobs):
                entry = self._dispatch_group(model_id, group)
                if entry is not None:
                    in_flight.append(entry)
                while len(in_flight) > self.MAX_IN_FLIGHT:
                    drain_one()
        while in_flight:
            drain_one()
        reap_posts(block=True)

    def _finish_job_safe(self, runner: "ModelRunner", job: Dict,
                         mask: np.ndarray) -> None:
        try:
            self._finish_job(runner, job, mask)
        except Exception as exc:
            self.store.fail_job(job["id"], f"postprocess error: {exc}")

    # ------------------------------------------------------------- compute
    def _runner(self, model_id: int) -> ModelRunner:
        if model_id not in self._runners:
            row = self.store.get_model(model_id)
            if row is None:
                raise KeyError(f"unknown vision model {model_id}")
            runner = ModelRunner(row, compute_dtype=self.compute_dtype,
                                 buckets=self.buckets,
                                 mesh_shape=self.mesh_shape)
            if self.warmup:
                runner.warmup()
            self._runners[model_id] = runner
        return self._runners[model_id]

    def _dispatch_group(self, model_id: int, jobs: List[Dict]):
        """Decode + dispatch one batch; returns an in-flight entry or None."""
        try:
            runner = self._runner(model_id)
        except Exception as exc:  # model load failure fails the whole group
            for job in jobs:
                self.store.fail_job(job["id"], f"model load error: {exc}")
            return None

        def decode(job):
            img = Image.open(job["input_image"])
            # JPEG uploads decode at the nearest DCT-domain scale >= the
            # target (libjpeg "draft" mode) before the bilinear resize —
            # measured 2.0x on the decode (3.6 -> 1.8 ms for a 640x480
            # JPEG -> 224²); a no-op for PNG and other formats. uint8 out:
            # normalization happens on-device (ModelRunner.forward).
            img.draft("RGB", (runner.input_size, runner.input_size))
            img = img.convert("RGB").resize(
                (runner.input_size, runner.input_size), Image.BILINEAR)
            return np.asarray(img, np.uint8)

        # Decode the whole batch concurrently on the io pool (PIL releases
        # the GIL while decoding/resizing); failures fail only their job.
        images, valid_jobs = [], []
        futures = [self._io_pool.submit(decode, job) for job in jobs]
        for job, fut in zip(jobs, futures):
            try:
                images.append(fut.result())
                valid_jobs.append(job)
            except Exception as exc:
                self.store.fail_job(job["id"], f"image decode error: {exc}")

        if not valid_jobs:
            return None
        try:
            pending = runner.dispatch(np.stack(images))
        except Exception as exc:
            for job in valid_jobs:
                self.store.fail_job(job["id"], f"inference error: {exc}")
            return None
        return runner, valid_jobs, pending

    def _finish_job(self, runner: ModelRunner, job: Dict,
                    mask: np.ndarray) -> None:
        mask_dir = os.path.join(self.store.media_root, "masks")
        os.makedirs(mask_dir, exist_ok=True)
        mask_path = os.path.join(mask_dir, f"{job['id']}.png")
        # Indexed-palette PNG: one byte per pixel with the class palette in
        # the PLTE chunk — renders identically to the RGB colorize but skips
        # the H×W×3 expansion and compresses 3× less data (measured 0.17 ms
        # vs ~3 ms per 224² mask on the serving host). compress_level=1:
        # flat-colored masks are already tiny at level 1; level 6 costs ~3×
        # the CPU for a few hundred bytes. Falls back to RGB above 256
        # classes (PNG palettes cap at 256 entries). Keyed off color_table
        # (num_classes rows) — the only palette contract a runner must carry.
        if len(runner.color_table) <= 256:
            img = Image.fromarray(mask.astype(np.uint8), mode="P")
            img.putpalette(runner.color_table.astype(np.uint8).tobytes())
            img.save(mask_path, compress_level=1)
        else:
            Image.fromarray(colorize(mask, runner.color_table)).save(
                mask_path, compress_level=1)

        # One-pass all-class connected components (native C++;
        # per-class fallback inside) — the per-class loop re-scanned the
        # mask once per present class.
        detections = [
            {"class_id": cls, "box_yxyx": [y0, x0, y1, x1]}
            for cls, y0, x0, y1, x1 in native_detections(mask)
        ]
        self.store.complete_job(job["id"], mask_path, json.dumps(detections))
        with self._processed_lock:
            self.processed += 1


def _group_by_model(jobs: Sequence[Dict]) -> List[Tuple[int, List[Dict]]]:
    groups: Dict[int, List[Dict]] = {}
    for job in jobs:
        groups.setdefault(job["vision_model"], []).append(job)
    return list(groups.items())
