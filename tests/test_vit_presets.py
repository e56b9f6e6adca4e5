"""Named ViT size presets (vit_b_16 / vit_l_16 / vit_h_14).

The reference's only ViT shapes are its 9-config sweep (reference
model/CE/datasetTestViTmodel.py:97-107, intermediate_size pinned to 3072 at
model/CE/classes.py:228). The named presets extend the serving registry to
the standard paper sizes — vit_l_16 is the driver's serving stretch config
(BASELINE.json config 5: "dynamic-batched TPU worker with ViT-L/16").
"""

import time

import numpy as np
import pytest
from PIL import Image

from visiontransformer_tpu.configs import vit_config_by_name
from visiontransformer_tpu.serve.store import JobStore
from visiontransformer_tpu.serve.worker import InferenceWorker


def test_vit_config_by_name_resolves_presets_and_sweep_rows():
    large = vit_config_by_name("vit_l_16")
    assert (large.patch_size, large.hidden_size, large.num_hidden_layers,
            large.num_attention_heads, large.intermediate_size) == (
        16, 1024, 24, 16, 4096)
    huge = vit_config_by_name("vit_h_14", image_size=448)
    assert (huge.patch_size, huge.hidden_size, huge.num_hidden_layers,
            huge.intermediate_size) == (14, 1280, 32, 5120)
    assert huge.image_size == 448

    # Sweep rows still resolve through the same name lookup, keeping the
    # reference's fixed 3072 MLP width (model/CE/classes.py:228).
    sweep = vit_config_by_name("P16H768A12")
    assert (sweep.hidden_size, sweep.intermediate_size) == (768, 3072)

    with pytest.raises(KeyError):
        vit_config_by_name("vit_g_14")


def test_resolve_model_rejects_indivisible_input_size():
    from visiontransformer_tpu.models.registry import resolve_model

    # 224 % 14 == 0 is fine, but 512 % 14 != 0 must fail fast with a clear
    # error instead of a shape blowup inside patchify.
    with pytest.raises(ValueError, match="not divisible"):
        resolve_model("vitseg", "vit_h_14", num_classes=2, input_size=512)


def test_register_model_cli_accepts_vit_presets(tmp_path):
    from visiontransformer_tpu.cli import main as cli_main

    db = str(tmp_path / "serving.db")
    base = ["register-model", "--db", db, "--media-root",
            str(tmp_path / "media")]
    assert cli_main(base + ["--name", "large", "--config", "vit_l_16",
                            "--num-classes", "17"]) == 0
    assert cli_main(base + ["--name", "bad", "--config", "vit_g_14",
                            "--num-classes", "17"]) == 1

    rows = JobStore(db, media_root=str(tmp_path / "media")).list_models()
    assert [r["name"] for r in rows] == ["large"]
    assert rows[0]["config_name"] == "vit_l_16"


def test_vit_h_14_serves_jobs_end_to_end(tmp_path):
    """vit_h_14 through the worker with NO monkeypatching: the real
    H=1280/L=32 (0.63B-param) model at input 28 (2x2 patches of 14) — the
    geometry the 224² serving path uses, CPU-tractable. Companion TPU
    numbers (224²/448² masks/s, worker jobs/s) live in docs/PERFORMANCE.md
    §'Named presets'."""
    store = JobStore(":memory:", media_root=str(tmp_path / "media"))
    mid = store.register_model("vit-huge", num_classes=4,
                               config_name="vit_h_14", input_size=28)

    img = tmp_path / "in.png"
    Image.fromarray(np.full((40, 40, 3), 90, np.uint8)).save(img)
    worker = InferenceWorker(store, compute_dtype="float32",
                             poll_interval=0.005, linger=0.0, buckets=(1,))
    try:
        job = store.create_job(None, mid, str(img))
        worker.start()
        deadline = time.time() + 600  # 0.63B f32 init + compile, 1 CPU core
        while time.time() < deadline:
            detail = store.get_job(job["id"])
            if detail["status"] in ("DONE", "FAILED"):
                break
            time.sleep(0.2)
        assert detail["status"] == "DONE", detail
        mask = np.asarray(Image.open(detail["mask_image"]))
        assert mask.shape[:2] == (28, 28)
    finally:
        worker.stop()


def test_vit_preset_serves_jobs_end_to_end(tmp_path):
    """A preset-named vitseg row goes through the worker with NO test
    monkeypatching (the other vitseg serving tests swap in tiny sweep
    entries): vit_b_16 at a small input size is the full real model."""
    store = JobStore(":memory:", media_root=str(tmp_path / "media"))
    mid = store.register_model("vit-base", num_classes=4,
                               config_name="vit_b_16", input_size=32)

    img = tmp_path / "in.png"
    Image.fromarray(np.full((32, 32, 3), 120, np.uint8)).save(img)
    worker = InferenceWorker(store, compute_dtype="float32",
                             poll_interval=0.005, linger=0.0, buckets=(1,))
    try:
        job = store.create_job(None, mid, str(img))
        worker.start()
        deadline = time.time() + 180
        while time.time() < deadline:
            detail = store.get_job(job["id"])
            if detail["status"] in ("DONE", "FAILED"):
                break
            time.sleep(0.1)
        assert detail["status"] == "DONE", detail
        mask = np.asarray(Image.open(detail["mask_image"]))
        assert mask.shape[:2] == (32, 32)
    finally:
        worker.stop()
