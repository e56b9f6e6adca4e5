"""Fault injection: the job pipeline never wedges.

The reference has no fault injection at all (SURVEY.md §5); here a flaky
model runner randomly throws and every job still terminates in DONE or
FAILED — nothing is left PENDING/PROCESSING.
"""

import os
import time

import numpy as np
import pytest
from PIL import Image

from visiontransformer_tpu.serve.store import JobStore
from visiontransformer_tpu.serve.worker import InferenceWorker


class FlakyRunner:
    input_size = 16

    def __init__(self, fail_every=3):
        self.calls = 0
        self.fail_every = fail_every
        from visiontransformer_tpu.evaluation.visualize import class_color_table
        self.color_table = class_color_table(None, 3)

    def predict(self, images):
        self.calls += 1
        if self.calls % self.fail_every == 0:
            raise RuntimeError("injected inference fault")
        return np.zeros(images.shape[:3], np.int32)

    def dispatch(self, images):
        runner = self

        class _Pending:
            def resolve(self):
                return runner.predict(images)

        # faults can fire at dispatch OR at resolve time
        if runner.calls % (runner.fail_every * 2) == 1 and runner.calls > 0:
            runner.calls += 1
            raise RuntimeError("injected inference fault (dispatch)")
        return _Pending()


def test_no_job_left_behind(tmp_path, monkeypatch):
    store = JobStore(":memory:", media_root=str(tmp_path))
    store.register_model("m", num_classes=3, config_name="P16H512A8",
                         input_size=16)

    img_path = str(tmp_path / "in.png")
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(img_path)
    jobs = [store.create_job(None, 1, img_path) for _ in range(17)]

    worker = InferenceWorker(store, poll_interval=0.005, linger=0.0,
                             max_batch=4)
    flaky = FlakyRunner()
    monkeypatch.setattr(worker, "_runner", lambda model_id: flaky)
    worker.start()

    deadline = time.time() + 30
    while time.time() < deadline:
        statuses = {store.get_job(j["id"])["status"] for j in jobs}
        if statuses <= {"DONE", "FAILED"}:
            break
        time.sleep(0.1)
    worker.stop()

    statuses = [store.get_job(j["id"])["status"] for j in jobs]
    assert set(statuses) <= {"DONE", "FAILED"}, statuses
    assert statuses.count("DONE") > 0
    assert statuses.count("FAILED") > 0  # faults actually fired
    for j in jobs:
        row = store.get_job(j["id"])
        if row["status"] == "FAILED":
            assert "inference" in row["error_message"]
        else:
            assert os.path.exists(
                os.path.join(str(tmp_path), "masks", f"{j['id']}.png"))
