"""Serving platform: end-to-end over real HTTP with the embedded worker.

Covers the reference's API contract table (SURVEY.md §1): auth flow, job
submit → dynamic-batched inference → DONE with mask URL, ?status= filter,
pagination shape, double-completion guard, metrics counters, failure path.
"""

import io
import json
import threading
import time
import urllib.request

import numpy as np
import pytest
from PIL import Image

from visiontransformer_tpu.serve.store import JobStore
from visiontransformer_tpu.serve.server import create_server
from visiontransformer_tpu.serve.worker import InferenceWorker


def _png_bytes(size=32, value=128):
    img = Image.fromarray(
        np.full((size, size, 3), value, np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def _multipart(fields, files):
    boundary = "testboundary123"
    parts = []
    for k, v in fields.items():
        parts.append(f'--{boundary}\r\nContent-Disposition: form-data; '
                     f'name="{k}"\r\n\r\n{v}\r\n'.encode())
    for k, (fname, content) in files.items():
        parts.append(f'--{boundary}\r\nContent-Disposition: form-data; '
                     f'name="{k}"; filename="{fname}"\r\n'
                     f'Content-Type: image/png\r\n\r\n'.encode()
                     + content + b"\r\n")
    parts.append(f"--{boundary}--\r\n".encode())
    body = b"".join(parts)
    return body, f"multipart/form-data; boundary={boundary}"


class Client:
    def __init__(self, base):
        self.base = base
        self.cookies = {}

    def request(self, method, path, body=None, content_type=None,
                headers=None):
        req = urllib.request.Request(self.base + path, data=body,
                                     method=method)
        if content_type:
            req.add_header("Content-Type", content_type)
        if self.cookies:
            req.add_header("Cookie", "; ".join(
                f"{k}={v}" for k, v in self.cookies.items()))
        for k, v in (headers or {}).items():
            req.add_header(k, v)
        try:
            resp = urllib.request.urlopen(req)
            status = resp.status
        except urllib.error.HTTPError as e:
            resp = e
            status = e.code
        for header in resp.headers.get_all("Set-Cookie") or []:
            kv = header.split(";")[0]
            k, v = kv.split("=", 1)
            if v:
                self.cookies[k] = v
            else:
                self.cookies.pop(k, None)
        raw = resp.read()
        try:
            return status, json.loads(raw)
        except (json.JSONDecodeError, UnicodeDecodeError):
            return status, raw

    def get(self, path, **kw):
        return self.request("GET", path, **kw)

    def post_json(self, path, payload, **kw):
        return self.request("POST", path, json.dumps(payload).encode(),
                            "application/json", **kw)


@pytest.fixture(scope="module")
def serving(tmp_path_factory):
    media = str(tmp_path_factory.mktemp("media"))
    store = JobStore(":memory:", media_root=media)
    store.register_model("tiny-vit", num_classes=5, config_name="P16H512A8",
                         input_size=32)
    # Tiny config override: the registry names a sweep config; for the test
    # monkeypatch ModelRunner's config via a tiny sweep entry.
    import visiontransformer_tpu.models.registry as registry_mod
    import visiontransformer_tpu.serve.worker as worker_mod
    from visiontransformer_tpu.configs import SweepEntry

    orig = registry_mod.sweep_by_name
    registry_mod.sweep_by_name = lambda name: SweepEntry(0, 16, 64, 1, 4)

    worker = InferenceWorker(store, compute_dtype="float32")
    worker.start()
    server, app = create_server(store, worker=worker)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    yield Client(base), store
    worker.stop()
    server.shutdown()
    registry_mod.sweep_by_name = orig


def test_hello_and_schema(serving):
    client, _ = serving
    status, payload = client.get("/api/hello/")
    assert status == 200 and payload == {"message": "Hello, World!"}
    status, schema = client.get("/api/schema/")
    assert status == 200 and schema["openapi"].startswith("3.")
    assert "/api/inference-jobs/" in schema["paths"]


def test_vision_models(serving):
    client, _ = serving
    status, payload = client.get("/api/vision-models/")
    assert status == 200
    assert payload["count"] == 1
    assert payload["results"][0]["name"] == "tiny-vit"
    model_id = payload["results"][0]["id"]
    status, model = client.get(f"/api/vision-models/{model_id}/")
    assert status == 200 and model["config_name"] == "P16H512A8"
    status, _ = client.get("/api/vision-models/999/")
    assert status == 404


def test_full_job_flow(serving):
    client, store = serving
    # register + login
    status, _ = client.post_json("/api/users/register/",
                                 {"username": "ana", "password": "secret1"})
    assert status == 201
    status, user = client.post_json("/api/users/login/",
                                    {"username": "ana", "password": "secret1"})
    assert status == 200 and "sessionid" in client.cookies

    status, me = client.get("/api/users/current-user/")
    assert status == 200 and me["username"] == "ana"

    # CSRF cookie + header for the unsafe request
    client.get("/api/csrf/")
    csrf = client.cookies["csrftoken"]

    body, ctype = _multipart({"vision_model": "1"},
                             {"input_image": ("photo.png", _png_bytes())})
    status, job = client.request("POST", "/api/inference-jobs/", body, ctype,
                                 headers={"X-CSRFToken": csrf})
    assert status == 201, job
    assert job["status"] == "PENDING"
    assert job["user_username"] == "ana"
    assert job["vision_model_details"]["name"] == "tiny-vit"

    # worker completes it — observed via the ?wait= long-poll (blocks until
    # the store's terminal-transition notify instead of a sleep loop).
    # Generous deadline: on this single-core host a fully loaded suite run
    # can starve the worker thread's compile for well over 30 s.
    deadline = time.time() + 120
    while time.time() < deadline:
        status, detail = client.get(
            f"/api/inference-jobs/{job['id']}/?wait=5")
        if detail["status"] in ("DONE", "FAILED"):
            break
    assert detail["status"] == "DONE", detail
    assert detail["mask_image"].startswith("/media/masks/")

    # mask file is a readable PNG
    status, mask_bytes = client.get(detail["mask_image"])
    assert status == 200
    mask = Image.open(io.BytesIO(mask_bytes))
    assert mask.size == (32, 32)

    # listing + status filter + pagination shape
    status, listing = client.get("/api/inference-jobs/?status=DONE")
    assert status == 200 and listing["count"] >= 1
    assert set(listing.keys()) == {"count", "next", "previous", "results"}
    status, empty = client.get("/api/inference-jobs/?status=FAILED")
    assert empty["count"] == 0

    # double completion rejected
    body2, ctype2 = _multipart({}, {"mask_image": ("m.png", _png_bytes())})
    status, err = client.request(
        "POST", f"/api/inference-jobs/{job['id']}/complete/", body2, ctype2)
    assert status == 400 and "error" in err

    # metrics reflect the work
    status, metrics = client.get("/api/metrics/")
    assert metrics["total_photos_analyzed"] >= 1
    assert metrics["total_failures_detected"] >= 1  # DONE count (sic)
    assert metrics["total_users"] == 1


def test_csrf_enforced_for_session_requests(serving):
    client, _ = serving
    # logged-in client without CSRF header must be rejected
    body, ctype = _multipart({"vision_model": "1"},
                             {"input_image": ("p.png", _png_bytes())})
    status, err = client.request("POST", "/api/inference-jobs/", body, ctype)
    assert status == 403


def test_anonymous_listing_rejected(serving):
    client, _ = serving
    anon = Client(client.base)
    status, _ = anon.get("/api/inference-jobs/")
    assert status == 403


def test_job_failure_path(serving):
    client, store = serving
    # corrupt upload -> decode error -> FAILED with error_message
    anon = Client(client.base)
    body, ctype = _multipart({"vision_model": "1"},
                             {"input_image": ("bad.png", b"not a png")})
    status, job = anon.request("POST", "/api/inference-jobs/", body, ctype)
    assert status == 201
    deadline = time.time() + 15
    while time.time() < deadline:
        j = store.get_job(job["id"])
        if j["status"] == "FAILED":
            break
        time.sleep(0.1)
    assert j["status"] == "FAILED"
    assert "decode error" in j["error_message"]


def test_external_complete_flow(serving):
    client, store = serving
    # no-worker path: stop claiming by creating a job and completing via API
    anon = Client(client.base)
    body, ctype = _multipart({"vision_model": "1"},
                             {"input_image": ("p.png", _png_bytes())})
    status, job = anon.request("POST", "/api/inference-jobs/", body, ctype)
    assert status == 201
    # race with embedded worker is fine: complete() accepts PENDING or
    # PROCESSING, and exactly one of the two completions can win.
    body2, ctype2 = _multipart({}, {"mask_image": ("m.png", _png_bytes())})
    status, resp = anon.request(
        "POST", f"/api/inference-jobs/{job['id']}/complete/", body2, ctype2)
    assert status in (200, 400)
    final = store.get_job(job["id"])
    assert final["status"] == "DONE"


def test_concurrent_claims_are_disjoint():
    """The atomic-claim guarantee: N threads racing claim_pending_jobs never
    receive the same job twice (the by-construction fix for the reference's
    dispatch race, SURVEY.md §5)."""
    import threading as th

    store = JobStore(":memory:", media_root="/tmp/vtpu_claim_media")
    store.register_model("m", num_classes=1, config_name="P16H512A8")
    for _ in range(40):
        store.create_job(None, 1, "/tmp/x.png")

    claimed, lock = [], th.Lock()

    def claim_loop():
        while True:
            got = store.claim_pending_jobs(3)
            if not got:
                return
            with lock:
                claimed.extend(j["id"] for j in got)

    threads = [th.Thread(target=claim_loop) for _ in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert len(claimed) == 40
    assert len(set(claimed)) == 40  # no double claims


def test_worker_serves_trained_checkpoint(tmp_path):
    """Orbax checkpoint from a training run -> registered model with
    checkpoint_path -> worker loads trained weights (not random init)."""
    import os

    import numpy as np

    import jax

    import visiontransformer_tpu.models.registry as registry_mod
    import visiontransformer_tpu.serve.worker as worker_mod
    from visiontransformer_tpu.ckpt.io import save_checkpoint
    from visiontransformer_tpu.configs import SweepEntry, ViTSegConfig
    from visiontransformer_tpu.models.vitseg import vitseg_init

    entry = SweepEntry(0, 16, 64, 1, 4)
    cfg = ViTSegConfig(vit=entry.vit_config(image_size=32,
                                            intermediate_size=64),
                       num_classes=3)
    # a "trained" set of params: distinctive constant cls token
    params = vitseg_init(jax.random.PRNGKey(1), cfg)
    params["backbone"]["cls_token"] = params["backbone"]["cls_token"] * 0 + 0.5
    ckpt_dir = str(tmp_path / "ckpts")
    save_checkpoint(ckpt_dir, {"params": params, "step": np.asarray(7)},
                    epoch=1, step=7)

    store = JobStore(":memory:", media_root=str(tmp_path / "media"))
    store.register_model("trained", num_classes=3, config_name="X",
                         input_size=32,
                         checkpoint_path=os.path.join(ckpt_dir,
                                                      "epoch=1-step=7"))
    orig = registry_mod.sweep_by_name
    registry_mod.sweep_by_name = lambda name: SweepEntry(0, 16, 64, 1, 4)
    try:
        # intermediate_size differs from the sweep default: monkeypatch the
        # entry so ModelRunner builds the matching tiny config
        registry_mod.sweep_by_name = lambda name: entry

        runner = worker_mod.ModelRunner(store.get_model(1),
                                        compute_dtype="float32")
        loaded = np.asarray(runner.params["backbone"]["cls_token"])
        np.testing.assert_allclose(loaded, 0.5)
    finally:
        registry_mod.sweep_by_name = orig


def test_orchestrator_push_dispatch(tmp_path):
    """External-orchestrator mode (the reference's call_model_server HTTP
    dispatch, views.py:97-114): created jobs POST to the orchestrator with
    the shared token; unreachable orchestrators FAIL the job (the reference
    leaves it PENDING forever)."""
    import http.server
    import threading as th

    from visiontransformer_tpu.serve.http import parse_multipart
    from visiontransformer_tpu.serve.server import create_server

    received = {}

    class Orch(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            fields, files = parse_multipart(body,
                                            self.headers["Content-Type"])
            received.update(fields)
            received["token"] = self.headers.get("X-ORCH-TOKEN")
            received["image_bytes"] = len(files["input_image"].content)
            self.send_response(202)
            self.send_header("Content-Length", "0")
            self.end_headers()

    orch = http.server.HTTPServer(("127.0.0.1", 0), Orch)
    th.Thread(target=orch.serve_forever, daemon=True).start()
    orch_url = f"http://127.0.0.1:{orch.server_address[1]}/enqueue/"

    store = JobStore(":memory:", media_root=str(tmp_path))
    store.register_model("m", num_classes=1, config_name="P16H512A8")
    server, app = create_server(store, orch_url=orch_url,
                                orch_token="sekret")
    th.Thread(target=server.serve_forever, daemon=True).start()
    client = Client(f"http://127.0.0.1:{server.server_address[1]}")

    body, ctype = _multipart({"vision_model": "1"},
                             {"input_image": ("p.png", _png_bytes())})
    status, job = client.request("POST", "/api/inference-jobs/", body, ctype)
    assert status == 201
    deadline = time.time() + 10
    while time.time() < deadline and "job_id" not in received:
        time.sleep(0.05)
    assert received["job_id"] == job["id"]
    assert received["vision_model_id"] == "1"
    assert received["token"] == "sekret"
    assert received["image_bytes"] > 0
    # job stays PENDING awaiting the /complete/ callback
    assert store.get_job(job["id"])["status"] == "PENDING"

    # unreachable orchestrator -> FAILED (improvement over the reference)
    orch.shutdown()
    orch.server_close()  # actually release the socket (refuse connections)
    status, job2 = client.request("POST", "/api/inference-jobs/", body, ctype)
    deadline = time.time() + 10
    while time.time() < deadline:
        if store.get_job(job2["id"])["status"] == "FAILED":
            break
        time.sleep(0.05)
    assert store.get_job(job2["id"])["status"] == "FAILED"
    server.shutdown()


def test_profile_capture_endpoint(serving, tmp_path):
    """POST /api/admin/profile: auth-gated jax.profiler capture of the live
    serving workload (tracing parity the reference lacks, SURVEY.md §5)."""
    client, store = serving

    # anonymous -> 403
    status, err = client.post_json("/api/admin/profile", {"seconds": 0.1})
    assert status == 403

    client.post_json("/api/users/register/",
                     {"username": "ops", "password": "secret1"})
    client.post_json("/api/users/login/",
                     {"username": "ops", "password": "secret1"})
    client.get("/api/csrf/")
    csrf = client.cookies["csrftoken"]

    trace_dir = str(tmp_path / "trace")
    status, out = client.post_json(
        "/api/admin/profile", {"seconds": 0.2, "trace_dir": trace_dir},
        headers={"X-CSRFToken": csrf})
    assert status == 200, out
    assert out["trace_dir"] == trace_dir
    import os as _os
    assert _os.path.isdir(trace_dir) and _os.listdir(trace_dir)


def test_two_models_served_concurrently(tmp_path):
    """Jobs for two different registered models interleave: the worker
    groups claims by model and keeps one bucketed program per model."""
    import visiontransformer_tpu.models.registry as registry_mod
    import visiontransformer_tpu.serve.worker as worker_mod
    from visiontransformer_tpu.configs import SweepEntry

    orig = registry_mod.sweep_by_name
    registry_mod.sweep_by_name = lambda name: SweepEntry(0, 16, 64, 1, 4)
    store = JobStore(":memory:", media_root=str(tmp_path / "media"))
    a = store.register_model("model-a", num_classes=5,
                             config_name="P16H512A8", input_size=32)
    b = store.register_model("model-b", num_classes=3,
                             config_name="P16H768A12", input_size=32)
    img = tmp_path / "in.png"
    Image.fromarray(np.full((32, 32, 3), 77, np.uint8)).save(img)
    worker = InferenceWorker(store, compute_dtype="float32",
                             poll_interval=0.005, linger=0.0)
    try:
        jobs = [store.create_job(None, a if i % 2 else b, str(img))["id"]
                for i in range(10)]
        worker.start()
        deadline = time.time() + 60
        while time.time() < deadline:
            states = [store.get_job(j)["status"] for j in jobs]
            if all(s in ("DONE", "FAILED") for s in states):
                break
            time.sleep(0.1)
        assert all(s == "DONE" for s in states), states
        # each model got its own runner (its own compiled programs)
        assert set(worker._runners) == {a, b}
        # masks decode and differ in palette size source (num_classes)
        m = np.asarray(Image.open(store.get_job(jobs[0])["mask_image"]))
        assert m.shape[:2] == (32, 32)
    finally:
        worker.stop()
        registry_mod.sweep_by_name = orig


def test_worker_mesh_sharded_inference_matches_single_device(tmp_path):
    """Multi-chip serving: a dp-8 mesh-sharded ModelRunner produces the
    same masks as the unsharded runner (virtual CPU mesh)."""
    import visiontransformer_tpu.models.registry as registry_mod
    import visiontransformer_tpu.serve.worker as worker_mod
    from visiontransformer_tpu.configs import SweepEntry

    orig = registry_mod.sweep_by_name
    registry_mod.sweep_by_name = lambda name: SweepEntry(0, 16, 64, 1, 4)
    try:
        row = {"config_name": "P16H512A8", "num_classes": 5,
               "input_size": 32, "checkpoint_path": ""}
        plain = worker_mod.ModelRunner(row, compute_dtype="float32",
                                       buckets=(8, 16))
        sharded = worker_mod.ModelRunner(row, compute_dtype="float32",
                                         buckets=(8, 16), mesh_shape=(8,))
        assert sharded.mesh is not None
        rng = np.random.default_rng(3)
        images = rng.integers(0, 256, (11, 32, 32, 3)).astype(np.uint8)  # pads to 16
        np.testing.assert_array_equal(plain.predict(images),
                                      sharded.predict(images))
        # bucket/dp divisibility enforced
        import pytest as _pytest
        with _pytest.raises(ValueError):
            worker_mod.ModelRunner(row, compute_dtype="float32",
                                   buckets=(4, 8), mesh_shape=(8,))
    finally:
        registry_mod.sweep_by_name = orig


@pytest.mark.parametrize("family,config", [
    ("unet", "small"), ("fpn", "small"), ("linknet", "small"),
    ("pspnet", "small"), ("deeplabv3", "small"),
    ("segformer", "mit_b0"),  # the native Mix Transformer encoder
])
def test_conv_family_model_serves_jobs(tmp_path, family, config):
    """A model registered with any conv model_family (config_name carries
    the encoder preset) serves jobs through the worker end to end — the
    serving face of the generic StructuralDamageModel(arch, encoder)
    surface (reference model/CE/classes.py:106-110), one body for all
    families (family-generic ModelRunner path)."""
    store = JobStore(":memory:", media_root=str(tmp_path / "media"))
    mid = store.register_model(f"damage-{family}", num_classes=4,
                               config_name=config, input_size=32,
                               model_family=family)
    row = store.get_model(mid)
    assert row["model_family"] == family

    img = tmp_path / "in.png"
    Image.fromarray(np.full((32, 32, 3), 120, np.uint8)).save(img)
    worker = InferenceWorker(store, compute_dtype="float32",
                             poll_interval=0.005, linger=0.0)
    try:
        job = store.create_job(None, mid, str(img))
        worker.start()
        deadline = time.time() + 120
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


def test_token_merge_opt_in_serves_jobs(tmp_path):
    """A vitseg row registered with token_merge_r builds its runner with
    merging enabled (ops/token_merge.py; the serving face of the opt-in,
    docs/PERFORMANCE.md trained-model quality table) and still serves a
    job end to end; non-vitseg rows reject the flag."""
    from visiontransformer_tpu.serve.worker import InferenceWorker, ModelRunner

    store = JobStore(":memory:", media_root=str(tmp_path / "media"))
    with pytest.raises(ValueError):
        store.register_model("bad", num_classes=4, config_name="small",
                             model_family="unet", token_merge_r=8)

    mid = store.register_model("vit-tome", num_classes=4,
                               config_name="P16H512A8", input_size=32,
                               token_merge_r=2)
    row = store.get_model(mid)
    assert row["token_merge_r"] == 2
    runner = ModelRunner(row, compute_dtype="float32", buckets=(1,))
    assert runner.cfg.vit.token_merge_r == 2

    img = tmp_path / "in.png"
    Image.fromarray(np.full((32, 32, 3), 120, np.uint8)).save(img)
    worker = InferenceWorker(store, compute_dtype="float32",
                             poll_interval=0.005, linger=0.0)
    try:
        job = store.create_job(None, mid, str(img))
        worker.start()
        deadline = time.time() + 120
        while time.time() < deadline:
            detail = store.get_job(job["id"])
            if detail["status"] in ("DONE", "FAILED"):
                break
            time.sleep(0.1)
        assert detail["status"] == "DONE", detail
    finally:
        worker.stop()


def test_model_family_migration_and_runner_validation(tmp_path):
    """Old DBs gain the model_family column on open; .ckpt checkpoints are
    rejected for non-vitseg families with a clear error."""
    import sqlite3

    from visiontransformer_tpu.serve.worker import ModelRunner

    db = str(tmp_path / "old.db")
    conn = sqlite3.connect(db)
    conn.executescript("""
CREATE TABLE vision_models (
    id INTEGER PRIMARY KEY AUTOINCREMENT,
    name TEXT UNIQUE NOT NULL,
    description TEXT DEFAULT '',
    num_classes INTEGER NOT NULL,
    input_size INTEGER NOT NULL DEFAULT 224,
    config_name TEXT NOT NULL,
    checkpoint_path TEXT DEFAULT ''
);
INSERT INTO vision_models (name, num_classes, input_size, config_name)
VALUES ('legacy', 5, 32, 'P16H512A8');
""")
    conn.commit()
    conn.close()

    store = JobStore(db, media_root=str(tmp_path / "media"))
    row = store.get_model(1)
    assert row["name"] == "legacy" and row["model_family"] == "vitseg"

    bad = {"config_name": "small", "num_classes": 2, "input_size": 32,
           "model_family": "fpn",
           "checkpoint_path": str(tmp_path / "x.ckpt")}
    (tmp_path / "x.ckpt").write_bytes(b"")
    with pytest.raises(ValueError, match="vitseg family only"):
        ModelRunner(bad, compute_dtype="float32", buckets=(1,))


def test_mask_png_is_indexed_palette_with_colorize_colors(tmp_path):
    """Worker masks are indexed-palette PNGs (one byte/pixel, measured ~10x
    cheaper to encode than the RGB expansion) that decode to EXACTLY the
    colors colorize() would have produced — the wire format changed, the
    rendered mask did not."""
    from visiontransformer_tpu.evaluation.visualize import (
        class_color_table,
        colorize,
    )
    import visiontransformer_tpu.models.registry as registry_mod
    from visiontransformer_tpu.configs import SweepEntry

    store = JobStore(":memory:", media_root=str(tmp_path / "media"))
    mid = store.register_model("palette", num_classes=4, config_name="X",
                               input_size=32)
    orig = registry_mod.sweep_by_name
    registry_mod.sweep_by_name = lambda name: SweepEntry(0, 16, 64, 1, 4)
    img = tmp_path / "in.png"
    Image.fromarray(np.full((32, 32, 3), 90, np.uint8)).save(img)
    worker = InferenceWorker(store, compute_dtype="float32",
                             poll_interval=0.005, linger=0.0)
    try:
        job = store.create_job(None, mid, str(img))
        worker.start()
        deadline = time.time() + 120
        while time.time() < deadline:
            detail = store.get_job(job["id"])
            if detail["status"] in ("DONE", "FAILED"):
                break
            time.sleep(0.1)
        assert detail["status"] == "DONE", detail

        png = Image.open(detail["mask_image"])
        assert png.mode == "P"  # indexed palette, not RGB
        indices = np.asarray(png)
        rendered = np.asarray(png.convert("RGB"))
        table = class_color_table(None, 4)
        np.testing.assert_array_equal(rendered, colorize(indices, table))
    finally:
        worker.stop()
        registry_mod.sweep_by_name = orig


def test_serve_cli_args_reach_server_parser():
    """Every flag cli.py:cmd_serve forwards must exist in the server's own
    parser (regression: `serve --mesh 8` crashed with 'unrecognized
    arguments' because main() read args.mesh without defining --mesh)."""
    from visiontransformer_tpu.serve.server import build_arg_parser

    args = build_arg_parser().parse_args(
        ["--host", "127.0.0.1", "--port", "0", "--db", ":memory:",
         "--media-root", "/tmp/m", "--no-worker", "--no-warmup",
         "--mesh", "4,2", "--compilation-cache", "/tmp/jaxcache"])
    assert args.mesh == "4,2"
    assert args.compilation_cache == "/tmp/jaxcache"
    assert args.no_worker and args.no_warmup
    # defaults keep the worker on and the cache off
    d = build_arg_parser().parse_args([])
    assert d.mesh is None and d.compilation_cache is None and not d.no_worker


def test_model_runner_rejects_float_images(tmp_path):
    """The jitted forward normalizes uint8 on-device (/255); a caller
    passing pre-normalized floats would silently get a second /255 and
    near-black inputs — dispatch must reject non-uint8 batches."""
    import visiontransformer_tpu.models.registry as registry_mod
    import visiontransformer_tpu.serve.worker as worker_mod
    from visiontransformer_tpu.configs import SweepEntry

    orig = registry_mod.sweep_by_name
    registry_mod.sweep_by_name = lambda name: SweepEntry(0, 16, 64, 1, 4)
    try:
        row = {"config_name": "P16H512A8", "num_classes": 5,
               "input_size": 32, "checkpoint_path": ""}
        runner = worker_mod.ModelRunner(row, compute_dtype="float32",
                                        buckets=(1,))
        with pytest.raises(TypeError, match="uint8"):
            runner.predict(np.zeros((1, 32, 32, 3), np.float32))
        runner.predict(np.zeros((1, 32, 32, 3), np.uint8))  # fine
    finally:
        registry_mod.sweep_by_name = orig


def test_wait_for_job_per_job_wakeups():
    """Long-poll waiters are woken per job (round-4 fix: a shared
    notify_all thundered every parked waiter through a SQLite re-read on
    every completion). A completion must wake ITS waiter promptly, leave
    waiters on other jobs parked, and a completion landing before the wait
    call must return immediately (registration-before-check, no lost
    wakeup)."""
    store = JobStore(":memory:", media_root="/tmp/vtpu_wait_media")
    store.register_model("m", num_classes=1, config_name="P16H512A8")
    job_a = store.create_job(None, 1, "/tmp/a.png")
    job_b = store.create_job(None, 1, "/tmp/b.png")

    results = {}

    def waiter(name, job_id, timeout):
        t0 = time.monotonic()
        job = store.wait_for_job(job_id, timeout)
        results[name] = (job["status"], time.monotonic() - t0)

    ta = threading.Thread(target=waiter, args=("a", job_a["id"], 30.0))
    tb = threading.Thread(target=waiter, args=("b", job_b["id"], 1.0))
    ta.start()
    tb.start()
    time.sleep(0.15)  # both parked
    store.complete_job(job_a["id"], "/tmp/mask_a.png")
    ta.join(timeout=5.0)
    assert not ta.is_alive()
    status_a, dt_a = results["a"]
    assert status_a == "DONE"
    assert dt_a < 2.0  # woken by the event, not the 5 s safety tick

    tb.join(timeout=5.0)  # b's job never completes: times out at its 1 s
    assert not tb.is_alive()
    status_b, dt_b = results["b"]
    assert status_b == "PENDING"
    assert dt_b >= 0.9

    # Waiter registry is cleaned up after both paths (wake and timeout).
    assert store._waiters == {}

    # Terminal-before-wait: returns immediately with the final status.
    t0 = time.monotonic()
    job = store.wait_for_job(job_a["id"], 10.0)
    assert job["status"] == "DONE"
    assert time.monotonic() - t0 < 1.0
