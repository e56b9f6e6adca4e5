"""Security hardening regression tests (round-1 advisor findings).

Covers: admin page auth gate + HTML escaping, upload-extension whitelist,
media-serving content-type hardening, byte-exact multipart parsing, and
prefetch exception propagation.
"""

import io
import threading

import numpy as np
import pytest
from PIL import Image

from visiontransformer_tpu.serve.store import JobStore
from visiontransformer_tpu.serve.server import ServingApp, create_server
from visiontransformer_tpu.serve.http import parse_multipart


def _png_bytes(size=8):
    img = Image.fromarray(np.zeros((size, size, 3), np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def _multipart(fields, files):
    boundary = "secboundary42"
    parts = []
    for k, v in fields.items():
        parts.append(f'--{boundary}\r\nContent-Disposition: form-data; '
                     f'name="{k}"\r\n\r\n{v}\r\n'.encode())
    for k, (fname, content) in files.items():
        parts.append(f'--{boundary}\r\nContent-Disposition: form-data; '
                     f'name="{k}"; filename="{fname}"\r\n'
                     f'Content-Type: application/octet-stream\r\n\r\n'.encode()
                     + content + b"\r\n")
    parts.append(f"--{boundary}--\r\n".encode())
    return b"".join(parts), f"multipart/form-data; boundary={boundary}"


@pytest.fixture()
def server(tmp_path):
    store = JobStore(":memory:", media_root=str(tmp_path / "media"))
    store.register_model("m1", num_classes=5, config_name="P16H512A8",
                         input_size=32)
    srv, app = create_server(store, worker=None)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", store, app
    srv.shutdown()


def _request(base, method, path, body=None, content_type=None, headers=None):
    import urllib.error
    import urllib.request

    req = urllib.request.Request(base + path, data=body, method=method)
    if content_type:
        req.add_header("Content-Type", content_type)
    for k, v in (headers or {}).items():
        req.add_header(k, v)
    try:
        resp = urllib.request.urlopen(req)
        return resp.status, dict(resp.headers), resp.read()
    except urllib.error.HTTPError as e:
        return e.code, dict(e.headers), e.read()


def test_admin_requires_auth(server):
    base, store, app = server
    status, _, body = _request(base, "GET", "/admin/")
    assert status == 403
    assert b"<html" not in body  # no dashboard content leaked


def test_admin_escapes_user_controlled_fields():
    store = JobStore(":memory:", media_root="/tmp/vtpu_sec_media")
    store.register_model('<img src=x onerror=alert(1)>', num_classes=5,
                         config_name="P16H512A8")
    store.create_user('<script>steal()</script>', "pw123456")
    job = store.create_job(1, 1, "/tmp/x.png")
    store.fail_job(job["id"], '<svg onload=alert(2)> boom')

    app = ServingApp(store)
    html = app.render_admin()
    assert "<script>steal()" not in html
    assert "<img src=x" not in html
    assert "<svg onload" not in html
    assert "&lt;script&gt;steal()" in html  # escaped, still visible


def test_upload_extension_whitelisted(server):
    base, store, app = server
    body, ctype = _multipart(
        {"vision_model": "1"},
        {"input_image": ("evil.html", b"<script>alert(1)</script>")})
    status, _, raw = _request(base, "POST", "/api/inference-jobs/", body,
                              ctype)
    assert status == 201, raw
    import json

    job = json.loads(raw)
    stored = store.get_job(job["id"])["input_image"]
    assert stored.endswith(".png"), stored  # .html was rejected


def test_media_served_with_nosniff_and_no_active_types(server, tmp_path):
    base, store, app = server
    # Plant a non-image file in media (simulates any stored artifact).
    blob_dir = tmp_path / "media"
    blob_dir.mkdir(exist_ok=True)
    (blob_dir / "weird.bin").write_bytes(b"\x00\x01binary")
    png = blob_dir / "ok.png"
    png.write_bytes(_png_bytes())

    status, headers, _ = _request(base, "GET", "/media/weird.bin")
    assert status == 200
    assert headers["Content-Type"] == "application/octet-stream"
    assert headers["X-Content-Type-Options"] == "nosniff"
    assert headers.get("Content-Disposition") == "attachment"

    status, headers, _ = _request(base, "GET", "/media/ok.png")
    assert status == 200
    assert headers["Content-Type"] == "image/png"
    assert "Content-Disposition" not in headers


def test_multipart_preserves_trailing_crlf_bytes():
    # File content legitimately ending in \r\n must round-trip byte-exact
    # (only the single delimiter CRLF is removed).
    payload = b"line1\r\nline2\r\n\r\n"
    body, ctype = _multipart({}, {"f": ("data.bin", payload)})
    _, files = parse_multipart(body, ctype)
    assert files["f"].content == payload


def test_prefetch_propagates_producer_exception():
    from visiontransformer_tpu.data.pipeline import prefetch

    def gen():
        yield 1
        yield 2
        raise RuntimeError("decode failed")

    it = prefetch(gen(), depth=2)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(RuntimeError, match="decode failed"):
        next(it)


def test_media_path_traversal_blocked(server, tmp_path):
    base, store, app = server
    secret = tmp_path / "secret.txt"
    secret.write_text("top secret")
    # absolute and relative escapes both 404
    for path in ("/media/../secret.txt", "/media/..%2fsecret.txt",
                 "/media/a/../../secret.txt"):
        status, _, body = _request(base, "GET", path)
        assert status == 404, (path, status)
        assert b"top secret" not in body


def test_tampered_session_cookie_rejected(server):
    base, store, app = server
    import json as _json
    _request(base, "POST", "/api/users/register/",
             _json.dumps({"username": "eve", "password": "pw-123456"}).encode(),
             "application/json")
    good = app.signer.create("eve")
    # legitimate cookie works
    status, _, body = _request(base, "GET", "/api/users/current-user/",
                               headers={"Cookie": f"sessionid={good}"})
    assert status == 200
    # flip the signature / forge another username -> rejected
    user, expiry, sig = good.rsplit(":", 2)
    forged = f"admin:{expiry}:{sig}"
    bad_sig = f"{user}:{expiry}:{'0' * len(sig)}"
    for cookie in (forged, bad_sig, "garbage"):
        status, _, _ = _request(base, "GET", "/api/users/current-user/",
                                headers={"Cookie": f"sessionid={cookie}"})
        assert status == 403, cookie


def test_complete_requires_orchestrator_token(tmp_path):
    """With an orch token configured, /complete/ rejects callbacks that
    don't present it (otherwise any client with a job UUID could attach an
    arbitrary mask)."""
    store = JobStore(":memory:", media_root=str(tmp_path / "media"))
    store.register_model("m", num_classes=5, config_name="P16H512A8",
                         input_size=32)
    srv, app = create_server(store, worker=None, orch_token="sekret")
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        job = store.create_job(None, 1, str(tmp_path / "in.png"))
        body, ctype = _multipart({}, {"mask_image": ("m.png", _png_bytes())})
        status, _, _ = _request(
            base, "POST", f"/api/inference-jobs/{job['id']}/complete/",
            body, ctype)
        assert status == 403
        status, _, _ = _request(
            base, "POST", f"/api/inference-jobs/{job['id']}/complete/",
            body, ctype, headers={"X-ORCH-TOKEN": "wrong"})
        assert status == 403
        status, _, _ = _request(
            base, "POST", f"/api/inference-jobs/{job['id']}/complete/",
            body, ctype, headers={"X-ORCH-TOKEN": "sekret"})
        assert status == 200
        assert store.get_job(job["id"])["status"] == "DONE"
    finally:
        srv.shutdown()


def test_complete_mask_extension_whitelisted(server):
    """/complete/ applies the same stored-XSS extension whitelist as the
    upload path: an .svg mask name (active content — image/svg+xml runs
    script) is stored and served as .png."""
    base, store, app = server
    job = store.create_job(None, 1, "unused.png")
    svg = b"<svg xmlns='http://www.w3.org/2000/svg'><script>1</script></svg>"
    body, ctype = _multipart({}, {"mask_image": ("evil.svg", svg)})
    status, _, payload = _request(
        base, "POST", f"/api/inference-jobs/{job['id']}/complete/",
        body, ctype)
    assert status == 200
    detail = store.get_job(job["id"])
    assert detail["mask_image"].endswith(".png")
    # And even a pre-existing .svg under media never serves as svg+xml.
    import os
    svg_path = os.path.join(store.media_root, "masks", "x.svg")
    os.makedirs(os.path.dirname(svg_path), exist_ok=True)
    with open(svg_path, "wb") as f:
        f.write(svg)
    status, headers, _ = _request(base, "GET", "/media/masks/x.svg")
    assert status == 200
    assert headers.get("Content-Type") == "application/octet-stream"
    assert "attachment" in headers.get("Content-Disposition", "")


def test_restore_rejects_shape_mismatch(tmp_path):
    """Partial restore must not silently accept shape-mismatched leaves
    (e.g. resuming a 5-class run from a 17-class checkpoint)."""
    import numpy as np

    import jax

    from visiontransformer_tpu.ckpt.io import (
        restore_checkpoint,
        save_checkpoint,
    )

    tree = {"params": {"w": np.zeros((17, 4), np.float32)},
            "step": np.asarray(3)}
    save_checkpoint(str(tmp_path / "ck"), tree, epoch=0, step=3)
    target = {"params": {"w": jax.numpy.zeros((5, 4), jax.numpy.float32)},
              "step": np.zeros((), np.int64)}
    with pytest.raises(ValueError, match="does not match"):
        restore_checkpoint(str(tmp_path / "ck" / "epoch=0-step=3"), target)


def test_worker_max_batch_clamped_to_buckets():
    """A claim larger than the biggest bucket would dispatch unpadded
    (un-warmed shape; with a mesh, a batch dp can't divide)."""
    from visiontransformer_tpu.serve.worker import InferenceWorker

    store = JobStore(":memory:")
    worker = InferenceWorker(store, buckets=(2, 6), max_batch=32,
                             warmup=False)
    assert worker.max_batch == 6
