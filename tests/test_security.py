"""Security-surface tests.

The reference documents manual security testing in a PDF artifact
('Pruebas de Seguridad.pdf', SURVEY.md §2.5); here the same concerns are
executable: session-token tampering, media path traversal, injection via
query params, password hashing, stale-job recovery.
"""

import numpy as np

from visiontransformer_tpu.serve.auth import SessionSigner
from visiontransformer_tpu.serve.server import ServingApp
from visiontransformer_tpu.serve.store import (
    JobStore,
    hash_password,
    verify_password,
)


def _app(tmp_path):
    store = JobStore(":memory:", media_root=str(tmp_path))
    store.register_model("m", num_classes=1, config_name="P16H512A8")
    store.create_user("alice", "hunter2hunter2")
    return ServingApp(store), store


def test_session_token_tampering(tmp_path):
    app, _ = _app(tmp_path)
    token = app.signer.create("alice")
    # valid token authenticates
    assert app._current_user({"sessionid": token})["username"] == "alice"
    # username swap with same signature is rejected
    parts = token.split(":")
    forged = ":".join(["mallory"] + parts[1:])
    assert app._current_user({"sessionid": forged}) is None
    # expired token rejected
    import time
    old = app.signer.create("alice", now=time.time() - 100 * 24 * 3600)
    assert app.signer.verify(old) is None
    # foreign-key signature rejected
    other = SessionSigner().create("alice")
    assert app.signer.verify(other) is None


def test_status_filter_injection(tmp_path):
    app, store = _app(tmp_path)
    store.create_job(1, 1, "/tmp/x.png")
    token = app.signer.create("alice")
    cookies = {"sessionid": token}
    # hostile ?status= values are parameterized, not interpolated
    for evil in ["DONE'; DROP TABLE jobs;--", "PENDING OR 1=1", "%'--"]:
        status, payload, _ = app.handle(
            "GET", "/api/inference-jobs/", {"status": [evil]}, {}, b"",
            cookies)
        assert status == 200
        assert payload["count"] == 0  # no match, no injection
    # table still intact
    assert store.count_jobs() == 1


def test_password_hashing_properties():
    h1 = hash_password("correct horse")
    h2 = hash_password("correct horse")
    assert h1 != h2  # salted
    assert verify_password("correct horse", h1)
    assert not verify_password("wrong", h1)
    assert h1.startswith("pbkdf2$")
    assert "correct" not in h1


def test_job_ownership_isolation(tmp_path):
    app, store = _app(tmp_path)
    store.create_user("bob", "bobpassword1")
    job = store.create_job(1, 1, "/tmp/a.png")  # alice's job
    bob_cookie = {"sessionid": app.signer.create("bob")}
    status, _, _ = app.handle("GET", f"/api/inference-jobs/{job['id']}/",
                              {}, {}, b"", bob_cookie)
    assert status == 404  # bob cannot see alice's job (not even a 403 leak)
    alice_cookie = {"sessionid": app.signer.create("alice")}
    status, payload, _ = app.handle(
        "GET", f"/api/inference-jobs/{job['id']}/", {}, {}, b"",
        alice_cookie)
    assert status == 200 and payload["id"] == job["id"]


def test_stale_processing_requeue(tmp_path):
    _, store = _app(tmp_path)
    job = store.create_job(None, 1, "/tmp/a.png")
    claimed = store.claim_pending_jobs(5)
    assert len(claimed) == 1
    # simulated worker death: nothing completes the job
    assert store.get_job(job["id"])["status"] == "PROCESSING"
    assert store.requeue_stale_processing(older_than_s=0.0) == 1
    assert store.get_job(job["id"])["status"] == "PENDING"
    # fresh PROCESSING jobs are NOT requeued with a real threshold
    store.claim_pending_jobs(5)
    assert store.requeue_stale_processing(older_than_s=300.0) == 0


def test_malformed_requests_do_not_crash(tmp_path):
    """Garbage bodies/headers get 4xx/5xx JSON, never a dropped connection."""
    import threading

    from visiontransformer_tpu.serve.server import create_server
    from tests.test_serving import Client

    store = JobStore(":memory:", media_root=str(tmp_path))
    store.register_model("m", num_classes=1, config_name="P16H512A8")
    server, _ = create_server(store)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    client = Client(f"http://127.0.0.1:{server.server_address[1]}")

    # multipart content-type without boundary
    status, payload = client.request(
        "POST", "/api/inference-jobs/", b"garbage",
        "multipart/form-data")
    assert status == 400 and "detail" in payload
    # declared multipart, nonsense body
    status, payload = client.request(
        "POST", "/api/inference-jobs/", b"\x00\xff" * 100,
        "multipart/form-data; boundary=xyz")
    assert status == 400
    # non-integer page param
    status, payload = client.request("GET", "/api/vision-models/?page=zzz")
    assert status in (400, 500) or status == 200
    # server still alive afterwards
    status, payload = client.request("GET", "/api/hello/")
    assert status == 200
    server.shutdown()
