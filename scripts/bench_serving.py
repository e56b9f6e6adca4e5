"""End-to-end serving throughput benchmark (REST submit -> mask DONE).

Stands up the full stack in one process — JobStore, dynamic-batching
InferenceWorker on the real TPU, ThreadingHTTPServer — then drives it with
concurrent HTTP clients: register/login, multipart job submit, poll until
DONE. Reports jobs/s over the steady-state window.

Round-3 numbers with THIS harness (256 jobs, submit->DONE for every job):
49.2 jobs/s full stack / 86.6 jobs/s worker-only on the single-core host
(docs/PERFORMANCE.md "End-to-end serving"; round 2 measured 23.2/41.9
before the uint8-over-the-tunnel fix). The raw model throughput is far
higher; end-to-end is host+tunnel-bound.

Env knobs:
  SERVE_CONFIG   model config name (default P16H768A12; e.g. vit_l_16 for
                 the BASELINE.json ViT-L/16 serving stretch config)
  SERVE_FAMILY   model family (default vitseg)
  SERVE_INPUT    input size (default 224)
  WORKER_ONLY=1  skip HTTP: create jobs straight in the store and measure
                 claim->decode->TPU->postprocess->DONE
  N_JOBS / N_CLIENTS  job and client counts

Split-process mode (round-4: isolate the HTTP clients' host-CPU cost from
the stack's — on this single-core host the in-process clients contend with
the server+worker for the same core, so the full-stack number conflates
bench-client cost with stack cost):
  SERVE_ONLY=1       stand up store+worker+server only; print "READY <port>",
                     then wait until N_JOBS reach DONE/FAILED and report the
                     server-side window (first job created -> last done) and
                     this process's CPU time over it.
  CLIENT_ONLY=<url>  drive the client load against an external server (no
                     jax import in this process); report wall jobs/s and
                     this process's CPU time.
Both processes print `process_cpu`: if client CPU + server CPU ≈ wall (core
saturated) the full-stack gap is bench-client contention, not stack cost.
"""

import http.client
import io
import json
import os
import sys
import tempfile
import threading
import time
import urllib.parse
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import numpy as np
from PIL import Image

N_JOBS = int(os.environ.get("N_JOBS", "256"))
N_CLIENTS = int(os.environ.get("N_CLIENTS", "32"))
SERVE_CONFIG = os.environ.get("SERVE_CONFIG", "P16H768A12")
SERVE_FAMILY = os.environ.get("SERVE_FAMILY", "vitseg")
SERVE_INPUT = int(os.environ.get("SERVE_INPUT", "224"))
WORKER_ONLY = os.environ.get("WORKER_ONLY", "") == "1"
SERVE_ONLY = os.environ.get("SERVE_ONLY", "") == "1"
CLIENT_ONLY = os.environ.get("CLIENT_ONLY", "")
# KEEPALIVE=1 (default): one persistent HTTP/1.1 connection per client
# thread (the server is keep-alive-ready — protocol_version HTTP/1.1 +
# Content-Length on every response); 0: the round-3 urllib client, which
# opens a fresh TCP connection (and server thread) per request.
KEEPALIVE = os.environ.get("KEEPALIVE", "1") == "1"


class KeepAliveClient:
    """Minimal persistent-connection REST client: cookie jar + CSRF over one
    http.client.HTTPConnection, reconnecting transparently. Amortizes TCP
    connect + server thread-spawn across a client's whole job stream — the
    untried lever round 4's split-process isolation pointed at
    (docs/PERFORMANCE.md round-4 section)."""

    def __init__(self, base: str, username: str):
        u = urllib.parse.urlparse(base)
        self.host, self.port = u.hostname, u.port
        self.conn = None
        self.cookies = {}
        self.request("GET", "/api/csrf/")
        for path in ("/api/users/register/", "/api/users/login/"):
            self.post_json(path, {"username": username,
                                  "password": "pw-123456"})

    def _headers(self, extra):
        h = dict(extra or {})
        if self.cookies:
            h["Cookie"] = "; ".join(f"{k}={v}"
                                    for k, v in self.cookies.items())
        if "csrftoken" in self.cookies:
            h.setdefault("X-CSRFToken", self.cookies["csrftoken"])
        return h

    def request(self, method, path, body=None, headers=None, tries=5):
        last = None
        for i in range(tries):
            try:
                if self.conn is None:
                    self.conn = http.client.HTTPConnection(
                        self.host, self.port, timeout=120)
                self.conn.request(method, path, body=body,
                                  headers=self._headers(headers))
                resp = self.conn.getresponse()
                data = resp.read()  # drain fully so the connection reuses
                for sc in resp.msg.get_all("Set-Cookie") or []:
                    name, _, rest = sc.partition("=")
                    self.cookies[name.strip()] = rest.split(";")[0]
                if resp.will_close:
                    self.conn.close()
                    self.conn = None
                return resp.status, data
            except (http.client.HTTPException, ConnectionError,
                    OSError) as exc:
                last = exc
                try:
                    if self.conn is not None:
                        self.conn.close()
                except OSError:
                    pass
                self.conn = None
                time.sleep(0.05 * (i + 1))
        raise RuntimeError(f"request failed after {tries} tries: {last}")

    def post_json(self, path, payload):
        return self.request(
            "POST", path, body=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})

    def submit_and_wait(self, png_bytes: bytes, model_id) -> str:
        boundary = "----benchboundary"
        body = io.BytesIO()
        body.write(f"--{boundary}\r\nContent-Disposition: form-data; "
                   f"name=\"vision_model\"\r\n\r\n{model_id}\r\n".encode())
        body.write(f"--{boundary}\r\nContent-Disposition: form-data; "
                   f"name=\"input_image\"; filename=\"img.png\"\r\n"
                   f"Content-Type: image/png\r\n\r\n".encode())
        body.write(png_bytes)
        body.write(f"\r\n--{boundary}--\r\n".encode())
        status, data = self.request(
            "POST", "/api/inference-jobs/", body=body.getvalue(),
            headers={"Content-Type":
                     f"multipart/form-data; boundary={boundary}"})
        job_id = json.loads(data)["id"]
        deadline = time.time() + 180
        while time.time() < deadline:
            _, data = self.request(
                "GET", f"/api/inference-jobs/{job_id}/?wait=30")
            st = json.loads(data)
            if st["status"] in ("DONE", "FAILED"):
                return st["status"]
        return "TIMEOUT"


def make_client(base, username):
    """Registered+logged-in opener with CSRF cookie."""
    import http.cookiejar
    jar = http.cookiejar.CookieJar()
    opener = urllib.request.build_opener(
        urllib.request.HTTPCookieProcessor(jar))

    def post_json(path, payload):
        req = urllib.request.Request(
            base + path, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json",
                     "X-CSRFToken": _csrf(jar)})
        return opener.open(req)

    def _csrf(jar):
        for c in jar:
            if c.name == "csrftoken":
                return c.value
        return ""

    opener.open(base + "/api/csrf/")
    post_json("/api/users/register/",
              {"username": username, "password": "pw-123456"})
    post_json("/api/users/login/",
              {"username": username, "password": "pw-123456"})
    return opener, jar, _csrf


def submit_and_wait(opener, jar, csrf, base, png_bytes, model_id):
    boundary = "----benchboundary"
    body = io.BytesIO()
    for name, value in (("vision_model", str(model_id)),):
        body.write(f"--{boundary}\r\nContent-Disposition: form-data; "
                   f"name=\"{name}\"\r\n\r\n{value}\r\n".encode())
    body.write(f"--{boundary}\r\nContent-Disposition: form-data; "
               f"name=\"input_image\"; filename=\"img.png\"\r\n"
               f"Content-Type: image/png\r\n\r\n".encode())
    body.write(png_bytes)
    body.write(f"\r\n--{boundary}--\r\n".encode())
    req = urllib.request.Request(
        base + "/api/inference-jobs/", data=body.getvalue(),
        headers={"Content-Type": f"multipart/form-data; boundary={boundary}",
                 "X-CSRFToken": csrf(jar)})
    def _retrying(request, tries=5):
        # Transient connection resets under connect bursts are part of what
        # this harness stresses; a real client retries.
        for i in range(tries):
            try:
                return opener.open(request)
            except (ConnectionResetError, ConnectionRefusedError):
                time.sleep(0.05 * (i + 1))
        return opener.open(request)

    job = json.loads(_retrying(req).read())
    job_id = job["id"]
    # Long-poll (?wait=): on the single-core serving host, sleep-loop
    # polling from 32 clients saturated the CPU with ~4ms request overheads
    # and throttled the worker itself to ~1.5 jobs/s.
    deadline = time.time() + 180
    while time.time() < deadline:
        st = json.loads(_retrying(
            base + f"/api/inference-jobs/{job_id}/?wait=30").read())
        if st["status"] in ("DONE", "FAILED"):
            return st["status"]
    return "TIMEOUT"


def _png_payload():
    rng = np.random.default_rng(0)
    img = Image.fromarray(
        (rng.random((384, 384, 3)) * 255).astype(np.uint8))
    buf = io.BytesIO()
    img.save(buf, "PNG")
    return buf.getvalue()


def _submit_all(pool, base, user_prefix, png_bytes, model_id):
    """Queue N_JOBS submit→wait tasks. KEEPALIVE: one persistent client per
    pool worker thread (HTTPConnection is not thread-safe, so clients are
    thread-local — exactly N_CLIENTS connections); else the urllib
    per-request-connection clients, round-robin as in round 3."""
    if KEEPALIVE:
        local = threading.local()

        def run_one():
            if not hasattr(local, "client"):
                local.client = KeepAliveClient(
                    base, f"{user_prefix}_{threading.get_ident()}")
            return local.client.submit_and_wait(png_bytes, model_id)

        return [pool.submit(run_one) for _ in range(N_JOBS)]
    clients = [make_client(base, f"{user_prefix}_{i}")
               for i in range(N_CLIENTS)]
    return [pool.submit(submit_and_wait, *clients[i % N_CLIENTS],
                        base, png_bytes, model_id)
            for i in range(N_JOBS)]


def client_main(base: str) -> None:
    """Client-process half of the split bench: pure stdlib HTTP (no jax),
    so its reported process CPU is exactly the bench-client cost."""
    png_bytes = _png_payload()
    model_id = json.loads(urllib.request.urlopen(
        base + "/api/vision-models/").read())["results"][0]["id"]
    print(f"driving {N_JOBS} jobs from {N_CLIENTS} clients (split process, "
          f"keepalive={KEEPALIVE})...")
    results = []
    t0, c0 = time.perf_counter(), time.process_time()
    with ThreadPoolExecutor(max_workers=N_CLIENTS) as pool:
        futs = _submit_all(pool, base, f"xuser{os.getpid()}", png_bytes,
                           model_id)
        results = [f.result() for f in futs]
    dt = time.perf_counter() - t0
    cpu = time.process_time() - c0
    print(f"{results.count('DONE')}/{N_JOBS} DONE, "
          f"{results.count('FAILED')} FAILED, "
          f"{results.count('TIMEOUT')} TIMEOUT")
    print(f"client process: {N_JOBS / dt:.1f} jobs/s over {dt:.1f}s; "
          f"process_cpu {cpu:.1f}s ({cpu / dt * 100:.0f}% of one core)")


def serve_main() -> None:
    """Server-process half: stack only. Reports the server-side completion
    window and this process's CPU consumption over it."""
    from visiontransformer_tpu.serve.server import create_server
    from visiontransformer_tpu.serve.store import JobStore
    from visiontransformer_tpu.serve.worker import InferenceWorker

    tmp = tempfile.mkdtemp(prefix="bench_serving_srv_")
    store = JobStore(os.path.join(tmp, "db.sqlite"),
                     media_root=os.path.join(tmp, "media"))
    store.register_model(
        f"{SERVE_FAMILY}-{SERVE_CONFIG}-damage", num_classes=17,
        config_name=SERVE_CONFIG, model_family=SERVE_FAMILY,
        input_size=SERVE_INPUT, description="bench model")
    worker = InferenceWorker(store, warmup=True, buckets=(8, 32))
    server, _ = create_server(store, host="127.0.0.1",
                              port=int(os.environ.get("SERVE_PORT", "0")),
                              worker=worker)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    worker.start()
    print(f"READY {port}", flush=True)

    # Wait for the first job, then measure until N_JOBS complete.
    while store.count_jobs() == 0:
        time.sleep(0.05)
    t0, c0 = time.perf_counter(), time.process_time()
    deadline = time.time() + 600
    finished = 0
    while finished < N_JOBS and time.time() < deadline:
        finished = store.count_jobs("DONE") + store.count_jobs("FAILED")
        time.sleep(0.05)
    dt = time.perf_counter() - t0
    cpu = time.process_time() - c0
    print(f"server process: {finished / dt:.1f} jobs/s completion rate "
          f"over {dt:.1f}s; process_cpu {cpu:.1f}s "
          f"({cpu / dt * 100:.0f}% of one core)", flush=True)
    server.shutdown()
    worker.stop()


def main():
    from visiontransformer_tpu.serve.store import JobStore
    from visiontransformer_tpu.serve.worker import InferenceWorker
    from visiontransformer_tpu.serve.server import create_server

    tmp = tempfile.mkdtemp(prefix="bench_serving_")
    store = JobStore(os.path.join(tmp, "db.sqlite"),
                     media_root=os.path.join(tmp, "media"))
    model_id = store.register_model(
        f"{SERVE_FAMILY}-{SERVE_CONFIG}-damage", num_classes=17,
        config_name=SERVE_CONFIG, model_family=SERVE_FAMILY,
        input_size=SERVE_INPUT, description="bench model")
    worker = InferenceWorker(store, warmup=True, buckets=(8, 32))
    server, _ = create_server(store, host="127.0.0.1", port=0, worker=worker)
    port = server.server_address[1]
    base = f"http://127.0.0.1:{port}"
    threading.Thread(target=server.serve_forever, daemon=True).start()

    print("warming up model buckets (compiles all bucket programs)...")
    worker.start()

    rng = np.random.default_rng(0)
    img = Image.fromarray(
        (rng.random((384, 384, 3)) * 255).astype(np.uint8))
    buf = io.BytesIO()
    img.save(buf, "PNG")
    png_bytes = buf.getvalue()

    if WORKER_ONLY:
        # No HTTP: jobs straight into the store; measures the worker path
        # (claim -> decode -> TPU batch -> postprocess -> DONE) alone.
        img_path = os.path.join(tmp, "in.png")
        with open(img_path, "wb") as f:
            f.write(png_bytes)
        print(f"driving {N_JOBS} jobs worker-only ({SERVE_FAMILY} "
              f"{SERVE_CONFIG} @{SERVE_INPUT})...")
        t0 = time.perf_counter()
        jobs = [store.create_job(None, model_id, img_path)
                for _ in range(N_JOBS)]
        # Poll the aggregate count, not per-job rows: N_JOBS get_job()
        # queries per 50 ms tick measurably contended with the worker for
        # the single CPU core (the harness was part of its own bottleneck).
        deadline = time.time() + 600
        finished = 0
        while finished < N_JOBS and time.time() < deadline:
            finished = (store.count_jobs("DONE") + store.count_jobs("FAILED"))
            time.sleep(0.05)
        dt = time.perf_counter() - t0
        print(f"worker-only: {finished / dt:.1f} jobs/s "
              f"over {dt:.1f}s ({N_JOBS - finished} unfinished)")
        server.shutdown()
        worker.stop()
        return

    print(f"driving {N_JOBS} jobs from {N_CLIENTS} clients "
          f"(keepalive={KEEPALIVE})...")
    results = []
    t0, c0 = time.perf_counter(), time.process_time()
    with ThreadPoolExecutor(max_workers=N_CLIENTS) as pool:
        futs = _submit_all(pool, base, "user", png_bytes, model_id)
        results = [f.result() for f in futs]
    dt = time.perf_counter() - t0
    cpu = time.process_time() - c0

    done = results.count("DONE")
    print(f"{done}/{N_JOBS} DONE, {results.count('FAILED')} FAILED, "
          f"{results.count('TIMEOUT')} TIMEOUT")
    print(f"end-to-end: {N_JOBS / dt:.1f} jobs/s over {dt:.1f}s "
          f"({N_CLIENTS} clients, {SERVE_FAMILY} {SERVE_CONFIG} "
          f"@{SERVE_INPUT}); process_cpu {cpu:.1f}s "
          f"({cpu / dt * 100:.0f}% of one core, clients+stack combined)")
    server.shutdown()
    worker.stop()


if __name__ == "__main__":
    if CLIENT_ONLY:
        client_main(CLIENT_ONLY.rstrip("/"))
    elif SERVE_ONLY:
        serve_main()
    else:
        main()
