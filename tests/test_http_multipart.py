"""Property tests for the stdlib multipart parser (serve/http.py).

Round-trip invariant: any byte content encoded by a well-formed
multipart/form-data producer must come back byte-identical — including
payloads that start/end with CR/LF bytes, contain the boundary-like
sequences, or are empty (the class of corruption a naive .strip(b"\\r\\n")
would introduce). The producer below emits the same wire format as
requests/DRF's MultiPartParser consumes (reference
backend/core/views.py:56).
"""

import numpy as np

from visiontransformer_tpu.serve.http import parse_multipart

BOUNDARY = "testboundary1337"


def encode_multipart(fields, files):
    """Minimal RFC 7578 producer (mirrors what `requests` sends)."""
    out = []
    for name, value in fields.items():
        out += [(f"--{BOUNDARY}\r\n"
                 f'Content-Disposition: form-data; name="{name}"'
                 "\r\n\r\n").encode(),
                value.encode(), b"\r\n"]
    for name, (filename, content) in files.items():
        out += [(f"--{BOUNDARY}\r\n"
                 f'Content-Disposition: form-data; name="{name}"; '
                 f'filename="{filename}"\r\n'
                 "Content-Type: application/octet-stream\r\n\r\n").encode(),
                content, b"\r\n"]
    out.append(f"--{BOUNDARY}--\r\n".encode())
    return b"".join(out), f"multipart/form-data; boundary={BOUNDARY}"


def _roundtrip_file(content: bytes):
    body, ctype = encode_multipart({"field": "value"},
                                   {"upload": ("f.bin", content)})
    fields, files = parse_multipart(body, ctype)
    assert fields == {"field": "value"}
    assert files["upload"].content == content, (
        f"corrupted: {content!r} -> {files['upload'].content!r}")


def test_crlf_edge_payloads_roundtrip():
    """The exact payloads .strip() would corrupt (ADVICE round-1 bug)."""
    for content in (b"\r\n", b"data\r\n", b"\r\ndata", b"data\n", b"data\r",
                    b"\n\n\n", b"\r\r", b"", b"\r\ndata\r\n",
                    b"x" + b"\r\n" * 5):
        _roundtrip_file(content)


def test_boundary_like_content_inside_payload():
    """Payload containing CRLF + dashes (but not the real delimiter)."""
    _roundtrip_file(b"--not-the-boundary\r\n--almost--\r\n")


def test_random_binary_fuzz_roundtrip():
    """256 random binary payloads (PNG-like, arbitrary bytes) survive;
    payloads containing the actual delimiter are excluded — RFC 2046
    requires producers to pick a boundary absent from the content, which
    is what requests/browsers do."""
    rng = np.random.default_rng(0)
    delim = b"--" + BOUNDARY.encode()
    n_checked = 0
    for _ in range(256):
        size = int(rng.integers(0, 2048))
        content = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
        if delim in content:
            continue
        _roundtrip_file(content)
        n_checked += 1
    assert n_checked > 250


def test_multiple_files_and_fields():
    body, ctype = encode_multipart(
        {"a": "1", "b": "two"},
        {"f1": ("x.png", b"\x89PNG\r\n\x1a\n payload"),
         "f2": ("y.bin", b"\x00\x01\x02\r\n")})
    fields, files = parse_multipart(body, ctype)
    assert fields == {"a": "1", "b": "two"}
    assert files["f1"].content == b"\x89PNG\r\n\x1a\n payload"
    assert files["f1"].filename == "x.png"
    assert files["f2"].content == b"\x00\x01\x02\r\n"


def test_missing_boundary_raises():
    import pytest

    with pytest.raises(ValueError):
        parse_multipart(b"x", "multipart/form-data")
