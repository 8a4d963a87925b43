"""HTTP serving layer: end-to-end request through a live server."""

import http.client
import json
import threading

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp

from realtimeobjectdetection_tpu.models import get_spec
from realtimeobjectdetection_tpu.pipeline.server import (DetectionService,
                                                         serve)
from realtimeobjectdetection_tpu.weights import init_params


@pytest.fixture(scope="module")
def server():
    spec = get_spec("yolov3-tiny", width=160, height=160)
    service = DetectionService(spec, init_params(spec, 0), resolution=160,
                               confidence=0.7, batch_size=4,
                               bn_mode="running",
                               compute_dtype=jnp.float32, top_k=32)
    httpd = serve(service, host="127.0.0.1", port=0, block=False)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield httpd.server_address
    httpd.shutdown()
    service.close()


def _request(addr, method, path, body=None):
    conn = http.client.HTTPConnection(addr[0], addr[1], timeout=60)
    conn.request(method, path, body=body)
    resp = conn.getresponse()
    data = json.loads(resp.read())
    conn.close()
    return resp.status, data


def test_healthz(server):
    status, data = _request(server, "GET", "/healthz")
    assert status == 200 and data["status"] == "ok"
    assert data["resolution"] == 160


def test_detect_roundtrip(server):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (120, 160, 3), np.uint8)
    ok, jpg = cv2.imencode(".jpg", img)
    assert ok
    status, data = _request(server, "POST", "/detect", bytes(jpg))
    assert status == 200
    assert "boxes" in data and "latency_ms" in data
    for row, name in zip(data["boxes"], data["class_names"]):
        assert len(row) == 7
        assert isinstance(name, str)
        # boxes in original image pixels
        assert 0 <= row[0] <= 160 and 0 <= row[1] <= 120


def test_detect_concurrent_microbatch(server):
    rng = np.random.RandomState(1)
    results = []

    def hit(seed):
        img = rng.randint(0, 255, (100, 140, 3), np.uint8)
        ok, jpg = cv2.imencode(".jpg", img)
        results.append(_request(server, "POST", "/detect", bytes(jpg)))

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 6
    assert all(code == 200 for code, _ in results)


def test_bad_requests(server):
    status, data = _request(server, "POST", "/detect", b"not an image")
    assert status == 400
    status, _ = _request(server, "GET", "/nope")
    assert status == 404
    status, _ = _request(server, "POST", "/detect", b"")
    assert status == 400


def test_readyz(server):
    import json
    from urllib.request import urlopen
    host, port = server
    with urlopen(f"http://{host}:{port}/readyz") as r:
        assert json.loads(r.read())["ready"] is True


@pytest.fixture(scope="module")
def server_v5():
    from realtimeobjectdetection_tpu.pipeline.server import DetectionServiceV5
    service = DetectionServiceV5(model_size="n", size=192, batch_size=2,
                                 compute_dtype=jnp.float32,
                                 activation_dtype=None, top_k=32,
                                 confidence=0.3)
    httpd = serve(service, host="127.0.0.1", port=0, block=False)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield httpd.server_address
    httpd.shutdown()
    service.close()


def test_v5_healthz_and_detect(server_v5):
    status, data = _request(server_v5, "GET", "/healthz")
    assert status == 200 and data["model"] == "yolov5n"
    assert data["resolution"] == 192
    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, (120, 160, 3), np.uint8)
    ok, jpg = cv2.imencode(".jpg", img)
    status, data = _request(server_v5, "POST", "/detect", bytes(jpg))
    assert status == 200 and "boxes" in data
    for row, name in zip(data["boxes"], data["class_names"]):
        # ultralytics rows [x1,y1,x2,y2,conf,cls] in original pixels
        assert len(row) == 6
        assert isinstance(name, str)
        assert 0 <= row[0] <= 160 and 0 <= row[1] <= 120


def test_v5_readyz(server_v5):
    status, data = _request(server_v5, "GET", "/readyz")
    assert status == 200 and data["ready"] is True


def test_detect_stream(server):
    """Length-prefixed frame stream in -> one ordered JSON line per
    frame out (chunked); bad frames yield error lines, order kept."""
    import struct
    from urllib.request import Request, urlopen
    rng = np.random.RandomState(3)
    body = b""
    for shape in [(120, 160, 3), (80, 100, 3)]:
        ok, jpg = cv2.imencode(".jpg", rng.randint(0, 255, shape, np.uint8))
        body += struct.pack(">I", len(jpg)) + bytes(jpg)
    body += struct.pack(">I", 5) + b"junk!"   # undecodable frame
    host, port = server
    req = Request(f"http://{host}:{port}/detect_stream", data=body,
                  method="POST")
    with urlopen(req, timeout=120) as r:
        lines = [json.loads(l) for l in r.read().splitlines() if l.strip()]
    assert len(lines) == 3
    assert "boxes" in lines[0] and "boxes" in lines[1]
    assert lines[2] == {"error": "undecodable image"}
    for row in lines[1]["boxes"]:   # second frame: 100x80 original pixels
        assert 0 <= row[0] <= 100 and 0 <= row[1] <= 80


def test_serve_cli_dispatches_by_family(monkeypatch):
    """'rodtpu serve --cfg yolov5s' must construct the v5 backend with
    v5 defaults; darknet names go to DetectionService with darknet
    defaults.  The server itself is monkeypatched out."""
    from realtimeobjectdetection_tpu import cli
    from realtimeobjectdetection_tpu.pipeline import server as srv
    built = {}

    class FakeV5:
        def __init__(self, **kw):
            built["v5"] = kw

    class FakeV3:
        def __init__(self, *a, **kw):
            built["v3"] = kw

    monkeypatch.setattr(srv, "DetectionServiceV5", FakeV5)
    monkeypatch.setattr(srv, "DetectionService", FakeV3)
    monkeypatch.setattr(srv, "serve", lambda s, h, p: ("served", h, p))

    r = cli.serve_cli(["--cfg", "yolov5s", "--port", "1234"])
    assert r == ("served", "0.0.0.0", 1234)
    assert built["v5"]["model_size"] == "s"
    assert built["v5"]["size"] == 640
    assert built["v5"]["confidence"] == 0.25
    assert built["v5"]["iou_thresh"] == 0.45

    r = cli.serve_cli(["--cfg", "yolov3-tiny"])
    assert built["v3"]["resolution"] == 416
    assert built["v3"]["confidence"] == 0.6


def _stream_body(frames):
    import struct
    out = b""
    for f in frames:
        out += struct.pack(">I", len(f)) + f
    return out


def test_detect_stream_http11_chunked_framing(server):
    """The /detect_stream response must be spec-valid chunked HTTP/1.1
    (ADVICE r2: under the BaseHTTPRequestHandler default of HTTP/1.0,
    curl-class clients would read raw chunk-size lines as body).  Parse
    the raw socket bytes with a strict chunked decoder."""
    import socket
    rng = np.random.RandomState(5)
    ok, jpg = cv2.imencode(".jpg", rng.randint(0, 255, (60, 80, 3),
                                               np.uint8))
    body = _stream_body([bytes(jpg)] * 2)
    s = socket.create_connection(server, timeout=60)
    s.sendall((f"POST /detect_stream HTTP/1.1\r\n"
               f"Host: {server[0]}\r\nContent-Length: {len(body)}\r\n"
               f"Connection: close\r\n\r\n").encode() + body)
    raw = b""
    while True:
        chunk = s.recv(65536)
        if not chunk:
            break
        raw += chunk
    s.close()
    head, _, rest = raw.partition(b"\r\n\r\n")
    assert head.startswith(b"HTTP/1.1 200"), head.splitlines()[0]
    assert b"transfer-encoding: chunked" in head.lower()
    # strict chunked decode
    lines = []
    while True:
        size_line, _, rest = rest.partition(b"\r\n")
        n = int(size_line, 16)
        if n == 0:
            break
        lines.append(rest[:n])
        assert rest[n:n + 2] == b"\r\n", "chunk not CRLF-terminated"
        rest = rest[n + 2:]
    payload = b"".join(lines).decode().strip().splitlines()
    assert len(payload) == 2
    for line in payload:
        assert "boxes" in json.loads(line)


def test_detect_stream_truncated_frame(server):
    """A frame-length prefix claiming more bytes than remain must not
    block the handler past Content-Length (ADVICE r2): the server clamps
    the read and emits an error line instead of hanging."""
    import struct
    from urllib.request import Request, urlopen
    rng = np.random.RandomState(6)
    ok, jpg = cv2.imencode(".jpg", rng.randint(0, 255, (60, 80, 3),
                                               np.uint8))
    body = _stream_body([bytes(jpg)])
    body += struct.pack(">I", 10_000_000) + b"only-a-few-bytes"
    host, port = server
    req = Request(f"http://{host}:{port}/detect_stream", data=body,
                  method="POST")
    with urlopen(req, timeout=60) as r:   # must not hit the timeout
        lines = [json.loads(l) for l in r.read().decode().splitlines()]
    assert len(lines) == 2
    assert "boxes" in lines[0]
    assert lines[1] == {"error": "truncated frame"}


def test_detect_stream_client_disconnect(server):
    """Client vanishing mid-stream must not wedge the server: the
    handler thread dies with its connection and subsequent requests are
    served normally (ThreadingHTTPServer isolation)."""
    import socket
    import struct
    rng = np.random.RandomState(7)
    ok, jpg = cv2.imencode(".jpg", rng.randint(0, 255, (60, 80, 3),
                                               np.uint8))
    frame = struct.pack(">I", len(bytes(jpg))) + bytes(jpg)
    body = frame * 8
    s = socket.create_connection(server, timeout=60)
    s.sendall((f"POST /detect_stream HTTP/1.1\r\n"
               f"Host: {server[0]}\r\nContent-Length: {len(body)}\r\n"
               f"\r\n").encode() + body[:len(body) // 2])
    s.recv(1)          # wait until the server started answering
    s.close()          # vanish mid-request
    # server still alive and serving
    status, data = _request(server, "GET", "/healthz")
    assert status == 200 and data["status"] == "ok"
    ok, jpg2 = cv2.imencode(".jpg", rng.randint(0, 255, (50, 70, 3),
                                                np.uint8))
    status, data = _request(server, "POST", "/detect", bytes(jpg2))
    assert status == 200 and "boxes" in data


def test_detect_hammer_many_clients(server):
    """16 concurrent clients x 2 requests through the micro-batcher:
    every request answered 200 with a well-formed payload."""
    rng = np.random.RandomState(8)
    payloads = []
    for i in range(16):
        ok, jpg = cv2.imencode(".jpg", rng.randint(0, 255, (90, 110, 3),
                                                   np.uint8))
        payloads.append(bytes(jpg))
    results = []
    lock = threading.Lock()

    def hit(i):
        for _ in range(2):
            r = _request(server, "POST", "/detect", payloads[i])
            with lock:
                results.append(r)

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 32
    for code, data in results:
        assert code == 200 and "boxes" in data and "latency_ms" in data


def test_pipeline_stages_service_matches_plain():
    """DetectionService(pipeline_stages=2): same boxes as the plain
    single-device backend for the same image (PP backend parity)."""
    import jax
    spec = get_spec("yolov3-tiny", width=160, height=160)
    params = init_params(spec, 0)
    kw = dict(resolution=160, confidence=0.7, batch_size=2,
              bn_mode="running", compute_dtype=jnp.float32, top_k=32)
    plain = DetectionService(spec, params, **kw)
    pp = DetectionService(spec, params, pipeline_stages=2, **kw)
    assert pp.pipeline is not None and len(pp.pipeline.devices) == 2
    try:
        plain.warmup()
        pp.warmup()
        rng = np.random.RandomState(1)
        img = rng.randint(0, 255, (120, 160, 3), np.uint8)
        a = plain.detect_image(img)
        b = pp.detect_image(img)
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), atol=1e-3)
    finally:
        plain.close()
        pp.close()


def test_detect_stream_trailing_bytes_keepalive(server):
    """A stream body with a sub-4-byte garbage tail must be drained so
    the HTTP/1.1 keep-alive socket stays usable for the next request
    (code-review r3 finding)."""
    import struct
    rng = np.random.RandomState(7)
    img = rng.randint(0, 255, (96, 128, 3), np.uint8)
    ok, jpg = cv2.imencode(".jpg", img)
    assert ok
    body = struct.pack(">I", len(jpg)) + bytes(jpg) + b"\x00\x01"  # tail
    conn = http.client.HTTPConnection(server[0], server[1], timeout=60)
    conn.request("POST", "/detect_stream", body=body)
    resp = conn.getresponse()
    lines = [json.loads(l) for l in resp.read().splitlines() if l]
    assert len(lines) == 1 and "boxes" in lines[0]
    # SAME connection, next request must parse cleanly
    conn.request("GET", "/healthz")
    resp2 = conn.getresponse()
    assert resp2.status == 200
    assert json.loads(resp2.read())["status"] == "ok"
    conn.close()


def test_metrics_endpoint(server):
    """GET /metrics: Prometheus text exposition with monotonic request/
    error counters, sliding-window latency quantiles, and batch
    occupancy — after a success and a forced error the counters must
    reflect both."""
    rng = np.random.RandomState(5)
    img = rng.randint(0, 255, (100, 120, 3), np.uint8)
    ok, jpg = cv2.imencode(".jpg", img)
    assert ok
    status, _ = _request(server, "POST", "/detect", bytes(jpg))
    assert status == 200
    status, _ = _request(server, "POST", "/detect", b"not-an-image")
    assert status == 400

    conn = http.client.HTTPConnection(server[0], server[1], timeout=60)
    conn.request("GET", "/metrics")
    resp = conn.getresponse()
    assert resp.status == 200
    assert resp.getheader("Content-Type").startswith("text/plain")
    text = resp.read().decode()
    conn.close()

    metrics = {}
    for line in text.splitlines():
        if line.startswith("#") or not line.strip():
            continue
        name, val = line.rsplit(" ", 1)
        metrics[name] = float(val)
    assert metrics["detector_requests_total"] >= 1
    assert metrics["detector_errors_total"] >= 1
    assert metrics["detector_batches_total"] >= 1
    assert 1.0 <= metrics["detector_batch_occupancy"] <= 4.0
    q50 = metrics['detector_request_latency_seconds{quantile="0.5"}']
    assert 0.0 < q50 < 60.0
    assert (metrics["detector_request_latency_seconds_count"]
            == metrics["detector_requests_total"])
    assert metrics['detector_info{field="resolution"}'] == 160.0


def test_reload_params_hot_swap():
    """DetectionService.reload_params: the serving weights swap without
    a restart or recompile — results change to the new weights' output,
    mismatched trees are rejected, and the fold path folds training-
    layout params exactly as __init__ does."""
    spec = get_spec("yolov3-tiny", width=160, height=160)
    svc = DetectionService(spec, init_params(spec, 0), resolution=160,
                           confidence=0.05, batch_size=2,
                           bn_mode="fold", compute_dtype=jnp.float32,
                           top_k=32)
    try:
        svc.warmup()
        rng = np.random.RandomState(0)
        img = rng.randint(0, 255, (160, 160, 3), np.uint8)
        rows0 = svc.detect_image(img)
        leaf0 = np.asarray(svc.params["node_0"]["w"]).copy()

        svc.reload_params(init_params(spec, 1))   # training layout: folds
        leaf1 = np.asarray(svc.params["node_0"]["w"])
        assert np.abs(leaf1 - leaf0).max() > 0
        rows1 = svc.detect_image(img)             # same program, new weights
        assert rows0.shape[1] == rows1.shape[1]
        assert (rows0.shape != rows1.shape
                or np.abs(rows0 - rows1).max() > 1e-3)

        # structure mismatch (different model) must be rejected cleanly
        other = get_spec("yolov3", width=160, height=160)
        with pytest.raises(ValueError):
            svc.reload_params(init_params(other, 0))
        # ... and the service still serves
        assert svc.detect_image(img) is not None
    finally:
        svc.close()


def test_reload_endpoint(server, tmp_path):
    """POST /reload: hot weight reload over HTTP — happy path swaps a
    .weights checkpoint in, missing files 404, garbage bodies 400, and
    /detect keeps working after every case."""
    import os
    from realtimeobjectdetection_tpu.models import get_spec as _gs
    from realtimeobjectdetection_tpu.weights import (export_darknet_weights,
                                                     init_params as _ip)
    spec = _gs("yolov3-tiny", width=160, height=160)
    blob = export_darknet_weights(spec, _ip(spec, 7), seen=7)
    wpath = str(tmp_path / "new.weights")
    with open(wpath, "wb") as f:
        f.write(blob)

    status, data = _request(server, "POST", "/reload",
                            body=json.dumps({"weights": wpath}))
    assert status == 200 and data["reloaded"] == wpath and data["ms"] >= 0

    status, data = _request(server, "POST", "/reload",
                            body=json.dumps({"weights": "/nope.weights"}))
    assert status == 404

    status, data = _request(server, "POST", "/reload", body=b"not json")
    assert status == 400 and "bad reload body" in data["error"]

    # service is still healthy after the swap + failures
    ok, png = True, cv2.imencode(".png", np.zeros((64, 80, 3), np.uint8))[1]
    status, data = _request(server, "POST", "/detect", body=png.tobytes())
    assert status == 200 and "boxes" in data


def test_reload_params_v5_folds_training_layout():
    """DetectionServiceV5.reload_params: a training-layout checkpoint
    (batch_norm=True, e.g. straight out of TrainerV5) is BN-folded on
    the way in (fold_v5_batchnorm) and swaps cleanly."""
    from realtimeobjectdetection_tpu.models.yolov5 import (
        YoloV5Config, init_yolov5_params)
    from realtimeobjectdetection_tpu.pipeline.server import \
        DetectionServiceV5
    svc = DetectionServiceV5(model_size="n", size=192, batch_size=2,
                             compute_dtype=jnp.float32,
                             activation_dtype=None, top_k=32,
                             confidence=0.05)
    try:
        svc.warmup()
        rng = np.random.RandomState(3)
        img = rng.randint(0, 255, (192, 192, 3), np.uint8)
        svc.detect_image(img)
        leaf0 = np.asarray(svc.params["m0"]["w"]).copy()
        cfg = YoloV5Config("n")
        svc.reload_params(init_yolov5_params(cfg, 5, batch_norm=True))
        leaf1 = np.asarray(svc.params["m0"]["w"])
        assert np.abs(leaf1 - leaf0).max() > 0
        assert "bn_gamma" not in svc.params["m0"]   # folded layout
        assert svc.detect_image(img) is not None    # still serves
    finally:
        svc.close()


# ----------------------------------------------------------------------
# AOT serving backend: serve an export artifact (weights baked in)


@pytest.fixture(scope="module")
def aot_setup(tmp_path_factory):
    """A bundle artifact (bs 1 and 4) + a live service with identical
    knobs, so AOT results can be checked against live results."""
    from realtimeobjectdetection_tpu.pipeline.export import \
        save_detector_bundle
    from realtimeobjectdetection_tpu.pipeline.server import \
        AOTDetectionService
    tmp = tmp_path_factory.mktemp("aot")
    spec = get_spec("yolov3-tiny", width=160, height=160)
    params = init_params(spec, 0)
    kw = dict(resolution=160, confidence=0.7, nms_thresh=0.5, top_k=32,
              compute_dtype=jnp.float32, fold=False)
    path = str(tmp / "tiny.bundle")
    save_detector_bundle(path, spec, params, batch_sizes=(1, 4), **kw)
    svc = AOTDetectionService(path)
    live = DetectionService(spec, params, resolution=160, confidence=0.7,
                            batch_size=4, bn_mode="running",
                            compute_dtype=jnp.float32, top_k=32,
                            fused_decode=False)
    yield svc, live, spec, tmp
    svc.close()
    live.close()


def test_aot_service_matches_live(aot_setup):
    """detect_image through the AOT bundle == the live jitted service
    (same weights, running BN, fp32, full decode)."""
    svc, live, _, _ = aot_setup
    assert svc.describe()["batch_sizes"] == [1, 4]
    assert svc.resolution == 160 and svc.cls_col == 6
    rng = np.random.RandomState(7)
    img = rng.randint(0, 255, (120, 160, 3), np.uint8)
    a = svc.detect_image(img)
    b = live.detect_image(img)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-4)


def test_aot_variable_batch_dispatch(aot_setup):
    """A lone request runs at its natural size (the bs=1 rung), not
    padded to the ladder top — the point of _variable_batch."""
    svc, _, _, _ = aot_setup
    seen = []
    orig = svc._detect

    def spy(p, x):
        seen.append(int(x.shape[0]))
        return orig(p, x)

    svc._detect = spy
    try:
        img = np.random.RandomState(8).randint(0, 255, (90, 160, 3),
                                               np.uint8)
        svc.detect_image(img)
    finally:
        svc._detect = orig
    assert seen == [1]


def test_aot_reload_semantics(aot_setup):
    """reload_weights swaps the whole artifact; incompatible artifacts
    (other resolution) and reload_params are rejected."""
    from realtimeobjectdetection_tpu.pipeline.export import save_detector
    svc, _, spec, tmp = aot_setup
    img = np.random.RandomState(9).randint(0, 255, (120, 160, 3),
                                           np.uint8)
    before = svc.detect_image(img)

    other = str(tmp / "tiny_other.stablehlo")
    save_detector(other, spec, init_params(spec, 99), batch_size=2,
                  resolution=160, confidence=0.7, top_k=32,
                  compute_dtype=jnp.float32, fold=False)
    svc.reload_weights(other)
    assert svc.describe()["batch_sizes"] == [2]
    after = svc.detect_image(img)
    assert before.shape != after.shape or \
        np.abs(np.asarray(before) - np.asarray(after)).max() > 0

    wrong = str(tmp / "tiny_wrong.stablehlo")
    spec96 = get_spec("yolov3-tiny", width=96, height=96)
    save_detector(wrong, spec96, init_params(spec96, 0), batch_size=1,
                  resolution=96, confidence=0.7, top_k=32,
                  compute_dtype=jnp.float32, fold=False)
    with pytest.raises(ValueError, match="resolution"):
        svc.reload_weights(wrong)
    with pytest.raises(ValueError, match="bake the weights in"):
        svc.reload_params({})


def test_aot_http_roundtrip(aot_setup):
    """Full HTTP path over the AOT backend, including /reload to a new
    artifact and the family/reso guards surfacing as 400s."""
    svc, _, _, tmp = aot_setup
    httpd = serve(svc, host="127.0.0.1", port=0, block=False)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        addr = httpd.server_address
        status, data = _request(addr, "GET", "/healthz")
        assert status == 200 and "artifact" in data
        img = np.random.RandomState(10).randint(0, 255, (100, 130, 3),
                                                np.uint8)
        jpg = cv2.imencode(".png", img)[1].tobytes()
        status, data = _request(addr, "POST", "/detect", jpg)
        assert status == 200 and "boxes" in data
        for row in data["boxes"]:
            assert len(row) == 7
        status, data = _request(
            addr, "POST", "/reload",
            body=json.dumps({"weights": str(tmp / "tiny_wrong.stablehlo")}))
        assert status == 400 and "resolution" in data["error"]
    finally:
        httpd.shutdown()


def test_aot_service_v5_family(tmp_path):
    """A v5 artifact routes the AOT service onto the v5 letterbox /
    round-extent rescale / 6-col row layout."""
    from realtimeobjectdetection_tpu.models.yolov5 import (
        YoloV5Config, init_yolov5_params)
    from realtimeobjectdetection_tpu.pipeline.export import save_detector_v5
    from realtimeobjectdetection_tpu.pipeline.server import (
        AOTDetectionService, DetectionServiceV5)
    params = init_yolov5_params(YoloV5Config("n"), 0)
    path = str(tmp_path / "v5n.stablehlo")
    save_detector_v5(path, "n", params, batch_size=1, size=96,
                     fast=False, confidence=0.05, top_k=32, max_det=20,
                     compute_dtype=jnp.float32)
    svc = AOTDetectionService(path)
    # DetectionServiceV5(weights_path=None) inits the SAME params
    # (init_yolov5_params seed 0, inference layout), so rows must match
    live = DetectionServiceV5(model_size="n", size=96, batch_size=1,
                              compute_dtype=jnp.float32,
                              activation_dtype=None, top_k=32,
                              confidence=0.05, max_det=20,
                              fused_decode=False)
    try:
        assert svc.cls_col == 5 and svc._family == "yolov5n"
        img = np.random.RandomState(11).randint(0, 255, (80, 96, 3),
                                                np.uint8)
        rows = svc.detect_image(img)
        assert rows.shape[1] == 6
        np.testing.assert_allclose(rows, live.detect_image(img),
                                   rtol=1e-5, atol=1e-4)
    finally:
        svc.close()
        live.close()


def test_pipelined_batcher_maps_results_correctly():
    """pipeline_depth=2: a flood of distinct images split across
    several in-flight device batches still delivers each request its
    own boxes (compare against the same service answering serially)."""
    spec = get_spec("yolov3-tiny", width=160, height=160)
    svc = DetectionService(spec, init_params(spec, 0), resolution=160,
                           confidence=0.6, batch_size=2,
                           batch_window_ms=2.0, bn_mode="running",
                           compute_dtype=jnp.float32, top_k=16,
                           pipeline_depth=2)
    try:
        svc.warmup()
        rng = np.random.RandomState(42)
        imgs = [rng.randint(0, 255, (120, 160, 3), np.uint8)
                for _ in range(7)]
        serial = [svc.detect_image(im) for im in imgs]   # lone requests
        handles = [svc.submit_image(im) for im in imgs]  # flood
        flooded = [svc.collect(h) for h in handles]
        assert svc.stats.batches_total >= 4   # really split into batches
        for a, b in zip(serial, flooded):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-4)
    finally:
        svc.close()
