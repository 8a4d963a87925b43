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
