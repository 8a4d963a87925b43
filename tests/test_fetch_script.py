"""End-to-end test of scripts/fetch_and_verify.sh against a local stub.

The script is the egress-day gate for real-pretrained-weights parity
(VERDICT r2 next-10): until this test existed it was written but never
executed.  Here the whole script runs against a localhost http.server
serving synthetic .weights, a stub reference dir whose det/metrics.json
was produced by our own pipeline with those weights, and a synthetic
yolov5s state-dict .pt built from the vendored schema fixture — so every
step (wget, detect CLI, metrics diff, schema diff, converter, v5 detect
CLI) executes for real, minus only the network.
"""

import functools
import http.server
import json
import os
import socketserver
import subprocess
import sys
import threading

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
SCRIPT = os.path.join(REPO, "scripts", "fetch_and_verify.sh")


def _make_stub_ref(tmp_path, weights_path):
    """Fake reference dir: imgs/ + det/metrics.json from OUR pipeline
    (the stub validates script mechanics, not cross-impl parity —
    tests/test_detect_pipeline.py owns that)."""
    import cv2
    from realtimeobjectdetection_tpu.pipeline.detector import DetectorV3

    ref = tmp_path / "ref"
    (ref / "imgs").mkdir(parents=True)
    rng = np.random.RandomState(7)
    for name in ("a.jpg", "b.jpg"):
        img = rng.randint(0, 255, (96, 128, 3), np.uint8)
        cv2.imwrite(str(ref / "imgs" / name), img)
    det = ref / "det"
    det.mkdir()
    DetectorV3(str(ref / "imgs"), str(det), cfg_path="yolov3-tiny",
               weights_path=str(weights_path), resolution=416,
               confidence=0.6, nms_thresh=0.5, precision="highest",
               top_k=1024)()
    assert (det / "metrics.json").exists()
    return ref


def test_fetch_and_verify_against_stub(tmp_path):
    from realtimeobjectdetection_tpu.models import get_spec
    from realtimeobjectdetection_tpu.testing import synthetic_darknet_weights

    # --- artifacts the stub server will "download" to the script
    serve_dir = tmp_path / "srv"
    serve_dir.mkdir()
    spec = get_spec("yolov3-tiny")
    blob = synthetic_darknet_weights(spec, seed=0)
    weights_path = serve_dir / "yolov3-tiny.weights"
    weights_path.write_bytes(blob)

    ref = _make_stub_ref(tmp_path, weights_path)

    # --- synthetic yolov5s checkpoint from the vendored schema
    import torch
    schema = json.load(open(os.path.join(
        os.path.dirname(__file__), "golden", "yolov5s_state_schema.json")))
    rng = np.random.RandomState(0)
    sd = {}
    for key, shape in schema.items():
        if key.endswith("num_batches_tracked"):
            sd[key] = torch.zeros((), dtype=torch.int64)
        elif key.endswith("running_var"):
            sd[key] = torch.from_numpy(
                rng.uniform(0.5, 2.0, shape).astype(np.float32))
        else:
            sd[key] = torch.from_numpy(
                rng.normal(0, 0.02, shape).astype(np.float32))
    v5_pt = tmp_path / "yolov5s_sd.pt"
    torch.save(sd, str(v5_pt))

    # --- localhost stub for the pjreddie URL
    handler = functools.partial(http.server.SimpleHTTPRequestHandler,
                                directory=str(serve_dir))
    httpd = socketserver.TCPServer(("127.0.0.1", 0), handler)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        env = dict(os.environ)
        env.update(
            WEIGHTS_URL_BASE=f"http://127.0.0.1:{port}",
            CFG_NAME="yolov3-tiny",
            V5_SD_PT=str(v5_pt),
            WORK_DIR=str(tmp_path / "work"),
            # keep the subprocess CLIs on the test backend
            JAX_PLATFORM_NAME="cpu",
        )
        r = subprocess.run(["bash", SCRIPT, str(ref)], env=env,
                           capture_output=True, text=True, timeout=1100,
                           cwd=REPO)
    finally:
        httpd.shutdown()
        httpd.server_close()
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "metrics.json PARITY OK" in r.stdout
    assert "schema OK" in r.stdout
    assert "ALL GATES PASSED" in r.stdout
    # the converter really ran: the npz exists and reloads
    assert (tmp_path / "work" / "yolov5s_native.npz").exists()
    # ...and the v5 ingestion branch ran END-TO-END: the converted
    # checkpoint flowed through `detect --version 5` and produced
    # rendered det_yolov5_* outputs (VERDICT r3 next-7: both egress
    # gates execution-tested, not just written)
    det_v5 = tmp_path / "work" / "det_v5"
    rendered = [f for f in os.listdir(det_v5)
                if f.startswith("det_yolov5_")]
    assert len(rendered) == 2, sorted(os.listdir(det_v5))
