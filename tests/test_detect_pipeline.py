"""End-to-end detect pipeline parity: DetectorV3 vs the reference
detect.py run (golden metrics.json captured offline with synthetic
weights at confidence 0.75 over /root/reference/imgs).

Exercises: folder read -> letterbox -> jitted forward+decode+NMS ->
metrics protocol (letterbox-space rows, batch-idx column, int-0 sentinel)
-> rendered det_<cfg>_<name> files.
"""

import json
import os

import numpy as np
import pytest

from conftest import REFERENCE_DIR, reference_available

from realtimeobjectdetection_tpu.models import get_spec
from realtimeobjectdetection_tpu.pipeline.detector import DetectorV3
from realtimeobjectdetection_tpu.testing import synthetic_darknet_weights

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
IMGS = os.path.join(REFERENCE_DIR, "imgs")

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference images not mounted")


@pytest.fixture(scope="module")
def tiny_weights(tmp_path_factory):
    blob = synthetic_darknet_weights(get_spec("yolov3-tiny"), 0)
    p = tmp_path_factory.mktemp("w") / "tiny.weights"
    p.write_bytes(blob)
    return str(p)


def test_folder_detect_matches_reference_metrics(tmp_path, tiny_weights):
    dest = str(tmp_path / "det")
    det = DetectorV3(images=IMGS, destination=dest,
                     cfg_path="yolov3-tiny", weights_path=tiny_weights,
                     resolution=416, confidence=0.75, nms_thresh=0.5,
                     top_k=512, precision="highest")
    metrics = det(verbose=False)

    ref = json.load(open(os.path.join(GOLDEN,
                                      "ref_detect_metrics_tiny.json")))
    assert set(metrics) == set(ref)
    for k in ref:
        r, m = ref[k], metrics[k]
        assert isinstance(r, int) == isinstance(m, int), k
        if isinstance(r, int):
            assert m == r
            continue
        r, m = np.array(r), np.array(m)
        assert r.shape == m.shape, (k, r.shape, m.shape)
        np.testing.assert_array_equal(r[:, 0], m[:, 0])   # image index
        np.testing.assert_array_equal(r[:, 7], m[:, 7])   # class ids
        np.testing.assert_allclose(m[:, 1:5], r[:, 1:5], atol=0.5)
        np.testing.assert_allclose(m[:, 5:7], r[:, 5:7], atol=1e-3)

    # output protocol: metrics.json written, rendered files named like the
    # reference (det_<cfg-stem>_<img>)
    assert os.path.exists(os.path.join(dest, "metrics.json"))
    assert os.path.exists(os.path.join(dest, "det_yolov3-tiny_dog.jpg"))


def test_no_detection_sentinel(tmp_path, tiny_weights):
    dest = str(tmp_path / "det0")
    det = DetectorV3(images=os.path.join(IMGS, "dog.jpg"), destination=dest,
                     cfg_path="yolov3-tiny", weights_path=tiny_weights,
                     confidence=0.9999)  # nothing passes
    metrics = det(verbose=False)
    assert metrics == {"dog.jpg": 0}  # the reference's int-0 protocol
    saved = json.load(open(os.path.join(dest, "metrics.json")))
    assert saved == {"dog.jpg": 0}


def test_single_file_input(tmp_path, tiny_weights):
    dest = str(tmp_path / "det1")
    det = DetectorV3(images=os.path.join(IMGS, "dog.jpg"), destination=dest,
                     cfg_path="yolov3-tiny", weights_path=tiny_weights,
                     confidence=0.75, top_k=512, precision="highest")
    metrics = det(verbose=False)
    assert list(metrics) == ["dog.jpg"]
    assert len(metrics["dog.jpg"]) == 35  # matches the dog golden


def test_batched_matches_bs1(tmp_path, tiny_weights):
    """batch_size=4 must give the same boxes as bs=1 (incl. padded tail)."""
    d1, d4 = str(tmp_path / "b1"), str(tmp_path / "b4")
    kw = dict(images=IMGS, cfg_path="yolov3-tiny",
              weights_path=tiny_weights, confidence=0.75, top_k=512,
              precision="highest", bn_mode="running")
    m1 = DetectorV3(destination=d1, batch_size=1, **kw)(verbose=False)
    m4 = DetectorV3(destination=d4, batch_size=4, **kw)(verbose=False)
    assert set(m1) == set(m4)
    for k in m1:
        a, b = m1[k], m4[k]
        if isinstance(a, int) or isinstance(b, int):
            assert a == b, k
            continue
        np.testing.assert_allclose(np.array(a), np.array(b), atol=1e-3)


def test_detector_sharded_over_mesh(tmp_path, tiny_weights, cpu_devices):
    """Batch sharded over the 8-device mesh == single-device results."""
    from realtimeobjectdetection_tpu.parallel.mesh import make_mesh
    kw = dict(images=IMGS, cfg_path="yolov3-tiny",
              weights_path=tiny_weights, confidence=0.75, top_k=512,
              precision="highest", bn_mode="running", batch_size=8)
    m1 = DetectorV3(destination=str(tmp_path / "one"), mesh=False,
                    **kw)(verbose=False)
    m8 = DetectorV3(destination=str(tmp_path / "eight"),
                    mesh=make_mesh(8, data=8, space=1), **kw)(verbose=False)
    assert set(m1) == set(m8)
    for k in m1:
        a, b = m1[k], m8[k]
        if isinstance(a, int) or isinstance(b, int):
            assert a == b, k
            continue
        np.testing.assert_allclose(np.array(a), np.array(b), atol=1e-3)


def test_detector_consumes_orbax_checkpoint(tmp_path):
    """The trainer's orbax tiers load directly into the detector."""
    from realtimeobjectdetection_tpu.testing import make_synthetic_coco
    from realtimeobjectdetection_tpu.train.trainer import DarknetTrainer
    ann, imgs = make_synthetic_coco(tmp_path, n_images=2)
    out = str(tmp_path / "w")
    trainer = DarknetTrainer("yolov3-tiny", epochs=1, batch_size=2,
                             resolution=160, out_dir=out, mesh=False,
                             max_boxes=8)
    trainer.train(ann, imgs, dataset_type="COCO", verbose=False)

    det = DetectorV3(images=imgs, destination=str(tmp_path / "det"),
                     cfg_path="yolov3-tiny",
                     weights_path=os.path.join(out, "training_output"),
                     resolution=160, confidence=0.9, bn_mode="running")
    metrics = det(verbose=False)
    assert len(metrics) == 2
    # params actually came from the checkpoint (equal to trainer state)
    np.testing.assert_allclose(
        np.asarray(det.params["node_0"]["w"]),
        np.asarray(trainer.state.params["node_0"]["w"]), rtol=1e-6)


def test_empty_folder(tmp_path, tiny_weights):
    empty = tmp_path / "empty"
    empty.mkdir()
    det = DetectorV3(images=str(empty), destination=str(tmp_path / "d"),
                     cfg_path="yolov3-tiny", weights_path=tiny_weights,
                     resolution=160)
    metrics = det(verbose=False)
    assert metrics == {}
    assert os.path.exists(str(tmp_path / "d" / "metrics.json"))


def test_top_k_saturation_surfaces(tmp_path, tiny_weights, capsys):
    """With a tiny top_k and a permissive confidence, more candidates pass
    the gate than the static budget holds; the detector must record and
    warn instead of silently dropping boxes (reference processes all,
    src/util.py:242-346)."""
    dest = str(tmp_path / "detsat")
    det = DetectorV3(images=os.path.join(IMGS, "dog.jpg"), destination=dest,
                     cfg_path="yolov3-tiny", weights_path=tiny_weights,
                     confidence=0.3, top_k=8)
    det(verbose=False)
    assert det.saturated.get("dog.jpg", 0) > 8
    assert "top_k" in capsys.readouterr().err


def test_rendered_images_deterministic_and_pixel_diff_waived(tmp_path,
                                                             tiny_weights):
    """Pixel-level diffing against the reference's det_yolov3_*.jpg goldens
    is deliberately NOT asserted anywhere in this suite: the reference
    picks box colors with random.choice from a pickled palette
    (detect.py:112), so its rendered pixels are not reproducible even
    against itself.  Our deviation (documented in pipeline/render.py) is a
    deterministic per-class palette; the drawing *protocol* (rectangle +
    filled label bar + text, detect.py:113-118) is the same.  What IS
    pinned: metrics.json rows (the reference's own machine-readable golden)
    everywhere else in this file, and — here — that our renders are
    byte-deterministic run-to-run."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    for dest in (a, b):
        DetectorV3(images=os.path.join(IMGS, "dog.jpg"), destination=dest,
                   cfg_path="yolov3-tiny", weights_path=tiny_weights,
                   confidence=0.75, precision="highest")(verbose=False)
    pa = os.path.join(a, "det_yolov3-tiny_dog.jpg")
    pb = os.path.join(b, "det_yolov3-tiny_dog.jpg")
    assert open(pa, "rb").read() == open(pb, "rb").read()


def test_fused_decode_detector_matches_full(tmp_path, tiny_weights):
    """The decode_topk serving fast path must reproduce the full-decode
    metrics rows end-to-end (fold mode)."""
    kw = dict(images=os.path.join(IMGS, "dog.jpg"),
              cfg_path="yolov3-tiny", weights_path=tiny_weights,
              bn_mode="fold", confidence=0.6, top_k=512)
    m_full = DetectorV3(destination=str(tmp_path / "a"), **kw)(verbose=False)
    m_fused = DetectorV3(destination=str(tmp_path / "b"),
                         fused_decode=True, **kw)(verbose=False)
    a, b = m_full["dog.jpg"], m_fused["dog.jpg"]
    assert isinstance(a, type(b))
    if not isinstance(a, int):
        np.testing.assert_allclose(np.array(b), np.array(a),
                                   rtol=1e-5, atol=1e-4)
