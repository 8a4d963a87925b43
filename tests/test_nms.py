"""NMS: property tests + row-for-row parity vs the reference write_results
output recorded in the goldens."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtimeobjectdetection_tpu.model import make_forward
from realtimeobjectdetection_tpu.models import yolov3_spec, yolov3_tiny_spec
from realtimeobjectdetection_tpu.ops.boxes import iou_matrix, xywh2xyxy, xyxy2xywh, wh_iou
from realtimeobjectdetection_tpu.ops.decode import decode_heads
from realtimeobjectdetection_tpu.ops.nms import nms_batch, nms_image
from realtimeobjectdetection_tpu.testing import synthetic_darknet_weights
from realtimeobjectdetection_tpu.weights import load_darknet_weights

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
SPECS = {"yolov3-tiny": yolov3_tiny_spec, "yolov3": yolov3_spec}


def make_pred(boxes_xywh, obj, cls_scores):
    """Assemble an [N, 5+C] prediction array."""
    return np.concatenate([
        np.asarray(boxes_xywh, np.float32),
        np.asarray(obj, np.float32)[:, None],
        np.asarray(cls_scores, np.float32)], axis=1)


def test_confidence_strictly_greater():
    pred = make_pred([[50, 50, 10, 10], [150, 150, 10, 10]],
                     [0.6, 0.61], np.full((2, 3), 0.9))
    boxes, valid = nms_image(jnp.asarray(pred), 3, confidence=0.6,
                             nms_thresh=0.5, top_k=8)
    assert int(valid.sum()) == 1  # obj == conf is dropped (ref uses >)


def test_same_class_suppression_and_order():
    # three overlapping boxes of class 0, one distant box of class 1
    pred = make_pred(
        [[100, 100, 40, 40], [102, 102, 40, 40], [300, 300, 40, 40],
         [104, 104, 40, 40]],
        [0.9, 0.95, 0.8, 0.7],
        [[0.9, 0.1], [0.8, 0.1], [0.1, 0.9], [0.95, 0.05]])
    boxes, valid = nms_image(jnp.asarray(pred), 2, confidence=0.5,
                             nms_thresh=0.5, top_k=8)
    boxes, valid = np.asarray(boxes), np.asarray(valid)
    kept = boxes[valid]
    # box 1 (obj .95) suppresses 0 and 3; box 2 (class 1) survives
    assert kept.shape[0] == 2
    # reference order: class ascending
    assert kept[0, 6] == 0 and kept[1, 6] == 1
    np.testing.assert_allclose(kept[0, 4], 0.95)


def test_cross_class_no_suppression():
    pred = make_pred([[100, 100, 40, 40], [101, 101, 40, 40]],
                     [0.9, 0.8], [[0.9, 0.1], [0.1, 0.9]])
    _, valid = nms_image(jnp.asarray(pred), 2, confidence=0.5,
                         nms_thresh=0.5, top_k=4)
    assert int(np.asarray(valid).sum()) == 2


def test_plus_one_iou_convention():
    a = jnp.asarray([[0.0, 0.0, 9.0, 9.0]])
    b = jnp.asarray([[5.0, 0.0, 14.0, 9.0]])
    # +1 convention: inter = 5*10, areas = 100 -> 50/150
    got = float(iou_matrix(a, b)[0, 0])
    assert abs(got - 50.0 / 150.0) < 1e-6
    got_std = float(iou_matrix(a, b, plus_one=False)[0, 0])
    assert abs(got_std - 4.0 * 9 / (81 + 81 - 36)) < 1e-6


def test_box_format_round_trip():
    rng = np.random.RandomState(0)
    xyxy = rng.rand(16, 6).astype(np.float32)
    xyxy[:, 2:4] += xyxy[:, 0:2]  # ensure x2>x1, y2>y1
    back = np.asarray(xywh2xyxy(xyxy2xywh(jnp.asarray(xyxy))))
    np.testing.assert_allclose(back, xyxy, atol=1e-5)


def test_wh_iou_reference_bug_flag():
    # fixed: symmetric; buggy: uses wh2[0] twice like src/util.py:169
    fixed = float(wh_iou(jnp.array([4.0, 8.0]), jnp.array([4.0, 8.0])))
    assert abs(fixed - 1.0) < 1e-6
    buggy = float(wh_iou(jnp.array([4.0, 8.0]), jnp.array([4.0, 8.0]),
                         reference_bug=True))
    # w2=h2=4: inter=min(4,4)*min(8,4)=16, union=32+16-16=32
    assert abs(buggy - 0.5) < 1e-6


@pytest.mark.parametrize("name", ["yolov3-tiny", "yolov3"])
def test_nms_rows_match_reference_write_results(name):
    d = np.load(os.path.join(GOLDEN, f"{name}_dog.npz"))
    spec = SPECS[name]()
    params, _ = load_darknet_weights(spec, synthetic_darknet_weights(spec, 0))
    x = jnp.asarray(d["input_nchw"].transpose(0, 2, 3, 1))
    fwd = jax.jit(make_forward(spec, bn_mode="batch"))
    pred = decode_heads(fwd(params, x), spec, 416)
    conf = float(d["nms_confidence"])
    boxes, valid = nms_batch(pred, spec.num_classes, conf, 0.5, top_k=512)
    boxes = np.asarray(boxes[0])[np.asarray(valid[0])]
    ref = d["nms_rows"]  # [R, 8]: batch_idx + 7 attrs
    assert boxes.shape[0] == ref.shape[0]
    # row-for-row: same order (class asc, objectness desc)
    np.testing.assert_array_equal(boxes[:, 6], ref[:, 7])
    np.testing.assert_allclose(boxes[:, 4], ref[:, 5], atol=2e-4)
    np.testing.assert_allclose(boxes[:, 5], ref[:, 6], atol=2e-4)
    np.testing.assert_allclose(boxes[:, :4], ref[:, 1:5], atol=0.5)


def test_pallas_nms_kernel_matches_xla_interpret():
    """Pallas greedy-suppression kernel (interpret mode on CPU) must match
    the XLA fori_loop path bit-for-bit."""
    from realtimeobjectdetection_tpu.ops.nms import _greedy_suppress
    rng = np.random.RandomState(3)
    K = 160
    cx, cy = rng.uniform(50, 350, (2, K))
    w, h = rng.uniform(20, 120, (2, K))
    corners = jnp.asarray(
        np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], 1)
        .astype(np.float32))
    cls = jnp.asarray(rng.randint(0, 6, K))
    valid = jnp.asarray(rng.rand(K) > 0.15)
    for plus_one, ge in [(True, True), (False, False)]:
        ref = np.asarray(_greedy_suppress(corners, cls, valid, 0.5,
                                          plus_one, ge, use_pallas=False))
        got = np.asarray(_greedy_suppress(corners, cls, valid, 0.5,
                                          plus_one, ge, use_pallas=True,
                                          interpret=True))
        np.testing.assert_array_equal(got, ref)


def test_nms_batch_pallas_path_interpret():
    rng = np.random.RandomState(1)
    pred = rng.rand(2, 300, 85).astype(np.float32)
    pred[:, :, 0:4] = rng.uniform(50, 350, (2, 300, 4))
    a_boxes, a_valid = nms_batch(jnp.asarray(pred), 80, 0.6, 0.5,
                                 top_k=64)
    b_boxes, b_valid = nms_batch(jnp.asarray(pred), 80, 0.6, 0.5,
                                 top_k=64, use_pallas=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(a_valid), np.asarray(b_valid))
    np.testing.assert_allclose(np.asarray(a_boxes), np.asarray(b_boxes))
