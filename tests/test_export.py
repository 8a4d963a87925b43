"""AOT export: save the full detect program, reload, identical outputs."""

import numpy as np
import pytest
import jax.numpy as jnp

from realtimeobjectdetection_tpu.models import get_spec
from realtimeobjectdetection_tpu.pipeline.export import (load_detector,
                                                         save_detector)
from realtimeobjectdetection_tpu.testing import synthetic_darknet_weights
from realtimeobjectdetection_tpu.weights import load_darknet_weights


def test_export_round_trip(tmp_path):
    spec = get_spec("yolov3-tiny", width=160, height=160)
    params, _ = load_darknet_weights(spec, synthetic_darknet_weights(spec, 0))
    path = str(tmp_path / "tiny.stablehlo")
    meta = save_detector(path, spec, params, batch_size=2, resolution=160,
                         confidence=0.7, top_k=32,
                         compute_dtype=jnp.float32, fold=False)
    assert meta["resolution"] == 160

    det = load_detector(path)
    assert det.meta["batch_size"] == 2
    rng = np.random.RandomState(0)
    x = rng.randint(0, 256, (2, 160, 160, 3), np.uint8)
    boxes, valid = det(x)
    assert boxes.shape == (2, 32, 7)

    # identical to the live pipeline
    import jax
    from realtimeobjectdetection_tpu.model import make_forward
    from realtimeobjectdetection_tpu.ops.decode import decode_heads
    from realtimeobjectdetection_tpu.ops.nms import nms_batch
    fwd = make_forward(spec, bn_mode="running",
                       compute_dtype=jnp.float32, scan_ladders=True)

    def live(xx):
        xx = xx.astype(jnp.float32) / 255.0
        pred = decode_heads(fwd(params, xx), spec, 160)
        return nms_batch(pred, 80, 0.7, 0.5, top_k=32)

    b2, v2 = jax.jit(live)(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(v2))
    np.testing.assert_allclose(np.asarray(boxes), np.asarray(b2),
                               rtol=1e-5, atol=1e-4)


def test_export_bad_magic(tmp_path):
    p = tmp_path / "junk.bin"
    p.write_bytes(b"garbage")
    import pytest
    with pytest.raises(ValueError, match="not a rodtpu export"):
        load_detector(str(p))


def test_bundle_multi_batch_dispatch(tmp_path):
    """One artifact, several batch shapes: calls dispatch to the smallest
    fitting program, tails are padded and sliced back, numerics match the
    single-size export."""
    import jax.numpy as jnp
    from realtimeobjectdetection_tpu.models import get_spec
    from realtimeobjectdetection_tpu.weights import init_params
    from realtimeobjectdetection_tpu.pipeline.export import (
        load_detector, load_detector_bundle, save_detector,
        save_detector_bundle)
    spec = get_spec("yolov3-tiny", width=160, height=160)
    params = init_params(spec, 0)
    kw = dict(resolution=160, confidence=0.4, top_k=32,
              compute_dtype=jnp.float32)
    bpath = str(tmp_path / "tiny.bundle")
    meta = save_detector_bundle(bpath, spec, params,
                                batch_sizes=(1, 4), **kw)
    assert meta["batch_sizes"] == [1, 4]
    det = load_detector_bundle(bpath)
    # load_detector auto-detects bundles too
    assert load_detector(bpath).batch_sizes == [1, 4]

    rng = np.random.RandomState(0)
    x3 = rng.randint(0, 256, (3, 160, 160, 3), np.uint8)
    boxes, valid = det(x3)               # pads 3 -> 4, slices back
    assert boxes.shape[0] == 3 and valid.shape[0] == 3

    # numerics equal the plain single-size export at bs=4
    spath = str(tmp_path / "tiny4.stablehlo")
    save_detector(spath, spec, params, batch_size=4, **kw)
    single = load_detector(spath)
    x4 = rng.randint(0, 256, (4, 160, 160, 3), np.uint8)
    b_a, v_a = det(x4)
    b_b, v_b = single(x4)
    np.testing.assert_array_equal(np.asarray(v_a), np.asarray(v_b))
    np.testing.assert_allclose(np.asarray(b_a), np.asarray(b_b))

    with pytest.raises(ValueError, match="exceeds"):
        det(rng.randint(0, 256, (5, 160, 160, 3), np.uint8))


def test_v5_export_round_trip(tmp_path):
    """save_detector_v5 -> load_detector -> call: the v5 AOT artifact
    (fp32-parity program on tiny shapes; training-layout params folded
    at export)."""
    from realtimeobjectdetection_tpu.models.yolov5 import (
        YoloV5Config, init_yolov5_params)
    from realtimeobjectdetection_tpu.pipeline.export import (
        load_detector, save_detector_v5)
    params = init_yolov5_params(YoloV5Config("n"), 0, batch_norm=True)
    path = str(tmp_path / "v5n.stablehlo")
    meta = save_detector_v5(path, "n", params, batch_size=2, size=96,
                            fast=False, top_k=32, max_det=20)
    assert meta["family"] == "yolov5n" and meta["resolution"] == 96
    det = load_detector(path)
    x = np.random.RandomState(0).randint(0, 256, (2, 96, 96, 3), np.uint8)
    boxes, valid = det(x)
    assert boxes.shape == (2, 20, 6)      # [x1,y1,x2,y2,conf,cls]
    assert np.isfinite(np.asarray(boxes)).all()


def test_v5_bundle_round_trip(tmp_path):
    """save_detector_bundle_v5: family meta propagates, dispatch pads a
    tail batch to the next rung and slices back."""
    from realtimeobjectdetection_tpu.models.yolov5 import (
        YoloV5Config, init_yolov5_params)
    from realtimeobjectdetection_tpu.pipeline.export import (
        load_detector, save_detector_bundle_v5)
    params = init_yolov5_params(YoloV5Config("n"), 0)
    path = str(tmp_path / "v5n.bundle")
    meta = save_detector_bundle_v5(path, "n", params, batch_sizes=(1, 2),
                                   size=96, fast=False, top_k=32,
                                   max_det=20)
    assert meta["family"] == "yolov5n" and meta["batch_sizes"] == [1, 2]
    det = load_detector(path)
    x = np.random.RandomState(0).randint(0, 256, (2, 96, 96, 3), np.uint8)
    boxes, valid = det(x)
    assert boxes.shape == (2, 20, 6)
    b1, v1 = det(x[:1])                   # bs=1 rung, no padding
    np.testing.assert_allclose(np.asarray(b1[0]), np.asarray(boxes[0]))
