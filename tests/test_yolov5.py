"""Native YOLOv5: shapes, decode semantics, converter mapping, NMS."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from realtimeobjectdetection_tpu.models.yolov5 import (
    V5_ANCHORS, YoloV5Config, decode_v5, init_yolov5_params,
    make_yolov5_forward, params_from_ultralytics)
from realtimeobjectdetection_tpu.ops.nms import nms_image_v5


@pytest.mark.parametrize("size,c3,c5", [("s", 128, 512), ("l", 256, 1024)])
def test_config_widths(size, c3, c5):
    cfg = YoloV5Config(size)
    assert cfg.ch[2] == c3 and cfg.ch[4] == c5


@pytest.mark.parametrize("size", ["s", "l"])
def test_forward_head_shapes(size):
    cfg = YoloV5Config(size)
    params = init_yolov5_params(cfg, 0)
    fwd = jax.jit(make_yolov5_forward(cfg, compute_dtype=jnp.float32))
    x = jnp.zeros((1, 320, 320, 3), jnp.float32)
    h3, h4, h5 = fwd(params, x)
    assert h3.shape == (1, 40, 40, 255)
    assert h4.shape == (1, 20, 20, 255)
    assert h5.shape == (1, 10, 10, 255)
    pred = decode_v5([h3, h4, h5], 80)
    assert pred.shape == (1, (40 * 40 + 20 * 20 + 10 * 10) * 3, 85)


def test_decode_v5_semantics():
    # zero logits: sigmoid=0.5 -> xy = (0.5*2-0.5+grid)*stride = (0.5+g)*s,
    # wh = (2*0.5)^2 * anchor = anchor
    h3 = jnp.zeros((1, 2, 2, 255))
    h4 = jnp.zeros((1, 1, 1, 255))
    h5 = jnp.zeros((1, 1, 1, 255))
    pred = np.asarray(decode_v5([h3, h4, h5], 80))
    np.testing.assert_allclose(pred[0, 0, 0:2], [0.5 * 8, 0.5 * 8])
    np.testing.assert_allclose(pred[0, 0, 2:4], V5_ANCHORS[0][0])
    # second cell of the 2x2 grid: x offset 1
    np.testing.assert_allclose(pred[0, 3, 0], (0.5 + 1) * 8)
    np.testing.assert_allclose(pred[0, 0, 4], 0.5)


def test_ultralytics_converter_mapping():
    torch = pytest.importorskip("torch")
    cfg = YoloV5Config("s")
    ours = init_yolov5_params(cfg, 3)

    # build an ultralytics-schema state dict carrying our own values:
    # conv kernels OIHW, identity BN (gamma=1, beta=0, mean=0, var=1-eps)
    sd = {}

    def put_conv(prefix, p):
        w = np.asarray(p["w"]).transpose(3, 2, 0, 1)
        sd[prefix + ".conv.weight"] = torch.from_numpy(w.copy())
        o = w.shape[0]
        sd[prefix + ".bn.weight"] = torch.ones(o)
        sd[prefix + ".bn.bias"] = torch.from_numpy(np.asarray(p["b"]).copy())
        sd[prefix + ".bn.running_mean"] = torch.zeros(o)
        sd[prefix + ".bn.running_var"] = torch.full((o,), 1.0 - 1e-3)

    def put_c3(prefix, p):
        put_conv(prefix + ".cv1", p["cv1"])
        put_conv(prefix + ".cv2", p["cv2"])
        put_conv(prefix + ".cv3", p["cv3"])
        for j, bp in enumerate(p["m"]):
            put_conv(f"{prefix}.m.{j}.cv1", bp["cv1"])
            put_conv(f"{prefix}.m.{j}.cv2", bp["cv2"])

    conv_idx = [0, 1, 3, 5, 7, 10, 14, 18, 21]
    conv_keys = ["m0", "m1", "m3", "m5", "m7", "m10", "m14", "m18", "m21"]
    for i, k in zip(conv_idx, conv_keys):
        put_conv(f"model.{i}", ours[k])
    c3_idx = [2, 4, 6, 8, 13, 17, 20, 23]
    c3_keys = ["m2", "m4", "m6", "m8", "m13", "m17", "m20", "m23"]
    for i, k in zip(c3_idx, c3_keys):
        put_c3(f"model.{i}", ours[k])
    put_conv("model.9.cv1", ours["m9"]["cv1"])
    put_conv("model.9.cv2", ours["m9"]["cv2"])
    for s in range(3):
        p = ours["m24"][str(s)]
        sd[f"model.24.m.{s}.weight"] = torch.from_numpy(
            np.asarray(p["w"]).transpose(3, 2, 0, 1).copy())
        sd[f"model.24.m.{s}.bias"] = torch.from_numpy(
            np.asarray(p["b"]).copy())

    conv = params_from_ultralytics(cfg, sd)
    # identity BN with var = 1-eps folds to scale exactly 1
    for key in ["m0", "m9", "m24"]:
        a = jax.tree_util.tree_leaves(ours[key])
        b = jax.tree_util.tree_leaves(conv[key])
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-5, atol=1e-6)
    # whole tree structurally identical
    assert jax.tree_util.tree_structure(ours) == \
        jax.tree_util.tree_structure(conv)


def test_nms_v5_semantics():
    # conf = obj * cls; ordering by conf desc; standard IoU
    pred = np.zeros((4, 85), np.float32)
    pred[:, 0:4] = [[100, 100, 40, 40], [102, 102, 40, 40],
                    [300, 300, 40, 40], [100, 100, 40, 40]]
    pred[:, 4] = [0.9, 0.8, 0.9, 0.6]
    pred[0, 5] = 0.8   # conf .72
    pred[1, 5] = 0.9   # conf .72 -> overlaps 0, same class, suppressed
    pred[2, 6] = 0.9   # class 1, conf .81
    pred[3, 5] = 0.2   # conf .12 < 0.25 -> dropped
    boxes, valid = nms_image_v5(jnp.asarray(pred), 80, 0.25, 0.45)
    boxes, valid = np.asarray(boxes), np.asarray(valid)
    kept = boxes[valid]
    assert kept.shape[0] == 2
    # conf-descending: class-1 box (0.81) first
    assert kept[0, 5] == 1 and kept[0, 4] == pytest.approx(0.81)
    assert kept[1, 5] == 0


def test_detector_v5_pipeline(tmp_path):
    import os
    cv2 = pytest.importorskip("cv2")
    from realtimeobjectdetection_tpu.pipeline.yolov5 import DetectorV5
    imgs = tmp_path / "imgs"
    imgs.mkdir()
    rng = np.random.RandomState(0)
    cv2.imwrite(str(imgs / "a.jpg"),
                rng.randint(0, 255, (240, 320, 3), np.uint8))
    det = DetectorV5(str(imgs), model_size="s", destination=str(tmp_path / "det"),
                     size=320, confidence=0.25)
    metrics = det(verbose=False)
    assert "a.jpg" in metrics
    assert os.path.exists(str(tmp_path / "det" / "det_yolov5_a.jpg"))


def test_stream_detector_synthetic():
    from realtimeobjectdetection_tpu.models import get_spec
    from realtimeobjectdetection_tpu.pipeline.stream import (StreamDetector,
                                                             synthetic_frames)
    from realtimeobjectdetection_tpu.weights import init_params
    import jax.numpy as jnp
    spec = get_spec("yolov3-tiny", width=160, height=160)
    det = StreamDetector(spec, init_params(spec, 0), resolution=160,
                         bn_mode="fold", compute_dtype=jnp.float32,
                         top_k=32)
    seen = []
    stats = det.run(synthetic_frames(12, 120, 160),
                    on_result=lambda f, rows: seen.append(len(rows)))
    assert stats["frames"] == 12 and len(seen) == 12
    assert np.isfinite(stats["p50_ms"]) and stats["p50_ms"] > 0
    assert stats["p99_ms"] >= stats["p50_ms"]


def test_stream_device_resize_matches_host_path_roughly():
    from realtimeobjectdetection_tpu.models import get_spec
    from realtimeobjectdetection_tpu.pipeline.stream import (StreamDetector,
                                                             synthetic_frames)
    from realtimeobjectdetection_tpu.weights import init_params
    import jax.numpy as jnp
    spec = get_spec("yolov3-tiny", width=160, height=160)
    params = init_params(spec, 0)
    kw = dict(resolution=160, bn_mode="running",
              compute_dtype=jnp.float32, top_k=32)
    host = StreamDetector(spec, params, **kw)
    dev = StreamDetector(spec, params, device_resize=True, **kw)
    sh = host.run(synthetic_frames(4, 120, 160))
    sd = dev.run(synthetic_frames(4, 120, 160))
    assert sh["frames"] == sd["frames"] == 4


def test_stream_cli_video_roundtrip(tmp_path):
    """Video file in -> rendered video out through the stream CLI."""
    cv2 = pytest.importorskip("cv2")
    import os
    from realtimeobjectdetection_tpu.cli import stream_cli
    src = str(tmp_path / "in.mp4")
    w = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"mp4v"), 10, (160, 120))
    rng = np.random.RandomState(0)
    for _ in range(6):
        w.write(rng.randint(0, 255, (120, 160, 3), np.uint8))
    w.release()
    out = str(tmp_path / "out.mp4")
    stats = stream_cli(["--source", src, "--cfg", "yolov3-tiny",
                        "--reso", "160", "--confidence", "0.7",
                        "--save", out])
    assert stats["frames"] == 6
    cap = cv2.VideoCapture(out)
    n = 0
    while cap.read()[0]:
        n += 1
    assert n == 6


def test_stream_pipelined_depth2_same_results():
    """Throughput mode (pipeline_depth=2, VERDICT r1 task 7) must produce
    exactly the per-frame rows of depth 1 — only the overlap schedule
    changes, never the math or the frame order."""
    from realtimeobjectdetection_tpu.models import get_spec
    from realtimeobjectdetection_tpu.pipeline.stream import (StreamDetector,
                                                             synthetic_frames)
    from realtimeobjectdetection_tpu.weights import init_params
    import jax.numpy as jnp
    spec = get_spec("yolov3-tiny", width=160, height=160)
    det = StreamDetector(spec, init_params(spec, 0), resolution=160,
                         bn_mode="fold", compute_dtype=jnp.float32,
                         top_k=32, confidence=0.3)
    runs = {}
    for depth in (1, 2, 3):
        seen = []
        stats = det.run(synthetic_frames(10, 120, 160),
                        on_result=lambda f, rows: seen.append(
                            np.asarray(rows).copy()),
                        pipeline_depth=depth)
        assert stats["frames"] == 10 and len(seen) == 10
        runs[depth] = seen
    for depth in (2, 3):
        for a, b in zip(runs[1], runs[depth]):
            np.testing.assert_array_equal(a, b)


def test_stream_cli_exposes_device_resize_and_depth():
    from realtimeobjectdetection_tpu.cli import stream_arg_parser
    a = stream_arg_parser().parse_args(
        ["--source", "synthetic", "--device_resize",
         "--pipeline_depth", "2", "--top_k", "64"])
    assert a.device_resize and a.pipeline_depth == 2 and a.top_k == 64


def test_rect_shape_autoshape_semantics():
    """rect_shape reproduces AutoShape's stride-ceil canvas (long side =
    size, short side ceil'd to the stride / bucket quantum)."""
    from realtimeobjectdetection_tpu.pipeline.yolov5 import rect_shape
    # 640x480 at size 640: g=1, short side 480 -> exact stride multiple
    assert rect_shape(640, 480, 640, bucket=32) == (480, 640)
    # 1280x720 at 640: g=0.5 -> 360 -> ceil32 = 384
    assert rect_shape(1280, 720, 640, bucket=32) == (384, 640)
    # bucket=64 quantizes the short side up, bounding program count
    assert rect_shape(1280, 720, 640, bucket=64) == (384, 640)
    assert rect_shape(1280, 700, 640, bucket=64) == (384, 640)
    # portrait orientation mirrors
    assert rect_shape(720, 1280, 640, bucket=32) == (640, 384)
    # square stays square (rect == non-rect canvas)
    assert rect_shape(500, 500, 640, bucket=64) == (640, 640)


def test_rect_letterbox_geometry_round_trip():
    """Canvas corners of the resized content map back to the original
    image corners through the recorded (r, left, top)."""
    cv2 = pytest.importorskip("cv2")
    from realtimeobjectdetection_tpu.pipeline.yolov5 import (
        letterbox_v5_rect, rect_shape)
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (700, 1280, 3), np.uint8)
    th, tw = rect_shape(1280, 700, 640, bucket=64)
    canvas, r, left, top = letterbox_v5_rect(img, th, tw)
    assert canvas.shape == (th, tw, 3)
    # content extent inside the canvas
    nw, nh = int(round(1280 * r)), int(round(700 * r))
    # corner (left, top) -> (0, 0); (left+nw, top+nh) -> (w, h)
    assert abs((left - left) / r - 0) < 1e-6
    assert abs((left + nw - left) / r - 1280) < 1.0 / r
    assert abs((top + nh - top) / r - 700) < 1.0 / r
    # padding is the 114 gray
    assert (canvas[0, :, :] == 114).all() or top == 0


def test_detector_v5_rect_square_image_matches_nonrect(tmp_path):
    """On a square image the AutoShape rect canvas IS the square canvas,
    so both paths must produce identical metrics rows (the box-parity
    gate for the rect feature on synthetic weights)."""
    import os
    cv2 = pytest.importorskip("cv2")
    from realtimeobjectdetection_tpu.pipeline.yolov5 import DetectorV5
    import jax.numpy as jnp
    imgs = tmp_path / "imgs"
    imgs.mkdir()
    rng = np.random.RandomState(2)
    cv2.imwrite(str(imgs / "sq.jpg"),
                rng.randint(0, 255, (280, 280, 3), np.uint8))
    kw = dict(model_size="s", size=320, confidence=0.25,
              compute_dtype=jnp.float32)
    m_sq = DetectorV5(str(imgs), destination=str(tmp_path / "d1"),
                      **kw)(verbose=False)
    m_rect = DetectorV5(str(imgs), destination=str(tmp_path / "d2"),
                        rect=True, **kw)(verbose=False)
    assert isinstance(m_sq["sq.jpg"], type(m_rect["sq.jpg"]))
    if not isinstance(m_sq["sq.jpg"], int):
        np.testing.assert_allclose(np.array(m_rect["sq.jpg"]),
                                   np.array(m_sq["sq.jpg"]), atol=1e-3)


def test_detector_v5_rect_nonsquare_runs_bucketed_canvas(tmp_path):
    """Non-square input runs on the stride-rounded rectangular canvas
    (not 320x320) and boxes come back in original-image coordinates."""
    import os
    cv2 = pytest.importorskip("cv2")
    from realtimeobjectdetection_tpu.pipeline.yolov5 import DetectorV5
    import jax.numpy as jnp
    imgs = tmp_path / "imgs"
    imgs.mkdir()
    rng = np.random.RandomState(3)
    cv2.imwrite(str(imgs / "wide.jpg"),
                rng.randint(0, 255, (180, 320, 3), np.uint8))
    det = DetectorV5(str(imgs), model_size="s", rect=True, size=320,
                     destination=str(tmp_path / "d"), confidence=0.25,
                     compute_dtype=jnp.float32)
    _, _, geoms, batch = det._prep_batch([str(imgs / "wide.jpg")])
    assert batch.shape[1] < 320 and batch.shape[2] == 320  # rect canvas
    assert batch.shape[1] % 32 == 0
    metrics = det(verbose=False)
    rows = metrics["wide.jpg"]
    if not isinstance(rows, int):
        rows = np.array(rows)
        assert (rows[:, [0, 2]] <= 320 + 1e-3).all()
        assert (rows[:, [1, 3]] <= 180 + 1e-3).all()


def test_decode_v5_topk_matches_full_path():
    """Fused v5 selection: NMS survivors identical to the full decode."""
    import jax, jax.numpy as jnp
    from realtimeobjectdetection_tpu.models.yolov5 import (
        YoloV5Config, decode_v5, decode_v5_topk, init_yolov5_params,
        make_yolov5_forward)
    from realtimeobjectdetection_tpu.ops.nms import nms_batch_v5
    cfg = YoloV5Config("n")
    params = init_yolov5_params(cfg, seed=0)
    fwd = jax.jit(make_yolov5_forward(cfg, compute_dtype=jnp.float32))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 320, 320, 3).astype(np.float32))
    heads = fwd(params, x)
    full = decode_v5(heads, 80)
    b_a, v_a = nms_batch_v5(full, 80, 0.25, 0.45, top_k=256, max_det=50)
    pred_k = decode_v5_topk(heads, 80, 256, 0.25)
    b_b, v_b = nms_batch_v5(pred_k, 80, 0.25, 0.45, top_k=256, max_det=50)
    np.testing.assert_array_equal(np.asarray(v_a), np.asarray(v_b))
    ka = np.asarray(b_a)[np.asarray(v_a)]
    kb = np.asarray(b_b)[np.asarray(v_b)]
    np.testing.assert_allclose(kb, ka, rtol=1e-5, atol=1e-4)


def test_detector_v5_fused_pipeline(tmp_path):
    cv2 = pytest.importorskip("cv2")
    import os
    import jax.numpy as jnp
    from realtimeobjectdetection_tpu.pipeline.yolov5 import DetectorV5
    imgs = tmp_path / "imgs"
    imgs.mkdir()
    rng = np.random.RandomState(4)
    cv2.imwrite(str(imgs / "a.jpg"),
                rng.randint(0, 255, (240, 320, 3), np.uint8))
    kw = dict(model_size="n", size=320, confidence=0.25,
              compute_dtype=jnp.float32)
    m_full = DetectorV5(str(imgs), destination=str(tmp_path / "d1"),
                        **kw)(verbose=False)
    m_fused = DetectorV5(str(imgs), destination=str(tmp_path / "d2"),
                         fused_decode=True, **kw)(verbose=False)
    a, b = m_full["a.jpg"], m_fused["a.jpg"]
    assert isinstance(a, type(b))
    if not isinstance(a, int):
        np.testing.assert_allclose(np.array(b), np.array(a),
                                   rtol=1e-4, atol=1e-3)


def test_detector_v5_rect_batched_matches_bs1(tmp_path):
    """Rect batching groups images by canvas bucket; per-image results
    must be identical to rect bs=1 (NMS is per-image, so batching is
    result-invariant — ROADMAP 7)."""
    cv2 = pytest.importorskip("cv2")
    import jax.numpy as jnp
    from realtimeobjectdetection_tpu.pipeline.yolov5 import DetectorV5
    imgs = tmp_path / "imgs"
    imgs.mkdir()
    rng = np.random.RandomState(7)
    # two wide (same bucket), one tall, one odd-size wide -> 2+ buckets,
    # one group with a batched chunk and one padded tail
    for name, (h, w) in [("w1.jpg", (180, 320)), ("w2.jpg", (170, 300)),
                         ("t1.jpg", (320, 180)), ("w3.jpg", (160, 310))]:
        cv2.imwrite(str(imgs / name),
                    rng.randint(0, 255, (h, w, 3), np.uint8))
    kw = dict(model_size="n", size=320, confidence=0.25, rect=True,
              compute_dtype=jnp.float32)
    m1 = DetectorV5(str(imgs), destination=str(tmp_path / "d1"),
                    batch_size=1, **kw)(verbose=False)
    m2 = DetectorV5(str(imgs), destination=str(tmp_path / "d2"),
                    batch_size=2, **kw)(verbose=False)
    assert set(m1) == set(m2) == {"w1.jpg", "w2.jpg", "t1.jpg", "w3.jpg"}
    for k in m1:
        assert isinstance(m1[k], type(m2[k]))
        if not isinstance(m1[k], int):
            np.testing.assert_allclose(np.array(m2[k]), np.array(m1[k]),
                                       rtol=1e-4, atol=1e-3)


def test_rect_groups_share_canvas(tmp_path):
    cv2 = pytest.importorskip("cv2")
    import jax.numpy as jnp
    from realtimeobjectdetection_tpu.pipeline.yolov5 import (DetectorV5,
                                                             rect_shape)
    imgs = tmp_path / "imgs"
    imgs.mkdir()
    rng = np.random.RandomState(8)
    for name, (h, w) in [("a.jpg", (180, 320)), ("b.jpg", (172, 300)),
                         ("c.jpg", (320, 180))]:
        cv2.imwrite(str(imgs / name),
                    rng.randint(0, 255, (h, w, 3), np.uint8))
    det = DetectorV5(str(imgs), model_size="n", size=320, rect=True,
                     batch_size=4, destination=str(tmp_path / "d"),
                     compute_dtype=jnp.float32)
    groups = det._rect_groups(det.list_images())
    for g in groups:
        shapes = set()
        for p in g:
            img = cv2.imread(p)
            shapes.add(rect_shape(img.shape[1], img.shape[0], 320,
                                  bucket=det.rect_bucket))
        assert len(shapes) == 1
    assert sum(len(g) for g in groups) == 3 and len(groups) == 2


def test_v5_act_bf16_drift_bounded():
    """bf16 activation residency (DetectorV5(activation_dtype=bf16), the
    serving fast path) must stay within bounded drift of the fp32-
    residency path on decoded boxes — regression net mirroring the
    darknet-side test_bf16_fast_path_drift_bounded."""
    cfg = YoloV5Config("s")
    params = init_yolov5_params(cfg, 0)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 320, 320, 3),
                    jnp.float32)
    f32 = jax.jit(make_yolov5_forward(cfg, compute_dtype=jnp.bfloat16))
    b16 = jax.jit(make_yolov5_forward(cfg, compute_dtype=jnp.bfloat16,
                                      activation_dtype=jnp.bfloat16))
    a = np.asarray(decode_v5(f32(params, x), 80))
    b = np.asarray(decode_v5(b16(params, x), 80))
    # probabilities: small absolute drift; coords: bounded pixel drift
    assert np.abs(a[..., 4:] - b[..., 4:]).max() < 0.05
    assert np.median(np.abs(a[..., :2] - b[..., :2])) < 1.0


def test_v5_act_bf16_default_unchanged():
    """activation_dtype=None must be bit-identical to the pre-option
    forward (fp32 residency): the parity default cannot move."""
    cfg = YoloV5Config("s")
    params = init_yolov5_params(cfg, 0)
    x = jnp.asarray(np.random.RandomState(1).rand(1, 320, 320, 3),
                    jnp.float32)
    f = jax.jit(make_yolov5_forward(cfg, compute_dtype=jnp.float32))
    g = jax.jit(make_yolov5_forward(cfg, compute_dtype=jnp.float32,
                                    activation_dtype=None, head_dtype=None))
    for ha, hb in zip(f(params, x), g(params, x)):
        np.testing.assert_array_equal(np.asarray(ha), np.asarray(hb))


def test_decode_v5_topk_per_head_gather_bit_identical():
    """per_head_gather=True skips the [B, N, 5+C] raw concat; the
    gathered rows must be BIT-identical to the concat path."""
    import jax, jax.numpy as jnp
    from realtimeobjectdetection_tpu.models.yolov5 import (
        YoloV5Config, decode_v5_topk, init_yolov5_params,
        make_yolov5_forward)
    cfg = YoloV5Config("n")
    params = init_yolov5_params(cfg, seed=0)
    fwd = jax.jit(make_yolov5_forward(cfg, compute_dtype=jnp.float32))
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, 320, 320, 3).astype(np.float32))
    heads = fwd(params, x)
    a = np.asarray(decode_v5_topk(heads, 80, 128, 0.25))
    b = np.asarray(decode_v5_topk(heads, 80, 128, 0.25,
                                  per_head_gather=True))
    np.testing.assert_array_equal(a, b)


def test_decode_v5_topk_approx_high_recall():
    """approx=True (lax.approx_max_k) must recover the overwhelming
    majority of the exact top-k's above-threshold candidates (the
    serving fast path's documented recall >= 0.95 contract)."""
    import jax, jax.numpy as jnp
    from realtimeobjectdetection_tpu.models.yolov5 import (
        YoloV5Config, decode_v5_topk, init_yolov5_params,
        make_yolov5_forward)
    cfg = YoloV5Config("n")
    params = init_yolov5_params(cfg, seed=0)
    fwd = jax.jit(make_yolov5_forward(cfg, compute_dtype=jnp.float32))
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(2, 320, 320, 3).astype(np.float32))
    heads = fwd(params, x)
    k = 128
    exact = np.asarray(decode_v5_topk(heads, 80, k, 0.25))
    approx = np.asarray(decode_v5_topk(heads, 80, k, 0.25, approx=True))

    def keyset(rows):
        conf = rows[..., 4] * rows[..., 5:].max(-1)
        out = set()
        for b in range(rows.shape[0]):
            for i in range(rows.shape[1]):
                if conf[b, i] > 0.25:
                    out.add((b, round(float(rows[b, i, 0]), 3),
                             round(float(rows[b, i, 1]), 3)))
        return out
    want, got = keyset(exact), keyset(approx)
    if want:
        recall = len(want & got) / len(want)
        assert recall >= 0.95, recall


def test_s2d_stem_exact():
    """make_yolov5_forward(s2d_stem=True) rewrites the 6x6/2 stem as a
    3x3/1 conv over the 2x2 space-to-depth input — an algebraic
    identity (models/yolov5._stem_s2d), so fp32 heads must match the
    plain forward to summation-order tolerance, in both the folded
    serving layout and the batch-stats training layout."""
    cfg = YoloV5Config("n")
    x = jnp.asarray(np.random.RandomState(7).rand(2, 128, 128, 3),
                    jnp.float32)
    for bn, layout in (("fold", False), ("batch", True)):
        params = init_yolov5_params(cfg, 0, batch_norm=layout)
        base = jax.jit(make_yolov5_forward(
            cfg, compute_dtype=jnp.float32, bn_mode=bn))
        s2d = jax.jit(make_yolov5_forward(
            cfg, compute_dtype=jnp.float32, bn_mode=bn, s2d_stem=True))
        for ha, hb in zip(base(params, x), s2d(params, x)):
            # batch-BN divides by the batch std, amplifying the stem's
            # summation-order noise; measured absmax 8.5e-5 on ~10-mag
            # normalized heads (CPU fp32), 1.1e-7 on the folded layout.
            np.testing.assert_allclose(np.asarray(ha), np.asarray(hb),
                                       rtol=1e-4, atol=5e-4)


def test_scan_ladders_forward_equivalence():
    """make_yolov5_forward(scan_ladders=True) rolls each C3's repeats
    into lax.scan over stacked weights — numerics must equal the
    unrolled forward (same ops, XLA-fusion ULPs only) in the folded
    serving layout, including under remat."""
    cfg = YoloV5Config("l")  # deep size: 3/6/9/3-repeat C3s
    x = jnp.asarray(np.random.RandomState(3).rand(1, 64, 64, 3),
                    jnp.float32)
    params = init_yolov5_params(cfg, 0)
    base = jax.jit(make_yolov5_forward(cfg, compute_dtype=jnp.float32))
    for remat in (False, True):
        rolled = jax.jit(make_yolov5_forward(
            cfg, compute_dtype=jnp.float32, scan_ladders=True,
            scan_remat=remat))
        for ha, hb in zip(base(params, x), rolled(params, x)):
            np.testing.assert_allclose(np.asarray(ha), np.asarray(hb),
                                       rtol=1e-5, atol=1e-5)


def test_scan_ladders_batch_stats_rekey():
    """With bn_mode='batch' the scanned C3 re-keys its per-repeat batch
    statistics back to the exact unrolled names — heads AND every
    (mean, var) entry must match the unrolled forward, so the
    running-stat update in train/v5.py is layout-agnostic."""
    cfg = YoloV5Config("n")
    x = jnp.asarray(np.random.RandomState(5).rand(2, 64, 64, 3),
                    jnp.float32)
    params = init_yolov5_params(cfg, 0, batch_norm=True)
    base = jax.jit(make_yolov5_forward(
        cfg, compute_dtype=jnp.float32, bn_mode="batch",
        return_stats=True))
    rolled = jax.jit(make_yolov5_forward(
        cfg, compute_dtype=jnp.float32, bn_mode="batch",
        return_stats=True, scan_ladders=True))
    hb, sb = base(params, x)
    hr, sr = rolled(params, x)
    for ha, hc in zip(hb, hr):
        np.testing.assert_allclose(np.asarray(ha), np.asarray(hc),
                                   rtol=2e-4, atol=5e-4)
    assert set(sb) == set(sr)
    for k in sb:
        np.testing.assert_allclose(np.asarray(sb[k][0]),
                                   np.asarray(sr[k][0]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)
        np.testing.assert_allclose(np.asarray(sb[k][1]),
                                   np.asarray(sr[k][1]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)


@pytest.mark.parametrize("size", ["n", "s", "m", "l", "x"])
def test_conv_inventory_matches_step_flops(size):
    """v5_conv_inventory (the analytic roofline's conv list) must count
    exactly the FLOPs of v5_step_flops (which test_yolov5 pins to the
    published ultralytics totals) — one source of truth, two walks."""
    from realtimeobjectdetection_tpu.models.yolov5 import (
        v5_conv_inventory, v5_step_flops, yolov5_config)
    cfg = yolov5_config(size)
    inv = sum(2 * r["s_out"] ** 2 * r["k"] ** 2 * r["cin"] * r["cout"]
              for r in v5_conv_inventory(cfg, 640))
    assert inv == sum(v5_step_flops(cfg, 640))
    # strides are only ever 1 or 2, and spatial dims stay consistent
    for r in v5_conv_inventory(cfg, 640):
        assert r["s_in"] // r["s_out"] in (1, 2), r


def test_decode_v5_topk_nhwc_select_bit_identical():
    """nhwc_select (score+gather off the conv layout, round-4 serving
    lever) must return EXACTLY the per_head_gather path's rows — same
    selection, same order, same values."""
    import jax, jax.numpy as jnp
    from realtimeobjectdetection_tpu.models.yolov5 import (
        YoloV5Config, decode_v5_topk, init_yolov5_params,
        make_yolov5_forward)
    cfg = YoloV5Config("n")
    params = init_yolov5_params(cfg, seed=0)
    fwd = jax.jit(make_yolov5_forward(cfg, compute_dtype=jnp.float32))
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, 320, 320, 3).astype(np.float32))
    heads = fwd(params, x)
    for approx in (False, True):
        base = decode_v5_topk(heads, 80, 256, 0.25, approx=approx,
                              per_head_gather=True)
        new = decode_v5_topk(heads, 80, 256, 0.25, approx=approx,
                             nhwc_select=True)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(new))


def test_decode_v5_topk_compact_bit_identical():
    """Compact conv-layout decode (decode_v5_topk_compact +
    nms_batch_v5(compact=True)) must produce bit-identical NMS outputs
    to the round-3 shipping pair (decode_v5_topk + nms_batch_v5) — same
    survivors, same row order, same values, exact and approx top-k."""
    import jax, jax.numpy as jnp
    from realtimeobjectdetection_tpu.models.yolov5 import (
        YoloV5Config, decode_v5_topk, decode_v5_topk_compact,
        init_yolov5_params, make_yolov5_forward)
    from realtimeobjectdetection_tpu.ops.nms import nms_batch_v5
    cfg = YoloV5Config("n")
    params = init_yolov5_params(cfg, seed=0)
    fwd = jax.jit(make_yolov5_forward(cfg, compute_dtype=jnp.float32))
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(2, 320, 320, 3).astype(np.float32))
    heads = fwd(params, x)
    for approx in (False, True):
        pred_a = decode_v5_topk(heads, 80, 256, 0.25, approx=approx,
                                per_head_gather=True)
        out_a, keep_a = nms_batch_v5(pred_a, 80, 0.25, 0.45, top_k=256,
                                     max_det=50)
        pred_b = decode_v5_topk_compact(heads, 80, 256, 0.25,
                                        approx=approx)
        out_b, keep_b = nms_batch_v5(pred_b, 80, 0.25, 0.45, top_k=256,
                                     max_det=50, compact=True)
        np.testing.assert_array_equal(np.asarray(keep_a),
                                      np.asarray(keep_b))
        np.testing.assert_array_equal(np.asarray(out_a),
                                      np.asarray(out_b))


def test_split_heads_and_split_decode_match():
    """split_heads forward (3 channel-sliced per-anchor convs per
    detect head) emits the single conv's values up to XLA conv-tiling
    ULPs (cout=85 vs 255 accumulate in different tile orders — the same
    caveat as scan_ladders), and decode_v5_topk_split +
    nms_batch_v5(compact=True) must keep the decode_v5_topk +
    nms_batch_v5 survivors/rows within that tolerance."""
    import jax, jax.numpy as jnp
    from realtimeobjectdetection_tpu.models.yolov5 import (
        YoloV5Config, decode_v5_topk, decode_v5_topk_split,
        init_yolov5_params, make_yolov5_forward)
    from realtimeobjectdetection_tpu.ops.nms import nms_batch_v5
    cfg = YoloV5Config("n")
    params = init_yolov5_params(cfg, seed=0)
    fwd = jax.jit(make_yolov5_forward(cfg, compute_dtype=jnp.float32))
    fwd_s = jax.jit(make_yolov5_forward(cfg, compute_dtype=jnp.float32,
                                        split_heads=True))
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(2, 320, 320, 3).astype(np.float32))
    heads = fwd(params, x)
    heads_s = fwd_s(params, x)
    c = 85
    for hm, h3 in zip(heads, heads_s):
        assert isinstance(h3, tuple) and len(h3) == 3
        for ai in range(3):
            np.testing.assert_allclose(
                np.asarray(hm[..., ai * c:(ai + 1) * c]),
                np.asarray(h3[ai]), rtol=2e-6, atol=2e-7)
    for approx in (False, True):
        pred_a = decode_v5_topk(heads, 80, 256, 0.25, approx=approx)
        out_a, keep_a = nms_batch_v5(pred_a, 80, 0.25, 0.45, top_k=256,
                                     max_det=50)
        pred_b = decode_v5_topk_split(heads_s, 80, 256, 0.25,
                                      approx=approx)
        out_b, keep_b = nms_batch_v5(pred_b, 80, 0.25, 0.45, top_k=256,
                                     max_det=50, compact=True)
        np.testing.assert_array_equal(np.asarray(keep_a),
                                      np.asarray(keep_b))
        np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_a),
                                   rtol=1e-5, atol=1e-5)

    # the split DECODE itself (given identical head values) is exact:
    # feed the single-conv heads re-sliced as tuples
    heads_sliced = [tuple(hm[..., ai * c:(ai + 1) * c]
                          for ai in range(3)) for hm in heads]
    pred_c = decode_v5_topk_split(heads_sliced, 80, 256, 0.25)
    pred_a = decode_v5_topk(heads, 80, 256, 0.25)
    out_a, keep_a = nms_batch_v5(pred_a, 80, 0.25, 0.45, top_k=256,
                                 max_det=50)
    out_c, keep_c = nms_batch_v5(pred_c, 80, 0.25, 0.45, top_k=256,
                                 max_det=50, compact=True)
    np.testing.assert_array_equal(np.asarray(keep_a), np.asarray(keep_c))
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_c))
