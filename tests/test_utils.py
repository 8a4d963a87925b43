import time

import numpy as np

from realtimeobjectdetection_tpu.utils.profiling import Timer, timed


def test_timer_sections_and_summary():
    t = Timer()
    for _ in range(3):
        with t("work"):
            time.sleep(0.01)
    s = t.summary()
    assert s["work"]["count"] == 3
    assert s["work"]["p50_ms"] >= 8
    assert "work" in t.report()


def test_timed_decorator_prints(capsys):
    @timed()
    def f(x):
        return x + 1

    assert f(1) == 2
    out = capsys.readouterr().out
    assert "predicted in" in out


def test_draw_target_boxes_roundtrip(tmp_path):
    from realtimeobjectdetection_tpu.utils.visualize import draw_target_boxes
    img = np.random.RandomState(0).rand(64, 64, 3).astype(np.float32)
    boxes = np.zeros((2, 85), np.float32)
    boxes[0, :6] = [32, 32, 20, 20, 1, 1]
    boxes[1, :6] = [10, 10, 8, 8, 1, 0]  # person flag unset -> skipped
    out = tmp_path / "t.png"
    im = draw_target_boxes(img, boxes, str(out))
    assert out.exists() and im.size == (64, 64)


def test_trace_to_writes_profile(tmp_path):
    import jax, jax.numpy as jnp
    from realtimeobjectdetection_tpu.utils.profiling import trace_to
    import os
    with trace_to(str(tmp_path)):
        np.asarray(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))
    # a tensorboard plugin directory appears
    found = []
    for root, dirs, files in os.walk(str(tmp_path)):
        found.extend(files)
    assert found, "no trace files written"

def test_conv_flops_v5_matches_published():
    """The v5 FLOP counter lands within 2% of ultralytics' published
    GFLOPs for every model size (their count = MACs*2 over the same
    conv set) — the MFU denominator for scripts/bench_v5.py."""
    from realtimeobjectdetection_tpu.models.yolov5 import YoloV5Config
    from realtimeobjectdetection_tpu.utils.profiling import conv_flops_v5
    published = {"n": 4.5, "s": 16.5, "m": 49.0, "l": 109.1, "x": 205.7}
    for size, pub in published.items():
        got = conv_flops_v5(YoloV5Config(size), 640) / 1e9
        assert abs(got - pub) / pub < 0.02, (size, got, pub)
    # scales quadratically with resolution
    cfg = YoloV5Config("s")
    assert conv_flops_v5(cfg, 320) * 4 == conv_flops_v5(cfg, 640)


def test_parallel_device_get_identity():
    """utils/transfer.parallel_device_get == jax.device_get bit-for-bit:
    big leaves split into row chunks and reassembled, small leaves and
    non-array leaves passed through, nested pytrees preserved."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from realtimeobjectdetection_tpu.utils.transfer import \
        parallel_device_get

    rng = np.random.RandomState(0)
    tree = {
        "big": jnp.asarray(rng.rand(4096, 600), jnp.float32),   # ~9.8 MB
        "small": jnp.asarray(rng.rand(7, 3), jnp.float32),
        "scalar": jnp.asarray(3.5),
        "nested": [jnp.asarray(rng.rand(5), jnp.bfloat16),
                   {"n": 7, "x": jnp.arange(11)}],
    }
    got = parallel_device_get(tree, workers=3, split_bytes=1 << 20)
    ref = jax.device_get(tree)
    assert got["nested"][1]["n"] == 7
    ga, _ = jax.tree_util.tree_flatten(got)
    ra, _ = jax.tree_util.tree_flatten(ref)
    for g, r in zip(ga, ra):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))
        assert np.asarray(g).dtype == np.asarray(r).dtype
