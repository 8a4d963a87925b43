"""convert/export CLI round trips."""

import numpy as np
import pytest

from realtimeobjectdetection_tpu.cli import convert_cli, export_cli
from realtimeobjectdetection_tpu.models import get_spec
from realtimeobjectdetection_tpu.testing import synthetic_darknet_weights


def test_convert_weights_npz_round_trip(tmp_path):
    blob = synthetic_darknet_weights(get_spec("yolov3-tiny"), 0)
    src = tmp_path / "t.weights"
    src.write_bytes(blob)
    npz = str(tmp_path / "t.npz")
    back = str(tmp_path / "t2.weights")
    convert_cli(["--cfg", "yolov3-tiny", "--src", str(src), "--dst", npz])
    convert_cli(["--cfg", "yolov3-tiny", "--src", npz, "--dst", back])
    assert open(back, "rb").read()[20:] == blob[20:]


def test_convert_v5_rejects_darknet_weights(tmp_path):
    src = tmp_path / "t.weights"
    src.write_bytes(synthetic_darknet_weights(get_spec("yolov3-tiny"), 0))
    with pytest.raises(ValueError, match="Darknet .weights"):
        convert_cli(["--cfg", "yolov5s", "--src", str(src),
                     "--dst", str(tmp_path / "o.npz")])


def test_export_cli_and_reload(tmp_path):
    dst = str(tmp_path / "t.stablehlo")
    export_cli(["--cfg", "yolov3-tiny", "--dst", dst, "--batch_size", "1",
                "--reso", "160", "--top_k", "16"])
    from realtimeobjectdetection_tpu.pipeline.export import load_detector
    det = load_detector(dst)
    boxes, valid = det(np.zeros((1, 160, 160, 3), np.uint8))
    assert boxes.shape == (1, 16, 7)


def test_detector_v5_batched_matches_bs1(tmp_path):
    cv2 = pytest.importorskip("cv2")
    import os
    from realtimeobjectdetection_tpu.pipeline.yolov5 import DetectorV5
    imgs = tmp_path / "imgs"
    imgs.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        cv2.imwrite(str(imgs / f"i{i}.jpg"),
                    rng.randint(0, 255, (200, 260, 3), np.uint8))
    import jax.numpy as jnp
    kw = dict(model_size="s", size=320, confidence=0.25,
              compute_dtype=jnp.float32)
    m1 = DetectorV5(str(imgs), destination=str(tmp_path / "d1"),
                    batch_size=1, **kw)(verbose=False)
    m2 = DetectorV5(str(imgs), destination=str(tmp_path / "d2"),
                    batch_size=2, **kw)(verbose=False)
    assert set(m1) == set(m2)
    for k in m1:
        a, b = m1[k], m2[k]
        if isinstance(a, int) or isinstance(b, int):
            assert a == b
            continue
        np.testing.assert_allclose(np.array(a), np.array(b), atol=1e-3)
