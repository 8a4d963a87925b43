"""Native C++ letterbox (native/letterbox.cpp): cv2-compatibility of the
fixed-point bicubic resize, letterbox geometry, batch/threading path,
and the DetectorV3 host_prep="native" integration.

Skips cleanly when the on-demand g++ build is unavailable."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from realtimeobjectdetection_tpu import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native build unavailable (g++)")


def test_resize_cubic_within_one_lsb_of_cv2():
    rng = np.random.RandomState(0)
    worst = 0
    exact_px = total_px = 0
    for _ in range(12):
        sh, sw = rng.randint(40, 600), rng.randint(40, 600)
        dh, dw = rng.randint(16, 450), rng.randint(16, 450)
        img = rng.randint(0, 256, (sh, sw, 3), np.uint8)
        a = native.resize_cubic_native(img, dh, dw)
        b = cv2.resize(img, (dw, dh), interpolation=cv2.INTER_CUBIC)
        d = np.abs(a.astype(int) - b.astype(int))
        worst = max(worst, int(d.max()))
        exact_px += int((d == 0).sum())
        total_px += d.size
    # cv2's exact LSB depends on its build's SIMD rounding; the in-repo
    # fixed-point pipeline stays within one u8 step everywhere and
    # matches the vast majority of pixels bit-exactly
    assert worst <= 1, worst
    assert exact_px / total_px > 0.9


def test_letterbox_matches_prep_image_host_u8():
    from realtimeobjectdetection_tpu.ops.letterbox import prep_image_host_u8
    rng = np.random.RandomState(1)
    for sh, sw in [(480, 640), (600, 400), (416, 416), (123, 457)]:
        img = rng.randint(0, 256, (sh, sw, 3), np.uint8)
        a = native.letterbox_batch_native([img], 416)[0]
        b = prep_image_host_u8(img, 416)[0]
        d = np.abs(a.astype(int) - b.astype(int))
        assert d.max() <= 1, (sh, sw, d.max())
        # padding region identical (exact 128 gray)
        mask = (b == 128).all(axis=2)
        assert (a[mask] == 128).all() or d[mask].max() == 0


def test_batch_matches_single_and_threads():
    rng = np.random.RandomState(2)
    imgs = [rng.randint(0, 256, (rng.randint(50, 300),
                                 rng.randint(50, 300), 3), np.uint8)
            for _ in range(7)]
    one = np.stack([native.letterbox_batch_native([im], 224, nthreads=1)[0]
                    for im in imgs])
    many = native.letterbox_batch_native(imgs, 224, nthreads=4)
    np.testing.assert_array_equal(many, one)


def test_round_extents_mode():
    # round_extents=True is the AutoShape convention (one-pixel extent
    # differences vs truncation)
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (333, 500, 3), np.uint8)
    a = native.letterbox_batch_native([img], 416, round_extents=True,
                                      pad_value=114, swap_rb=False)[0]
    from realtimeobjectdetection_tpu.ops.letterbox import \
        letterbox_params_round
    _, nw, nh, ox, oy = letterbox_params_round(500, 333, 416)
    # content extent matches the rounded geometry
    assert (a[oy - 1] == 114).all() and (a[oy + nh] == 114).all()
    assert not (a[oy + nh // 2] == 114).all()


def test_detector_host_prep_native(tmp_path):
    """DetectorV3(host_prep='native') produces the same detections as
    the cv2 path on the dog image (synthetic weights, fold mode): a +-1
    u8 input perturbation must not change the box protocol."""
    import os
    from conftest import REFERENCE_DIR, reference_available
    if not reference_available():
        pytest.skip("reference images not mounted")
    from realtimeobjectdetection_tpu.models import get_spec
    from realtimeobjectdetection_tpu.pipeline.detector import DetectorV3
    from realtimeobjectdetection_tpu.testing import \
        synthetic_darknet_weights
    blob = synthetic_darknet_weights(get_spec("yolov3-tiny"), 0)
    wpath = tmp_path / "t.weights"
    wpath.write_bytes(blob)
    kw = dict(images=os.path.join(REFERENCE_DIR, "imgs", "dog.jpg"),
              cfg_path="yolov3-tiny", weights_path=str(wpath),
              bn_mode="fold", confidence=0.75)
    m_cv = DetectorV3(destination=str(tmp_path / "d1"), **kw)(verbose=False)
    m_nat = DetectorV3(destination=str(tmp_path / "d2"),
                       host_prep="native", **kw)(verbose=False)
    a, b = m_cv["dog.jpg"], m_nat["dog.jpg"]
    assert isinstance(a, type(b))
    if not isinstance(a, int):
        # +-1 LSB input perturbation can flip borderline candidates of
        # the synthetic net, so compare as matched sets, not row lists
        a, b = np.array(a), np.array(b)
        assert abs(len(a) - len(b)) <= max(2, len(a) // 10)
        used = np.zeros(len(b), bool)
        matched = 0
        for r in a:
            d = np.abs(b[:, 1:5] - r[1:5]).max(1) \
                + 1e9 * (b[:, 7] != r[7]) + 1e9 * used
            j = int(d.argmin())
            if d[j] < 1.5:
                matched += 1
                used[j] = True
        assert matched / len(a) > 0.8, (matched, len(a))
