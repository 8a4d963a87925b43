import os

import numpy as np
import jax.numpy as jnp

from realtimeobjectdetection_tpu.ops.letterbox import (letterbox_host,
                                                       letterbox_jax,
                                                       letterbox_params,
                                                       prep_image_host)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def synth_image():
    rng = np.random.RandomState(7)
    return rng.randint(0, 256, size=(317, 640, 3), dtype=np.uint8)


def test_prep_image_matches_reference_exactly():
    """Bit-parity with the reference prep_image (cv2 INTER_CUBIC path)."""
    d = np.load(os.path.join(GOLDEN, "letterbox_synth.npz"))
    img = synth_image()
    ours_bgr = prep_image_host(img, 416, mode="BGR")   # NHWC
    ref_bgr = d["prepped_bgr"].transpose(0, 2, 3, 1)   # NCHW -> NHWC
    np.testing.assert_array_equal(ours_bgr, ref_bgr)
    ours_rgb = prep_image_host(img, 416, mode="RGB")
    ref_rgb = d["prepped_rgb"].transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(ours_rgb, ref_rgb)


def test_letterbox_params_geometry():
    scale, new_w, new_h, off_x, off_y = letterbox_params(640, 317, 416)
    assert new_w == 416 and off_x == 0
    assert new_h == int(317 * 416 / 640)
    assert off_y == (416 - new_h) // 2


def test_letterbox_jax_close_to_host():
    # geometry/padding on noise; value closeness on smooth content (the
    # cubic kernels differ slightly — cv2 vs Keys — so noise is worst-case)
    img = synth_image()
    dev = np.asarray(letterbox_jax(jnp.asarray(img), 416, method="cubic"))
    host = letterbox_host(img, 416) / 255.0
    assert dev.shape == host.shape
    pad_rows = (416 - int(317 * 416 / 640)) // 2
    np.testing.assert_allclose(dev[:pad_rows - 1], 128.0 / 255.0, atol=1e-5)

    yy, xx = np.mgrid[0:317, 0:640]
    smooth = np.stack([
        127 + 100 * np.sin(xx / 60.0),
        127 + 100 * np.cos(yy / 45.0),
        (xx + yy) % 256 * 0.5 + 60,
    ], axis=-1).astype(np.uint8)
    dev_s = np.asarray(letterbox_jax(jnp.asarray(smooth), 416, method="cubic"))
    host_s = letterbox_host(smooth, 416) / 255.0
    assert np.mean(np.abs(dev_s - host_s)) < 0.01


def test_prep_image_u8_matches_float_path():
    from realtimeobjectdetection_tpu.ops.letterbox import prep_image_host_u8
    img = synth_image()
    f32 = prep_image_host(img, 416, mode="BGR")
    u8 = prep_image_host_u8(img, 416, mode="BGR")
    assert u8.dtype == np.uint8
    np.testing.assert_array_equal(u8.astype(np.float32) / 255.0, f32)
