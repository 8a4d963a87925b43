"""Int8 quantization: exactness of the quantizer, bounded decoded-box
drift of the w8/w8a8 inference paths vs fp32 folded inference, and the
detector integration (VERDICT r1 task 10 / ROADMAP 6)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtimeobjectdetection_tpu.model import fold_batchnorm, make_forward
from realtimeobjectdetection_tpu.models import get_spec
from realtimeobjectdetection_tpu.ops.decode import decode_heads
from realtimeobjectdetection_tpu.ops.quantize import quantize_folded_int8
from realtimeobjectdetection_tpu.testing import synthetic_darknet_weights
from realtimeobjectdetection_tpu.weights import load_darknet_weights

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def tiny_case():
    spec = get_spec("yolov3-tiny")
    params, _ = load_darknet_weights(spec, synthetic_darknet_weights(spec, 0))
    folded = fold_batchnorm(spec, params)
    d = np.load(os.path.join(GOLDEN, "yolov3-tiny_dog.npz"))
    x = jnp.asarray(d["input_nchw"].transpose(0, 2, 3, 1))
    return spec, folded, x


def test_quantizer_per_channel_round_trip(tiny_case):
    spec, folded, _ = tiny_case
    q = quantize_folded_int8(spec, folded)
    for node in spec.conv_nodes:
        key = f"node_{node.index}"
        w = np.asarray(folded[key]["w"])
        wq = np.asarray(q[key]["w_q"])
        s = np.asarray(q[key]["scale"])
        assert wq.dtype == np.int8
        # per-output-channel scale: dequantized error <= half a step
        deq = wq.astype(np.float32) * s[None, None, None, :]
        np.testing.assert_allclose(deq, w, atol=float(s.max()) / 2 + 1e-9)
        # scale actually spans the channel's max weight
        amax = np.abs(w).max(axis=(0, 1, 2))
        np.testing.assert_allclose(s * 127.0, np.maximum(amax, 1e-12),
                                   rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(q[key]["b"]),
                                      np.asarray(folded[key]["b"]))


def _decoded(spec, params, x, **fw):
    fwd = jax.jit(make_forward(spec, bn_mode="fold", **fw))
    return np.asarray(decode_heads(fwd(params, x), spec, 416))


def test_w8_drift_bounded(tiny_case):
    """Weight-only int8: decoded boxes stay close to the fp32 folded
    path on the golden input — the accuracy gate for the 4x-smaller
    weight format."""
    spec, folded, x = tiny_case
    ref = _decoded(spec, folded, x)
    q = quantize_folded_int8(spec, folded)
    got = _decoded(spec, q, x, quantize="w8")
    # post-sigmoid probabilities drift a rounding-step's worth
    assert np.abs(got[..., 4:] - ref[..., 4:]).max() < 0.05
    assert np.abs(got[..., :2] - ref[..., :2]).max() < 1.5
    # wh is exp-amplified, so gate only boxes that can pass the default
    # operating point (sub-threshold garbage boxes blow up harmlessly)
    cand = ref[..., 4] > 0.6
    rel_wh = np.abs(got[..., 2:4] / np.maximum(ref[..., 2:4], 1e-3) - 1)
    assert rel_wh[cand].max() < 0.08
    # survivor agreement at the default operating point
    assert ((got[..., 4] > 0.6) == (ref[..., 4] > 0.6)).mean() > 0.995


def test_w8a8_drift_bounded(tiny_case):
    """Full int8 (dynamic activation quant, int32 accumulate): looser but
    still bounded drift."""
    spec, folded, x = tiny_case
    ref = _decoded(spec, folded, x)
    q = quantize_folded_int8(spec, folded)
    got = _decoded(spec, q, x, quantize="w8a8")
    assert np.isfinite(got).all()
    assert np.abs(got[..., 4:] - ref[..., 4:]).max() < 0.10
    cand = ref[..., 4] > 0.6
    rel_wh = np.abs(got[..., 2:4] / np.maximum(ref[..., 2:4], 1e-3) - 1)
    assert rel_wh[cand].max() < 0.20
    assert ((got[..., 4] > 0.6) == (ref[..., 4] > 0.6)).mean() > 0.99


def test_detector_quantized_end_to_end(tmp_path):
    from conftest import REFERENCE_DIR, reference_available
    if not reference_available():
        pytest.skip("reference images not mounted")
    from realtimeobjectdetection_tpu.pipeline.detector import DetectorV3
    blob = synthetic_darknet_weights(get_spec("yolov3-tiny"), 0)
    wpath = tmp_path / "t.weights"
    wpath.write_bytes(blob)
    det = DetectorV3(images=os.path.join(REFERENCE_DIR, "imgs", "dog.jpg"),
                     destination=str(tmp_path / "d"),
                     cfg_path="yolov3-tiny", weights_path=str(wpath),
                     bn_mode="fold", quantize="w8", confidence=0.6)
    metrics = det(verbose=False)
    assert "dog.jpg" in metrics
    with pytest.raises(ValueError):
        DetectorV3(images=".", destination=".", cfg_path="yolov3-tiny",
                   weights_path=None, bn_mode="batch", quantize="w8")


def test_w8a8_pallas_drift_bounded(tiny_case):
    """Pallas int8-MXU path (model_int8.py, interpret mode on CPU):
    per-block dynamic activation scales are finer-grained than w8a8's
    per-tensor scale, so the same drift gates must hold."""
    from realtimeobjectdetection_tpu.model_int8 import make_forward_int8
    spec, folded, x = tiny_case
    ref = _decoded(spec, folded, x)
    q = quantize_folded_int8(spec, folded)
    fwd = make_forward_int8(spec, compute_dtype=jnp.float32,
                            interpret=True)
    got = np.asarray(decode_heads(fwd(q, x), spec, 416))
    assert np.isfinite(got).all()
    assert np.abs(got[..., 4:] - ref[..., 4:]).max() < 0.10
    cand = ref[..., 4] > 0.6
    rel_wh = np.abs(got[..., 2:4] / np.maximum(ref[..., 2:4], 1e-3) - 1)
    assert rel_wh[cand].max() < 0.20
    assert ((got[..., 4] > 0.6) == (ref[..., 4] > 0.6)).mean() > 0.99


def test_w8a8_pallas_full_yolov3_ladders(tiny_case):
    """Full yolov3 through the int8 builder: ladder scans + fused skips
    + NHWC fallbacks all compose.  Synthetic darknet-53 weights drive
    raw head logits to ~1e5 (a pathological dynamic range no trained
    net has), so this gates *composition* — a wiring bug gives O(1)
    relative garbage, quantization gives a few percent — while the
    tiny-net test above holds the tight accuracy gates."""
    spec = get_spec("yolov3")
    params, _ = load_darknet_weights(spec, synthetic_darknet_weights(spec, 1))
    folded = fold_batchnorm(spec, params)
    q = quantize_folded_int8(spec, folded)
    from realtimeobjectdetection_tpu.model_int8 import make_forward_int8
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 416, 416, 3).astype(np.float32))
    h_ref = make_forward(spec, bn_mode="fold",
                         compute_dtype=jnp.float32)(folded, x)
    fwd = make_forward_int8(spec, compute_dtype=jnp.float32,
                            interpret=True)
    h_q = fwd(q, x)
    for a, b in zip(h_ref, h_q):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(b).all()
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
        assert rel < 0.15, rel
    ref = np.asarray(decode_heads(h_ref, spec, 416))
    got = np.asarray(decode_heads(h_q, spec, 416))
    assert ((got[..., 4] > 0.6) == (ref[..., 4] > 0.6)).mean() > 0.9
