"""End-to-end numerical parity vs golden tensors recorded from the
PyTorch reference (scripts/gen_reference_goldens.py).

Goldens were produced with synthetic weights (regenerated bit-identically
here) on the letterboxed dog.jpg input that ships inside the fixture, in
the three BN modes the reference exercises:
  * pred       — detect-path forward (train-mode BN => batch statistics)
  * pred_train — TRAIN=True decode-lite (train.py loss path)
  * pred_eval  — .eval() running-stats forward (tiny only)
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtimeobjectdetection_tpu.model import make_forward, fold_batchnorm
from realtimeobjectdetection_tpu.models import yolov3_spec, yolov3_tiny_spec
from realtimeobjectdetection_tpu.ops.decode import decode_heads
from realtimeobjectdetection_tpu.testing import synthetic_darknet_weights
from realtimeobjectdetection_tpu.weights import load_darknet_weights

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

SPECS = {"yolov3-tiny": yolov3_tiny_spec, "yolov3": yolov3_spec}


def load_case(name):
    d = np.load(os.path.join(GOLDEN, f"{name}_dog.npz"))
    spec = SPECS[name]()
    params, _ = load_darknet_weights(spec, synthetic_darknet_weights(spec, 0))
    x = jnp.asarray(d["input_nchw"].transpose(0, 2, 3, 1))  # NCHW -> NHWC
    return d, spec, params, x


@pytest.mark.parametrize("name", ["yolov3-tiny", "yolov3"])
def test_detect_forward_batch_bn(name):
    d, spec, params, x = load_case(name)
    fwd = jax.jit(make_forward(spec, bn_mode="batch"))
    pred = np.asarray(decode_heads(fwd(params, x), spec, 416))
    ref = d["pred"]
    assert pred.shape == ref.shape
    # coords are in input pixels (scale ~416, exp-amplified); probs in [0,1]
    np.testing.assert_allclose(pred[..., :4], ref[..., :4], atol=0.35)
    np.testing.assert_allclose(pred[..., 4:], ref[..., 4:], atol=2e-4)


@pytest.mark.parametrize("name", ["yolov3-tiny", "yolov3"])
def test_train_mode_decode_lite(name):
    d, spec, params, x = load_case(name)
    fwd = jax.jit(make_forward(spec, bn_mode="batch"))
    pred = np.asarray(decode_heads(fwd(params, x), spec, 416, train=True))
    ref = d["pred_train"]
    np.testing.assert_allclose(pred, ref, atol=2e-3)


def test_eval_forward_running_bn():
    d, spec, params, x = load_case("yolov3-tiny")
    fwd = jax.jit(make_forward(spec, bn_mode="running"))
    pred = np.asarray(decode_heads(fwd(params, x), spec, 416))
    ref = d["pred_eval"]
    np.testing.assert_allclose(pred[..., 4:], ref[..., 4:], atol=2e-4)
    np.testing.assert_allclose(pred[..., :4], ref[..., :4],
                               rtol=1e-3, atol=0.05)


def test_folded_bn_equals_running_bn():
    d, spec, params, x = load_case("yolov3-tiny")
    run = jax.jit(make_forward(spec, bn_mode="running"))(params, x)
    folded_params = fold_batchnorm(spec, params)
    fold = jax.jit(make_forward(spec, bn_mode="fold"))(folded_params, x)
    for a, b in zip(run, fold):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_anchor_detection_order_matches_reference():
    d, spec, params, x = load_case("yolov3-tiny")
    np.testing.assert_array_equal(
        np.array(spec.anchors_in_detection_order, dtype=np.float32),
        d["anchors"])


def test_scan_ladders_numerics_identical():
    """lax.scan-rolled residual ladders == unrolled graph (fold/running)."""
    import jax
    from realtimeobjectdetection_tpu.model import _find_ladders
    from realtimeobjectdetection_tpu.models import yolov3_spec
    spec = yolov3_spec()
    ladders = _find_ladders(spec)
    assert ladders == {6: 2, 13: 8, 38: 8, 63: 4}
    params, _ = __import__(
        "realtimeobjectdetection_tpu.weights", fromlist=["x"]
    ).load_darknet_weights(
        spec, synthetic_darknet_weights(spec, 0))
    x = jnp.asarray(np.random.RandomState(1).rand(1, 160, 160, 3),
                    jnp.float32)
    spec160 = yolov3_spec(width=160, height=160)
    a = jax.jit(make_forward(spec160, bn_mode="running"))(params, x)
    b = jax.jit(make_forward(spec160, bn_mode="running",
                             scan_ladders=True))(params, x)
    for u, v in zip(a, b):
        np.testing.assert_array_equal(np.asarray(u), np.asarray(v))


def test_scan_ladders_batch_stats_identical():
    """Train-mode (batch-BN + return_stats) scan path == unrolled: the
    heads AND every per-node batch statistic must match, including the
    stats that ride out of the lax.scan as stacked ys (model.py ladder
    scan, round-3 compile-robustness change).  Tolerance, not bit-exact:
    the batch mean/var reductions fuse differently inside the scan body
    than in the unrolled graph (observed drift ~1e-4 relative)."""
    import jax
    from realtimeobjectdetection_tpu.models import yolov3_spec
    from realtimeobjectdetection_tpu.weights import load_darknet_weights
    spec = yolov3_spec(width=160, height=160)
    params, _ = load_darknet_weights(
        spec, synthetic_darknet_weights(yolov3_spec(), 0))
    x = jnp.asarray(np.random.RandomState(2).rand(2, 160, 160, 3),
                    jnp.float32)
    ha, sa = jax.jit(make_forward(
        spec, bn_mode="batch", return_stats=True,
        scan_ladders=False))(params, x)
    hb, sb = jax.jit(make_forward(
        spec, bn_mode="batch", return_stats=True,
        scan_ladders=True))(params, x)
    for u, v in zip(ha, hb):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                   rtol=5e-4, atol=5e-4)
    assert set(sa) == set(sb)
    for k in sa:
        np.testing.assert_allclose(np.asarray(sa[k][0]),
                                   np.asarray(sb[k][0]),
                                   rtol=5e-4, atol=5e-4, err_msg=k)
        np.testing.assert_allclose(np.asarray(sa[k][1]),
                                   np.asarray(sb[k][1]),
                                   rtol=5e-4, atol=5e-4, err_msg=k)


def test_non_default_resolution_608():
    """Any multiple-of-32 resolution works (the reference's --reso flag)."""
    import jax
    from realtimeobjectdetection_tpu.models import yolov3_tiny_spec
    from realtimeobjectdetection_tpu.model import head_shapes
    from realtimeobjectdetection_tpu.weights import init_params
    from realtimeobjectdetection_tpu.ops.nms import nms_batch
    spec = yolov3_tiny_spec(width=608, height=608)
    assert head_shapes(spec, 1) == [(1, 19, 19, 255), (1, 38, 38, 255)]
    params = init_params(spec, 0)
    fwd = jax.jit(make_forward(spec, bn_mode="running"))
    x = jnp.zeros((1, 608, 608, 3), jnp.float32)
    pred = decode_heads(fwd(params, x), spec, 608)
    assert pred.shape == (1, (19 * 19 + 38 * 38) * 3, 85)
    boxes, valid = nms_batch(pred, 80, 0.6, 0.5, top_k=64)
    assert boxes.shape == (1, 64, 7)


def test_bf16_fast_path_drift_bounded():
    """The bf16 MXU fast path must stay within a bounded drift of fp32
    on decoded boxes — a regression net for the production config."""
    import jax
    d, spec, params, x = load_case("yolov3-tiny")
    from realtimeobjectdetection_tpu.model import fold_batchnorm
    fp = fold_batchnorm(spec, params)
    f32 = jax.jit(make_forward(spec, bn_mode="fold",
                               compute_dtype=jnp.float32))
    bf16 = jax.jit(make_forward(spec, bn_mode="fold",
                                compute_dtype=jnp.bfloat16,
                                scan_ladders=True))
    a = decode_heads(f32(fp, x), spec, 416)
    b = decode_heads(bf16(fp, x), spec, 416)
    a, b = np.asarray(a), np.asarray(b)
    # probabilities: small absolute drift; coords: bounded pixel drift
    assert np.abs(a[..., 4:] - b[..., 4:]).max() < 0.05
    assert np.median(np.abs(a[..., :2] - b[..., :2])) < 1.0


@pytest.mark.parametrize("name", ["yolov3-tiny", "yolov3"])
def test_forward_and_nms_parity_at_608(name):
    """Second-resolution goldens (the reference's --reso path,
    detect.py:47): forward + decode + NMS row parity at 608, at both the
    sparse and dense confidence operating points."""
    from realtimeobjectdetection_tpu.ops.nms import nms_batch
    d = np.load(os.path.join(GOLDEN, f"{name}_dog_608.npz"))
    spec = SPECS[name](width=608, height=608)
    params, _ = load_darknet_weights(spec, synthetic_darknet_weights(spec, 0))
    x = jnp.asarray(d["input_nchw"].transpose(0, 2, 3, 1))
    fwd = jax.jit(make_forward(spec, bn_mode="batch"))
    pred = np.asarray(decode_heads(fwd(params, x), spec, 608))
    ref = d["pred"]
    assert pred.shape == ref.shape
    np.testing.assert_allclose(pred[..., :4], ref[..., :4], atol=0.6)
    np.testing.assert_allclose(pred[..., 4:], ref[..., 4:], atol=3e-4)

    for conf_key, rows_key in [("nms_confidence", "nms_rows"),
                               ("nms_confidence_dense", "nms_rows_dense")]:
        conf = float(d[conf_key])
        ref_rows = d[rows_key]
        boxes, valid = nms_batch(jnp.asarray(ref), 80, conf, 0.5,
                                 top_k=1024)
        got = np.asarray(boxes[0])[np.asarray(valid[0])]
        assert got.shape[0] == ref_rows.shape[0], conf_key
        np.testing.assert_array_equal(got[:, 6], ref_rows[:, 7])
        np.testing.assert_allclose(got[:, 4], ref_rows[:, 5], atol=1e-5)
        np.testing.assert_allclose(got[:, :4], ref_rows[:, 1:5], atol=1e-2)


def test_s2d_stem_exact_on_tiny():
    """Space-to-depth stem: numerically equivalent to the plain stem conv
    (exact on the tiny net; see model._s2d_stem_weights)."""
    import jax
    from realtimeobjectdetection_tpu.model import fold_batchnorm
    spec = yolov3_tiny_spec(width=160, height=160)
    params, _ = load_darknet_weights(spec, synthetic_darknet_weights(spec, 0))
    folded = fold_batchnorm(spec, params)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 160, 160, 3).astype(np.float32))
    a = jax.jit(make_forward(spec, bn_mode="fold"))(folded, x)
    b = jax.jit(make_forward(spec, bn_mode="fold", s2d_stem=True))(folded, x)
    for ha, hb in zip(a, b):
        np.testing.assert_allclose(np.asarray(hb), np.asarray(ha),
                                   atol=2e-5)


def test_s2d_stem_yolov3_bounded_drift():
    """Full yolov3 with the s2d stem: only fp32 reassociation drift on
    sane-scale (bench) weights."""
    import jax
    from realtimeobjectdetection_tpu.model import fold_batchnorm
    from realtimeobjectdetection_tpu.models import yolov3_spec
    from realtimeobjectdetection_tpu.testing import bench_params
    spec = yolov3_spec(width=160, height=160)
    folded = fold_batchnorm(spec, bench_params(spec, "yolov3"))
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(1, 160, 160, 3).astype(np.float32))
    a = jax.jit(make_forward(spec, bn_mode="fold"))(folded, x)
    b = jax.jit(make_forward(spec, bn_mode="fold", s2d_stem=True))(folded, x)
    for ha, hb in zip(a, b):
        ha, hb = np.asarray(ha), np.asarray(hb)
        rel = np.abs(ha - hb) / (np.abs(ha) + 1e-2)
        assert rel.max() < 5e-3, rel.max()


def test_head_dtype_bf16_matches_fp32_selection():
    """decode_topk on bf16 heads: same candidate selection as decoding
    the same bf16 values in fp32 (the head cast is the only change)."""
    import jax
    from realtimeobjectdetection_tpu.model import fold_batchnorm
    from realtimeobjectdetection_tpu.ops.decode import decode_topk
    spec = yolov3_tiny_spec(width=160, height=160)
    params, _ = load_darknet_weights(spec, synthetic_darknet_weights(spec, 0))
    folded = fold_batchnorm(spec, params)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 160, 160, 3).astype(np.float32))
    heads_bf = jax.jit(make_forward(spec, bn_mode="fold",
                                    head_dtype=jnp.bfloat16))(folded, x)
    heads_up = [h.astype(jnp.float32) for h in heads_bf]
    pa, na = decode_topk(heads_bf, spec, 160, 64, 0.5)
    pb, nb = decode_topk(heads_up, spec, 160, 64, 0.5)
    np.testing.assert_array_equal(np.asarray(na), np.asarray(nb))
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                               rtol=1e-5, atol=1e-5)


def test_decode_topk_per_head_matches_global():
    """Both fused decode variants select the same rows (see
    ops/decode.decode_topk_per_head for the on-chip A/B record)."""
    import jax
    from realtimeobjectdetection_tpu.model import fold_batchnorm
    from realtimeobjectdetection_tpu.ops.decode import (decode_topk,
                                                        decode_topk_per_head)
    spec = yolov3_tiny_spec(width=160, height=160)
    params, _ = load_darknet_weights(spec, synthetic_darknet_weights(spec, 0))
    folded = fold_batchnorm(spec, params)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 160, 160, 3).astype(np.float32))
    heads = jax.jit(make_forward(spec, bn_mode="fold"))(folded, x)
    pa, na = decode_topk(heads, spec, 160, 64, 0.5)
    pb, nb = decode_topk_per_head(heads, spec, 160, 64, 0.5)
    np.testing.assert_array_equal(np.asarray(na), np.asarray(nb))
    np.testing.assert_allclose(np.asarray(pb), np.asarray(pa),
                               rtol=1e-5, atol=1e-5)


def test_decode_topk_approx_recall_gate():
    """decode_topk(approx=True): the approx_max_k candidate set must
    retain >= 0.95 of the exact top-k rows that pass the confidence
    gate, and the returned rows must stay objectness-descending (the
    greedy-NMS order contract).  Mirrors the v5-side gate on
    decode_v5_topk(approx=True)."""
    import jax
    from realtimeobjectdetection_tpu.model import fold_batchnorm
    from realtimeobjectdetection_tpu.ops.decode import decode_topk
    spec = yolov3_tiny_spec(width=160, height=160)
    params, _ = load_darknet_weights(spec, synthetic_darknet_weights(spec, 0))
    folded = fold_batchnorm(spec, params)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(2, 160, 160, 3).astype(np.float32))
    heads = jax.jit(make_forward(spec, bn_mode="fold"))(folded, x)
    conf = 0.3
    k = 64
    pe, ne = decode_topk(heads, spec, 160, k, conf)
    pa, na = decode_topk(heads, spec, 160, k, conf, approx=True)
    np.testing.assert_array_equal(np.asarray(ne), np.asarray(na))
    pe, pa = np.asarray(pe), np.asarray(pa)
    for b in range(pe.shape[0]):
        obj = pa[b, :, 4]
        assert (np.diff(obj) <= 1e-7).all()  # descending objectness
        want = {tuple(np.round(r[:5], 4)) for r in pe[b] if r[4] > conf}
        got = {tuple(np.round(r[:5], 4)) for r in pa[b] if r[4] > conf}
        if want:
            assert len(want & got) / len(want) >= 0.95
