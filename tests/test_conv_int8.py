"""Pallas int8 conv kernel (ops/pallas/conv_int8.py): layout round trip,
interpret-mode kernel vs the bit-matched emulation, and quantization
drift vs the true f32 conv.  All on CPU (conftest forces 8 virtual CPU
devices); the on-TPU throughput story lives in PERFORMANCE.md."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax import lax

from realtimeobjectdetection_tpu.ops.pallas.conv_int8 import (
    FlatLayout, conv_flat_int8, conv_flat_int8_reference, from_flat,
    make_layout, pack_conv_int8, to_flat)


def _quant(w):
    amax = np.abs(w).max(axis=(0, 1, 2))
    s = np.maximum(amax, 1e-12) / 127.0
    q = np.clip(np.round(w / s), -127, 127).astype(np.int8)
    return jnp.asarray(q), jnp.asarray(s.astype(np.float32))


def test_layout_round_trip():
    lay = make_layout(3, 26, 26, tm=512)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, 26, 26, 64).astype(np.float32))
    flat = to_flat(x, lay)
    assert flat.shape == (lay.rows, 64)
    assert lay.rows % lay.tm == 0 and lay.tm % lay.gr == 0
    assert lay.gr >= lay.g
    # guard blocks: content strictly inside [tm, rows - tm)
    assert lay.tm + lay.p <= lay.rows - lay.tm + lay.tm  # fits
    np.testing.assert_array_equal(np.asarray(from_flat(flat, lay)),
                                  np.asarray(x))
    # non-content rows are zero
    content = np.zeros(lay.rows, bool)
    content[lay.tm:lay.tm + lay.p] = True
    assert not np.asarray(flat)[~content].any()


@pytest.mark.parametrize("k,skip", [(3, False), (1, False), (3, True)])
def test_kernel_matches_emulation(k, skip):
    rng = np.random.RandomState(1)
    B, H, W, Cin, Cout = 2, 13, 13, 32, 64
    lay = make_layout(B, H, W, tm=256)
    x = jnp.asarray(rng.randn(B, H, W, Cin).astype(np.float32))
    w = rng.randn(k, k, Cin, Cout).astype(np.float32) * 0.1
    b = jnp.asarray(rng.randn(Cout).astype(np.float32) * 0.1)
    wq, sw = _quant(w)
    xf = to_flat(x, lay)
    sk = None
    if skip:
        sk = to_flat(jnp.asarray(
            rng.randn(B, H, W, Cout).astype(np.float32)), lay)
    y_k = conv_flat_int8(xf, pack_conv_int8(wq), sw, b, lay, k=k,
                         skip=sk, out_dtype=jnp.float32, interpret=True)
    y_r = conv_flat_int8_reference(xf, pack_conv_int8(wq), sw, b, lay,
                                   k=k, skip=sk, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_r),
                               rtol=0, atol=2e-5)


@pytest.mark.parametrize("k", [3, 1])
def test_kernel_drift_vs_f32_conv(k):
    """w8a8 with per-block dynamic activation scales: decoded conv must
    stay within ~2% relative of the true f32 conv."""
    rng = np.random.RandomState(2)
    B, H, W, Cin, Cout = 2, 26, 26, 64, 64
    lay = make_layout(B, H, W, tm=1024)
    x = jnp.asarray(rng.randn(B, H, W, Cin).astype(np.float32))
    w = rng.randn(k, k, Cin, Cout).astype(np.float32) * 0.1
    b = jnp.asarray(rng.randn(Cout).astype(np.float32) * 0.1)
    wq, sw = _quant(w)
    y_k = conv_flat_int8(to_flat(x, lay), pack_conv_int8(wq), sw, b,
                         lay, k=k, out_dtype=jnp.float32, interpret=True)
    pad = (k - 1) // 2
    y_t = lax.conv_general_dilated(
        x, jnp.asarray(w), (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    y_t = jnp.where(y_t > 0, y_t, 0.1 * y_t)
    d = np.abs(np.asarray(from_flat(y_k, lay)) - np.asarray(y_t))
    rel = d.max() / np.abs(np.asarray(y_t)).max()
    assert rel < 0.02, rel


def test_chained_convs_no_repad():
    """Two chained kernel convs (the ladder pattern) against two f32
    convs: the masked epilogue's zeroed rows must serve as the second
    conv's padding — no re-pad between layers."""
    rng = np.random.RandomState(3)
    B, H, W, C = 2, 13, 13, 32
    lay = make_layout(B, H, W, tm=256)
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    w1 = rng.randn(1, 1, C, C // 2).astype(np.float32) * 0.2
    w3 = rng.randn(3, 3, C // 2, C).astype(np.float32) * 0.2
    b1 = jnp.asarray(rng.randn(C // 2).astype(np.float32) * 0.1)
    b3 = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
    q1, s1 = _quant(w1)
    q3, s3 = _quant(w3)
    xf = to_flat(x, lay)
    y1 = conv_flat_int8(xf, pack_conv_int8(q1), s1, b1, lay, k=1,
                        out_dtype=jnp.float32, interpret=True)
    y2 = conv_flat_int8(y1, pack_conv_int8(q3), s3, b3, lay, k=3,
                        skip=xf, out_dtype=jnp.float32, interpret=True)

    def leaky(v):
        return jnp.where(v > 0, v, 0.1 * v)

    t1 = leaky(lax.conv_general_dilated(
        x, jnp.asarray(w1), (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b1)
    t2 = leaky(lax.conv_general_dilated(
        t1, jnp.asarray(w3), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b3) + x
    d = np.abs(np.asarray(from_flat(y2, lay)) - np.asarray(t2))
    rel = d.max() / np.abs(np.asarray(t2)).max()
    assert rel < 0.04, rel
    # guard + padding rows stay exactly zero after chaining
    content = np.zeros(lay.rows, bool)
    content[lay.tm:lay.tm + lay.p] = True
    assert not np.asarray(y2)[~content].any()


def test_linear_activation_mode():
    rng = np.random.RandomState(4)
    B, H, W, Cin, Cout = 1, 13, 13, 32, 32
    lay = make_layout(B, H, W, tm=256)
    x = jnp.asarray(rng.randn(B, H, W, Cin).astype(np.float32))
    w = rng.randn(1, 1, Cin, Cout).astype(np.float32) * 0.2
    b = jnp.asarray(rng.randn(Cout).astype(np.float32))
    wq, sw = _quant(w)
    y = conv_flat_int8(to_flat(x, lay), pack_conv_int8(wq), sw, b, lay,
                       k=1, act="linear", out_dtype=jnp.float32,
                       interpret=True)
    y_t = lax.conv_general_dilated(
        x, jnp.asarray(w), (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    d = np.abs(np.asarray(from_flat(y, lay)) - np.asarray(y_t))
    assert d.max() / np.abs(np.asarray(y_t)).max() < 0.02
