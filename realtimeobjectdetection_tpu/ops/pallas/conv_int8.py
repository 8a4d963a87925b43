"""Pallas TPU int8 convolution — the int8-MXU path XLA leaves on the table.

Motivation (measured on the v5e chip, see PERFORMANCE.md "int8 MXU
microbenchmarks"): the MXU runs int8 matmuls at ~224 TOP/s vs ~144
TFLOP/s for bf16 (1.56x), but XLA's int8 *convolution* lowering reaches
neither (w8a8 via ``lax.conv`` measured 1099 fps vs 1901 bf16 e2e).
This kernel expresses stride-1 convs as tap-matmuls so the int8 MXU
rate is actually reachable:

    conv3x3(x, w)[p] = sum_t  x[p + o_t] @ w[t]      (9 taps)

over a **flat padded row layout**: NHWC activations are zero-padded to
[B, H+2, W+2, C] and flattened to rows of C channels, so a spatial tap
(dy, dx) is a constant row offset ``o_t = dy*(W+2) + dx`` and each tap
is a dense [TM, C_in] @ [C_in, C_out] MXU matmul.  Consecutive stride-1
convs chain in this layout with zero re-padding: the kernel writes
zeros to all non-content rows (the masked epilogue), which *are* the
next conv's zero padding.

Quantization is w8a8: weights per-output-channel int8 (the existing
``ops.quantize.quantize_folded_int8`` grid), activations quantized
**dynamically per row-block** inside the kernel (abs-max over the
block + halo), so there is no calibration pass and no stored scale —
HBM activations stay bf16, the MXU sees int8, and the f32 epilogue
applies ``s_x_block * s_w[c]``, bias, leaky-ReLU, the optional residual
add, and the content mask in one fused pass.

Layout contract (see :class:`FlatLayout`):
  rows 0..R-1 with R = nb*tm; content pixels at rows
  [tm, tm + B*(H+2)*(W+2)); one full guard block above and below keeps
  every tap read of a content row inside clamped halo blocks.

Reference semantics matched: cross-correlation taps, pad=1 zero
padding, LeakyReLU(0.1) (src/darknet.py:467-501), conv-then-BN folded
ahead of time (weights.fold_batchnorm).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["FlatLayout", "make_layout", "to_flat", "from_flat",
           "pack_conv_int8", "conv_flat_int8", "conv_flat_int8_reference"]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@dataclasses.dataclass(frozen=True)
class FlatLayout:
    """Flat padded row layout for one (batch, resolution) segment."""
    b: int        # batch
    h: int        # content height
    w: int        # content width
    tm: int       # row-block height (grid step)
    gr: int       # halo block height (>= g, divides tm)

    @property
    def wp(self) -> int:          # padded width
        return self.w + 2

    @property
    def hp(self) -> int:          # padded height
        return self.h + 2

    @property
    def g(self) -> int:           # max |tap row offset| = wp + 1
        return self.wp + 1

    @property
    def p(self) -> int:           # content rows (all padded pixels)
        return self.b * self.hp * self.wp

    @property
    def nb(self) -> int:          # grid blocks (1 guard block each side)
        return -(-self.p // self.tm) + 2

    @property
    def rows(self) -> int:
        return self.nb * self.tm


def make_layout(b: int, h: int, w: int, tm: int = 1024) -> FlatLayout:
    """Pick a layout: gr = g rounded up to 128 lanes-of-rows, tm a
    multiple of gr (so halo blocks tile the row axis)."""
    g = (w + 2) + 1
    gr = _round_up(g, 128)
    tm = max(_round_up(tm, gr), gr)
    return FlatLayout(b=b, h=h, w=w, tm=tm, gr=gr)


def to_flat(x: jnp.ndarray, lay: FlatLayout) -> jnp.ndarray:
    """[B, H, W, C] -> [R, C] flat padded rows (zeros elsewhere)."""
    b, h, w, c = x.shape
    assert (b, h, w) == (lay.b, lay.h, lay.w), (x.shape, lay)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    flat = xp.reshape(lay.p, c)
    return jnp.pad(flat, ((lay.tm, lay.rows - lay.tm - lay.p), (0, 0)))


def from_flat(y: jnp.ndarray, lay: FlatLayout) -> jnp.ndarray:
    """[R, C] -> [B, H, W, C] (content crop)."""
    c = y.shape[-1]
    flat = lax.slice(y, (lay.tm, 0), (lay.tm + lay.p, c))
    xp = flat.reshape(lay.b, lay.hp, lay.wp, c)
    return xp[:, 1:1 + lay.h, 1:1 + lay.w, :]


def pack_conv_int8(w_q: jnp.ndarray) -> jnp.ndarray:
    """HWIO int8 kernel -> [k*k*C_in, C_out] tap-major stack, tap order
    t = (dy+1)*k + (dx+1) matching the kernel's o_t loop."""
    kh, kw, cin, cout = w_q.shape
    return w_q.reshape(kh * kw * cin, cout)


# ---------------------------------------------------------------------------
# kernels


def _mask_for_block(i, lay: FlatLayout):
    """[TM, 1] f32 content mask for row-block i."""
    r = i * lay.tm + lax.broadcasted_iota(jnp.int32, (lay.tm, 1), 0)
    q = r - lay.tm
    wi = q % lay.wp
    hi = (q // lay.wp) % lay.hp
    valid = ((q >= 0) & (q < lay.p)
             & (wi >= 1) & (wi <= lay.w)
             & (hi >= 1) & (hi <= lay.h))
    return valid


def _epilogue(acc_i32, amax, sw_ref, b_ref, skip_ref, lay, neg_slope,
              out_dtype, y_ref):
    i = pl.program_id(0)
    y = acc_i32.astype(jnp.float32) * (amax * (1.0 / 127.0)) * sw_ref[0:1, :]
    y = y + b_ref[0:1, :]
    if neg_slope is not None:
        y = jnp.where(y > 0, y, neg_slope * y)
    if skip_ref is not None:
        y = y + skip_ref[:].astype(jnp.float32)
    y = jnp.where(_mask_for_block(i, lay), y, 0.0)
    y_ref[:] = y.astype(out_dtype)


def _quantize(xin):
    xf = xin.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-6)
    xq = jnp.clip(jnp.round(xf * (127.0 / amax)), -127, 127)
    return xq.astype(jnp.int8), amax


def _kernel3(*refs, lay: FlatLayout, cin: int, neg_slope, out_dtype,
             has_skip: bool, im2col: bool):
    if has_skip:
        top, cur, bot, w_ref, sw_ref, b_ref, skip_ref, y_ref = refs
    else:
        top, cur, bot, w_ref, sw_ref, b_ref, y_ref = refs
        skip_ref = None
    xin = jnp.concatenate([top[:], cur[:], bot[:]], axis=0)
    xq, amax = _quantize(xin)
    taps = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    if im2col:
        # one deep-K matmul via a VMEM im2col concat.  Measured on the
        # v5e axon stack (2026-08-16): Mosaic FAILS to compile this
        # variant at every yolov3 ladder shape (remote tpu_compile_helper
        # exit 1 on the lane-axis concat + K=9*C_in dot), so the 9-dot
        # accumulation below is the default; kept for newer toolchains.
        cols = [lax.slice(xq, (lay.gr + dy * lay.wp + dx, 0),
                          (lay.gr + dy * lay.wp + dx + lay.tm, cin))
                for dy, dx in taps]
        acc = jnp.dot(jnp.concatenate(cols, axis=1), w_ref[:],
                      preferred_element_type=jnp.int32)
    else:
        acc = jnp.zeros((lay.tm, w_ref.shape[1]), jnp.int32)
        for t, (dy, dx) in enumerate(taps):
            start = lay.gr + dy * lay.wp + dx
            a = lax.slice(xq, (start, 0), (start + lay.tm, cin))
            acc = acc + jnp.dot(a, w_ref[t * cin:(t + 1) * cin, :],
                                preferred_element_type=jnp.int32)
    _epilogue(acc, amax, sw_ref, b_ref, skip_ref, lay, neg_slope,
              out_dtype, y_ref)


def _kernel1(*refs, lay: FlatLayout, cin: int, neg_slope, out_dtype,
             has_skip: bool):
    if has_skip:
        cur, w_ref, sw_ref, b_ref, skip_ref, y_ref = refs
    else:
        cur, w_ref, sw_ref, b_ref, y_ref = refs
        skip_ref = None
    xq, amax = _quantize(cur[:])
    acc = jnp.dot(xq, w_ref[:], preferred_element_type=jnp.int32)
    _epilogue(acc, amax, sw_ref, b_ref, skip_ref, lay, neg_slope,
              out_dtype, y_ref)


def conv_flat_int8(x_flat: jnp.ndarray, w_q: jnp.ndarray,
                   s_w: jnp.ndarray, bias: jnp.ndarray, lay: FlatLayout,
                   k: int = 3, act: str = "leaky",
                   skip: Optional[jnp.ndarray] = None,
                   out_dtype=jnp.bfloat16, im2col: bool = False,
                   interpret: bool = False) -> jnp.ndarray:
    """One w8a8 conv over the flat layout.

    Args:
      x_flat: [R, C_in] activations (bf16/f32), flat padded layout.
      w_q:    [k*k*C_in, C_out] int8 (``pack_conv_int8``).
      s_w:    [C_out] f32 per-channel weight scales.
      bias:   [C_out] f32 folded bias.
      k:      1 or 3 (stride 1 only; pad = (k-1)//2).
      act:    "leaky" (slope 0.1) or "linear".
      skip:   optional [R, C_out] residual (added post-activation, the
              darknet shortcut semantics: src/darknet.py:557-560).
    Returns:
      [R, C_out] out_dtype, non-content rows zeroed.
    """
    assert k in (1, 3)
    cin = x_flat.shape[1]
    cout = w_q.shape[1]
    assert w_q.shape[0] == k * k * cin
    neg_slope = 0.1 if act == "leaky" else None
    sw2 = s_w.reshape(1, cout).astype(jnp.float32)
    b2 = bias.reshape(1, cout).astype(jnp.float32)
    tmb = lay.tm // lay.gr  # tm in units of gr blocks
    nbot = lay.rows // lay.gr - 1

    common = [
        pl.BlockSpec((k * k * cin, cout), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cout), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cout), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [w_q, sw2, b2]
    if k == 3:
        in_specs = [
            pl.BlockSpec((lay.gr, cin),
                         lambda i: (jnp.maximum(i * tmb - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lay.tm, cin), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lay.gr, cin),
                         lambda i: (jnp.minimum((i + 1) * tmb, nbot), 0),
                         memory_space=pltpu.VMEM),
        ] + common
        args = [x_flat, x_flat, x_flat] + args
        kern = _kernel3
    else:
        in_specs = [
            pl.BlockSpec((lay.tm, cin), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + common
        args = [x_flat] + args
        kern = _kernel1
    if skip is not None:
        in_specs.append(pl.BlockSpec((lay.tm, cout), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(skip)

    kw = dict(lay=lay, cin=cin, neg_slope=neg_slope,
              out_dtype=out_dtype, has_skip=skip is not None)
    if k == 3:
        kw["im2col"] = im2col
    kernel = functools.partial(kern, **kw)
    flops = 2 * lay.rows * k * k * cin * cout
    return pl.pallas_call(
        kernel,
        grid=(lay.nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((lay.tm, cout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((lay.rows, cout), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x_flat.size * 2 + w_q.size
            + lay.rows * cout * 2,
            transcendentals=0),
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# pure-JAX emulation (exact, same per-block scales) for unit tests


def conv_flat_int8_reference(x_flat, w_q, s_w, bias, lay: FlatLayout,
                             k: int = 3, act: str = "leaky",
                             skip=None, out_dtype=jnp.bfloat16):
    """Bit-matched emulation of :func:`conv_flat_int8` (same blocking,
    same per-block activation scales) in plain jax.numpy."""
    cin = x_flat.shape[1]
    cout = w_q.shape[1]
    neg_slope = 0.1 if act == "leaky" else None
    out = []
    for i in range(lay.nb):
        if k == 3:
            tmb = lay.tm // lay.gr
            nbot = lay.rows // lay.gr - 1
            ti = max(i * tmb - 1, 0)
            bi = min((i + 1) * tmb, nbot)
            top = x_flat[ti * lay.gr:(ti + 1) * lay.gr]
            cur = x_flat[i * lay.tm:(i + 1) * lay.tm]
            bot = x_flat[bi * lay.gr:(bi + 1) * lay.gr]
            xin = jnp.concatenate([top, cur, bot], axis=0)
        else:
            xin = x_flat[i * lay.tm:(i + 1) * lay.tm]
        xq, amax = _quantize(xin)
        if k == 3:
            acc = jnp.zeros((lay.tm, cout), jnp.int32)
            t = 0
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    start = lay.gr + dy * lay.wp + dx
                    a = xq[start:start + lay.tm].astype(jnp.int32)
                    acc = acc + a @ w_q[t * cin:(t + 1) * cin].astype(
                        jnp.int32)
                    t += 1
        else:
            acc = xq.astype(jnp.int32) @ w_q.astype(jnp.int32)
        y = acc.astype(jnp.float32) * (amax / 127.0) * s_w[None, :]
        y = y + bias[None, :]
        if neg_slope is not None:
            y = jnp.where(y > 0, y, neg_slope * y)
        if skip is not None:
            y = y + skip[i * lay.tm:(i + 1) * lay.tm].astype(jnp.float32)
        r = i * lay.tm + jnp.arange(lay.tm)[:, None]
        q = r - lay.tm
        wi = q % lay.wp
        hi = (q // lay.wp) % lay.hp
        valid = ((q >= 0) & (q < lay.p) & (wi >= 1) & (wi <= lay.w)
                 & (hi >= 1) & (hi <= lay.h))
        out.append(jnp.where(valid, y, 0.0).astype(out_dtype))
    return jnp.concatenate(out, axis=0)
