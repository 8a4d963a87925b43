"""GraphSpec -> int8-MXU inference program (Pallas conv path).

A sibling of :func:`model.make_forward` for the ``w8a8_pallas``
inference mode: every *eligible* conv (stride 1, kernel 1x1/3x3,
min(C_in, C_out) >= ``min_channels``) runs through the Pallas int8
tap-matmul kernel (:mod:`.ops.pallas.conv_int8`) over the flat padded
row layout; everything else (stem, stride-2 downsamples, maxpool,
upsample, route) stays NHWC bf16 XLA.  Consecutive eligible convs chain
in flat layout with zero re-padding — the masked epilogue's zero rows
ARE the next conv's padding — so a whole residual ladder (and the
detection-head conv towers) never leaves the layout.

Residual ladders (model._find_ladders) are additionally rolled into
``lax.scan`` over stacked int8 params with the skip-add fused into the
3x3 kernel's epilogue, mirroring the bf16 path's HLO-size trick.

Params: the ``ops.quantize.quantize_folded_int8`` dict
({"w_q" HWIO int8, "scale" [O] f32, "b" [O] f32} per conv) — shared
with the XLA w8/w8a8 modes, no new checkpoint format.

Why this exists (measured, PERFORMANCE.md "int8 MXU"): the v5e MXU
runs int8 at ~224 TOP/s vs ~144 TFLOP/s bf16, but XLA's int8 *conv*
lowering reaches neither; tap-matmuls do.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
from jax import lax

from .cfg_parser import (ConvSpec, GraphSpec, MaxPoolSpec, RouteSpec,
                         ShortcutSpec, UpsampleSpec, YoloSpec)
from .model import _find_ladders, _maxpool, _upsample_bilinear
from .ops.pallas.conv_int8 import (FlatLayout, conv_flat_int8, from_flat,
                                   make_layout, to_flat)

__all__ = ["make_forward_int8"]

_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom under the 16MB VMEM


def _vmem_estimate(tm: int, gr: int, cin: int, cout: int, k: int) -> int:
    halo = tm + 2 * gr if k == 3 else tm
    return (halo * cin * 3            # bf16 input + int8 quantized copy
            + k * k * cin * cout      # int8 weights
            + tm * cout * 4           # int32/f32 accumulator
            + tm * cout * 2)          # bf16 output block


def _pick_tm(gr: int, pairs: List[Tuple[int, int, int]]) -> int:
    """Largest tm (multiple of gr, <=1024) fitting every (cin, cout, k)
    conv at this resolution under the VMEM budget."""
    for tm in (1024, 768, 512, 384, 256, 128):
        if tm % gr or tm < gr:
            continue
        if all(_vmem_estimate(tm, gr, ci, co, k) < _VMEM_BUDGET
               for ci, co, k in pairs):
            return tm
    return gr


def make_forward_int8(spec: GraphSpec, compute_dtype=jnp.bfloat16,
                      head_dtype=None, min_channels: int = 64,
                      scan_ladders: bool = True,
                      interpret: bool = False):
    """Build ``forward(params_q, x) -> [head0, ...]`` (raw NHWC heads).

    ``compute_dtype`` is the NHWC fallback conv dtype *and* the flat
    activation dtype; ``head_dtype`` defaults to fp32 (decode parity).
    """
    head_dtype = head_dtype or jnp.float32
    live = spec.live_after()
    nodes = spec.nodes

    def eligible(n) -> bool:
        return (isinstance(n, ConvSpec) and n.stride == 1
                and n.kernel_size in (1, 3)
                and min(n.in_channels, n.out_channels) >= min_channels)

    ladders = {
        start: reps for start, reps in
        (_find_ladders(spec) if scan_ladders else {}).items()
        if eligible(nodes[start]) and eligible(nodes[start + 1])
    }

    # per-resolution tm: walk static shapes once (mirrors head_shapes)
    def resolution_of() -> Dict[int, Tuple[int, int]]:
        h, w = spec.net.height, spec.net.width
        out, sizes = {}, []
        cur = (h, w)
        for n in nodes:
            if isinstance(n, ConvSpec):
                cur = ((cur[0] + 2 * n.pad - n.kernel_size) // n.stride + 1,
                       (cur[1] + 2 * n.pad - n.kernel_size) // n.stride + 1)
            elif isinstance(n, MaxPoolSpec):
                if n.stride != 1:
                    cur = ((cur[0] - n.kernel_size) // n.stride + 1,
                           (cur[1] - n.kernel_size) // n.stride + 1)
                elif n.kernel_size != 2:
                    p = n.kernel_size - 1
                    cur = ((cur[0] + p - n.kernel_size) // p + 1,
                           (cur[1] + p - n.kernel_size) // p + 1)
            elif isinstance(n, UpsampleSpec):
                cur = (cur[0] * n.stride, cur[1] * n.stride)
            elif isinstance(n, RouteSpec):
                cur = sizes[n.sources[0]]
            out[n.index] = cur
            sizes.append(cur)
        return out

    res_of = resolution_of()
    conv_pairs: Dict[Tuple[int, int], List[Tuple[int, int, int]]] = {}
    for n in nodes:
        if eligible(n):
            # input resolution == output resolution for stride-1 convs
            conv_pairs.setdefault(res_of[n.index], []).append(
                (n.in_channels, n.out_channels, n.kernel_size))

    def layout_for(b: int, hw: Tuple[int, int]) -> FlatLayout:
        h, w = hw
        gr = make_layout(b, h, w, tm=128).gr
        tm = _pick_tm(gr, conv_pairs.get(hw, [(64, 64, 3)]))
        return make_layout(b, h, w, tm=tm)

    def packed(params, i: int, n: ConvSpec):
        e = params[f"node_{i}"]
        k = n.kernel_size
        w_p = jnp.asarray(e["w_q"]).reshape(k * k * n.in_channels,
                                            n.out_channels)
        return w_p, jnp.asarray(e["scale"]), jnp.asarray(e["b"])

    def _ladder_scan_flat(params, xflat, lay, start: int, reps: int):
        n1, n3 = nodes[start], nodes[start + 1]

        def stack(off, n):
            ws, ss, bs = zip(*(packed(params, start + 3 * t + off, n)
                               for t in range(reps)))
            return jnp.stack(ws), jnp.stack(ss), jnp.stack(bs)

        w1, s1, b1 = stack(0, n1)
        w3, s3, b3 = stack(1, n3)

        def body(h, ws):
            w1, s1, b1, w3, s3, b3 = ws
            y = conv_flat_int8(h, w1, s1, b1, lay, k=1,
                               out_dtype=compute_dtype,
                               interpret=interpret)
            y = conv_flat_int8(y, w3, s3, b3, lay, k=3, skip=h,
                               out_dtype=compute_dtype,
                               interpret=interpret)
            return y, None

        out, _ = lax.scan(body, xflat, (w1, s1, b1, w3, s3, b3))
        return out

    def forward(params, x):
        b = x.shape[0]
        layouts: Dict[Tuple[int, int], FlatLayout] = {}
        outputs: Dict[int, jnp.ndarray] = {}       # NHWC
        flats: Dict[int, Tuple[jnp.ndarray, Tuple[int, int]]] = {}
        heads: List[jnp.ndarray] = []

        def lay_of(hw):
            if hw not in layouts:
                layouts[hw] = layout_for(b, hw)
            return layouts[hw]

        def as_nhwc(i: int) -> jnp.ndarray:
            if i not in outputs:
                f, hw = flats[i]
                outputs[i] = from_flat(f, lay_of(hw))
            return outputs[i]

        def gc(upto: int):
            for j in list(outputs):
                if live[j] <= upto:
                    del outputs[j]
            for j in list(flats):
                if live[j] <= upto:
                    del flats[j]

        prev = x
        prev_flat: Optional[jnp.ndarray] = None
        prev_hw = (x.shape[1], x.shape[2])

        idx = 0
        while idx < len(nodes):
            node = nodes[idx]
            i = node.index
            if i in ladders:
                reps = ladders[i]
                hw = res_of[i]
                lay = lay_of(hw)
                if prev_flat is None:
                    prev_flat = to_flat(prev.astype(compute_dtype), lay)
                out_f = _ladder_scan_flat(params, prev_flat, lay, i, reps)
                last = i + 3 * reps - 1
                flats[last] = (out_f, hw)
                prev, prev_flat, prev_hw = None, out_f, hw
                idx += 3 * reps
                gc(last)
                continue

            if eligible(node):
                hw = res_of[i]
                lay = lay_of(hw)
                if prev_flat is None:
                    prev_flat = to_flat(prev.astype(compute_dtype), lay)
                w_p, s_w, bias = packed(params, i, node)
                act = "leaky" if node.activation == "leaky" else "linear"
                # fuse a following shortcut into the kernel epilogue when
                # this conv's raw output has no other consumer
                skip = None
                consumed = 1
                if (node.kernel_size == 3 and idx + 1 < len(nodes)
                        and isinstance(nodes[idx + 1], ShortcutSpec)
                        and nodes[idx + 1].source in flats
                        and flats[nodes[idx + 1].source][1] == hw
                        and act == "leaky"
                        and live[i] <= i + 1):
                    skip = flats[nodes[idx + 1].source][0]
                    consumed = 2
                y_f = conv_flat_int8(prev_flat, w_p, s_w, bias, lay,
                                     k=node.kernel_size, act=act,
                                     skip=skip, out_dtype=compute_dtype,
                                     interpret=interpret)
                out_i = i + consumed - 1
                flats[out_i] = (y_f, hw)
                prev, prev_flat, prev_hw = None, y_f, hw
                idx += consumed
                gc(out_i)
                continue

            # ---- NHWC fallback path
            if prev is None:
                prev = from_flat(prev_flat, lay_of(prev_hw))
            if isinstance(node, ConvSpec):
                e = params[f"node_{i}"]
                # weight-only int8 fallback (bf16 MXU): cast int8 kernel
                # up, rescale output per channel (ops/quantize.conv_w8
                # semantics, inlined to keep one code path)
                w = jnp.asarray(e["w_q"]).astype(compute_dtype)
                y = lax.conv_general_dilated(
                    prev.astype(compute_dtype), w,
                    window_strides=(node.stride, node.stride),
                    padding=[(node.pad, node.pad)] * 2,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                y = (y.astype(jnp.float32)
                     * jnp.asarray(e["scale"])[None, None, None, :]
                     + jnp.asarray(e["b"])[None, None, None, :])
                if node.activation == "leaky":
                    y = jnp.where(y > 0, y, 0.1 * y)
                out = y.astype(compute_dtype)
            elif isinstance(node, MaxPoolSpec):
                out = _maxpool(prev, node)
            elif isinstance(node, UpsampleSpec):
                out = _upsample_bilinear(prev, node.stride)
            elif isinstance(node, RouteSpec):
                out = (as_nhwc(node.sources[0]) if len(node.sources) == 1
                       else jnp.concatenate(
                           [as_nhwc(s) for s in node.sources], axis=-1))
            elif isinstance(node, ShortcutSpec):
                out = prev + as_nhwc(node.source)
            elif isinstance(node, YoloSpec):
                heads.append(prev.astype(head_dtype))
                out = prev
            else:  # pragma: no cover
                raise TypeError(node)
            outputs[i] = out
            prev, prev_flat = out, None
            prev_hw = res_of[i]
            idx += 1
            gc(i)
        return heads

    return forward
