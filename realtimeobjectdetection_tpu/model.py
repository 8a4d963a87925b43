"""GraphSpec -> one traced/jitted TPU computation (NHWC, fp32/bf16).

Unlike the reference's per-layer Python interpreter that walks an
``nn.ModuleList`` on every call (/root/reference/src/darknet.py:199-303),
the whole network is traced once into a single XLA program: route concats,
shortcut adds, pooling and upsampling are ordinary lax ops that XLA fuses
and tiles onto the MXU/VPU.

BatchNorm modes
---------------
``fold``     BN folded into conv weights at load time — the fast inference
             path (identical numerics to ``running`` up to fp rounding).
``running``  eval-style BN with stored running statistics.
``batch``    per-batch statistics *even at inference* — this reproduces the
             reference detector, which never calls ``model.eval()``
             (detect.py:62-63 runs the module in training mode), so the
             golden ``det/metrics.json`` was produced with batch stats.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .cfg_parser import (ConvSpec, GraphSpec, MaxPoolSpec, RouteSpec,
                         ShortcutSpec, UpsampleSpec, YoloSpec)

__all__ = ["fold_batchnorm", "make_forward", "head_shapes", "Darknet"]

BN_EPS = 1e-5  # torch.nn.BatchNorm2d default (src/darknet.py:494)


def fold_batchnorm(spec: GraphSpec, params: Dict) -> Dict:
    """Fold BN affine+stats into conv kernel/bias (inference fast path)."""
    out = {}
    for node in spec.conv_nodes:
        key = f"node_{node.index}"
        entry = params[key]
        if node.batch_normalize:
            w = jnp.asarray(entry["w"])
            gamma = jnp.asarray(entry["bn_gamma"])
            beta = jnp.asarray(entry["bn_beta"])
            mean = jnp.asarray(entry["bn_mean"])
            var = jnp.asarray(entry["bn_var"])
            scale = gamma * lax.rsqrt(var + BN_EPS)
            out[key] = {
                "w": w * scale[None, None, None, :],
                "b": beta - mean * scale,
            }
        else:
            out[key] = {"w": jnp.asarray(entry["w"]),
                        "b": jnp.asarray(entry["b"])}
    return out


def _conv(x, w, stride: int, pad: int, compute_dtype, precision=None,
          out_dtype=jnp.float32):
    # fp32 path: full-precision output via preferred_element_type.
    # bf16 path: emit bf16 and upcast — the MXU accumulates fp32
    # internally either way, and mixed in/out dtypes break the conv
    # transpose rule under autodiff (training runs through this too).
    # out_dtype=bfloat16 (inference fold path only) keeps the materialized
    # activation bf16, halving the HBM traffic between layers.
    preferred = jnp.float32 if compute_dtype == jnp.float32 else None
    y = lax.conv_general_dilated(
        x.astype(compute_dtype), w.astype(compute_dtype),
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred,
        precision=precision,
    )
    return y.astype(out_dtype)


def _s2d_stem_weights(w):
    """Transform a 3x3/stride-1 stem kernel [3,3,Cin,Cout] into the
    equivalent space-to-depth kernel [3,3,4*Cin,4*Cout].

    The raw stem conv (yolov3: 3->32 at 416², cfg block 1) runs at ~3/128
    MXU lane occupancy.  Space-to-depth packs 2x2 input blocks into
    channels ([B,H,W,C] -> [B,H/2,W/2,4C]) and computes all four output-
    pixel parities as extra output channels, then depth-to-space restores
    the exact original output.  4x the nominal FLOPs, but 12->128 channels
    runs ~8x more efficiently on the MXU — a net win measured on-chip.

    Derivation: output pixel (2i+di, 2j+dj) reads input rows
    y = 2(i+dy)+ay with u = 2*dy+ay-di ∈ [-1,1]; taps outside map to
    zeros.  Zero-padding the s2d tensor by 1 reproduces the original
    1-pixel zero border exactly (the extra half-block rows are never
    read by any in-range tap).
    """
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3)
    w2 = jnp.zeros((3, 3, 4 * cin, 4 * cout), w.dtype)
    for di in range(2):
        for dj in range(2):
            for ay in range(2):
                for ax in range(2):
                    for dy in (-1, 0, 1):
                        for dx in (-1, 0, 1):
                            u = 2 * dy + ay - di
                            v = 2 * dx + ax - dj
                            if -1 <= u <= 1 and -1 <= v <= 1:
                                ci = (ay * 2 + ax) * cin
                                co = (di * 2 + dj) * cout
                                w2 = w2.at[dy + 1, dx + 1,
                                           ci:ci + cin,
                                           co:co + cout].set(w[u + 1, v + 1])
    return w2


def _space_to_depth(x):
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c) \
        .transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def _depth_to_space(x, cout):
    b, h, w, _ = x.shape
    return x.reshape(b, h, w, 2, 2, cout) \
        .transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, cout)


def _batch_stats_bn(y, gamma, beta):
    # biased variance over (N, H, W), matching torch train-mode BN
    mean = jnp.mean(y, axis=(0, 1, 2))
    var = jnp.mean(jnp.square(y - mean[None, None, None, :]), axis=(0, 1, 2))
    inv = lax.rsqrt(var + BN_EPS)
    return (y - mean) * (gamma * inv) + beta, mean, var


def _maxpool(x, node: MaxPoolSpec):
    k, s = node.kernel_size, node.stride
    if s != 1:
        return lax.reduce_window(x, -jnp.inf, lax.max,
                                 (1, k, k, 1), (1, s, s, 1), "VALID")
    # stride-1 cfg variant: replicate-pad right/bottom by k-1, pool with
    # stride k-1 (reference MaxPoolStride1, src/darknet.py:17-46 — note it
    # constructs MaxPool2d(kernel, stride=k-1)).
    p = k - 1
    x = jnp.pad(x, ((0, 0), (0, p), (0, p), (0, 0)), mode="edge")
    return lax.reduce_window(x, -jnp.inf, lax.max,
                             (1, k, k, 1), (1, p, p, 1), "VALID")


def _upsample_bilinear(x, stride: int):
    b, h, w, c = x.shape
    # half-pixel-centres bilinear == nn.Upsample(align_corners=False)
    # (src/darknet.py:591-592)
    return jax.image.resize(x, (b, h * stride, w * stride, c), "bilinear")


def head_shapes(spec: GraphSpec, batch: int, height: Optional[int] = None,
                width: Optional[int] = None) -> List[Tuple[int, int, int, int]]:
    """Static output shape of each yolo head for a given input size."""
    h = height or spec.net.height
    w = width or spec.net.width
    shapes = []
    cur_h, cur_w = h, w
    sizes: List[Tuple[int, int]] = []
    for node in spec.nodes:
        if isinstance(node, ConvSpec):
            cur_h = (cur_h + 2 * node.pad - node.kernel_size) // node.stride + 1
            cur_w = (cur_w + 2 * node.pad - node.kernel_size) // node.stride + 1
        elif isinstance(node, MaxPoolSpec):
            if node.stride != 1:
                cur_h = (cur_h - node.kernel_size) // node.stride + 1
                cur_w = (cur_w - node.kernel_size) // node.stride + 1
            elif node.kernel_size != 2:
                # replicate-pad variant pools with stride k-1 (see
                # _maxpool); only k=2 is shape-preserving
                p = node.kernel_size - 1
                cur_h = (cur_h + p - node.kernel_size) // p + 1
                cur_w = (cur_w + p - node.kernel_size) // p + 1
        elif isinstance(node, UpsampleSpec):
            cur_h *= node.stride
            cur_w *= node.stride
        elif isinstance(node, RouteSpec):
            cur_h, cur_w = sizes[node.sources[0]]
        elif isinstance(node, YoloSpec):
            a = len(node.anchors)
            shapes.append((batch, cur_h, cur_w, a * (5 + node.num_classes)))
        sizes.append((cur_h, cur_w))
    return shapes


def _find_ladders(spec: GraphSpec) -> Dict[int, int]:
    """Find residual ladders: maximal runs of identical
    [conv 1x1 c->c/2, conv 3x3 c/2->c, shortcut] triples.

    Returns {start_node_index: repetitions}.  Used by ``scan_ladders`` to
    roll Darknet-53's 23 residual blocks into 5 ``lax.scan``s — same
    numerics, ~4x smaller HLO (compile time on the remote TPU service
    drops accordingly).  A ladder is only eligible if no route/shortcut
    outside it taps an interior node (only the final output may be read).
    """
    nodes = spec.nodes
    # (referrer, source) pairs so interior taps can be attributed
    ref_pairs = []
    for n in nodes:
        if isinstance(n, RouteSpec):
            ref_pairs.extend((n.index, s) for s in n.sources)
        elif isinstance(n, ShortcutSpec):
            ref_pairs.append((n.index, n.source))

    def is_triple(i, proto=None):
        if i + 2 >= len(nodes):
            return False
        a, b, c = nodes[i], nodes[i + 1], nodes[i + 2]
        ok = (isinstance(a, ConvSpec) and isinstance(b, ConvSpec)
              and isinstance(c, ShortcutSpec)
              and c.source == i - 1
              and a.kernel_size == 1 and b.kernel_size == 3
              and a.stride == 1 and b.stride == 1
              and a.batch_normalize and b.batch_normalize
              and a.activation == "leaky" and b.activation == "leaky"
              and b.out_channels == a.in_channels
              and b.in_channels == a.out_channels)
        if not ok:
            return False
        if proto is not None:
            pa, pb = proto
            ok = (a.in_channels == pa.in_channels
                  and a.out_channels == pa.out_channels)
        return ok

    ladders: Dict[int, int] = {}
    i = 0
    while i < len(nodes):
        if is_triple(i):
            proto = (nodes[i], nodes[i + 1])
            reps = 1
            while is_triple(i + 3 * reps, proto):
                # interior tap check: the shortcut source of the NEXT
                # triple is this triple's output — allowed; anything else
                # referencing interior nodes blocks extension
                reps += 1
            # trim reps while any node interior to the rolled region is
            # referenced by anything other than the ladder's own shortcut
            # nodes (a route into a mid-ladder output would need that
            # intermediate activation, which scan doesn't materialize)
            while reps > 1:
                interior = set(range(i, i + 3 * reps - 1))
                own_shortcut_nodes = {i + 3 * t + 2 for t in range(reps)}
                external = [
                    (ref, src) for ref, src in ref_pairs
                    if src in interior and ref not in own_shortcut_nodes]
                if external:
                    reps -= 1
                else:
                    break
            if reps > 1:
                ladders[i] = reps
            i += 3 * reps
        else:
            i += 1
    return ladders


def make_forward(spec: GraphSpec, bn_mode: str = "fold",
                 compute_dtype=jnp.float32, return_stats: bool = False,
                 precision=None, scan_ladders: bool = False,
                 quantize: Optional[str] = None,
                 activation_dtype=None, head_dtype=None,
                 s2d_stem: bool = False, scan_remat: bool = False,
                 stage_range: Optional[Tuple[int, int]] = None):
    """Build ``forward(params, x) -> [head0, head1, ...]`` (raw heads, NHWC).

    ``return_stats`` additionally returns per-conv batch statistics
    ``{node_i: (mean, var)}`` so a training loop can maintain torch-style
    running averages.

    ``precision``: lax precision for convs.  On TPU the default uses bf16
    MXU passes (the fast path); parity tests use ``Precision.HIGHEST``.

    ``scan_ladders``: roll repeated residual triples into ``lax.scan``
    over stacked params (same numerics, much smaller HLO / faster
    compile).  In batch-BN train mode the per-layer batch statistics
    ride out of the scan as stacked ys; for other bn modes with
    return_stats the roll is skipped.

    ``scan_remat``: checkpoint the scan body so the backward pass
    recomputes body intermediates from the carried activation instead
    of storing them stacked per iteration — the standard scan+remat
    trade (the stacked residuals OOM the yolov3 train step at bs=64;
    see PERFORMANCE.md training notes).  Only meaningful when the
    forward will be differentiated.

    ``quantize``: ``"w8"`` or ``"w8a8"`` int8 inference over params
    produced by :func:`..ops.quantize.quantize_folded_int8` (requires
    bn_mode="fold"; see ops/quantize.py for semantics + drift gates).

    ``activation_dtype``: dtype the inter-layer activations are
    materialized in.  ``jnp.bfloat16`` halves activation HBM traffic —
    the dominant memory stream of a conv net — at a bounded numeric
    drift (heads are always cast back to ``head_dtype`` before decode;
    drift gated by tests/test_forward_parity.py).  None keeps fp32.
    Composes with batch/running BN (training): statistics and
    normalization stay fp32, only the materialized post-activation
    tensor is cast, halving the forward stream AND the stashed-for-
    backward activations (see make_train_step(activation_dtype=...)).

    ``stage_range=(lo, hi)``: pipeline-parallel stage mode — run only
    nodes ``[lo, hi)`` and return ``(heads_emitted, boundary)`` where
    ``boundary`` maps node index -> activation for everything a later
    stage still reads.  The returned function's signature becomes
    ``forward(params, x, carry)`` (``x`` is consumed only by the first
    stage; later stages read ``carry``, the previous stage's boundary).
    Node-for-node identical math to the full forward — the boundary is
    exactly the interpreter's live-activation set at the cut
    (tests/test_pipeline_parallel.py proves bit-equality).  Cuts must
    not fall inside a rolled ladder; serving-path only
    (``return_stats`` unsupported).  Used by
    :mod:`..parallel.pipeline` to place consecutive stages on
    consecutive devices.
    """
    assert bn_mode in ("fold", "running", "batch")
    assert quantize in (None, "w8", "w8a8", "w8a8_pallas")
    if quantize:
        assert bn_mode == "fold", "int8 paths consume BN-folded params"
    if quantize == "w8a8_pallas":
        # int8-MXU path: eligible convs via the Pallas tap-matmul kernel
        # (model_int8.py); same quantize_folded_int8 params as w8/w8a8
        from .model_int8 import make_forward_int8
        return make_forward_int8(
            spec, compute_dtype=activation_dtype or jnp.bfloat16,
            head_dtype=head_dtype)
    act_dtype = activation_dtype or jnp.float32
    # activation_dtype composes with every bn mode: in batch/running BN
    # the conv output, the batch statistics, and the normalization all
    # stay fp32 (stat stability), and only the MATERIALIZED post-
    # activation tensor is cast — so bf16 residency halves the HBM bytes
    # of both the forward stream and the activations autodiff stashes
    # for the backward pass (the training-side twin of the serving
    # fast path; numerics gated by tests/test_train_targets.py and
    # test_train_v5.py bf16-activation step tests).
    # head_dtype: dtype the raw heads are returned in.  Default fp32 (the
    # parity paths decode fp32); the serving fast path passes bf16 so
    # decode_topk's reshape/concat/gather of the [B, N, 85] raw tensor
    # moves half the HBM bytes (profiler: ~14 ms/batch at bs=256 fp32).
    head_dtype = head_dtype or jnp.float32
    if s2d_stem:
        assert bn_mode == "fold", "s2d stem folds into conv weights"
        n0 = spec.nodes[0]
        assert (isinstance(n0, ConvSpec) and n0.kernel_size == 3
                and n0.stride == 1 and n0.in_channels == 3), \
            "s2d_stem expects a 3x3/1 3-channel stem conv"
    live = spec.live_after()
    # ladders scan in every bn mode; with return_stats (the train step)
    # the per-layer batch statistics ride out of the scan as stacked
    # outputs — same numerics, ~4x smaller HLO for the unrolled-heavy
    # train graph (compile robustness on the remote service, r3)
    ladders = _find_ladders(spec) if scan_ladders and not quantize \
        and not (return_stats and bn_mode != "batch") else {}
    if stage_range is not None:
        assert not return_stats, "stage mode is a serving path"
        lo_, hi_ = stage_range
        assert 0 <= lo_ < hi_ <= len(spec.nodes), stage_range
        for s, r in ladders.items():
            for cut in (lo_, hi_):
                assert not (s < cut < s + 3 * r), \
                    f"stage cut {cut} falls inside the ladder at {s}"

    def _ladder_scan(params, x, start: int, reps: int,
                     want_stats: bool = False):
        """Run one residual ladder as a lax.scan over stacked params."""
        def stack(offset, field):
            return jnp.stack([
                jnp.asarray(params[f"node_{start + 3 * t + offset}"][field])
                for t in range(reps)])

        if bn_mode == "fold":
            xs = tuple(stack(o, f) for o in (0, 1) for f in ("w", "b"))

            def body(h, ws):
                w1, b1, w2, b2 = ws
                y = _conv(h, w1, 1, 0, compute_dtype, precision,
                          act_dtype) + b1.astype(act_dtype)
                y = jnp.where(y > 0, y, 0.1 * y)
                y = _conv(y, w2, 1, 1, compute_dtype, precision,
                          act_dtype) + b2.astype(act_dtype)
                y = jnp.where(y > 0, y, 0.1 * y)
                return h + y, None
        else:
            fields = ("w", "bn_gamma", "bn_beta", "bn_mean", "bn_var")
            xs = tuple(stack(o, f) for o in (0, 1) for f in fields)

            def body(h, ws):
                (w1, g1, be1, m1, v1, w2, g2, be2, m2, v2) = ws
                y = _conv(h, w1, 1, 0, compute_dtype, precision)
                if bn_mode == "batch":
                    y, bm1, bv1 = _batch_stats_bn(y, g1, be1)
                else:
                    y = (y - m1) * (g1 * lax.rsqrt(v1 + BN_EPS)) + be1
                y = jnp.where(y > 0, y, 0.1 * y)
                y = _conv(y, w2, 1, 1, compute_dtype, precision)
                if bn_mode == "batch":
                    y, bm2, bv2 = _batch_stats_bn(y, g2, be2)
                else:
                    y = (y - m2) * (g2 * lax.rsqrt(v2 + BN_EPS)) + be2
                y = jnp.where(y > 0, y, 0.1 * y)
                ys = (bm1, bv1, bm2, bv2) if want_stats \
                    and bn_mode == "batch" else None
                # keep the scan carry at the residency dtype (the carry
                # dtype must be loop-invariant; h is act_dtype)
                return h + y.astype(h.dtype), ys

        if scan_remat:
            # Store only the scan carry; recompute body intermediates in
            # the backward pass.  prevent_cse=False is the documented
            # setting for checkpoint-under-scan (CSE cannot defeat remat
            # across lax.scan iterations).
            body = jax.checkpoint(body, prevent_cse=False)
        out, ys = lax.scan(body, x, xs)
        return (out, ys) if want_stats else out

    def forward(params, x, carry=None):
        lo, hi = stage_range if stage_range is not None \
            else (0, len(spec.nodes))
        outputs: Dict[int, jnp.ndarray] = dict(carry) if carry else {}
        heads: List[jnp.ndarray] = []
        stats: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]] = {}
        prev = x if lo == 0 else outputs[lo - 1]
        idx = lo
        nodes = spec.nodes
        while idx < hi:
            node = nodes[idx]
            i = node.index
            if i in ladders:
                reps = ladders[i]
                if return_stats and bn_mode == "batch":
                    out, (ms1, vs1, ms2, vs2) = _ladder_scan(
                        params, prev, i, reps, want_stats=True)
                    for t in range(reps):
                        stats[f"node_{i + 3 * t}"] = (ms1[t], vs1[t])
                        stats[f"node_{i + 3 * t + 1}"] = (ms2[t], vs2[t])
                else:
                    out = _ladder_scan(params, prev, i, reps)
                last = i + 3 * reps - 1
                outputs[last] = out
                prev = out
                idx += 3 * reps
                for j in list(outputs):
                    if live[j] <= last:
                        del outputs[j]
                continue
            if isinstance(node, ConvSpec):
                entry = params[f"node_{i}"]
                if s2d_stem and i == 0:
                    cout = node.out_channels
                    s = _space_to_depth(prev)
                    w2 = _s2d_stem_weights(entry["w"])
                    t = _conv(s, w2, 1, 1, compute_dtype, precision,
                              act_dtype)
                    y = _depth_to_space(t, cout)
                    y = y + entry["b"][None, None, None, :].astype(y.dtype)
                    if node.activation == "leaky":
                        y = jnp.where(y > 0, y, 0.1 * y)
                    outputs[i] = y
                    prev = y
                    idx += 1
                    for j in list(outputs):
                        if live[j] <= i:
                            del outputs[j]
                    continue
                if quantize == "w8":
                    from .ops.quantize import conv_w8
                    y = conv_w8(prev, entry["w_q"], entry["scale"],
                                node.stride, node.pad, compute_dtype,
                                precision)
                elif quantize == "w8a8":
                    from .ops.quantize import conv_w8a8
                    y = conv_w8a8(prev, entry["w_q"], entry["scale"],
                                  node.stride, node.pad)
                else:
                    # batch/running BN: keep the conv output fp32 so the
                    # batch statistics and the normalization stay fp32
                    # (the documented residency invariant); only the
                    # final post-activation tensor is cast to act_dtype
                    # below.  Fold/no-BN convs materialize act_dtype
                    # directly (the serving fast path).
                    conv_dt = act_dtype if (bn_mode == "fold"
                                            or not node.batch_normalize) \
                        else jnp.float32
                    y = _conv(prev, entry["w"], node.stride, node.pad,
                              compute_dtype, precision, conv_dt)
                if node.batch_normalize and bn_mode != "fold":
                    if bn_mode == "batch":
                        y, m, v = _batch_stats_bn(
                            y, entry["bn_gamma"], entry["bn_beta"])
                        if return_stats:
                            stats[f"node_{i}"] = (m, v)
                    else:
                        inv = lax.rsqrt(entry["bn_var"] + BN_EPS)
                        y = (y - entry["bn_mean"]) * (entry["bn_gamma"] * inv) \
                            + entry["bn_beta"]
                else:
                    y = y + entry["b"][None, None, None, :].astype(y.dtype)
                if node.activation == "leaky":
                    y = jnp.where(y > 0, y, 0.1 * y)
                out = y.astype(act_dtype)
            elif isinstance(node, MaxPoolSpec):
                out = _maxpool(prev, node)
            elif isinstance(node, UpsampleSpec):
                out = _upsample_bilinear(prev, node.stride)
            elif isinstance(node, RouteSpec):
                out = (outputs[node.sources[0]] if len(node.sources) == 1
                       else jnp.concatenate(
                           [outputs[s] for s in node.sources], axis=-1))
            elif isinstance(node, ShortcutSpec):
                out = prev + outputs[node.source]
            elif isinstance(node, YoloSpec):
                heads.append(prev.astype(head_dtype))
                out = prev  # reference: outputs[i] = outputs[i-1]
            else:  # pragma: no cover
                raise TypeError(node)
            outputs[i] = out
            prev = out
            idx += 1
            # free dead activations so the traced graph stays lean
            for j in list(outputs):
                if live[j] <= i:
                    del outputs[j]
        if stage_range is not None:
            # boundary = every activation a later stage still reads,
            # plus hi-1 (the next stage's ``prev``, which the liveness
            # sweep may already have freed from ``outputs``)
            boundary = {j: v for j, v in outputs.items() if live[j] >= hi}
            if hi < len(nodes):
                boundary[hi - 1] = prev
            return heads, boundary
        if return_stats:
            return heads, stats
        return heads

    return forward


class Darknet:
    """Convenience wrapper: spec + params + jitted heads-forward.

    The detection pipeline composes this with :mod:`.ops.decode` and
    :mod:`.ops.nms` into a single jit; this class only owns the backbone.
    """

    def __init__(self, spec: GraphSpec, params: Dict, bn_mode: str = "fold",
                 compute_dtype=jnp.float32):
        self.spec = spec
        self.bn_mode = bn_mode
        self.compute_dtype = compute_dtype
        if bn_mode == "fold":
            params = fold_batchnorm(spec, params)
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self.forward = jax.jit(make_forward(spec, bn_mode, compute_dtype))

    def __call__(self, x):
        return self.forward(self.params, x)
