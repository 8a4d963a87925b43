"""Native YOLOv5 (v6.x) graph — CSP-C3 backbone, SPPF, PANet, SiLU.

The reference has no YOLOv5 implementation at all: it downloads the
entire model through ``torch.hub.load('ultralytics/yolov5', ...)``
(/root/reference/detect.py:258) and delegates preprocessing, forward,
NMS, and rendering to ultralytics' AutoShape.  Owning that capability
requires a native graph + a weight converter from the ultralytics
checkpoint format (offline torch is only a dev-time dependency).

Architecture (yolov5{n,s,m,l,x} = depth/width multiples of the same
graph): Conv(6x6/2) stem, C3 stages [3,6,9,3], SPPF tail; PAN head with
two top-down and two bottom-up fusions; 3-scale Detect at strides
8/16/32 with the standard COCO anchors.

Numerics notes: BatchNorm eps=1e-3 (ultralytics convention, vs 1e-5 in
Darknet); activation SiLU; v5 decode ``xy=(2σ-0.5+grid)·stride``,
``wh=(2σ)²·anchor``, confidence = objectness · class score.

BN: inference params carry folded ``{"w","b"}`` conv entries (the
converter folds the checkpoint's BN).  Training uses
``init_yolov5_params(batch_norm=True)`` entries ``{"w", "bn_gamma",
"bn_beta", "bn_mean", "bn_var"}`` — batch-stats BN in the train step
(running stats maintained with ultralytics momentum 0.03), foldable to
the inference layout with :func:`fold_v5_batchnorm`.  Detect heads
(m24) are plain biased convs in both layouts, as in ultralytics.
"""

from __future__ import annotations

import math
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["YoloV5Config", "yolov5_config", "init_yolov5_params",
           "make_yolov5_forward", "decode_v5", "decode_v5_topk",
           "params_from_ultralytics", "fold_v5_batchnorm",
           "load_v5_checkpoint", "V5_ANCHORS", "V5_STRIDES",
           "BN_MOMENTUM_V5", "v5_conv_inventory",
           "decode_v5_topk_compact", "decode_v5_topk_split"]

V5_ANCHORS = (
    ((10, 13), (16, 30), (33, 23)),      # P3/8
    ((30, 61), (62, 45), (59, 119)),     # P4/16
    ((116, 90), (156, 198), (373, 326)),  # P5/32
)
V5_STRIDES = (8, 16, 32)
BN_EPS_V5 = 1e-3
BN_MOMENTUM_V5 = 0.03  # ultralytics BatchNorm2d(momentum=0.03)

_MULTIPLES = {
    "n": (0.33, 0.25), "s": (0.33, 0.50), "m": (0.67, 0.75),
    "l": (1.00, 1.00), "x": (1.33, 1.25),
}


def _make_divisible(x: float, div: int = 8) -> int:
    return int(math.ceil(x / div) * div)


class YoloV5Config:
    """Resolved layer widths/depths for one model size."""

    def __init__(self, size: str = "l", num_classes: int = 80):
        size = size.lower()
        depth, width = _MULTIPLES[size]
        self.size = size
        self.num_classes = num_classes
        gw = lambda c: _make_divisible(c * width)
        gd = lambda n: max(round(n * depth), 1)
        self.ch = [gw(64), gw(128), gw(256), gw(512), gw(1024)]
        self.depths = [gd(3), gd(6), gd(9), gd(3)]       # backbone C3 reps
        self.head_depth = gd(3)                           # head C3 reps
        self.no = 3 * (5 + num_classes)                   # detect channels


def yolov5_config(size: str = "l", num_classes: int = 80) -> YoloV5Config:
    return YoloV5Config(size, num_classes)


# ---------------------------------------------------------------------------
# parameter construction
# ---------------------------------------------------------------------------

def _conv_param(rng, c1, c2, k, bn=False):
    fan_in = c1 * k * k
    w = rng.normal(0, np.sqrt(2.0 / fan_in), (k, k, c1, c2))
    if bn:  # training layout: conv (no bias) + BatchNorm2d(eps=1e-3)
        return {"w": w.astype(np.float32),
                "bn_gamma": np.ones(c2, np.float32),
                "bn_beta": np.zeros(c2, np.float32),
                "bn_mean": np.zeros(c2, np.float32),
                "bn_var": np.ones(c2, np.float32)}
    return {"w": w.astype(np.float32),
            "b": np.zeros(c2, np.float32)}  # BN folded: bias slot


def _bottleneck_params(rng, c1, c2, e=1.0, bn=False):
    c_ = int(c2 * e)
    return {"cv1": _conv_param(rng, c1, c_, 1, bn),
            "cv2": _conv_param(rng, c_, c2, 3, bn)}


def _c3_params(rng, c1, c2, n, e=0.5, bn=False):
    c_ = int(c2 * e)
    return {
        "cv1": _conv_param(rng, c1, c_, 1, bn),
        "cv2": _conv_param(rng, c1, c_, 1, bn),
        "cv3": _conv_param(rng, 2 * c_, c2, 1, bn),
        "m": [_bottleneck_params(rng, c_, c_, 1.0, bn) for _ in range(n)],
    }


def _sppf_params(rng, c1, c2, bn=False):
    c_ = c1 // 2
    return {"cv1": _conv_param(rng, c1, c_, 1, bn),
            "cv2": _conv_param(rng, c_ * 4, c2, 1, bn)}


def init_yolov5_params(cfg: YoloV5Config, seed: int = 0,
                       batch_norm: bool = False) -> Dict:
    """Random parameter pytree, keys = ultralytics module index.

    ``batch_norm=False``: folded inference layout (``{"w","b"}``).
    ``batch_norm=True``: training layout — every Conv carries BN params
    (the Detect heads m24 stay plain biased convs, as in ultralytics)
    and the head biases get the ultralytics prior init
    (obj ≈ log(8/(640/stride)²), cls ≈ log(0.6/(nc-0.99))) so training
    starts with sane objectness/class probabilities.
    """
    bn = batch_norm
    rng = np.random.RandomState(seed)
    ch = cfg.ch
    d = cfg.depths
    hd = cfg.head_depth
    p: Dict[str, object] = {}
    p["m0"] = _conv_param(rng, 3, ch[0], 6, bn)             # stem 6x6/2
    p["m1"] = _conv_param(rng, ch[0], ch[1], 3, bn)         # /4
    p["m2"] = _c3_params(rng, ch[1], ch[1], d[0], bn=bn)
    p["m3"] = _conv_param(rng, ch[1], ch[2], 3, bn)         # /8
    p["m4"] = _c3_params(rng, ch[2], ch[2], d[1], bn=bn)    # -> P3
    p["m5"] = _conv_param(rng, ch[2], ch[3], 3, bn)         # /16
    p["m6"] = _c3_params(rng, ch[3], ch[3], d[2], bn=bn)    # -> P4
    p["m7"] = _conv_param(rng, ch[3], ch[4], 3, bn)         # /32
    p["m8"] = _c3_params(rng, ch[4], ch[4], d[3], bn=bn)
    p["m9"] = _sppf_params(rng, ch[4], ch[4], bn)
    # PAN head
    p["m10"] = _conv_param(rng, ch[4], ch[3], 1, bn)
    p["m13"] = _c3_params(rng, ch[3] * 2, ch[3], hd, bn=bn)
    p["m14"] = _conv_param(rng, ch[3], ch[2], 1, bn)
    p["m17"] = _c3_params(rng, ch[2] * 2, ch[2], hd, bn=bn)  # -> P3 out
    p["m18"] = _conv_param(rng, ch[2], ch[2], 3, bn)         # down
    p["m20"] = _c3_params(rng, ch[2] * 2, ch[3], hd, bn=bn)  # -> P4 out
    p["m21"] = _conv_param(rng, ch[3], ch[3], 3, bn)         # down
    p["m23"] = _c3_params(rng, ch[3] * 2, ch[4], hd, bn=bn)  # -> P5 out
    p["m24"] = {                                             # Detect
        "0": _conv_param(rng, ch[2], cfg.no, 1),
        "1": _conv_param(rng, ch[3], cfg.no, 1),
        "2": _conv_param(rng, ch[4], cfg.no, 1),
    }
    if batch_norm:  # ultralytics Detect._initialize_biases
        nc = cfg.num_classes
        for i, stride in enumerate(V5_STRIDES):
            b = p["m24"][str(i)]["b"].reshape(3, 5 + nc)
            b[:, 4] += math.log(8.0 / (640.0 / stride) ** 2)
            b[:, 5:] += math.log(0.6 / (nc - 0.99)) if nc > 1 else 0.0
            p["m24"][str(i)]["b"] = b.reshape(-1)
    return p


def fold_v5_batchnorm(params):
    """Fold training-layout BN params into the inference ``{"w","b"}``
    layout (running stats + affine -> conv scale/bias; mirrors the
    darknet-side fold_batchnorm and the ultralytics fuse())."""
    if isinstance(params, list):
        return [fold_v5_batchnorm(q) for q in params]
    if not isinstance(params, dict):
        return params
    if "bn_gamma" in params:
        w = jnp.asarray(params["w"])
        gamma = jnp.asarray(params["bn_gamma"])
        beta = jnp.asarray(params["bn_beta"])
        mean = jnp.asarray(params["bn_mean"])
        var = jnp.asarray(params["bn_var"])
        scale = gamma * lax.rsqrt(var + BN_EPS_V5)
        return {"w": w * scale[None, None, None, :],
                "b": beta - mean * scale}
    return {k: fold_v5_batchnorm(v) if k != "w" and k != "b"
            else jnp.asarray(v) for k, v in params.items()}


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _conv(x, p, stride=1, compute_dtype=jnp.bfloat16, act=True,
          out_dtype=jnp.float32, bn="fold", stats=None, name=""):
    k = p["w"].shape[0]
    pad = (k - 1) // 2 if k != 6 else 2   # stem 6x6/2 uses pad 2
    preferred = jnp.float32 if compute_dtype == jnp.float32 else None
    # out_dtype=bfloat16 keeps the materialized activation (bias + SiLU
    # included) in bf16 — halves every inter-layer HBM transfer, same
    # trade as make_forward(activation_dtype=...) on the darknet side.
    # The MXU still accumulates fp32 internally either way.
    y = lax.conv_general_dilated(
        x.astype(compute_dtype), jnp.asarray(p["w"]).astype(compute_dtype),
        (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred).astype(out_dtype)
    if "bn_gamma" in p:  # training layout: BatchNorm2d(eps=1e-3)
        gamma = jnp.asarray(p["bn_gamma"])
        beta = jnp.asarray(p["bn_beta"])
        if bn in ("batch", "batch1p"):
            yf = y.astype(jnp.float32)
            if bn == "batch1p":
                # one-pass stats: E[x²]−E[x]² lets XLA emit BOTH
                # reductions in one multi-output fusion reading the conv
                # output once; the two-pass form below re-reads it for
                # the deviation pass (the round-4 profile priced the
                # fused batch-stat re-reads at ~18 ms/step at v5s 640²
                # bs=128 — this is the "stat-reduce" lever VERDICT r4
                # item 7 asked to measure).  fp32 accumulators; the
                # classic cancellation risk (mean² ≫ var) is why this is
                # an opt-in A/B mode, not the parity default — torch's
                # batch_norm uses the deviation form this replaces.
                mean = jnp.mean(yf, axis=(0, 1, 2))
                var = jnp.mean(jnp.square(yf), axis=(0, 1, 2)) \
                    - jnp.square(mean)
            else:
                mean = jnp.mean(yf, axis=(0, 1, 2))
                var = jnp.mean(jnp.square(yf - mean[None, None, None, :]),
                               axis=(0, 1, 2))
            if stats is not None:
                stats[name] = (mean, var)
        else:  # "running"
            mean, var = jnp.asarray(p["bn_mean"]), jnp.asarray(p["bn_var"])
        inv = lax.rsqrt(var + BN_EPS_V5)
        y = ((y - mean.astype(out_dtype))
             * (gamma * inv).astype(out_dtype)
             + beta.astype(out_dtype))
    else:
        y = y + jnp.asarray(p["b"])[None, None, None, :].astype(out_dtype)
    if act:
        y = y * jax.nn.sigmoid(y)  # SiLU
    return y


def _bottleneck(x, p, shortcut, dtype, odt=jnp.float32, bn="fold",
                stats=None, name=""):
    y = _conv(x, p["cv1"], 1, dtype, out_dtype=odt, bn=bn, stats=stats,
              name=name + ".cv1")
    y = _conv(y, p["cv2"], 1, dtype, out_dtype=odt, bn=bn, stats=stats,
              name=name + ".cv2")
    return x + y if shortcut else y


def _c3(x, p, shortcut, dtype, odt=jnp.float32, bn="fold", stats=None,
        name="", scan=False, remat=False):
    y1 = _conv(x, p["cv1"], 1, dtype, out_dtype=odt, bn=bn, stats=stats,
               name=name + ".cv1")
    reps = p["m"]
    if scan and len(reps) >= 2:
        # Roll the n identical bottleneck repeats into lax.scan over the
        # stacked weights — the v5 analog of model._find_ladders on the
        # darknet side: every repeat inside a C3 has the same shapes
        # (c_->c_ 1x1 then c_->c_ 3x3, same shortcut flag), so one scan
        # body replaces n copies of the HLO.  Shrinks the v5l/x program
        # ~linearly in depth (compile robustness: the unrolled yolov3
        # train graph provably hit degraded-executable windows on the
        # remote compiler, PERFORMANCE.md round-3 drill-down).  With
        # bn="batch" the per-repeat batch statistics ride out as stacked
        # scan ys and are re-keyed to the exact unrolled names, so the
        # running-stat update in train/v5.py is layout-agnostic.
        # ``remat``: jax.checkpoint the body — backward recomputes body
        # intermediates instead of stacking them per repeat.
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack([jnp.asarray(a) for a in xs]), *reps)

        def body(carry, bp):
            st = {} if stats is not None else None
            y = _bottleneck(carry, bp, shortcut, dtype, odt, bn, st, "")
            return y, st

        if remat:
            body = jax.checkpoint(body)
        y1, ys = lax.scan(body, y1, stacked)
        if stats is not None:
            for j in range(len(reps)):
                for suffix in (".cv1", ".cv2"):
                    mean_s, var_s = ys[suffix]
                    stats[f"{name}.m{j}{suffix}"] = (mean_s[j], var_s[j])
    else:
        for j, bp in enumerate(reps):
            y1 = _bottleneck(y1, bp, shortcut, dtype, odt, bn, stats,
                             f"{name}.m{j}")
    y2 = _conv(x, p["cv2"], 1, dtype, out_dtype=odt, bn=bn, stats=stats,
               name=name + ".cv2")
    return _conv(jnp.concatenate([y1, y2], -1), p["cv3"], 1, dtype,
                 out_dtype=odt, bn=bn, stats=stats, name=name + ".cv3")


def _sppf(x, p, dtype, k=5, odt=jnp.float32, bn="fold", stats=None,
          name=""):
    y = _conv(x, p["cv1"], 1, dtype, out_dtype=odt, bn=bn, stats=stats,
              name=name + ".cv1")
    pool = lambda t: lax.reduce_window(t, -jnp.inf, lax.max,
                                       (1, k, k, 1), (1, 1, 1, 1),
                                       [(0, 0), (k // 2, k // 2),
                                        (k // 2, k // 2), (0, 0)])
    y1 = pool(y)
    y2 = pool(y1)
    y3 = pool(y2)
    return _conv(jnp.concatenate([y, y1, y2, y3], -1), p["cv2"], 1, dtype,
                 out_dtype=odt, bn=bn, stats=stats, name=name + ".cv2")


def _stem_s2d(x, p, ctx):
    """Space-to-depth rewrite of the 6x6/2 stem conv (exact identity).

    ``y(i,j,o) = sum_{ky,kx,c} w[ky,kx,c,o] * x(2i+ky-2, 2j+kx-2, c)``
    (stride 2, pad 2).  Substituting ``ky = 2*py + dy`` (py in [0,3),
    dy in {0,1}) and likewise for kx maps the sum onto a 3x3 stride-1
    pad-1 conv over the 2x2 space-to-depth input
    ``z(i,j,(dy*2+dx)*C+c) = x(2i+dy, 2j+dx, c)`` with rearranged
    weights ``w'[py,px,(dy*2+dx)*C+c,o] = w[2*py+dy, 2*px+dx, c, o]`` —
    the identical sum, so outputs match up to fp summation order
    (tests/test_yolov5.py::test_s2d_stem_exact).  This is the inverse of
    ultralytics' Focus->6x6-conv change (made for GPU perf): on TPU the
    s2d form raises the stem's input channel count 3 -> 12, filling more
    of the MXU's 8-deep input tiling.  Opt-in via
    ``make_yolov5_forward(s2d_stem=True)``; measured verdict in
    PERFORMANCE.md."""
    b, h, w, c = x.shape
    z = x.reshape(b, h // 2, 2, w // 2, 2, c)
    z = z.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
    wt = jnp.asarray(p["w"])
    o = wt.shape[-1]
    wt = (wt.reshape(3, 2, 3, 2, c, o).transpose(0, 2, 1, 3, 4, 5)
          .reshape(3, 3, 4 * c, o))
    p2 = dict(p)
    p2["w"] = wt
    return _conv(z, p2, 1, ctx["dt"], out_dtype=ctx["odt"], bn=ctx["bn"],
                 stats=ctx["stats"], name="m0")


def _upsample2(x):
    b, h, w, c = x.shape
    # nearest x2 (ultralytics nn.Upsample(mode='nearest'))
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def _v5_steps():
    """Ordered dataflow of the v5 graph: ``(name, reads, write, fn)``.

    ``fn(p, ctx, *read_values) -> tensor``; ``write=None`` marks a head
    emission (the three m24 detect convs).  This table is the single
    source of truth for the full forward, the pipeline-parallel
    stage-split forward (``make_yolov5_forward(stage_range=...)``), and
    the per-step FLOP balance (:func:`v5_step_flops`) — module order and
    channel math mirror ultralytics yolov5 v6.x (models/yolov5{s..x}.yaml
    via torch.hub, /root/reference/detect.py:258)."""
    def conv(m, stride):
        def f(p, ctx, x):
            if m == "m0" and ctx.get("s2d") and p[m]["w"].shape[0] == 6:
                return _stem_s2d(x, p[m], ctx)
            return _conv(x, p[m], stride, ctx["dt"], out_dtype=ctx["odt"],
                         name=m, bn=ctx["bn"], stats=ctx["stats"])
        return f

    def c3(m, shortcut):
        def f(p, ctx, x):
            return _c3(x, p[m], shortcut, ctx["dt"], ctx["odt"], ctx["bn"],
                       ctx["stats"], m, scan=ctx.get("scan", False),
                       remat=ctx.get("scan_remat", False))
        return f

    def sppf(m):
        def f(p, ctx, x):
            return _sppf(x, p[m], ctx["dt"], odt=ctx["odt"], bn=ctx["bn"],
                         stats=ctx["stats"], name=m)
        return f

    def upcat(p, ctx, top, lateral):
        return jnp.concatenate([_upsample2(top), lateral], -1)

    def downcat(m):
        def f(p, ctx, x, lateral):
            return jnp.concatenate(
                [_conv(x, p[m], 2, ctx["dt"], out_dtype=ctx["odt"],
                       name=m, bn=ctx["bn"], stats=ctx["stats"]), lateral],
                -1)
        return f

    def head(i):
        def f(p, ctx, x):
            pr = p["m24"][str(i)]
            if ctx.get("split_heads"):
                # one conv per anchor (channel-sliced weights): output
                # channels of the detect conv are independent dot
                # products, so three [.., 85] convs are bit-identical to
                # one [.., 255] conv — but give the decode heads whose
                # minor dim IS the 5+C row, killing the (a, 5+C) channel
                # split that forces full-candidate relayout copies in
                # the fused decode (round-4 drill-down; the padded MXU
                # cost is unchanged: 255 and 3x85 both pad to 384 lanes)
                c = pr["w"].shape[-1] // 3
                return tuple(
                    _conv(x, {"w": pr["w"][..., ai * c:(ai + 1) * c],
                              "b": pr["b"][ai * c:(ai + 1) * c]},
                          1, ctx["dt"], act=False, out_dtype=ctx["hdt"])
                    for ai in range(3))
            return _conv(x, pr, 1, ctx["dt"], act=False,
                         out_dtype=ctx["hdt"])
        return f

    return [
        ("m0", ("in",), "x0", conv("m0", 2)),
        ("m1", ("x0",), "x1", conv("m1", 2)),
        ("m2", ("x1",), "x2", c3("m2", True)),
        ("m3", ("x2",), "x3", conv("m3", 2)),
        ("m4", ("x3",), "p3", c3("m4", True)),
        ("m5", ("p3",), "x5", conv("m5", 2)),
        ("m6", ("x5",), "p4", c3("m6", True)),
        ("m7", ("p4",), "x7", conv("m7", 2)),
        ("m8", ("x7",), "x8", c3("m8", True)),
        ("m9", ("x8",), "p5", sppf("m9")),
        ("m10", ("p5",), "t5", conv("m10", 1)),
        ("m11_12", ("t5", "p4"), "x12", upcat),
        ("m13", ("x12",), "f4", c3("m13", False)),
        ("m14", ("f4",), "t4", conv("m14", 1)),
        ("m15_16", ("t4", "p3"), "x16", upcat),
        ("m17", ("x16",), "out3", c3("m17", False)),
        ("m24.0", ("out3",), None, head(0)),
        ("m18_19", ("out3", "t4"), "x19", downcat("m18")),
        ("m20", ("x19",), "out4", c3("m20", False)),
        ("m24.1", ("out4",), None, head(1)),
        ("m21_22", ("out4", "t5"), "x22", downcat("m21")),
        ("m23", ("x22",), "out5", c3("m23", False)),
        ("m24.2", ("out5",), None, head(2)),
    ]


def v5_step_flops(cfg: YoloV5Config, resolution: int = 640) -> List[int]:
    """Per-step conv FLOPs aligned with :func:`_v5_steps` order (same
    2*H*W*K²*Cin*Cout count as utils.profiling.conv_flops_v5; their sum
    is asserted equal in tests/test_yolov5.py).  Drives the
    FLOP-balanced pipeline-parallel cuts (parallel/pipeline.py)."""
    ch, d, hd, no = cfg.ch, cfg.depths, cfg.head_depth, cfg.no

    def conv(s, c1, c2, k):
        return 2 * s * s * k * k * c1 * c2

    def c3(s, c1, c2, n, e=0.5):
        c_ = int(c2 * e)
        return (conv(s, c1, c_, 1) + conv(s, c1, c_, 1)
                + sum(conv(s, c_, c_, 1) + conv(s, c_, c_, 3)
                      for _ in range(n))
                + conv(s, 2 * c_, c2, 1))

    r = resolution
    return [
        conv(r // 2, 3, ch[0], 6),                      # m0
        conv(r // 4, ch[0], ch[1], 3),                  # m1
        c3(r // 4, ch[1], ch[1], d[0]),                 # m2
        conv(r // 8, ch[1], ch[2], 3),                  # m3
        c3(r // 8, ch[2], ch[2], d[1]),                 # m4
        conv(r // 16, ch[2], ch[3], 3),                 # m5
        c3(r // 16, ch[3], ch[3], d[2]),                # m6
        conv(r // 32, ch[3], ch[4], 3),                 # m7
        c3(r // 32, ch[4], ch[4], d[3]),                # m8
        conv(r // 32, ch[4], ch[4] // 2, 1)             # m9 SPPF cv1
        + conv(r // 32, (ch[4] // 2) * 4, ch[4], 1),    # m9 SPPF cv2
        conv(r // 32, ch[4], ch[3], 1),                 # m10
        0,                                              # m11_12 up+cat
        c3(r // 16, ch[3] * 2, ch[3], hd),              # m13
        conv(r // 16, ch[3], ch[2], 1),                 # m14
        0,                                              # m15_16 up+cat
        c3(r // 8, ch[2] * 2, ch[2], hd),               # m17
        conv(r // 8, ch[2], no, 1),                     # m24.0
        conv(r // 16, ch[2], ch[2], 3),                 # m18_19 down
        c3(r // 16, ch[2] * 2, ch[3], hd),              # m20
        conv(r // 16, ch[3], no, 1),                    # m24.1
        conv(r // 32, ch[3], ch[3], 3),                 # m21_22 down
        c3(r // 32, ch[3] * 2, ch[4], hd),              # m23
        conv(r // 32, ch[4], no, 1),                    # m24.2
    ]


def v5_conv_inventory(cfg: YoloV5Config, resolution: int = 640):
    """Every individual conv in the forward as a dict
    ``{name, s_in, s_out, k, cin, cout}`` (stride = s_in // s_out).

    The analytic side of the per-conv roofline closure
    (scripts/roofline_v5.py): per conv, the device floor is
    ``max(2*s_out²k²·cin·cout / peak_flops,
    2B*(s_in²·cin + s_out²·cout + k²·cin·cout) / hbm_bw)`` — the same
    accounting the v5l floor proof in PERFORMANCE.md did by hand.
    FLOP totals are pinned to :func:`v5_step_flops`
    (tests/test_yolov5.py::test_conv_inventory_matches_step_flops).
    """
    ch, d, hd, no = cfg.ch, cfg.depths, cfg.head_depth, cfg.no
    rows = []

    def conv(name, s_in, s_out, k, cin, cout):
        rows.append(dict(name=name, s_in=s_in, s_out=s_out, k=k,
                         cin=cin, cout=cout))

    def c3(m, s, c1, c2, n, e=0.5):
        c_ = int(c2 * e)
        conv(f"{m}.cv1", s, s, 1, c1, c_)
        conv(f"{m}.cv2", s, s, 1, c1, c_)
        for i in range(n):
            conv(f"{m}.b{i}.cv1", s, s, 1, c_, c_)
            conv(f"{m}.b{i}.cv2", s, s, 3, c_, c_)
        conv(f"{m}.cv3", s, s, 1, 2 * c_, c2)

    r = resolution
    conv("m0", r, r // 2, 6, 3, ch[0])
    conv("m1", r // 2, r // 4, 3, ch[0], ch[1])
    c3("m2", r // 4, ch[1], ch[1], d[0])
    conv("m3", r // 4, r // 8, 3, ch[1], ch[2])
    c3("m4", r // 8, ch[2], ch[2], d[1])
    conv("m5", r // 8, r // 16, 3, ch[2], ch[3])
    c3("m6", r // 16, ch[3], ch[3], d[2])
    conv("m7", r // 16, r // 32, 3, ch[3], ch[4])
    c3("m8", r // 32, ch[4], ch[4], d[3])
    conv("m9.cv1", r // 32, r // 32, 1, ch[4], ch[4] // 2)
    conv("m9.cv2", r // 32, r // 32, 1, (ch[4] // 2) * 4, ch[4])
    conv("m10", r // 32, r // 32, 1, ch[4], ch[3])
    c3("m13", r // 16, ch[3] * 2, ch[3], hd)
    conv("m14", r // 16, r // 16, 1, ch[3], ch[2])
    c3("m17", r // 8, ch[2] * 2, ch[2], hd)
    conv("m24.0", r // 8, r // 8, 1, ch[2], no)
    conv("m18", r // 8, r // 16, 3, ch[2], ch[2])
    c3("m20", r // 16, ch[2] * 2, ch[3], hd)
    conv("m24.1", r // 16, r // 16, 1, ch[3], no)
    conv("m21", r // 16, r // 32, 3, ch[3], ch[3])
    c3("m23", r // 32, ch[3] * 2, ch[4], hd)
    conv("m24.2", r // 32, r // 32, 1, ch[4], no)
    return rows


def make_yolov5_forward(cfg: YoloV5Config, compute_dtype=jnp.bfloat16,
                        activation_dtype=None, head_dtype=None,
                        bn_mode: str = "fold",
                        return_stats: bool = False,
                        stage_range=None,
                        s2d_stem: bool = False,
                        scan_ladders: bool = False,
                        scan_remat: bool = False,
                        split_heads: bool = False):
    """Build ``forward(params, x) -> [p3, p4, p5]`` raw heads (NHWC).

    ``activation_dtype``: dtype of the materialized inter-layer
    activations (bias + SiLU included).  None = float32 (the parity
    default, matching torch fp32 modules); ``jnp.bfloat16`` halves every
    inter-layer HBM transfer — the serving fast path, same trade as
    ``make_forward(activation_dtype=...)`` on the darknet side.
    ``head_dtype``: dtype of the returned raw heads (None = float32).

    ``bn_mode``: "fold" consumes the inference ``{"w","b"}`` layout;
    "batch"/"running" consume the training layout ("batch1p" = batch
    stats via one-pass E[x²]−E[x]² — one fused read of each conv output
    instead of two; A/B lever, see the note in :func:`_conv`) (see
    ``init_yolov5_params(batch_norm=True)``) with batch-stats or
    running-stats BatchNorm.  With ``return_stats=True`` (training) the
    forward returns ``(heads, {name: (mean, var)})`` for the running-
    stat update in train/v5.py.

    ``stage_range=(lo, hi)``: pipeline-parallel stage mode over the
    :func:`_v5_steps` dataflow — run only steps ``[lo, hi)`` and return
    ``(heads_emitted, boundary)`` where the boundary maps value name ->
    activation for everything a later stage still reads.  The returned
    function's signature becomes ``forward(p, x, carry)``; step math is
    identical to the full forward (same table), so chained stages are
    bit-exact (tests/test_pipeline_parallel.py).  Serving path only
    (``return_stats`` unsupported).

    ``scan_ladders=True``: roll each C3's n identical bottleneck
    repeats into ``lax.scan`` over stacked weights (see :func:`_c3`) —
    ~linearly smaller HLO for the deep sizes (v5l 9-repeat, v5x
    12-repeat C3s), the same compile-robustness trade the darknet train
    step makes (PERFORMANCE.md round-3 drill-down).  ``scan_remat``
    additionally checkpoints the scan body (training memory lever).
    Numerics equal the unrolled forward up to XLA fusion ULPs
    (tests/test_yolov5.py::test_scan_ladders_*).

    ``split_heads=True``: each detect conv is run as three channel-
    sliced per-anchor convs, so every returned head is a TUPLE of three
    ``[B, H, W, 5+C]`` tensors (bit-identical values — tested).  Feed
    into :func:`decode_v5_topk_split`: with the 5+C row as the minor
    dim, the fused decode never pays the (anchors, 5+C) channel-split
    relayout (round-4 serving lever, PERFORMANCE.md).
    """
    assert bn_mode in ("fold", "batch", "batch1p", "running")
    odt = activation_dtype or jnp.float32
    hdt = head_dtype or jnp.float32
    steps = _v5_steps()
    if stage_range is not None:
        assert not return_stats, "stage mode is a serving path"
        lo_, hi_ = stage_range
        assert 0 <= lo_ < hi_ <= len(steps), stage_range
    # liveness: the last step index that reads each value
    last_read = {}
    for i, (_, reads, _, _) in enumerate(steps):
        for r in reads:
            last_read[r] = i

    def forward(p, x, carry=None):
        lo, hi = stage_range if stage_range is not None else (0, len(steps))
        stats = ({} if return_stats and bn_mode in ("batch", "batch1p")
                 else None)
        ctx = {"dt": compute_dtype, "odt": odt, "hdt": hdt,
               "bn": bn_mode, "stats": stats, "s2d": s2d_stem,
               "scan": scan_ladders, "scan_remat": scan_remat,
               "split_heads": split_heads}
        env = dict(carry) if carry else {}
        if lo == 0:
            env["in"] = x
        heads: List[jnp.ndarray] = []
        for i in range(lo, hi):
            name, reads, write, fn = steps[i]
            out = fn(p, ctx, *(env[r] for r in reads))
            if write is None:
                heads.append(out)
            else:
                env[write] = out
            for r in reads:  # free values no later step reads
                if last_read[r] == i:
                    del env[r]
        if stage_range is not None:
            boundary = {k: v for k, v in env.items()
                        if last_read.get(k, -1) >= hi}
            return heads, boundary
        return (heads, stats) if stats is not None else heads

    return forward


def decode_v5(heads: List[jnp.ndarray], num_classes: int,
              anchors=V5_ANCHORS, strides=V5_STRIDES) -> jnp.ndarray:
    """v5 decode: xy=(2σ-0.5+grid)·stride, wh=(2σ)²·anchor.

    Returns ``[B, N, 5+C]`` with sigmoided obj/cls, boxes in pixels.
    """
    parts = []
    for head, anc, stride in zip(heads, anchors, strides):
        b, h, w, _ = head.shape
        a = len(anc)
        c = 5 + num_classes
        p = jax.nn.sigmoid(head.reshape(b, h * w, a, c))
        cols = jnp.arange(w, dtype=head.dtype)
        rows = jnp.arange(h, dtype=head.dtype)
        gx, gy = jnp.meshgrid(cols, rows)
        offs = jnp.stack([gx, gy], -1).reshape(1, h * w, 1, 2)
        anc_a = jnp.asarray(anc, head.dtype).reshape(1, 1, a, 2)
        xy = (p[..., 0:2] * 2.0 - 0.5 + offs) * stride
        wh = jnp.square(p[..., 2:4] * 2.0) * anc_a
        out = jnp.concatenate([xy, wh, p[..., 4:]], -1)
        parts.append(out.reshape(b, h * w * a, c))
    return jnp.concatenate(parts, axis=1)


def decode_v5_topk(heads: List[jnp.ndarray], num_classes: int,
                   top_k: int, conf_thresh: float,
                   anchors=V5_ANCHORS, strides=V5_STRIDES,
                   approx: bool = False, per_head_gather: bool = False,
                   nhwc_select: bool = False):
    """Fused v5 selection: score every row by ultralytics confidence
    (``sigmoid(obj) * max(sigmoid(cls))`` — the max is taken on logits,
    sigmoid is monotonic) without materializing the [B, N, 5+C] decode,
    then decode only the top-k rows.  Rows failing the AutoShape gate
    (``obj > th and conf > th``) score -1 so they can never displace a
    real candidate.  Feed the result into ``nms_batch_v5(top_k=K)`` —
    survivors identical to the full decode_v5 path (tested).

    Round-3 drill-down levers (profiled at bs=512/640², see
    PERFORMANCE.md):

    * ``per_head_gather=True`` skips the [B, N, 5+C] raw-head concat
      (10 ms of pad fusions at bs=512) — only the [B, N] score vector is
      concatenated, and the winning rows are gathered per head with a
      range select.  Bit-identical outputs (tested).
    * ``approx=True`` replaces the sort-based ``lax.top_k`` (13.7 ms on
      [512, 25200]) with the TPU-native ``lax.approx_max_k`` PartialReduce
      (recall ≥ 0.95 of true top-k among >threshold rows).  Opt-in for
      serving; parity paths keep the exact sort.
    * ``nhwc_select=True`` (round 4) scores AND gathers straight off the
      conv-layout heads: the ``[B, N, 5+C]`` flatten is never
      materialized (at bs=512 that flatten is a full-candidate-tensor
      relayout — 11.9 ms of reshape+copy for the 80² head alone in the
      round-4 drill-down) and the winning rows are fetched with one
      multi-dim gather per head from ``[B, H, W, a, 5+C]`` views.
      Bit-identical outputs (tested); selection semantics unchanged.
    """
    b = heads[0].shape[0]
    c = 5 + num_classes

    raw_parts, score_parts = [], []
    gxs, gys, aws, ahs, sts = [], [], [], [], []
    for head, anc, stride in zip(heads, anchors, strides):
        _, h, w, _ = head.shape
        a = len(anc)
        if nhwc_select:
            # minor-dim split only — same bytes, no relayout; row order
            # (h, w, a) matches the flat reshape below exactly
            p = head.reshape(b, h, w, a, c)
            flat = (b, h * w * a)
        else:
            p = head.reshape(b, h * w * a, c)
            flat = None
        raw_parts.append(p)
        obj = jax.nn.sigmoid(p[..., 4].astype(jnp.float32))
        cls_best = jax.nn.sigmoid(
            jnp.max(p[..., 5:].astype(jnp.float32), axis=-1))
        conf = obj * cls_best
        valid = (obj > conf_thresh) & (conf > conf_thresh)
        score = jnp.where(valid, conf, -1.0)
        score_parts.append(score.reshape(flat) if flat else score)
        gx, gy = np.meshgrid(np.arange(w), np.arange(h))
        gxs.append(np.repeat(gx.reshape(-1), a))
        gys.append(np.repeat(gy.reshape(-1), a))
        anc_np = np.asarray(anc, np.float32)
        aws.append(np.tile(anc_np[:, 0], h * w))
        ahs.append(np.tile(anc_np[:, 1], h * w))
        sts.append(np.full(h * w * a, float(stride), np.float32))

    n = sum(s.shape[1] for s in score_parts)
    scores = jnp.concatenate(score_parts, axis=1)
    consts = jnp.asarray(np.stack(
        [np.concatenate(gxs).astype(np.float32),
         np.concatenate(gys).astype(np.float32),
         np.concatenate(aws), np.concatenate(ahs),
         np.concatenate(sts)], axis=1))

    k = min(top_k, n)
    if approx:
        _, idx = jax.lax.approx_max_k(scores, k)
    else:
        _, idx = jax.lax.top_k(scores, k)
    if nhwc_select:
        rows = jnp.zeros((b, k, c), jnp.float32)
        off = 0
        bidx = jnp.arange(b)[:, None]
        for part in raw_parts:
            _, h, w, a, _ = part.shape
            nh = h * w * a
            local = jnp.clip(idx - off, 0, nh - 1)
            hw, ai = local // a, local % a
            r = part[bidx, hw // w, hw % w, ai]  # one gather, k rows
            sel = (idx >= off) & (idx < off + nh)
            rows = jnp.where(sel[..., None], r.astype(jnp.float32), rows)
            off += nh
    elif per_head_gather:
        rows = jnp.zeros((b, k, c), jnp.float32)
        off = 0
        for part in raw_parts:
            nh = part.shape[1]
            local = jnp.clip(idx - off, 0, nh - 1)
            r = jnp.take_along_axis(part, local[..., None], axis=1)
            sel = (idx >= off) & (idx < off + nh)
            rows = jnp.where(sel[..., None], r.astype(jnp.float32), rows)
            off += nh
    else:
        raw = jnp.concatenate(raw_parts, axis=1)
        rows = jnp.take_along_axis(raw, idx[..., None], axis=1) \
            .astype(jnp.float32)
    cst = consts[idx]
    p = jax.nn.sigmoid(rows)
    xy = (p[..., 0:2] * 2.0 - 0.5 + cst[..., 0:2]) * cst[..., 4:5]
    wh = jnp.square(p[..., 2:4] * 2.0) * cst[..., 2:4]
    return jnp.concatenate([xy, wh, p[..., 4:]], axis=-1)


def decode_v5_topk_compact(heads: List[jnp.ndarray], num_classes: int,
                           top_k: int, conf_thresh: float,
                           anchors=V5_ANCHORS, strides=V5_STRIDES,
                           approx: bool = False):
    """Round-4 serving decode: fully decode every candidate IN THE CONV
    LAYOUT, then gather 7-column compact rows — the wide gather is gone.

    The round-4 bs=512 drill-down showed the fused-decode tail costing
    ~61 ms device: flattening [B, H, W, a·(5+C)] to [B, N, 5+C] and
    gathering 85-column rows both force full-candidate-tensor relayout
    copies (XLA retiles so the 85-element minor dim is contiguous).  But
    ultralytics NMS (ops/nms.nms_image_v5) only consumes box, obj and
    the best class — so this path computes xywh / obj / best-class
    score+id for ALL candidates as one elementwise pass over the heads
    in their native layout (reads each head once — the same bytes the
    score pass already had to read) and gathers [B, K, 7] compact rows:
    ``cx, cy, w, h, obj, cls_best, cls_id``.

    Feed into ``nms_batch_v5(..., compact=True)``.  Survivors, order and
    values are bit-identical to ``decode_v5_topk`` + plain
    ``nms_batch_v5`` (tested): sigmoid is monotone, so best-class value,
    argmax tie-breaks, scores and the top-k selection all agree exactly.
    """
    b = heads[0].shape[0]
    c = 5 + num_classes
    score_parts, compact_parts = [], []
    for head, anc, stride in zip(heads, anchors, strides):
        _, h, w, _ = head.shape
        a = len(anc)
        v = head.reshape(b, h, w, a, c)  # minor split, no data move
        p = jax.nn.sigmoid(v.astype(jnp.float32))
        obj = p[..., 4]
        cls_best = jnp.max(p[..., 5:], axis=-1)
        cls_id = jnp.argmax(p[..., 5:], axis=-1)
        conf = obj * cls_best
        valid = (obj > conf_thresh) & (conf > conf_thresh)
        score = jnp.where(valid, conf, -1.0)
        # grid / anchor constants, broadcast over [b, h, w, a]
        gx = np.broadcast_to(np.arange(w, dtype=np.float32)
                             [None, :, None], (h, w, a))
        gy = np.broadcast_to(np.arange(h, dtype=np.float32)
                             [:, None, None], (h, w, a))
        anc_np = np.asarray(anc, np.float32)
        aw = np.broadcast_to(anc_np[None, None, :, 0], (h, w, a))
        ah = np.broadcast_to(anc_np[None, None, :, 1], (h, w, a))
        g = jnp.asarray(np.stack([gx, gy], -1))
        awh = jnp.asarray(np.stack([aw, ah], -1))
        xy = (p[..., 0:2] * 2.0 - 0.5 + g) * float(stride)
        wh = jnp.square(p[..., 2:4] * 2.0) * awh
        compact = jnp.concatenate(
            [xy, wh, obj[..., None], cls_best[..., None],
             cls_id.astype(jnp.float32)[..., None]], axis=-1)
        compact_parts.append(compact.reshape(b, h * w * a, 7))
        score_parts.append(score.reshape(b, h * w * a))

    n = sum(s.shape[1] for s in score_parts)
    scores = jnp.concatenate(score_parts, axis=1)
    k = min(top_k, n)
    if approx:
        _, idx = jax.lax.approx_max_k(scores, k)
    else:
        _, idx = jax.lax.top_k(scores, k)
    rows = jnp.zeros((b, k, 7), jnp.float32)
    off = 0
    for part in compact_parts:
        nh = part.shape[1]
        local = jnp.clip(idx - off, 0, nh - 1)
        r = jnp.take_along_axis(part, local[..., None], axis=1)
        sel = (idx >= off) & (idx < off + nh)
        rows = jnp.where(sel[..., None], r, rows)
        off += nh
    return rows


def decode_v5_topk_split(heads, num_classes: int, top_k: int,
                         conf_thresh: float, anchors=V5_ANCHORS,
                         strides=V5_STRIDES, approx: bool = False):
    """Fused v5 selection over SPLIT heads (round-4 serving decode).

    ``heads``: ``make_yolov5_forward(split_heads=True)`` output — per
    scale a tuple of three per-anchor ``[B, H, W, 5+C]`` tensors whose
    minor dim is already the candidate row.  Scoring, box decode and
    the class reduction all run elementwise in the convs' native layout
    (no (anchors, 5+C) channel split, so none of the full-candidate
    relayout copies the single-head decode pays — 23 ms of data
    formatting at bs=512 in the round-4 drill-down), and the top-k
    winners are fetched as 7-column compact rows with nine tiny
    per-(scale, anchor) gathers.

    Returns ``[B, K, 7]`` rows ``cx, cy, w, h, obj, cls_best, cls_id``
    for ``nms_batch_v5(..., compact=True)``.  Survivors, order and
    values are bit-identical to the ``decode_v5_topk`` +
    ``nms_batch_v5`` pair (tested): candidate order is the same
    ``(h, w, anchor)`` flattening, sigmoid monotonicity keeps scores,
    argmax tie-breaks and top-k selection exactly aligned.
    """
    b = heads[0][0].shape[0]
    score_parts, scale_meta = [], []
    for head3, anc, stride in zip(heads, anchors, strides):
        _, h, w, _ = head3[0].shape
        a = len(anc)
        gx = np.broadcast_to(np.arange(w, dtype=np.float32)[None, :],
                             (h, w))
        gy = np.broadcast_to(np.arange(h, dtype=np.float32)[:, None],
                             (h, w))
        g = jnp.asarray(np.stack([gx, gy], -1))  # [h, w, 2]
        anchor_scores, anchor_compact = [], []
        for ai, hm in enumerate(head3):
            p = jax.nn.sigmoid(hm.astype(jnp.float32))  # [b, h, w, 5+C]
            obj = p[..., 4]
            cls_best = jnp.max(p[..., 5:], axis=-1)
            cls_id = jnp.argmax(p[..., 5:], axis=-1)
            conf = obj * cls_best
            valid = (obj > conf_thresh) & (conf > conf_thresh)
            score = jnp.where(valid, conf, -1.0)
            xy = (p[..., 0:2] * 2.0 - 0.5 + g) * float(stride)
            wh = jnp.square(p[..., 2:4] * 2.0) * \
                jnp.asarray(anc[ai], jnp.float32)
            compact = jnp.concatenate(
                [xy, wh, obj[..., None], cls_best[..., None],
                 cls_id.astype(jnp.float32)[..., None]], axis=-1)
            anchor_scores.append(score.reshape(b, h * w))
            anchor_compact.append(compact.reshape(b, h * w, 7))
        # interleave anchors minor: flat order (h, w, anchor), matching
        # head.reshape(b, h*w*a, 5+C) in the single-head paths
        score_parts.append(
            jnp.stack(anchor_scores, -1).reshape(b, h * w * a))
        scale_meta.append((h * w, a, anchor_compact))

    n = sum(s.shape[1] for s in score_parts)
    scores = jnp.concatenate(score_parts, axis=1)
    k = min(top_k, n)
    if approx:
        _, idx = jax.lax.approx_max_k(scores, k)
    else:
        _, idx = jax.lax.top_k(scores, k)
    rows = jnp.zeros((b, k, 7), jnp.float32)
    off = 0
    for hw, a, anchor_compact in scale_meta:
        nh = hw * a
        local = jnp.clip(idx - off, 0, nh - 1)
        hw_idx, ai_idx = local // a, local % a
        in_scale = (idx >= off) & (idx < off + nh)
        for ai, part in enumerate(anchor_compact):
            r = jnp.take_along_axis(part, hw_idx[..., None], axis=1)
            sel = in_scale & (ai_idx == ai)
            rows = jnp.where(sel[..., None], r, rows)
        off += nh
    return rows


# ---------------------------------------------------------------------------
# ultralytics checkpoint conversion (offline dev path)
# ---------------------------------------------------------------------------

def _fold_conv_bn(sd, prefix: str) -> Dict[str, np.ndarray]:
    """ultralytics Conv(conv+bn) -> folded HWIO kernel + bias."""
    def g(name):
        v = sd[prefix + name]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v, np.float32)

    w = g(".conv.weight").transpose(2, 3, 1, 0)  # OIHW -> HWIO
    if prefix + ".bn.weight" in sd:
        gamma, beta = g(".bn.weight"), g(".bn.bias")
        mean, var = g(".bn.running_mean"), g(".bn.running_var")
        scale = gamma / np.sqrt(var + BN_EPS_V5)
        return {"w": (w * scale[None, None, None, :]).astype(np.float32),
                "b": (beta - mean * scale).astype(np.float32)}
    b = g(".conv.bias") if prefix + ".conv.bias" in sd \
        else np.zeros(w.shape[-1], np.float32)
    return {"w": np.ascontiguousarray(w), "b": b}


def _detect_conv(sd, prefix: str) -> Dict[str, np.ndarray]:
    def g(name):
        v = sd[prefix + name]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v, np.float32)
    return {"w": np.ascontiguousarray(g(".weight").transpose(2, 3, 1, 0)),
            "b": g(".bias")}


def load_v5_checkpoint(cfg: YoloV5Config, path: str) -> Dict:
    """Load a YOLOv5 checkpoint: .npz (converted) or torch .pt
    (raw state_dict or an ultralytics container).  Rejects Darknet
    ``.weights`` binaries with a clear error."""
    if path.endswith(".weights"):
        raise ValueError(
            f"{path!r} is a Darknet .weights binary — YOLOv5 uses "
            "ultralytics checkpoints; convert with 'rodtpu convert' or "
            "pass an .npz/.pt file")
    if path.endswith(".npz"):
        return _unflatten(dict(np.load(path)))
    import torch  # offline dev dependency
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    elif isinstance(obj, dict) and "model" in obj \
            and hasattr(obj["model"], "state_dict"):
        obj = obj["model"].state_dict()
    return params_from_ultralytics(cfg, obj)


def params_from_ultralytics(cfg: YoloV5Config, state_dict) -> Dict:
    """Map an ultralytics yolov5 ``model.state_dict()`` into our pytree.

    Keys follow ``model.<idx>.<module>`` (e.g. ``model.2.cv1.conv.weight``,
    detect head ``model.24.m.<scale>.weight``).  BN is folded at load.
    """
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("model.model."):
            k = k[len("model."):]
        sd[k] = v

    def conv(i):
        return _fold_conv_bn(sd, f"model.{i}")

    def c3(i, n):
        out = {"cv1": _fold_conv_bn(sd, f"model.{i}.cv1"),
               "cv2": _fold_conv_bn(sd, f"model.{i}.cv2"),
               "cv3": _fold_conv_bn(sd, f"model.{i}.cv3"),
               "m": []}
        for j in range(n):
            out["m"].append({
                "cv1": _fold_conv_bn(sd, f"model.{i}.m.{j}.cv1"),
                "cv2": _fold_conv_bn(sd, f"model.{i}.m.{j}.cv2")})
        return out

    d, hd = cfg.depths, cfg.head_depth
    p = {
        "m0": conv(0), "m1": conv(1), "m2": c3(2, d[0]), "m3": conv(3),
        "m4": c3(4, d[1]), "m5": conv(5), "m6": c3(6, d[2]),
        "m7": conv(7), "m8": c3(8, d[3]),
        "m9": {"cv1": _fold_conv_bn(sd, "model.9.cv1"),
               "cv2": _fold_conv_bn(sd, "model.9.cv2")},
        "m10": conv(10), "m13": c3(13, hd), "m14": conv(14),
        "m17": c3(17, hd), "m18": conv(18), "m20": c3(20, hd),
        "m21": conv(21), "m23": c3(23, hd),
        "m24": {str(s): _detect_conv(sd, f"model.24.m.{s}")
                for s in range(3)},
    }
    return p


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict:
    """'m0/w'-style flat npz -> nested pytree (lists for C3 'm' stacks)."""
    tree: Dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def fix_m(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k == "m" and isinstance(v, dict) \
                        and all(s.isdigit() for s in v):
                    out[k] = [fix_m(v[str(i)]) for i in range(len(v))]
                else:
                    out[k] = fix_m(v)
            return out
        return node

    return fix_m(tree)
