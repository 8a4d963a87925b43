#!/usr/bin/env python
"""Repeatable YOLOv5 serving benchmark on the real TPU.

The judged bench (bench.py at the repo root) is the yolov3 flagship;
this harness reproduces the canonical v5 table in PERFORMANCE.md so
future rounds re-measure with a pinned program instead of scratch
scripts.  Pinned program = uint8 upload -> /255 -> forward -> decode
(fused decode_v5_topk or full decode_v5) -> nms_batch_v5(max_det=300)
at 640², conf 0.25, best-of-N windows with host readback (the axon
``block_until_ready`` is not a true sync).

Usage: python scripts/bench_v5.py [--configs s:512:fast,l:64:fast,...]
Each config is ``size:batch:mode`` with mode ``fast`` (bf16 residency +
fused decode + bf16 heads — the DetectionServiceV5 default) or ``full``
(fp32 residency + full decode — the AutoShape-parity program).
"""
import argparse
import sys
import time


def _enable_compile_cache():
    try:
        import jax
        if jax.default_backend() == "tpu":
            jax.config.update("jax_compilation_cache_dir",
                              "/root/.cache/jax")
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
    except Exception:
        pass


def run(size: str, bs: int, fast: bool, reso: int = 640, iters: int = 5,
        depth: int = 1):
    """``depth`` > 1 keeps that many batches in flight (dispatch batch
    i+1 before reading back batch i) — hides the ~2x57 ms tunnel RPC
    per dispatch that dominates the serial numbers at large bs, and is
    how DetectionServiceV5's queue actually drives the device."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from realtimeobjectdetection_tpu.models.yolov5 import (
        decode_v5, decode_v5_topk, init_yolov5_params, make_yolov5_forward,
        yolov5_config)
    from realtimeobjectdetection_tpu.ops.nms import nms_batch_v5

    cfg = yolov5_config(size)
    params = jax.device_put(init_yolov5_params(cfg, seed=0))
    fwd = make_yolov5_forward(
        cfg, compute_dtype=jnp.bfloat16,
        activation_dtype=jnp.bfloat16 if fast else None,
        head_dtype=jnp.bfloat16 if fast else None)

    def detect(p, x):
        x = x.astype(jnp.float32) / 255.0
        heads = fwd(p, x)
        if fast:
            pred = decode_v5_topk(heads, 80, 512, 0.25,
                                  approx=True, per_head_gather=True)
            return nms_batch_v5(pred, 80, 0.25, 0.45, top_k=512,
                                max_det=300)
        pred = decode_v5([h.astype(jnp.float32) for h in heads], 80)
        return nms_batch_v5(pred, 80, 0.25, 0.45, max_det=300)

    f = jax.jit(detect)
    rng = np.random.RandomState(0)
    x = jax.device_put(jnp.asarray(
        rng.randint(0, 256, (bs, reso, reso, 3), np.uint8)))
    t0 = time.time()
    r = f(params, x)
    np.asarray(r[0])
    comp = time.time() - t0
    best = 1e9
    if depth > 1:
        # steady-state pipelined rate over iters*depth batches
        for _ in range(iters):
            t0 = time.time()
            inflight = [f(params, x) for _ in range(depth)]
            n_done = 0
            for _ in range(depth * 3):
                np.asarray(inflight.pop(0)[0])
                n_done += 1
                inflight.append(f(params, x))
            for r in inflight:
                np.asarray(r[0])
                n_done += 1
            best = min(best, (time.time() - t0) / n_done)
    else:
        for _ in range(iters):
            t0 = time.time()
            r = f(params, x)
            np.asarray(r[0])
            best = min(best, time.time() - t0)
    mode = ("fast" if fast else "full") + \
        (f"+pipe{depth}" if depth > 1 else "")
    # MFU vs the same 197 bf16-TFLOPS v5e peak as bench.py (VERDICT r2
    # next-1: the v5 surface gets the v3 path's accounting standard)
    from realtimeobjectdetection_tpu.utils.profiling import conv_flops_v5
    gflop = conv_flops_v5(cfg, reso) / 1e9
    fps = bs / best
    mfu = fps * gflop / 1e3 / 197.0 * 100.0
    print(f"yolov5{size} bs={bs} {mode}: {best * 1000:.1f} ms/batch = "
          f"{fps:.0f} fps, {fps * gflop / 1e3:.1f} TFLOP/s = {mfu:.1f}% "
          f"MFU ({gflop:.1f} GFLOP/img) (compile {comp:.0f}s)", flush=True)
    return {"size": size, "bs": bs, "mode": mode, "fps": fps, "mfu": mfu}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs",
                    default="s:64:full,s:512:fast,l:32:full,l:64:fast")
    ap.add_argument("--reso", type=int, default=640)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--depth", type=int, default=1,
                    help="batches kept in flight (2 = hide the tunnel "
                         "RPC, the serving-queue steady state)")
    args = ap.parse_args()
    _enable_compile_cache()
    for spec in args.configs.split(","):
        size, bs, mode = spec.split(":")
        try:
            run(size, int(bs), mode == "fast", args.reso, args.iters,
                depth=args.depth)
        except Exception as e:
            print(f"{spec} FAILED: {e}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
