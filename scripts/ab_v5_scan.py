#!/usr/bin/env python
"""Interleaved A/B of scan-rolled C3 ladders on the v5 SERVING path.

``make_yolov5_forward(scan_ladders=True)`` rolls each C3's bottleneck
repeats into ``lax.scan`` over stacked weights (models/yolov5._c3) —
~depth-times smaller HLO for the deep sizes.  The training-side A/B
(scripts/ab_v5_train.py) measured a wash at v5s; this harness measures
the serving fast path (fold layout, fused decode, pipelined dispatch)
where the scan's per-step weight re-stacking competes with the smaller
program.  Also prints per-variant compile time — the actual payoff for
v5l/x.

Usage: python scripts/ab_v5_scan.py [--size l --bs 64 --rounds 3]
"""
import argparse
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="l")
    ap.add_argument("--bs", type=int, default=64)
    ap.add_argument("--reso", type=int, default=640)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--depth", type=int, default=3)
    args = ap.parse_args()

    import jax
    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    from realtimeobjectdetection_tpu.models.yolov5 import (
        decode_v5_topk, init_yolov5_params, make_yolov5_forward,
        yolov5_config)
    from realtimeobjectdetection_tpu.ops.nms import nms_batch_v5

    cfg = yolov5_config(args.size)
    params = jax.device_put(init_yolov5_params(cfg, seed=0))

    def make(scan):
        fwd = make_yolov5_forward(cfg, compute_dtype=jnp.bfloat16,
                                  activation_dtype=jnp.bfloat16,
                                  head_dtype=jnp.bfloat16,
                                  scan_ladders=scan)

        def detect(p, x):
            x = x.astype(jnp.float32) / 255.0
            heads = fwd(p, x)
            pred = decode_v5_topk(heads, 80, 512, 0.25, approx=True,
                                  per_head_gather=True)
            return nms_batch_v5(pred, 80, 0.25, 0.45, top_k=512,
                                max_det=300)
        return jax.jit(detect)

    variants = {"unrolled": make(False), "scan": make(True)}
    rng = np.random.RandomState(0)
    x = jax.device_put(jnp.asarray(
        rng.randint(0, 256, (args.bs, args.reso, args.reso, 3), np.uint8)))

    for name, f in variants.items():
        t0 = time.time()
        np.asarray(f(params, x)[0])
        print(f"{name}: compile+first {time.time() - t0:.1f}s", flush=True)

    best = {k: 1e9 for k in variants}
    d = max(1, args.depth)
    for r in range(args.rounds):
        for name, f in variants.items():
            for _ in range(args.iters):
                t0 = time.time()
                inflight = [f(params, x) for _ in range(d)]
                n = 0
                for _ in range(d * 2):
                    np.asarray(inflight.pop(0)[0])
                    n += 1
                    inflight.append(f(params, x))
                for rres in inflight:
                    np.asarray(rres[0])
                    n += 1
                best[name] = min(best[name], (time.time() - t0) / n)
    for name, t in best.items():
        print(f"yolov5{args.size} bs={args.bs} pipe{d} {name}: "
              f"{t * 1000:.1f} ms/batch = {args.bs / t:.0f} fps", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
