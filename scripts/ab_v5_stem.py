#!/usr/bin/env python
"""Interleaved A/B of the v5 space-to-depth stem rewrite on the real TPU.

``make_yolov5_forward(s2d_stem=True)`` re-expresses the 6x6/2 stem conv
as a 3x3/1 conv over the 2x2 space-to-depth input (exact identity, see
models/yolov5._stem_s2d): input channels 3 -> 12, a 4x better fit for
the MXU's input tiling.  The round-3 per-HLO drill-down put the stem at
8.6 ms/batch (bs=512) against a ~4.8 ms read+write floor, so the
available win is ~2% end-to-end — this harness measures whether XLA
actually banks it.

Variants share one process and alternate windows (best-of-N interleaved,
the PERFORMANCE.md protocol for the ±15% tunnel variance):
  base — round-3 shipping fast path (fused decode, approx, per-head)
  s2d  — same + s2d_stem=True

Usage: python scripts/ab_v5_stem.py [--size s --bs 512 --rounds 3]
"""
import argparse
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="s")
    ap.add_argument("--bs", type=int, default=512)
    ap.add_argument("--reso", type=int, default=640)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--depth", type=int, default=3,
                    help="batches in flight; serial (1) windows are "
                         "tunnel-RPC-dominated and bury few-ms device "
                         "deltas, so default to the pipelined steady "
                         "state the canonical numbers use")
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

    def make(s2d):
        fwd = make_yolov5_forward(cfg, compute_dtype=jnp.bfloat16,
                                  activation_dtype=jnp.bfloat16,
                                  head_dtype=jnp.bfloat16, s2d_stem=s2d)

        def detect(p, x):
            x = x.astype(jnp.float32) / 255.0
            heads = fwd(p, x)
            pred = decode_v5_topk(heads, 80, 512, 0.25, approx=True,
                                  per_head_gather=True)
            return nms_batch_v5(pred, 80, 0.25, 0.45, top_k=512,
                                max_det=300)
        return jax.jit(detect)

    variants = {"base": make(False), "s2d": make(True)}
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
