#!/usr/bin/env python
"""Interleaved A/B of the v5 decode/top-k levers on the real TPU.

Variants share one process and alternate windows (best-of-N interleaved,
the PERFORMANCE.md protocol for the ±15% tunnel variance):
  base      — decode_v5_topk(exact sort, raw concat)  [round-2b shipping]
  perhead   — per_head_gather=True (no [B,N,85] concat)
  approx    — approx_max_k instead of sort
  both      — per_head_gather + approx                [round-3 shipping]
  nhwc      — nhwc_select=True (conv-layout score+gather, round 4)
  shipn     — nhwc + approx                           [round-4 candidate]

Usage: python scripts/ab_v5_decode.py [--size s --bs 512 --rounds 3]
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
    fwd = make_yolov5_forward(cfg, compute_dtype=jnp.bfloat16,
                              activation_dtype=jnp.bfloat16,
                              head_dtype=jnp.bfloat16)

    def make(approx, per_head, nhwc=False):
        def detect(p, x):
            x = x.astype(jnp.float32) / 255.0
            heads = fwd(p, x)
            pred = decode_v5_topk(heads, 80, 512, 0.25, approx=approx,
                                  per_head_gather=per_head,
                                  nhwc_select=nhwc)
            return nms_batch_v5(pred, 80, 0.25, 0.45, top_k=512,
                                max_det=300)
        return jax.jit(detect)

    variants = {
        "base": make(False, False),
        "perhead": make(False, True),
        "approx": make(True, False),
        "both": make(True, True),
        # round 4: conv-layout score+gather (no [B,N,85] relayout)
        "nhwc": make(False, False, nhwc=True),
        "shipn": make(True, False, nhwc=True),
    }
    rng = np.random.RandomState(0)
    x = jax.device_put(jnp.asarray(
        rng.randint(0, 256, (args.bs, args.reso, args.reso, 3), np.uint8)))

    for name, f in variants.items():
        t0 = time.time()
        np.asarray(f(params, x)[0])
        print(f"{name}: compile+first {time.time() - t0:.1f}s", flush=True)

    best = {k: 1e9 for k in variants}
    for r in range(args.rounds):
        for name, f in variants.items():
            for _ in range(args.iters):
                t0 = time.time()
                np.asarray(f(params, x)[0])
                best[name] = min(best[name], time.time() - t0)
    for name, t in best.items():
        print(f"yolov5{args.size} bs={args.bs} {name}: "
              f"{t * 1000:.1f} ms/batch = {args.bs / t:.0f} fps", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
