#!/usr/bin/env python
"""Interleaved A/B of the v5 train-step levers on the real TPU.

Variants (one process, alternating windows):
  fp32          — round-2b shipping step (fp32 MXU compute)
  bf16          — compute_dtype=bfloat16 (fp32 master weights unchanged)
  bf16+recipe   — bf16 + in-graph mosaic + flip/HSV (full recipe cost)
  bf16+act      — bf16 compute + bf16 activation residency (round 3)
  bf16+act+scan — + scan-rolled C3 ladders (compile-robustness trade)

Usage: python scripts/ab_v5_train.py [--size s --bs 16 --reso 640]
"""
import argparse
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="s")
    ap.add_argument("--bs", type=int, default=16)
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
    import optax
    from realtimeobjectdetection_tpu.models.yolov5 import (
        init_yolov5_params, yolov5_config)
    from realtimeobjectdetection_tpu.train.step import init_train_state
    from realtimeobjectdetection_tpu.train.v5 import make_train_step_v5

    cfg = yolov5_config(args.size)
    opt = optax.adam(1e-3)
    params = init_yolov5_params(cfg, seed=0, batch_norm=True)

    def make(dtype, mosaic, augment, adt=None, scan=False):
        step = make_train_step_v5(cfg, opt, resolution=args.reso,
                                  compute_dtype=dtype, mosaic=mosaic,
                                  augment=augment, activation_dtype=adt,
                                  scan_ladders=scan, scan_remat=scan)
        return jax.jit(step)

    variants = {
        "fp32": make(jnp.float32, False, False),
        "bf16": make(jnp.bfloat16, False, False),
        "bf16+recipe": make(jnp.bfloat16, True, True),
        "bf16+act": make(jnp.bfloat16, False, False, adt=jnp.bfloat16),
        "bf16+act+scan": make(jnp.bfloat16, False, False,
                              adt=jnp.bfloat16, scan=True),
    }
    state = jax.device_put(init_train_state(params, opt))
    rng = np.random.RandomState(0)
    bs, reso, m = args.bs, args.reso, 32
    images = jax.device_put(jnp.asarray(
        rng.rand(bs, reso, reso, 3), jnp.float32))
    boxes = np.zeros((bs, m, 85), np.float32)
    boxes[:, :8, 0:2] = rng.uniform(0.2 * reso, 0.8 * reso, (bs, 8, 2))
    boxes[:, :8, 2:4] = rng.uniform(0.05 * reso, 0.3 * reso, (bs, 8, 2))
    boxes[:, :8, 4] = 1.0
    boxes[:, :8, 5] = 1.0
    mask = np.zeros((bs, m), bool)
    mask[:, :8] = True
    boxes = jax.device_put(jnp.asarray(boxes))
    mask = jax.device_put(jnp.asarray(mask))

    def sync(s2, loss):
        # host readback = the only true sync on axon.  Read BOTH the
        # loss and an updated param leaf: the loss is computed
        # mid-program, so it alone could surface before the Adam tail.
        float(loss)
        float(jax.tree_util.tree_leaves(s2.params)[0].ravel()[0])

    for name, f in variants.items():
        t0 = time.time()
        s2, loss = f(state, images, boxes, mask)
        sync(s2, loss)
        print(f"{name}: compile+first {time.time() - t0:.1f}s "
              f"loss={float(loss):.2f}", flush=True)

    best = {k: 1e9 for k in variants}
    for r in range(args.rounds):
        for name, f in variants.items():
            for _ in range(args.iters):
                t0 = time.time()
                sync(*f(state, images, boxes, mask))
                best[name] = min(best[name], time.time() - t0)
    for name, t in best.items():
        print(f"yolov5{args.size} {args.reso}² bs={bs} train {name}: "
              f"{t * 1000:.1f} ms/step = {bs / t:.0f} img/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
