#!/usr/bin/env python
"""Interleaved A/B of approx_max_k candidate selection on the yolov3
serving fast path (ops/decode.decode_topk(approx=True)).

The v3 drill-down puts decode_topk at ~9.7 ms of the 130.8 ms device
time at bs=256 (PERFORMANCE.md); the sort-based ``lax.top_k`` over
[256, 10647] logits is part of that.  The v5 path banked +4-5% from the
same swap (PartialReduce instead of a full sort) — this measures the v3
side.  Results-changing (recall >= 0.95 of the exact top-k,
tests/test_forward_parity.py gate), so the flag stays opt-in
(`bench.py --approx_topk`, serving via DetectionService) unless the win
justifies a documented default flip.

Variants share one process and alternate windows (best-of-N interleaved,
the PERFORMANCE.md protocol for the ±15% tunnel variance).

Usage: python scripts/ab_v3_approx.py [--bs 256 --reso 416 --rounds 3]
"""
import argparse
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="yolov3")
    ap.add_argument("--bs", type=int, default=256)
    ap.add_argument("--reso", type=int, default=416)
    ap.add_argument("--top_k", type=int, default=512)
    ap.add_argument("--conf", type=float, default=0.6)
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
    from realtimeobjectdetection_tpu.model import fold_batchnorm, make_forward
    from realtimeobjectdetection_tpu.models import get_spec
    from realtimeobjectdetection_tpu.ops.decode import decode_topk
    from realtimeobjectdetection_tpu.ops.nms import nms_batch
    from realtimeobjectdetection_tpu.testing import bench_params

    spec = get_spec(args.model, width=args.reso, height=args.reso)
    fparams = jax.device_put(fold_batchnorm(spec, bench_params(spec,
                                                               args.model)))
    fwd = make_forward(spec, bn_mode="fold", compute_dtype=jnp.bfloat16,
                       scan_ladders=True, activation_dtype=jnp.bfloat16,
                       head_dtype=jnp.bfloat16)

    def make(approx):
        def detect(p, x):
            x = x.astype(jnp.float32) / 255.0
            heads = fwd(p, x)
            pred, n_cand = decode_topk(heads, spec, args.reso, args.top_k,
                                       confidence=args.conf, approx=approx)
            boxes, valid = nms_batch(pred, spec.num_classes, args.conf,
                                     0.5, top_k=args.top_k)
            return boxes, valid, n_cand
        return jax.jit(detect)

    variants = {"exact": make(False), "approx": make(True)}
    rng = np.random.RandomState(0)
    x = jax.device_put(jnp.asarray(
        rng.randint(0, 256, (args.bs, args.reso, args.reso, 3), np.uint8)))

    for name, f in variants.items():
        t0 = time.time()
        np.asarray(f(fparams, x)[0])
        print(f"{name}: compile+first {time.time() - t0:.1f}s", flush=True)

    best = {k: 1e9 for k in variants}
    d = max(1, args.depth)
    for r in range(args.rounds):
        for name, f in variants.items():
            for _ in range(args.iters):
                t0 = time.time()
                inflight = [f(fparams, x) for _ in range(d)]
                n = 0
                for _ in range(d * 2):
                    np.asarray(inflight.pop(0)[0])
                    n += 1
                    inflight.append(f(fparams, x))
                for rres in inflight:
                    np.asarray(rres[0])
                    n += 1
                best[name] = min(best[name], (time.time() - t0) / n)
    for name, t in best.items():
        print(f"{args.model} bs={args.bs} reso={args.reso} pipe{d} {name}: "
              f"{t * 1000:.1f} ms/batch = {args.bs / t:.0f} fps", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
