#!/usr/bin/env python
"""Interleaved A/B of the serving micro-batcher's in-flight depth
(DetectionService(pipeline_depth=...), pipeline/server.py _batch_loop).

The raw-dispatch benches proved depth-2 pipelining is worth +55-69%
under load (PERFORMANCE.md "pipeline depth"); this measures the SAME
lever where it actually ships — the micro-batcher thread behind
POST /detect.  Load is injected at the batcher boundary (the service
queue, pre-letterboxed canvases) so the 1-core host's per-image cv2
letterbox does not masquerade as device time; the HTTP layer is not in
the loop for the same reason.

Variants share one service and alternate windows (best-of-N
interleaved, the PERFORMANCE.md protocol for the ±15% tunnel variance);
``pipeline_depth`` is read by the batch loop per iteration, so flipping
the attribute between windows is race-free.

Usage: python scripts/ab_serve_depth.py [--bs 256 --batches 6 --rounds 3]
"""
import argparse
import queue
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="yolov3")
    ap.add_argument("--bs", type=int, default=256)
    ap.add_argument("--reso", type=int, default=416)
    ap.add_argument("--top_k", type=int, default=512)
    ap.add_argument("--batches", type=int, default=6,
                    help="device batches of load per window")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--depths", default="1,2,3")
    args = ap.parse_args()

    import jax
    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np
    from realtimeobjectdetection_tpu.models import get_spec
    from realtimeobjectdetection_tpu.pipeline.server import DetectionService
    from realtimeobjectdetection_tpu.testing import bench_params

    spec = get_spec(args.model, width=args.reso, height=args.reso)
    params = bench_params(spec, args.model)
    svc = DetectionService(spec, params, resolution=args.reso,
                           batch_size=args.bs, top_k=args.top_k,
                           batch_window_ms=2.0)
    svc.warmup()
    rng = np.random.RandomState(0)
    canvas = rng.randint(0, 255, (args.reso, args.reso, 3), np.uint8)
    n_imgs = args.bs * args.batches

    def window(depth):
        svc.pipeline_depth = depth
        results = queue.Queue()
        t0 = time.time()
        for _ in range(n_imgs):
            svc._q.put((canvas, (args.reso, args.reso), results.put))
        for _ in range(n_imgs):
            _, _, err = results.get(timeout=600)
            assert err is None, err
        dt = time.time() - t0
        return n_imgs / dt

    depths = [int(d) for d in args.depths.split(",")]
    for d in depths:   # one warm window each (queue ramp, allocator)
        window(d)
    best = {d: 0.0 for d in depths}
    for r in range(args.rounds):
        for d in depths:
            fps = window(d)
            best[d] = max(best[d], fps)
            print(f"round {r} depth={d}: {fps:.0f} fps", flush=True)
    print("---")
    for d in depths:
        rel = best[d] / best[depths[0]] - 1.0
        print(f"depth={d}: best {best[d]:.0f} fps ({rel:+.1%} vs "
              f"depth={depths[0]})")
    svc.close()


if __name__ == "__main__":
    main()
