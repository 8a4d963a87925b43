#!/usr/bin/env python
"""Batched-evaluator throughput on the real TPU (VERDICT r2 next-4).

The reference validates one image per forward (test.py:46-60 batch=1);
round 3 gave validate_map/_v5 padded batches.  This measures what that
buys through the ~57 ms/RPC tunnel: images/s of a full mAP evaluation
over a synthetic COCO set at batch_size 1 vs N.  Without --skip_bs1 the
bs=1 point is also run and the scores are asserted identical (the
padded tail repeats real samples and the matcher sees each image once
either way); with --skip_bs1 only the batched point is measured and the
identity check is delegated to tests/test_map.py.

Data-path knobs: --host_prep {cv2,native} picks the letterbox engine,
--cache routes decode through the on-disk canvas cache (data/cache.py;
the warmup pass fills it so the timed pass measures the memmap-served
steady state).  All temp data (synthetic COCO + any cache) lives in one
TemporaryDirectory removed on exit.

Usage: python scripts/bench_eval.py [--n 64] [--bs 32] [--family both]
           [--host_prep native] [--cache] [--skip_bs1]
"""
import argparse
import sys
import tempfile
import time
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64, help="synthetic images")
    ap.add_argument("--bs", type=int, default=32)
    ap.add_argument("--reso", type=int, default=416)
    ap.add_argument("--family", default="both",
                    choices=["v3", "v5", "both"])
    ap.add_argument("--host_prep", default="cv2",
                    choices=["cv2", "native"],
                    help="letterbox engine for the eval datasets "
                         "(native = the C++ fixed-point bicubic)")
    ap.add_argument("--cache", action="store_true",
                    help="letterboxed-canvas cache (data/cache.py); the "
                         "warmup pass fills it, so the timed pass "
                         "measures the memmap-served steady state")
    ap.add_argument("--skip_bs1", action="store_true",
                    help="measure only the batched point (bs=1 vs bs=N "
                         "score identity is pinned by tests/test_map.py; "
                         "skipping bs=1 saves a fresh compile per family "
                         "on a cold cache)")
    args = ap.parse_args()

    import jax
    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from realtimeobjectdetection_tpu.testing import make_synthetic_coco
    # TemporaryDirectory: --cache writes ~110 MB of canvas memmaps; a
    # bare mkdtemp leaked that into /tmp on every bench run (ADVICE r4)
    tmp_ctx = tempfile.TemporaryDirectory(prefix="bench_eval_")
    tmp = Path(tmp_ctx.name)
    ann, imgs = make_synthetic_coco(tmp, n_images=args.n,
                                    img_size=(480, 640))
    cache_dir = str(tmp / "canvas_cache") if args.cache else None
    prep_tag = (f" prep={args.host_prep}"
                f"{' +cache' if args.cache else ''}")

    def timed(fn):
        fn()  # warm: compiles land in the persistent cache first
        t0 = time.time()
        out = fn()
        return out, time.time() - t0

    if args.family in ("v3", "both"):
        from realtimeobjectdetection_tpu.eval.validator import validate_map
        from realtimeobjectdetection_tpu.models import get_spec
        from realtimeobjectdetection_tpu.testing import bench_params
        spec = get_spec("yolov3", width=args.reso, height=args.reso)
        # dense weights: ~hundreds of candidates/img pass the NMS, so
        # the host-side matcher does realistic work too
        params = bench_params(spec, "yolov3")
        for bs in ((args.bs,) if args.skip_bs1 else (1, args.bs)):
            (scores), dt = timed(lambda b=bs: validate_map(
                ann, imgs, spec, params, resolution=args.reso,
                batch_size=b, verbose=False, cache_dir=cache_dir,
                host_prep=args.host_prep))
            print(f"validate_map yolov3 {args.reso}² bs={bs}{prep_tag}: "
                  f"{args.n / dt:.1f} img/s ({dt:.1f}s for {args.n}), "
                  f"mAP@0.5={scores['mAP@0.5']:.4f}", flush=True)
            if bs == 1:
                ref = scores
        if not args.skip_bs1:
            for k in ("mAP@0.5", "mAP@[.5:.95]"):
                assert abs(ref[k] - scores[k]) < 1e-9, (k, ref[k], scores[k])
            print("v3 scores identical across batch sizes", flush=True)

    if args.family in ("v5", "both"):
        from realtimeobjectdetection_tpu.eval.validator import \
            validate_map_v5
        from realtimeobjectdetection_tpu.models.yolov5 import \
            init_yolov5_params, yolov5_config
        params5 = init_yolov5_params(yolov5_config("s"), seed=0)
        for bs in ((args.bs,) if args.skip_bs1 else (1, args.bs)):
            scores, dt = timed(lambda b=bs: validate_map_v5(
                ann, imgs, "s", params5, size=640, batch_size=b,
                verbose=False, cache_dir=cache_dir,
                host_prep=args.host_prep))
            print(f"validate_map_v5 yolov5s 640² bs={bs}{prep_tag}: "
                  f"{args.n / dt:.1f} img/s ({dt:.1f}s for {args.n}), "
                  f"mAP@0.5={scores['mAP@0.5']:.4f}", flush=True)
            if bs == 1:
                ref = scores
        if not args.skip_bs1:
            for k in ("mAP@0.5", "mAP@[.5:.95]"):
                assert abs(ref[k] - scores[k]) < 1e-9, (k, ref[k], scores[k])
            print("v5 scores identical across batch sizes", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
