#!/usr/bin/env python
"""Pre-seed the persistent JAX compilation cache (/root/.cache/jax) with
the standard serving/bench/train programs, so fresh processes (the
driver's bench run, a production rollout) start in seconds instead of
sitting through 3-10 min axon service compiles.

Run on the real TPU:  python scripts/warm_cache.py [--train] [--v5]
"""
import argparse
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true",
                    help="also warm the training step programs")
    ap.add_argument("--v5", action="store_true",
                    help="also warm the yolov5 serving + training "
                         "programs (server defaults: v5s 640 fused bs=8)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    from bench import bench_tpu  # repo root on sys.path when run from it

    t0 = time.time()
    # the bench/serving configs (compiles and runs a few iters each)
    for model, bs in [("yolov3", 256), ("yolov3-tiny", 64)]:
        r = bench_tpu(model, 416, bs, 4, "bfloat16", depth=1, windows=1)
        print(f"warmed {model} bs={bs}: compile {r['compile_s']:.0f}s")

    if args.train:
        import optax
        from realtimeobjectdetection_tpu.models import get_spec
        from realtimeobjectdetection_tpu.train.trainer import DarknetTrainer
        for model in ["yolov3", "yolov3-tiny"]:
            tr = DarknetTrainer(model, epochs=1, batch_size=16, mesh=False,
                                multiscale=True)
            tr.warm_step_cache()
            print(f"warmed {model} train steps @ {tr._scales}")

    if args.v5:
        t1 = time.time()
        from realtimeobjectdetection_tpu.pipeline.server import \
            DetectionServiceV5
        svc = DetectionServiceV5(model_size="s", batch_size=8)
        svc.warmup()
        svc.close()
        print(f"warmed v5s serving program in {time.time() - t1:.0f}s")
        import optax
        from realtimeobjectdetection_tpu.models.yolov5 import (
            YoloV5Config, init_yolov5_params)
        from realtimeobjectdetection_tpu.train.step import init_train_state
        from realtimeobjectdetection_tpu.train.v5 import make_train_step_v5
        t1 = time.time()
        cfg = YoloV5Config("s")
        step = jax.jit(make_train_step_v5(cfg, optax.adam(1e-3),
                                          resolution=640))
        state = init_train_state(
            init_yolov5_params(cfg, 0, batch_norm=True), optax.adam(1e-3))
        imgs = jnp.zeros((16, 640, 640, 3), jnp.float32)
        bx = jnp.zeros((16, 64, 85), jnp.float32)
        mk = jnp.zeros((16, 64), bool)
        _, loss = step(state, imgs, bx, mk)
        float(loss)
        print(f"warmed v5s train step in {time.time() - t1:.0f}s")
    print(f"cache warm in {time.time() - t0:.0f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
