#!/usr/bin/env python
"""Benchmark: YOLOv3 detection throughput (frames/sec/chip at 416²).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the PyTorch reference running its detect path (forward +
write_results NMS) on CPU, measured on this container 2026-08-16 with
torch 2.13 (1 thread, 416²): yolov3 1.309 fps, yolov3-tiny 9.345 fps.
Override with REF_CPU_FPS env var or remeasure with --measure-baseline
(needs /root/reference mounted).

Timing methodology: the axon TPU backend's ``block_until_ready`` returns
before execution completes, so every timed iteration forces a host
readback of the NMS output — the honest end-to-end device time.
"""

import argparse
import json
import os
import sys
import time

# jax is pre-imported at interpreter startup here (axon plugin), so the
# env var would be read too late — set the config directly.
def _enable_compile_cache():
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

_enable_compile_cache()

import numpy as np

REF_CPU_FPS = {"yolov3": 1.309, "yolov3-tiny": 9.345}


def measure_reference_cpu(model: str, reso: int) -> float:
    """Re-measure the torch reference on CPU (slow; optional)."""
    sys.path.insert(0, "/root/reference")
    import torch
    import cv2
    from src.darknet import Darknet
    from src.util import prep_image, write_results
    from realtimeobjectdetection_tpu.models import get_spec
    from realtimeobjectdetection_tpu.testing import synthetic_darknet_weights
    import tempfile
    torch.set_num_threads(os.cpu_count() or 1)
    spec = get_spec(model)
    with tempfile.NamedTemporaryFile(suffix=".weights") as f:
        f.write(synthetic_darknet_weights(spec, 0))
        f.flush()
        m = Darknet(f"/root/reference/cfg/{model}.cfg", CUDA=False)
        m.load_weights(f.name)
    img = cv2.imread("/root/reference/imgs/dog.jpg")
    x = prep_image(img, reso)
    with torch.no_grad():
        m(x)
        n = 3
        t0 = time.time()
        for _ in range(n):
            write_results(m(x), 80, confidence=0.9, nms_conf=0.5)
        dt = time.time() - t0
    return n / dt


def bench_tpu(model: str, reso: int, batch: int, iters: int,
              dtype_name: str = "bfloat16", depth: int = 2) -> dict:
    import jax
    import jax.numpy as jnp
    from realtimeobjectdetection_tpu.models import get_spec
    from realtimeobjectdetection_tpu.weights import init_params
    from realtimeobjectdetection_tpu.model import (fold_batchnorm,
                                                   make_forward)
    from realtimeobjectdetection_tpu.ops.decode import decode_heads
    from realtimeobjectdetection_tpu.ops.nms import nms_batch

    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[dtype_name]
    spec = get_spec(model, width=reso, height=reso)
    # damped init: residual adds grow activation variance exponentially
    # with raw He init + identity BN; scale down so fold-mode activations
    # stay finite (values are irrelevant to throughput, NaNs are not)
    params = init_params(spec, 0)
    for k in params:
        params[k]["w"] = params[k]["w"] * 0.5
    fparams = jax.device_put(fold_batchnorm(spec, params))

    fwd = make_forward(spec, bn_mode="fold", compute_dtype=dtype,
                   scan_ladders=True)

    def detect(p, x):
        x = x.astype(jnp.float32) / 255.0
        pred = decode_heads(fwd(p, x), spec, reso)
        return nms_batch(pred, spec.num_classes, 0.6, 0.5, top_k=128)

    jd = jax.jit(detect)
    rng = np.random.RandomState(0)
    # uint8 input, normalized on device — matches the detector pipeline
    # and is what a production feed uploads
    x_host = rng.randint(0, 256, (batch, reso, reso, 3), np.uint8)
    x = jax.device_put(jnp.asarray(x_host))

    t0 = time.time()
    boxes, valid = jd(fparams, x)
    b_host = np.asarray(boxes)
    compile_s = time.time() - t0
    finite = bool(np.isfinite(b_host).all())

    # warmup
    for _ in range(3):
        np.asarray(jd(fparams, x)[0])
    # steady-state serving pattern: keep 2 batches in flight so the
    # host<->device round trip overlaps execution; every result is still
    # read back in full (honest end-to-end throughput)
    t0 = time.time()
    inflight = [jd(fparams, x) for _ in range(depth - 1)]
    for _ in range(iters - depth + 1):
        inflight.append(jd(fparams, x))
        np.asarray(inflight.pop(0)[0])
    while inflight:
        np.asarray(inflight.pop(0)[0])
    dt = time.time() - t0
    fps = iters * batch / dt
    return {"fps": fps, "ms_per_batch": dt / iters * 1000,
            "compile_s": compile_s, "finite": finite,
            "device": str(jax.devices()[0])}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="yolov3")
    ap.add_argument("--reso", type=int, default=416)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--depth", type=int, default=2,
                    help="batches kept in flight")
    ap.add_argument("--measure-baseline", action="store_true")
    args = ap.parse_args()

    if args.measure_baseline:
        base = measure_reference_cpu(args.model, args.reso)
    else:
        base = float(os.environ.get("REF_CPU_FPS",
                                    REF_CPU_FPS.get(args.model, 1.309)))

    r = bench_tpu(args.model, args.reso, args.batch, args.iters, args.dtype,
                  depth=args.depth)
    print(f"[bench] {args.model} reso={args.reso} bs={args.batch} "
          f"{args.dtype}: {r['ms_per_batch']:.2f} ms/batch, "
          f"{r['fps']:.1f} fps, compile {r['compile_s']:.1f}s, "
          f"finite={r['finite']}, dev={r['device']}, "
          f"baseline_cpu={base:.3f} fps", file=sys.stderr)
    if not r["finite"]:
        print("[bench] WARNING: non-finite outputs", file=sys.stderr)

    print(json.dumps({
        "metric": f"{args.model}_detect_fps_{args.reso}",
        "value": round(r["fps"], 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(r["fps"] / base, 2),
    }))


if __name__ == "__main__":
    main()
