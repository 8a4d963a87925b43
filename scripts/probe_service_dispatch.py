#!/usr/bin/env python
"""Where does the serving batch loop's time go?  Times each stage of
DetectionService._batch_loop's work for one bs=256 batch: host batch
assembly, jnp.asarray upload, _detect dispatch, result readback —
against the raw-dispatch rate bench.py reports for the same program.
"""
import time

import jax
if jax.default_backend() == "tpu":
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from realtimeobjectdetection_tpu.models import get_spec
from realtimeobjectdetection_tpu.pipeline.server import DetectionService
from realtimeobjectdetection_tpu.testing import bench_params

BS, RESO, K = 256, 416, 512
spec = get_spec("yolov3", width=RESO, height=RESO)
params = bench_params(spec, "yolov3")
svc = DetectionService(spec, params, resolution=RESO, batch_size=BS,
                       top_k=K, batch_window_ms=2.0)
svc.warmup()

rng = np.random.RandomState(0)
canvases = [rng.randint(0, 255, (RESO, RESO, 3), np.uint8)
            for _ in range(BS)]

for rep in range(3):
    t0 = time.time()
    batch = np.zeros((BS, RESO, RESO, 3), np.uint8)
    for j, c in enumerate(canvases):
        batch[j] = c
    t1 = time.time()
    dev = jnp.asarray(batch)
    t2 = time.time()
    boxes, valid = svc._detect(svc.params, dev)
    t3 = time.time()
    b = np.asarray(boxes)
    v = np.asarray(valid)
    t4 = time.time()
    rows = [b[j][v[j]] for j in range(BS)]
    t5 = time.time()
    print(f"rep {rep}: assemble {1e3*(t1-t0):6.1f} ms | upload "
          f"{1e3*(t2-t1):6.1f} ms | dispatch {1e3*(t3-t2):6.1f} ms | "
          f"readback {1e3*(t4-t3):6.1f} ms | slice {1e3*(t5-t4):6.1f} ms"
          f" | total {1e3*(t5-t0):6.1f} ms = {BS/(t5-t0):.0f} fps",
          flush=True)

# and the end-to-end service loop rate for comparison (one window)
import queue
results = queue.Queue()
N = BS * 4
t0 = time.time()
for i in range(N):
    svc._q.put((canvases[i % BS], (RESO, RESO), results.put))
for _ in range(N):
    _, _, err = results.get(timeout=600)
    assert err is None, err
dt = time.time() - t0
print(f"service loop: {N} imgs in {dt:.2f}s = {N/dt:.0f} fps")
svc.close()
