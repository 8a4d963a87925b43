"""Streaming detection: video/webcam/synthetic frame loop with fixed
shapes and latency percentiles.

The reference has no video code, but its config surface and the project
baseline call for a streaming loop (BASELINE.md: "Streaming video/webcam
loop: batched frame pipeline, fixed-shape NMS, p50 latency").  This
driver runs a continuous pipeline:

  frame source (cv2.VideoCapture / synthetic) -> host letterbox ->
  jitted forward+decode+NMS (one static-shape program) -> callback

with a reader thread double-buffering host work against device compute,
and per-frame end-to-end latency recorded for p50/p90/p99 reporting.
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Callable, Dict, Iterator, List, Optional

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

import jax
import jax.numpy as jnp

from ..cfg_parser import GraphSpec
from ..model import fold_batchnorm, make_forward
from ..ops.decode import decode_heads
from ..ops.letterbox import prep_image_host_u8
from ..ops.nms import nms_batch

__all__ = ["StreamDetector", "synthetic_frames", "video_frames"]


def synthetic_frames(n: int, height: int = 480, width: int = 640,
                     seed: int = 0) -> Iterator[np.ndarray]:
    """Deterministic BGR frame source for benchmarks/tests."""
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 255, (height, width, 3), np.uint8)
    for i in range(n):
        frame = np.roll(base, shift=3 * i, axis=1)  # cheap motion
        yield frame


def video_frames(source) -> Iterator[np.ndarray]:
    """cv2.VideoCapture wrapper: a path or a webcam index."""
    cap = cv2.VideoCapture(source)
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video source {source!r}")
    try:
        while True:
            ok, frame = cap.read()
            if not ok:
                return
            yield frame
    finally:
        cap.release()


class StreamDetector:
    """Continuous fixed-shape detection over a frame stream."""

    def __init__(self, spec: GraphSpec, params, resolution: int = 416,
                 confidence: float = 0.6, nms_thresh: float = 0.5,
                 num_classes: int = 80, top_k: int = 128,
                 bn_mode: str = "fold", compute_dtype=jnp.bfloat16,
                 device_resize: bool = False, prefetch: int = 4):
        """``device_resize``: letterbox in-graph on the TPU (frames must
        share one fixed resolution, e.g. a camera) — removes the host cv2
        resize from the hot loop, leaving only the uint8 frame upload."""
        self.spec = spec
        self.resolution = resolution
        self.device_resize = device_resize
        self.prefetch = prefetch
        if bn_mode == "fold":
            params = fold_batchnorm(spec, params)
        self.params = jax.device_put(params)
        fwd = make_forward(spec, bn_mode=bn_mode,
                           compute_dtype=compute_dtype,
                           scan_ladders=bn_mode in ("fold", "running"))

        def detect(p, x):
            # uint8 in; fuse (boxes, valid) into one [1, K, 8] array so a
            # frame costs exactly one upload and one readback round trip
            x = x.astype(jnp.float32) / 255.0
            pred = decode_heads(fwd(p, x), spec, resolution)
            boxes, valid = nms_batch(pred, num_classes, confidence,
                                     nms_thresh, top_k=top_k)
            return jnp.concatenate(
                [boxes, valid[..., None].astype(boxes.dtype)], axis=-1)

        self._detect = jax.jit(detect)

        if device_resize:
            from ..ops.letterbox import letterbox_jax

            def detect_raw(p, frame_bgr):
                # frame: [H, W, 3] uint8 BGR -> letterbox+normalize in-graph
                rgb = frame_bgr[:, :, ::-1]
                x = letterbox_jax(rgb, resolution, method="linear")[None]
                pred = decode_heads(fwd(p, x), spec, resolution)
                boxes, valid = nms_batch(pred, num_classes, confidence,
                                         nms_thresh, top_k=top_k)
                return jnp.concatenate(
                    [boxes, valid[..., None].astype(boxes.dtype)], axis=-1)

            self._detect_raw = jax.jit(detect_raw)
        self.latencies_ms: List[float] = []

    def warmup(self, frame_shape=None):
        if self.device_resize:
            # only the frame-shaped raw program is used in this mode;
            # compiling _detect would double the multi-minute cold start
            if frame_shape is not None:
                f = jnp.zeros(frame_shape, jnp.uint8)
                np.asarray(self._detect_raw(self.params, f))
            return
        x = jnp.zeros((1, self.resolution, self.resolution, 3), jnp.uint8)
        np.asarray(self._detect(self.params, x))

    def run(self, frames: Iterator[np.ndarray],
            on_result: Optional[Callable] = None,
            max_frames: Optional[int] = None,
            pipeline_depth: int = 1) -> Dict[str, float]:
        """Drive the stream; returns latency/throughput statistics.

        Latency is per-frame end-to-end: letterbox start -> NMS rows on
        host.  The reader thread overlaps the next frame's host work with
        the current frame's device work.

        ``pipeline_depth`` (throughput mode, depth >= 2): keep that many
        frames in flight at once.  Measured through the axon tunnel, a
        frame costs ~31 ms upload RPC + ~0.3 ms dispatch + ~26 ms readback
        RPC, and those RPCs are pure *latency* (a [1,416,416,3] uint8
        upload and a [1,K,8] readback are both far below the tunnel's
        bandwidth) — but the tunnel multiplexes concurrent RPCs almost
        linearly (4 upload threads sustain ~109 uploads/s vs ~31 for one).
        So throughput mode runs uploads and readbacks on thread pools of
        ``pipeline_depth`` workers each, with dispatch kept in strict
        frame order on the caller thread.  Results are delivered in order;
        per-frame latency grows by the queueing delay.  Depth 1 is the
        strictly serial lowest-latency mode.  Both modes are tabulated in
        PERFORMANCE.md.
        """
        assert pipeline_depth >= 1
        if pipeline_depth > 1:
            return self._run_pipelined(frames, on_result, max_frames,
                                       pipeline_depth)
        self.warmup()
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)

        def produce():
            count = 0
            for frame in frames:
                if max_frames is not None and count >= max_frames:
                    break
                t_in = time.time()
                if self.device_resize:
                    x = frame  # raw uint8 upload; letterbox runs in-graph
                else:
                    x = prep_image_host_u8(frame, self.resolution)
                q.put((t_in, x, frame))
                count += 1
            q.put(None)

        threading.Thread(target=produce, daemon=True).start()

        self.latencies_ms = []
        n = 0
        warmed_raw = not self.device_resize
        fn = self._detect_raw if self.device_resize else self._detect
        # in-flight device work: (t_in, async device array, frame)
        from collections import deque
        inflight: "deque" = deque()

        def drain_one():
            nonlocal n
            t_in, fut, frame = inflight.popleft()
            fused = np.asarray(fut)[0]  # host readback = true sync on axon
            rows = fused[fused[:, 7] > 0, :7]
            self.latencies_ms.append((time.time() - t_in) * 1000)
            n += 1
            if on_result is not None:
                on_result(frame, rows)

        t_start = time.time()
        while True:
            item = q.get()
            if item is None:
                break
            t_in, x, frame = item
            if not warmed_raw:
                # compile the frame-shaped raw program outside the timed
                # window so p50/p99 reflect steady state, not one compile
                np.asarray(fn(self.params, jnp.asarray(x)))
                warmed_raw = True
                t_in = time.time()
                t_start = t_in
            # async dispatch; sync happens in drain_one's np.asarray
            inflight.append((t_in, fn(self.params, jnp.asarray(x)), frame))
            if len(inflight) >= pipeline_depth:
                drain_one()
        while inflight:
            drain_one()
        wall = time.time() - t_start

        return self._stats(n, wall)

    def _stats(self, n: int, wall: float) -> Dict[str, float]:
        lat = np.asarray(self.latencies_ms)
        return {
            "frames": n,
            "fps": n / wall if wall > 0 else float("nan"),
            "p50_ms": float(np.percentile(lat, 50)) if n else float("nan"),
            "p90_ms": float(np.percentile(lat, 90)) if n else float("nan"),
            "p99_ms": float(np.percentile(lat, 99)) if n else float("nan"),
        }

    def _run_pipelined(self, frames: Iterator[np.ndarray],
                       on_result: Optional[Callable],
                       max_frames: Optional[int],
                       depth: int) -> Dict[str, float]:
        """Throughput-mode engine: overlapped upload/readback RPC stages.

        Three stages per frame, in flight for up to ``depth`` frames:

          1. upload pool:   host letterbox + ``jax.device_put`` (the ~31 ms
             tunnel RPC) — parallel across frames;
          2. caller thread: jitted dispatch in strict frame order (~0.3 ms,
             async on the device);
          3. readback pool: ``np.asarray`` of the fused [1, K, 8] output
             (the ~26 ms tunnel RPC) — parallel across frames, results
             delivered to ``on_result`` in frame order.

        Numerics are identical to the serial path — only the schedule
        differs (tests pin rows equal at every depth).
        """
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        self.warmup()
        fn = self._detect_raw if self.device_resize else self._detect
        reso = self.resolution

        def prep_upload(frame):
            if self.device_resize:
                return jax.device_put(jnp.asarray(frame))
            return jax.device_put(
                jnp.asarray(prep_image_host_u8(frame, reso)))

        up_pool = ThreadPoolExecutor(depth, "stream-upload")
        rd_pool = ThreadPoolExecutor(depth, "stream-readback")
        uploading: "deque" = deque()   # (t_in, upload future, frame)
        reading: "deque" = deque()     # (t_in, readback future, frame)
        self.latencies_ms = []
        n = 0

        def dispatch_ready(block: bool):
            # head-of-line only: dispatch order == frame order
            while uploading and (block or uploading[0][1].done()):
                t_in, f, frame = uploading.popleft()
                out = fn(self.params, f.result())
                reading.append((t_in, rd_pool.submit(np.asarray, out),
                                frame))
                block = False

        def drain_one():
            nonlocal n
            t_in, f, frame = reading.popleft()
            fused = f.result()[0]
            rows = fused[fused[:, 7] > 0, :7]
            self.latencies_ms.append((time.time() - t_in) * 1000)
            n += 1
            if on_result is not None:
                on_result(frame, rows)

        t_start = time.time()
        count = 0
        try:
            for frame in frames:
                if max_frames is not None and count >= max_frames:
                    break
                count += 1
                uploading.append((time.time(),
                                  up_pool.submit(prep_upload, frame),
                                  frame))
                dispatch_ready(block=False)
                while len(uploading) + len(reading) > depth:
                    if reading:
                        drain_one()
                    else:
                        dispatch_ready(block=True)
            while uploading or reading:
                if uploading:
                    dispatch_ready(block=not reading)
                if reading:
                    drain_one()
        finally:
            up_pool.shutdown(wait=False)
            rd_pool.shutdown(wait=False)
        wall = time.time() - t_start
        return self._stats(n, wall)
