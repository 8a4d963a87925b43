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
            max_frames: Optional[int] = None) -> Dict[str, float]:
        """Drive the stream; returns latency/throughput statistics.

        Latency is per-frame end-to-end: letterbox start -> NMS rows on
        host.  The reader thread overlaps the next frame's host work with
        the current frame's device work.
        """
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
        t_start = time.time()
        while True:
            item = q.get()
            if item is None:
                break
            t_in, x, frame = item
            fn = self._detect_raw if self.device_resize else self._detect
            if not warmed_raw:
                # compile the frame-shaped raw program outside the timed
                # window so p50/p99 reflect steady state, not one compile
                np.asarray(fn(self.params, jnp.asarray(x)))
                warmed_raw = True
                t_in = time.time()
                t_start = t_in
            fused = np.asarray(fn(self.params, jnp.asarray(x)))[0]
            rows = fused[fused[:, 7] > 0, :7]
            self.latencies_ms.append((time.time() - t_in) * 1000)
            n += 1
            if on_result is not None:
                on_result(frame, rows)
        wall = time.time() - t_start

        lat = np.asarray(self.latencies_ms)
        return {
            "frames": n,
            "fps": n / wall if wall > 0 else float("nan"),
            "p50_ms": float(np.percentile(lat, 50)) if n else float("nan"),
            "p90_ms": float(np.percentile(lat, 90)) if n else float("nan"),
            "p99_ms": float(np.percentile(lat, 99)) if n else float("nan"),
        }
