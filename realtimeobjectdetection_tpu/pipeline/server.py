"""Minimal production serving layer: HTTP detection endpoint with
micro-batching.

The reference stops at folder scripts; a deployable framework needs a
server.  This one is stdlib-only (http.server + threads):

* ``POST /detect`` with an image body (any cv2-decodable format) ->
  JSON ``{"boxes": [[x1,y1,x2,y2,obj,cls_conf,cls_id], ...],
  "class_names": [...], "latency_ms": t}`` in original-image pixels;
* ``POST /detect_stream`` with a stream of ``[4-byte big-endian
  length][image bytes]`` frames -> chunked response, one JSON line per
  frame in order; frames are fed to the micro-batcher as they arrive,
  so consecutive frames share device batches (video-over-HTTP without
  one round-trip per frame);
* ``GET /healthz`` -> liveness + model info; ``GET /readyz`` ->
  readiness (503 until the jitted program is compiled and warm);
* ``GET /metrics`` -> Prometheus text exposition (request/error/batch
  counters, sliding-window latency quantiles, batch occupancy — see
  :class:`ServiceStats`);
* a micro-batcher thread collects concurrent requests into one
  fixed-shape device batch (up to ``batch_size`` within
  ``batch_window_ms``) and keeps up to ``pipeline_depth`` batches in
  flight (async dispatch; batch N launches before batch N-1's readback),
  so throughput under load approaches the pipelined device rate while a
  lone request only pays the window.

Run: ``rodtpu serve --cfg yolov3-tiny --weights w.weights --port 8000``.
"""

from __future__ import annotations

import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

import jax
import jax.numpy as jnp

from ..cfg_parser import GraphSpec
from ..data.classnames import COCO80
from ..model import fold_batchnorm, make_forward
from ..ops.decode import decode_heads
from ..ops.letterbox import prep_image_host_u8, unletterbox_boxes
from ..ops.nms import nms_batch

__all__ = ["AOTDetectionService", "DetectionService",
           "DetectionServiceV5", "ServiceStats", "serve"]


class ServiceStats:
    """Rolling serving metrics behind ``GET /metrics`` (Prometheus text
    exposition 0.0.4, no client-library dependency).

    Counters are monotonic; latency quantiles are a summary over a
    sliding window of the last ``window`` requests (adequate for a
    single-process server; a multi-replica deployment would aggregate
    the counters and scrape-side histograms instead).  Beyond the
    reference, which prints per-image wall time only
    (/root/reference/detect.py:141-142)."""

    def __init__(self, window: int = 1024):
        import collections
        self._lock = threading.Lock()
        self.requests_total = 0
        self.errors_total = 0
        self.batches_total = 0
        self.images_total = 0
        self.latency_sum = 0.0
        self._window = collections.deque(maxlen=window)

    def record_request(self, latency_s: float) -> None:
        with self._lock:
            self.requests_total += 1
            self.latency_sum += float(latency_s)
            self._window.append(float(latency_s))

    def record_error(self) -> None:
        with self._lock:
            self.errors_total += 1

    def record_batch(self, n_images: int) -> None:
        with self._lock:
            self.batches_total += 1
            self.images_total += int(n_images)

    def render(self, info: Optional[Dict] = None) -> str:
        with self._lock:
            lat = sorted(self._window)
            occupancy = (self.images_total / self.batches_total
                         if self.batches_total else float("nan"))
            lines = [
                "# HELP detector_requests_total detect requests served",
                "# TYPE detector_requests_total counter",
                f"detector_requests_total {self.requests_total}",
                "# HELP detector_errors_total failed detect requests",
                "# TYPE detector_errors_total counter",
                f"detector_errors_total {self.errors_total}",
                "# HELP detector_batches_total device batches dispatched",
                "# TYPE detector_batches_total counter",
                f"detector_batches_total {self.batches_total}",
                "# HELP detector_batch_occupancy mean images per device "
                "batch (batch_size is the ceiling)",
                "# TYPE detector_batch_occupancy gauge",
                f"detector_batch_occupancy {occupancy}",
                "# HELP detector_request_latency_seconds request latency"
                " (sliding-window summary)",
                "# TYPE detector_request_latency_seconds summary",
            ]
            for p in (0.5, 0.9, 0.99):
                v = (lat[min(len(lat) - 1, int(p * len(lat)))]
                     if lat else float("nan"))
                lines.append("detector_request_latency_seconds"
                             f'{{quantile="{p}"}} {v:.6f}')
            lines.append("detector_request_latency_seconds_sum "
                         f"{self.latency_sum:.6f}")
            lines.append("detector_request_latency_seconds_count "
                         f"{self.requests_total}")
            for k, v in (info or {}).items():
                if isinstance(v, (int, float)) and not isinstance(v, bool):
                    lines.append(f'detector_info{{field="{k}"}} {v}')
            return "\n".join(lines) + "\n"


class DetectionService:
    """Micro-batching detection backend shared by server workers."""

    # the jitted program has one static batch shape, so the batcher pads
    # every device call up to batch_size; AOT *bundle* backends flip
    # this to dispatch each call at its natural size instead (the
    # bundle ships a ladder of batch shapes — see _AOTBackend)
    _variable_batch = False

    def __init__(self, spec: GraphSpec, params, resolution: int = 416,
                 confidence: float = 0.6, nms_thresh: float = 0.5,
                 num_classes: int = 80, top_k: int = 128,
                 batch_size: int = 8, batch_window_ms: float = 5.0,
                 bn_mode: str = "fold", compute_dtype=jnp.bfloat16,
                 class_names: Optional[List[str]] = None,
                 fused_decode: bool = True,
                 pipeline_stages: Optional[int] = None,
                 approx_topk: bool = False,
                 pipeline_depth: int = 2):
        self.spec = spec
        self.resolution = resolution
        self.batch_size = batch_size
        self.batch_window_s = batch_window_ms / 1000.0
        self.pipeline_depth = max(1, int(pipeline_depth))
        self.classes = class_names or COCO80
        self._folds_bn = bn_mode == "fold"   # reload_params mirrors this
        if bn_mode == "fold":
            params = fold_batchnorm(spec, params)
        self.params = jax.device_put(params)
        # serving fast path (PERFORMANCE.md): bf16 activation/head
        # residency + decode_topk — identical survivors, less HBM
        fast = fused_decode and bn_mode == "fold" \
            and compute_dtype == jnp.bfloat16
        fwd = make_forward(spec, bn_mode=bn_mode,
                           compute_dtype=compute_dtype,
                           scan_ladders=bn_mode in ("fold", "running"),
                           activation_dtype=jnp.bfloat16 if fast else None,
                           head_dtype=jnp.bfloat16 if fast else None)

        def post(heads):
            if fused_decode:
                # approx_topk: lax.approx_max_k candidate selection
                # (results-changing, recall >= 0.95 — opt-in, same
                # lever as DetectionServiceV5(approx_topk=...))
                from ..ops.decode import decode_topk
                pred, _ = decode_topk(heads, spec, resolution, top_k,
                                      confidence=confidence,
                                      approx=approx_topk)
            else:
                pred = decode_heads(heads, spec, resolution)
            return nms_batch(pred, num_classes, confidence, nms_thresh,
                             top_k=top_k)

        def detect(p, x):
            x = x.astype(jnp.float32) / 255.0
            return post(fwd(p, x))

        # pipeline-parallel backend: forward as N stage programs on N
        # devices (parallel/pipeline.py), decode+NMS on the last stage's
        # device — same integration as DetectorV3(pipeline_stages=...)
        if pipeline_stages and int(pipeline_stages) > 1:
            assert bn_mode in ("fold", "running"), bn_mode
            from ..parallel.pipeline import PipelinedForward
            pf = PipelinedForward(
                spec, self.params, n_stages=int(pipeline_stages),
                bn_mode=bn_mode, compute_dtype=compute_dtype,
                activation_dtype=jnp.bfloat16 if fast else None,
                head_dtype=jnp.bfloat16 if fast else None,
                scan_ladders=bn_mode in ("fold", "running"),
                resolution=resolution)
            self.pipeline = pf
            self._detect = pf.make_detect(post)
        else:
            self.pipeline = None
            self._detect = jax.jit(detect)
        self.cls_col = 6   # row layout [x1,y1,x2,y2,obj,cls_conf,cls]
        self._start_worker()

    def _start_worker(self):
        self.ready = False
        self.stats = ServiceStats()
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._reload_lock = threading.Lock()
        self._worker = threading.Thread(target=self._batch_loop,
                                        daemon=True)
        self._worker.start()

    # ------------------------------------------------------------------
    def reload_params(self, params, folded: bool = False) -> None:
        """Hot-swap the serving weights without restarting the service.

        ``params`` must match the spec the service was built with (same
        pytree structure and shapes) — the compiled executable is
        reused, so the swap costs one host->device upload and zero
        recompiles.  ``folded=False`` params in the training layout are
        BN-folded first, exactly as ``__init__`` does.  The swap holds
        the batch lock, so in-flight batches finish on the old weights
        and the next batch picks up the new ones — no dropped or mixed
        requests.  Production surface beyond the reference (which must
        restart detect.py to change weights)."""
        if not folded and self._folds_bn and any(
                "bn_gamma" in v for v in params.values()
                if isinstance(v, dict)):
            try:
                params = fold_batchnorm(self.spec, params)
            except KeyError as e:   # params from a different graph
                raise ValueError(
                    f"params do not match the serving spec "
                    f"({len(self.spec.nodes)} nodes): missing {e}")
        # validate on the host BEFORE any device upload (the tunnel's
        # host->device bandwidth makes a rejected device_put expensive)
        old_td = jax.tree_util.tree_structure(self.params)
        new_td = jax.tree_util.tree_structure(params)
        if old_td != new_td:
            raise ValueError(f"params tree mismatch: {new_td} != {old_td}")
        old_leaves = jax.tree_util.tree_leaves(self.params)
        for a, b in zip(old_leaves, jax.tree_util.tree_leaves(params)):
            if a.shape != np.shape(b):
                raise ValueError(
                    f"shape mismatch {np.shape(b)} != {a.shape}")
        # cast to the built dtypes: the jitted executable is keyed on
        # input avals, so a dtype drift (e.g. a bf16-saved artifact into
        # an fp32-built service) would silently trigger a multi-minute
        # recompile instead of reusing the program
        params = jax.tree_util.tree_unflatten(
            old_td, [jnp.asarray(b, a.dtype) for a, b in
                     zip(old_leaves, jax.tree_util.tree_leaves(params))])
        new = jax.device_put(params)
        with self._reload_lock:
            if self.pipeline is not None:
                self.pipeline.update_params(new)
            self.params = new

    def reload_weights(self, path: str) -> None:
        """Load a darknet ``.weights`` checkpoint (any trainer tier's
        ``.weights`` export) and hot-swap it (see reload_params)."""
        from ..weights import load_darknet_weights
        params, _ = load_darknet_weights(self.spec, path)
        self.reload_params(params, folded=False)

    def describe(self) -> Dict:
        return {"model_nodes": len(self.spec.nodes),
                "resolution": self.resolution,
                "batch_size": self.batch_size}

    def _prep(self, img_bgr: np.ndarray) -> np.ndarray:
        """Host letterbox -> uint8 canvas at self.resolution."""
        return prep_image_host_u8(img_bgr, self.resolution)[0]

    def warmup(self):
        x = np.zeros((self.batch_size, self.resolution, self.resolution, 3),
                     np.uint8)
        np.asarray(self._detect(self.params, jnp.asarray(x))[0])
        self.ready = True

    def close(self):
        self._stop.set()

    # ------------------------------------------------------------------
    def _batch_loop(self):
        """Collect -> dispatch -> (later) materialize.

        JAX dispatch is asynchronous, so up to ``pipeline_depth``
        batches stay in flight: batch N is dispatched before batch
        N-1's results are read back, which keeps the device busy while
        the host collects the next batch and materializes the previous
        one (the +55-69%% under-load lever the bench pipelined windows
        measure — PERFORMANCE.md).  A lone request pays nothing extra:
        with the queue empty the dispatched batch is materialized
        immediately, identical to the serial loop."""
        inflight: List = []   # [(items, boxes_dev, valid_dev)] oldest first

        def materialize_oldest():
            items, boxes, valid = inflight.pop(0)
            try:
                b = np.asarray(boxes)
                v = np.asarray(valid)
                for j, (_, dims, done) in enumerate(items):
                    done((b[j][v[j]], dims, None))
            except BaseException as e:  # pragma: no cover
                for _, dims, done in items:
                    done((None, dims, e))

        while not self._stop.is_set():
            if inflight and self._q.empty():
                # no request waiting: deliver the oldest in-flight
                # batch instead of idling on the queue with results
                # pending
                materialize_oldest()
                continue
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            items = [first]
            deadline = time.time() + self.batch_window_s
            while len(items) < self.batch_size:
                remaining = deadline - time.time()
                if remaining <= 0:
                    break
                try:
                    items.append(self._q.get(timeout=remaining))
                except queue.Empty:
                    break
            nb = len(items) if self._variable_batch else self.batch_size
            batch = np.zeros((nb, self.resolution,
                              self.resolution, 3), np.uint8)
            for j, (canvas, _, _) in enumerate(items):
                batch[j] = canvas
            self.stats.record_batch(len(items))
            try:
                with self._reload_lock:   # weight swaps land between batches
                    boxes, valid = self._detect(self.params,
                                                jnp.asarray(batch))
            except BaseException as e:  # pragma: no cover — dispatch-time
                for _, dims, done in items:
                    done((None, dims, e))
            else:
                inflight.append((items, boxes, valid))
            while len(inflight) >= self.pipeline_depth:
                materialize_oldest()
        while inflight:   # close(): deliver everything already launched
            materialize_oldest()

    # ------------------------------------------------------------------
    def submit_image(self, img_bgr: np.ndarray) -> "queue.Queue":
        """Async API: enqueue one image, return the 1-slot result queue.

        Collect with :meth:`collect`.  Lets a caller keep several frames
        in flight so consecutive frames share device batches (the
        /detect_stream path)."""
        h, w = img_bgr.shape[:2]
        canvas = self._prep(img_bgr)
        result: "queue.Queue" = queue.Queue(maxsize=1)
        result.dims = (w, h)  # carried for collect()
        self._q.put((canvas, (w, h), result.put))
        return result

    def collect(self, result: "queue.Queue") -> np.ndarray:
        rows, _, err = result.get()
        if err is not None:
            raise err
        w, h = result.dims
        return self._unletterbox(rows, w, h)

    def detect_image(self, img_bgr: np.ndarray) -> np.ndarray:
        """Synchronous single-image API -> rows in original pixels."""
        return self.collect(self.submit_image(img_bgr))

    def _unletterbox(self, rows: np.ndarray, w: int, h: int) -> np.ndarray:
        if rows is None or len(rows) == 0:
            return np.zeros((0, self.cls_col + 1), np.float32)
        return unletterbox_boxes(rows, w, h, self.resolution)


class DetectionServiceV5(DetectionService):
    """Micro-batching backend for the native YOLOv5 graph.

    Same queue/batcher machinery as :class:`DetectionService`; swaps in
    the v5 forward (bf16 activation residency + fused decode_v5_topk by
    default — the serving fast path; ``approx_topk=True`` additionally
    opts into approx_max_k candidate selection, +4-5% fps at a
    recall>=0.95 candidate gate — results-changing, so OFF by default),
    AutoShape's square letterbox
    (114-gray, round() extents) and its box rescale.  Rows are the
    ultralytics layout ``[x1,y1,x2,y2,conf,cls]``.
    """

    def __init__(self, model_size: str = "s", weights_path=None,
                 size: int = 640, confidence: float = 0.25,
                 iou_thresh: float = 0.45, max_det: int = 300,
                 top_k: int = 512, num_classes: int = 80,
                 batch_size: int = 8, batch_window_ms: float = 5.0,
                 compute_dtype=jnp.bfloat16, fused_decode: bool = True,
                 activation_dtype=jnp.bfloat16,
                 approx_topk: bool = False,
                 class_names: Optional[List[str]] = None,
                 pipeline_stages: Optional[int] = None,
                 pipeline_depth: int = 2):
        from ..models.yolov5 import (YoloV5Config, decode_v5, decode_v5_topk,
                                     init_yolov5_params, load_v5_checkpoint,
                                     make_yolov5_forward)
        from ..ops.nms import nms_batch_v5

        self.cfg = YoloV5Config(model_size.lower(), num_classes)
        self.resolution = size
        self.batch_size = batch_size
        self.batch_window_s = batch_window_ms / 1000.0
        self.pipeline_depth = max(1, int(pipeline_depth))
        self.classes = class_names or COCO80
        self._folds_bn = True   # v5 serving always consumes folded params
        if weights_path is None:
            params = init_yolov5_params(self.cfg, seed=0)
        else:
            params = load_v5_checkpoint(self.cfg, weights_path)
        self.params = jax.device_put(params)
        fwd = make_yolov5_forward(self.cfg, compute_dtype=compute_dtype,
                                  activation_dtype=activation_dtype,
                                  head_dtype=activation_dtype)
        nc, conf, iou, md, tk = (num_classes, confidence, iou_thresh,
                                 max_det, top_k)

        def post(heads):
            if fused_decode:
                # approx_topk: lax.approx_max_k candidate selection
                # (recall >= 0.95 of >threshold rows) — +4-5% fps at
                # bs=512/640² vs the exact sort (PERFORMANCE.md r3);
                # per_head_gather skips the [B, N, 85] raw concat,
                # bit-identical rows
                pred = decode_v5_topk(heads, nc, tk, conf,
                                      approx=approx_topk,
                                      per_head_gather=True)
            else:
                pred = decode_v5([h.astype(jnp.float32) for h in heads], nc)
            return nms_batch_v5(pred, nc, conf, iou, top_k=tk, max_det=md)

        def detect(p, x):
            x = x.astype(jnp.float32) / 255.0
            return post(fwd(p, x))

        if pipeline_stages and int(pipeline_stages) > 1:
            from ..parallel.pipeline import PipelinedForwardV5
            pf = PipelinedForwardV5(
                self.cfg, self.params, n_stages=int(pipeline_stages),
                compute_dtype=compute_dtype,
                activation_dtype=activation_dtype,
                head_dtype=activation_dtype, resolution=size)
            self.pipeline = pf
            self._detect = pf.make_detect(post)
        else:
            self.pipeline = None
            self._detect = jax.jit(detect)
        self.cls_col = 5   # ultralytics rows [x1,y1,x2,y2,conf,cls]
        self._start_worker()

    def describe(self) -> Dict:
        return {"model": f"yolov5{self.cfg.size}",
                "resolution": self.resolution,
                "batch_size": self.batch_size}

    def reload_params(self, params, folded: bool = False) -> None:
        """v5 reload: training-layout params are folded via
        fold_v5_batchnorm (the v5 twin of the darknet fold); otherwise
        identical swap semantics to DetectionService.reload_params."""
        from ..models.yolov5 import fold_v5_batchnorm

        def _has_bn(t):
            if isinstance(t, dict):
                return "bn_gamma" in t or any(_has_bn(v)
                                              for v in t.values())
            if isinstance(t, list):
                return any(_has_bn(v) for v in t)
            return False
        if not folded and _has_bn(params):
            params = fold_v5_batchnorm(params)
        DetectionService.reload_params(self, params, folded=True)

    def reload_weights(self, path: str) -> None:
        """Load any v5 checkpoint format load_v5_checkpoint accepts
        (.npz deploy artifact, orbax dir, ultralytics .pt) and swap."""
        from ..models.yolov5 import load_v5_checkpoint
        self.reload_params(load_v5_checkpoint(self.cfg, path),
                           folded=False)

    def _prep(self, img_bgr: np.ndarray) -> np.ndarray:
        from .yolov5 import letterbox_v5
        return np.ascontiguousarray(
            letterbox_v5(img_bgr, self.resolution)[:, :, ::-1])

    def _unletterbox(self, rows: np.ndarray, w: int, h: int) -> np.ndarray:
        from ..ops.letterbox import letterbox_params_round
        if rows is None or len(rows) == 0:
            return np.zeros((0, 6), np.float32)
        return unletterbox_boxes(rows, w, h, self.resolution,
                                 params_fn=letterbox_params_round)


class AOTDetectionService(DetectionService):
    """Serve from an ahead-of-time export artifact (pipeline/export.py)
    instead of live model code.

    The artifact — ``save_detector``/``save_detector_v5`` single-shape
    program or a ``save_detector_bundle[_v5]`` multi-batch-size bundle —
    carries the weights as constants and pins the exact numerics that
    were validated offline, so the serving host needs no cfg/weights
    files and pays no trace-and-lower at startup (deserialize + one
    warm execution per shape).  With a bundle, the micro-batcher
    dispatches each device call at its natural size and the bundle
    routes it to the smallest compiled batch shape that fits
    (``_variable_batch``): low-traffic windows run the bs=1 program
    instead of padding to the ladder top.  ``rodtpu serve --aot
    model.stablehlo``.  Beyond the reference, which rebuilds the torch
    model from cfg+weights on every start (detect.py:185-194)."""

    def __init__(self, artifact_path: str,
                 batch_window_ms: float = 5.0,
                 class_names: Optional[List[str]] = None,
                 pipeline_depth: int = 2):
        from .export import load_detector
        self.classes = class_names or COCO80
        self.batch_window_s = batch_window_ms / 1000.0
        self.pipeline_depth = max(1, int(pipeline_depth))
        self.pipeline = None
        self.params = None   # weights live inside the artifact
        self._install(load_detector(artifact_path), artifact_path)
        self._start_worker()

    def _install(self, loaded, path: str) -> None:
        meta = loaded.meta
        self._loaded = loaded
        self._artifact = path
        self._family = meta.get("family", "darknet")
        self.resolution = int(meta["resolution"])
        self._rungs = (list(loaded.batch_sizes)
                       if hasattr(loaded, "batch_sizes")
                       else [int(meta["batch_size"])])
        # bundles pad internally to the chosen rung; a single-shape
        # artifact needs the batcher's full-size padding
        self._variable_batch = hasattr(loaded, "batch_sizes")
        self.batch_size = self._rungs[-1]
        self.cls_col = 5 if self._family.startswith("yolov5") else 6
        self._detect = lambda _params, x: self._loaded(x)

    def describe(self) -> Dict:
        return {"model": self._family, "artifact": self._artifact,
                "resolution": self.resolution,
                "batch_size": self.batch_size,
                "batch_sizes": self._rungs}

    def warmup(self):
        # one execution per compiled shape: the deserialized programs
        # still compile on first run, and a bundle's smaller rungs must
        # not pay that on the first low-traffic request
        for bs in self._rungs:
            x = np.zeros((bs, self.resolution, self.resolution, 3),
                         np.uint8)
            np.asarray(self._loaded(jnp.asarray(x))[0])
        self.ready = True

    def reload_params(self, params, folded: bool = False) -> None:
        raise ValueError(
            "AOT artifacts bake the weights in; POST /reload with "
            '{"weights": "<new artifact path>"} to swap programs')

    def reload_weights(self, path: str) -> None:
        """Hot-swap the entire artifact (weights AND program).  The
        replacement must keep the request contract clients rely on —
        same family (row layout) and input resolution — anything else
        is rejected before the swap."""
        from .export import load_detector
        new = load_detector(path)
        fam = new.meta.get("family", "darknet")
        if fam != self._family:
            raise ValueError(f"artifact family {fam!r} != serving "
                             f"{self._family!r}")
        if int(new.meta["resolution"]) != self.resolution:
            raise ValueError(
                f"artifact resolution {new.meta['resolution']} != "
                f"serving {self.resolution}")
        # warm outside the lock so in-flight traffic keeps the old
        # program while the new one compiles
        rungs = (list(new.batch_sizes) if hasattr(new, "batch_sizes")
                 else [int(new.meta["batch_size"])])
        for bs in rungs:
            x = np.zeros((bs, self.resolution, self.resolution, 3),
                         np.uint8)
            np.asarray(new(jnp.asarray(x))[0])
        with self._reload_lock:
            self._install(new, path)

    def _prep(self, img_bgr: np.ndarray) -> np.ndarray:
        if self._family.startswith("yolov5"):
            from .yolov5 import letterbox_v5
            return np.ascontiguousarray(
                letterbox_v5(img_bgr, self.resolution)[:, :, ::-1])
        return prep_image_host_u8(img_bgr, self.resolution)[0]

    def _unletterbox(self, rows: np.ndarray, w: int, h: int) -> np.ndarray:
        if rows is None or len(rows) == 0:
            return np.zeros((0, self.cls_col + 1), np.float32)
        if self._family.startswith("yolov5"):
            from ..ops.letterbox import letterbox_params_round
            return unletterbox_boxes(rows, w, h, self.resolution,
                                     params_fn=letterbox_params_round)
        return unletterbox_boxes(rows, w, h, self.resolution)


def _make_handler(service: DetectionService):
    class Handler(BaseHTTPRequestHandler):
        # chunked Transfer-Encoding (the /detect_stream response) is an
        # HTTP/1.1 framing; under the BaseHTTPRequestHandler default of
        # HTTP/1.0 spec-compliant clients (curl) would treat the chunk
        # size lines as body bytes.  Every other response carries an
        # explicit Content-Length, so keep-alive semantics stay sound.
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):  # quiet
            pass

        def _json(self, code: int, payload: Dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, dict(status="ok", **service.describe()))
            elif self.path == "/readyz":
                # readiness: the jitted program is compiled and warmed
                # (first compile through the axon service takes minutes —
                # load balancers must not route traffic before this)
                if service.ready:
                    self._json(200, {"ready": True})
                else:
                    self._json(503, {"ready": False,
                                     "reason": "model warming up"})
            elif self.path == "/metrics":
                body = service.stats.render(service.describe()).encode()
                self.send_response(200)
                self.send_header("Content-Type",
                                 "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._json(404, {"error": "unknown path"})

        def _rows_payload(self, rows, t0):
            service.stats.record_request(time.time() - t0)
            return {
                "boxes": rows.tolist(),
                "class_names": [service.classes[int(r[service.cls_col])]
                                for r in rows],
                "latency_ms": round((time.time() - t0) * 1000, 2),
            }

        def _detect_stream(self):
            """[4B big-endian length][image bytes]... -> chunked JSON
            lines, order-preserving; frames pipelined into the batcher."""
            import struct
            length = int(self.headers.get("Content-Length", 0))
            self.send_response(200)
            self.send_header("Content-Type", "application/x-ndjson")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()

            def emit(obj):
                line = (json.dumps(obj) + "\n").encode()
                self.wfile.write(f"{len(line):x}\r\n".encode()
                                 + line + b"\r\n")

            pending = []   # (result_queue, t0) in arrival order
            consumed = 0
            max_inflight = max(2, service.batch_size)
            while consumed + 4 <= length:
                hdr = self.rfile.read(4)
                consumed += 4
                (n,) = struct.unpack(">I", hdr)
                # never read past Content-Length: a malformed frame
                # claiming more bytes than remain would block this
                # handler thread on the socket until the client closes
                truncated = n > length - consumed
                data = self.rfile.read(min(n, length - consumed))
                consumed += len(data)
                if truncated:
                    pending.append(("truncated frame", time.time()))
                    break
                t0 = time.time()
                img = cv2.imdecode(np.frombuffer(data, np.uint8),
                                   cv2.IMREAD_COLOR)
                if img is None:
                    pending.append((None, t0))
                else:
                    pending.append((service.submit_image(img), t0))
                while len(pending) > max_inflight:
                    self._drain_one(pending, emit)
            if consumed < length:
                # drain a sub-4-byte tail (or a truncated frame's
                # remainder): HTTP/1.1 keep-alive reuses this socket, so
                # unread body bytes would be parsed as the NEXT
                # request's start line
                self.rfile.read(length - consumed)
            while pending:
                self._drain_one(pending, emit)
            self.wfile.write(b"0\r\n\r\n")  # chunked EOF

        def _drain_one(self, pending, emit):
            result, t0 = pending.pop(0)
            if result is None:
                service.stats.record_error()
                emit({"error": "undecodable image"})
                return
            if isinstance(result, str):
                service.stats.record_error()
                emit({"error": result})
                return
            try:
                rows = service.collect(result)
                emit(self._rows_payload(rows, t0))
            except BaseException as e:
                service.stats.record_error()
                emit({"error": repr(e)})

        def do_POST(self):
            if self.path == "/detect_stream":
                self._detect_stream()
                return
            if self.path == "/reload":
                # hot weight reload: {"weights": "<path>"} — swaps the
                # device params between batches, zero recompiles (see
                # DetectionService.reload_params).  Path-based by design:
                # the checkpoint must already be on the serving host
                # (a trainer tier's .weights / .npz / orbax dir).
                length = int(self.headers.get("Content-Length", 0))
                try:
                    body = json.loads(self.rfile.read(length) or b"{}")
                    path = body["weights"]   # TypeError: non-dict JSON
                except (ValueError, KeyError, TypeError) as e:
                    self._json(400, {"error": f"bad reload body: {e!r}"})
                    return
                t0 = time.time()
                try:
                    service.reload_weights(path)
                except FileNotFoundError as e:
                    self._json(404, {"error": repr(e)})
                    return
                except BaseException as e:
                    service.stats.record_error()
                    self._json(400, {"error": repr(e)})
                    return
                self._json(200, {"reloaded": path,
                                 "ms": round(1000 * (time.time() - t0),
                                             2)})
                return
            if self.path != "/detect":
                self._json(404, {"error": "unknown path"})
                return
            length = int(self.headers.get("Content-Length", 0))
            if length <= 0:
                self._json(400, {"error": "empty body"})
                return
            data = self.rfile.read(length)
            img = cv2.imdecode(np.frombuffer(data, np.uint8),
                               cv2.IMREAD_COLOR)
            if img is None:
                service.stats.record_error()
                self._json(400, {"error": "undecodable image"})
                return
            t0 = time.time()
            try:
                rows = service.detect_image(img)
            except BaseException as e:
                service.stats.record_error()
                self._json(500, {"error": repr(e)})
                return
            self._json(200, self._rows_payload(rows, t0))

    return Handler


class _Server(ThreadingHTTPServer):
    # socketserver's default listen backlog of 5 RSTs concurrent
    # connection bursts (a 16-client flood loses connections at accept
    # time before the handler ever runs); the micro-batcher exists
    # precisely for such bursts, so give the kernel room to queue them
    request_queue_size = 128


def serve(service: DetectionService, host: str = "0.0.0.0",
          port: int = 8000, block: bool = True):
    service.warmup()
    httpd = _Server((host, port), _make_handler(service))
    if block:  # pragma: no cover
        print(f"serving detection on {host}:{port}")
        httpd.serve_forever()
    return httpd
