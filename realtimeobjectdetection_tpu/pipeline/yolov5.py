"""YOLOv5 detection driver — native replacement for the hub pipeline.

The reference's ``Darknetv5Detector`` (/root/reference/detect.py:255-285)
downloads the model via torch.hub and lets ultralytics AutoShape do
everything: glob ``*.jpg``/``*.png``, letterbox (gray 114), forward, NMS
(conf 0.25, IoU 0.45, max 300), render, save ``det_yolov5_<name>``.

This driver owns that pipeline natively: our YOLOv5 graph
(:mod:`..models.yolov5`), jitted forward + decode + v5-semantics NMS on
TPU, and ultralytics-style rendering.  Weights come from a converted
ultralytics state dict (``--weights foo.pt`` saved via
``torch.save(model.state_dict())`` or an ``.npz`` export) — the zero-
egress build environment cannot fetch hub checkpoints, so random init
is the fallback (documented; the graph + converter carry the parity).
"""

from __future__ import annotations

import glob
import os
import time
from typing import Dict, List, Optional

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

import jax
import jax.numpy as jnp

from ..data.classnames import COCO80
from ..models.yolov5 import (YoloV5Config, decode_v5, init_yolov5_params,
                             make_yolov5_forward)
from ..ops.letterbox import letterbox_params_round, unletterbox_boxes
from ..ops.nms import nms_batch_v5
from .render import draw_detection, make_palette

__all__ = ["DetectorV5"]

V5_PAD_COLOR = 114  # ultralytics letterbox gray


def letterbox_v5(img: np.ndarray, size: int) -> np.ndarray:
    """Square letterbox with 114-gray padding, bilinear resize and
    round() extents (AutoShape's non-rect path)."""
    h, w = img.shape[:2]
    _, new_w, new_h, off_x, off_y = letterbox_params_round(w, h, size)
    resized = cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
    canvas = np.full((size, size, 3), V5_PAD_COLOR, np.uint8)
    canvas[off_y:off_y + new_h, off_x:off_x + new_w] = resized
    return canvas


def make_divisible(x: float, divisor: int) -> int:
    """Ceil to a multiple (ultralytics utils.general.make_divisible)."""
    import math
    return int(math.ceil(x / divisor) * divisor)


def rect_shape(w: int, h: int, size: int, stride: int = 32,
               bucket: int = 64):
    """AutoShape's rectangular target canvas for one image.

    AutoShape scales so the long side is ``size`` and rounds each side UP
    to a multiple of the model stride — it does NOT pad to a square
    (hub AutoShape.forward; the reference rides it at detect.py:277-285).
    On TPU every distinct canvas is a separate compiled program, so the
    short side is additionally quantized up to a multiple of ``bucket``
    (default 64 = 2x stride), bounding the program count at
    ``size / bucket`` per orientation while keeping the long side exact.
    ``bucket=stride`` gives the exact AutoShape canvas.

    Returns (target_h, target_w).
    """
    g = size / max(w, h)
    th = make_divisible(h * g, stride)
    tw = make_divisible(w * g, stride)
    th = make_divisible(th, bucket) if th < size else size
    tw = make_divisible(tw, bucket) if tw < size else size
    return th, tw


def letterbox_v5_rect(img: np.ndarray, th: int, tw: int):
    """Ultralytics ``letterbox(im, (th, tw), auto=False)``: bilinear
    resize by ``r = min(th/h, tw/w)``, near-center 114-gray padding with
    the round(d-0.1)/round(d+0.1) split.

    Returns (canvas, r, pad_left, pad_top) for box un-mapping.
    """
    h, w = img.shape[:2]
    r = min(th / h, tw / w)
    nw, nh = int(round(w * r)), int(round(h * r))
    resized = img if (nw, nh) == (w, h) else cv2.resize(
        img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    dw, dh = (tw - nw) / 2, (th - nh) / 2
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    canvas = cv2.copyMakeBorder(resized, top, bottom, left, right,
                                cv2.BORDER_CONSTANT,
                                value=(V5_PAD_COLOR,) * 3)
    return canvas, r, left, top


class DetectorV5:
    def __init__(self, images: str, model_size: str = "L",
                 destination: str = "det",
                 weights_path: Optional[str] = None,
                 size: int = 640, confidence: float = 0.25,
                 iou_thresh: float = 0.45, max_det: int = 300,
                 num_classes: int = 80, batch_size: int = 1,
                 compute_dtype=jnp.bfloat16,
                 rect: bool = False, rect_bucket: int = 64,
                 fused_decode: bool = False, top_k: int = 512,
                 activation_dtype=None,
                 pipeline_stages: Optional[int] = None):
        """``rect``: AutoShape's rectangular inference (pad to stride
        multiples, not to a square — hub AutoShape semantics, the path
        the reference actually rides at detect.py:277-285).  Off by
        default.  With ``batch_size > 1`` images are grouped by their
        bucketed canvas shape and batched *within* each group — NMS is
        per-image, so batching cannot change any image's boxes, only
        amortize dispatch.  ``rect_bucket``: short-side quantum bounding
        the compiled-program count (see rect_shape)."""
        if model_size.upper() not in ("N", "S", "M", "L", "X"):
            raise Exception("Unknown YOLOv5 size input")
        self.cfg = YoloV5Config(model_size.lower(), num_classes)
        self.images_dir = images
        self.destination = destination
        self.size = size
        self.confidence = confidence
        self.iou_thresh = iou_thresh
        self.max_det = max_det
        self.rect = rect
        self.rect_bucket = rect_bucket
        self.batch_size = batch_size
        # decode/letterbox thread pool (auto: one per core up to 4)
        import os as _os
        _w = max(1, min(4, _os.cpu_count() or 1))
        if _w > 1:
            from concurrent.futures import ThreadPoolExecutor
            self._pool = ThreadPoolExecutor(
                _w, thread_name_prefix="rodtpu-v5det")
        else:
            self._pool = None
        self.classes = COCO80
        self.metrics: Dict[str, object] = {}

        self.params = self._load_params(weights_path)
        self.params = jax.device_put(self.params)
        # activation_dtype=jnp.bfloat16: bf16 inter-layer residency (the
        # serving fast path, halves activation HBM traffic; drift gated
        # by tests/test_yolov5.py::test_v5_act_bf16_drift_bounded).
        # None = fp32 activations, the AutoShape-parity default.
        fwd = make_yolov5_forward(self.cfg, compute_dtype=compute_dtype,
                                  activation_dtype=activation_dtype)
        nc, conf, iou, md = num_classes, confidence, iou_thresh, max_det
        tk = top_k

        def post(heads):
            if fused_decode:
                from ..models.yolov5 import decode_v5_topk
                pred = decode_v5_topk(heads, nc, tk, conf)
                return nms_batch_v5(pred, nc, conf, iou, top_k=tk,
                                    max_det=md)
            pred = decode_v5(heads, nc)
            return nms_batch_v5(pred, nc, conf, iou, max_det=md)

        def detect(p, x):
            # uint8 in, normalized on device (quarter the tunnel traffic)
            x = x.astype(jnp.float32) / 255.0
            return post(fwd(p, x))

        # pipeline parallelism: FLOP-balanced stage programs on distinct
        # devices (parallel/pipeline.PipelinedForwardV5, bit-identical
        # heads); decode+NMS jits on the last stage's device.  Same
        # integration as DetectorV3(pipeline_stages=...).
        self.pipeline = None
        if pipeline_stages and int(pipeline_stages) > 1:
            from ..parallel.pipeline import PipelinedForwardV5
            pf = PipelinedForwardV5(
                self.cfg, self.params, n_stages=int(pipeline_stages),
                compute_dtype=compute_dtype,
                activation_dtype=activation_dtype, resolution=size)
            self.pipeline = pf
            self._detect = pf.make_detect(post)
        else:
            self._detect = jax.jit(detect)  # one program per canvas shape

    def _load_params(self, weights_path):
        if weights_path is None:
            return init_yolov5_params(self.cfg, seed=0)
        from ..models.yolov5 import load_v5_checkpoint
        return load_v5_checkpoint(self.cfg, weights_path)

    # ------------------------------------------------------------------
    def list_images(self) -> List[str]:
        """Parity with detect.py:259-260 (glob jpg + png)."""
        paths = glob.glob(os.path.join(self.images_dir, "*.jpg"))
        paths.extend(glob.glob(os.path.join(self.images_dir, "*.png")))
        return paths

    def _rect_groups(self, paths: List[str]) -> List[List[str]]:
        """Group images by their bucketed rect canvas so a batch shares
        one static shape (one compiled program per canvas, images of the
        same aspect bucket ride it together).  Dims come from the image
        header (PIL lazy open) — no full decode."""
        from PIL import Image
        groups: Dict[tuple, List[str]] = {}
        for p in paths:
            with Image.open(p) as im:
                w, h = im.size
            key = rect_shape(w, h, self.size, bucket=self.rect_bucket)
            groups.setdefault(key, []).append(p)
        return list(groups.values())

    def _prep_one(self, path):
        img = cv2.imread(path)
        if img is None:
            raise FileNotFoundError(path)
        if self.rect:
            th, tw = rect_shape(img.shape[1], img.shape[0], self.size,
                                bucket=self.rect_bucket)
            canvas, r, left, top = letterbox_v5_rect(img, th, tw)
            return img, canvas[:, :, ::-1], (r, left, top)
        return img, letterbox_v5(img, self.size)[:, :, ::-1], None

    def _prep_batch(self, chunk):
        # per-image decode+letterbox over a small thread pool (cv2
        # releases the GIL) — same rationale as DetectorV3._loader_thread
        if self._pool is not None:
            loaded = list(self._pool.map(self._prep_one, chunk))
        else:
            loaded = [self._prep_one(p) for p in chunk]
        imgs = [l[0] for l in loaded]
        dims = [(im.shape[1], im.shape[0]) for im in imgs]
        canvases = [l[1] for l in loaded]
        geoms = [l[2] for l in loaded]
        batch = np.stack(canvases)  # uint8; normalized on device
        if len(chunk) < self.batch_size:  # pad tail to the static shape
            batch = np.concatenate(
                [batch, np.repeat(batch[-1:],
                                  self.batch_size - len(chunk), 0)], 0)
        return imgs, dims, geoms, np.ascontiguousarray(batch)

    def __call__(self, verbose: bool = True) -> Dict[str, object]:
        os.makedirs(self.destination, exist_ok=True)
        palette = make_palette(100)
        paths = self.list_images()
        bs = self.batch_size
        # one batch in flight: dispatch i+1 before reading i back so the
        # host render/IO overlaps device compute (same pattern as
        # DetectorV3.__call__)
        pending = None
        if self.rect and bs > 1:
            chunks = [g[s:s + bs] for g in self._rect_groups(paths)
                      for s in range(0, len(g), bs)]
        else:
            chunks = [paths[s:s + bs] for s in range(0, len(paths), bs)]
        for idx in range(len(chunks) + 1):
            item = None
            if idx < len(chunks):
                chunk = chunks[idx]
                imgs, dims, geoms, batch = self._prep_batch(chunk)
                t0 = time.time()
                out = self._detect(self.params, jnp.asarray(batch))
                item = (chunk, imgs, dims, geoms, t0, out)
            if pending is not None:
                self._drain(pending, palette, verbose)
            pending = item
        return self.metrics

    def _drain(self, pending, palette, verbose):
        chunk, imgs, dims, geoms, t0, (boxes, valid) = pending
        boxes = np.asarray(boxes)  # host readback = true sync
        valid = np.asarray(valid)
        dt = (time.time() - t0) / len(chunk)
        for j, path in enumerate(chunk):
            name = os.path.basename(path)
            w, h = dims[j]
            rows = self._unletterbox(boxes[j][valid[j]], w, h, geoms[j])
            self.metrics[name] = rows.tolist() if len(rows) else 0
            img = imgs[j]
            for r in rows:
                cls = int(r[5])
                draw_detection(img, r[:4], self.classes[cls],
                               float(r[4]), palette[cls % len(palette)])
            cv2.imwrite(os.path.join(self.destination,
                                     "det_yolov5_" + name), img)
            if verbose:
                print(f"{name:20s} {len(rows)} objects in {dt:6.3f}s")

    def _unletterbox(self, rows: np.ndarray, w: int, h: int,
                     geom=None) -> np.ndarray:
        if len(rows) == 0:
            return rows
        if geom is not None:  # rect mode: (r, pad_left, pad_top)
            r, left, top = geom
            out = rows.copy()
            out[:, [0, 2]] = np.clip((out[:, [0, 2]] - left) / r, 0, w)
            out[:, [1, 3]] = np.clip((out[:, [1, 3]] - top) / r, 0, h)
            return out
        return unletterbox_boxes(rows, w, h, self.size,
                                 params_fn=letterbox_params_round)
