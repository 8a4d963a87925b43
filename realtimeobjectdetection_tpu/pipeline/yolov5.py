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


class DetectorV5:
    def __init__(self, images: str, model_size: str = "L",
                 destination: str = "det",
                 weights_path: Optional[str] = None,
                 size: int = 640, confidence: float = 0.25,
                 iou_thresh: float = 0.45, max_det: int = 300,
                 num_classes: int = 80, batch_size: int = 1,
                 compute_dtype=jnp.bfloat16):
        if model_size.upper() not in ("N", "S", "M", "L", "X"):
            raise Exception("Unknown YOLOv5 size input")
        self.cfg = YoloV5Config(model_size.lower(), num_classes)
        self.images_dir = images
        self.destination = destination
        self.size = size
        self.confidence = confidence
        self.iou_thresh = iou_thresh
        self.max_det = max_det
        self.batch_size = batch_size
        self.classes = COCO80
        self.metrics: Dict[str, object] = {}

        self.params = self._load_params(weights_path)
        self.params = jax.device_put(self.params)
        fwd = make_yolov5_forward(self.cfg, compute_dtype=compute_dtype)
        nc, conf, iou, md = num_classes, confidence, iou_thresh, max_det

        def detect(p, x):
            # uint8 in, normalized on device (quarter the tunnel traffic)
            x = x.astype(jnp.float32) / 255.0
            pred = decode_v5(fwd(p, x), nc)
            return nms_batch_v5(pred, nc, conf, iou, max_det=md)

        self._detect = jax.jit(detect)

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

    def _prep_batch(self, chunk):
        imgs, dims, canvases = [], [], []
        for path in chunk:
            img = cv2.imread(path)
            if img is None:
                raise FileNotFoundError(path)
            imgs.append(img)
            dims.append((img.shape[1], img.shape[0]))
            canvases.append(letterbox_v5(img, self.size)[:, :, ::-1])
        batch = np.stack(canvases)  # uint8; normalized on device
        if len(chunk) < self.batch_size:  # pad tail to the static shape
            batch = np.concatenate(
                [batch, np.repeat(batch[-1:],
                                  self.batch_size - len(chunk), 0)], 0)
        return imgs, dims, np.ascontiguousarray(batch)

    def __call__(self, verbose: bool = True) -> Dict[str, object]:
        os.makedirs(self.destination, exist_ok=True)
        palette = make_palette(100)
        paths = self.list_images()
        bs = self.batch_size
        # one batch in flight: dispatch i+1 before reading i back so the
        # host render/IO overlaps device compute (same pattern as
        # DetectorV3.__call__)
        pending = None
        chunks = [paths[s:s + bs] for s in range(0, len(paths), bs)]
        for idx in range(len(chunks) + 1):
            item = None
            if idx < len(chunks):
                chunk = chunks[idx]
                imgs, dims, batch = self._prep_batch(chunk)
                t0 = time.time()
                out = self._detect(self.params, jnp.asarray(batch))
                item = (chunk, imgs, dims, t0, out)
            if pending is not None:
                self._drain(pending, palette, verbose)
            pending = item
        return self.metrics

    def _drain(self, pending, palette, verbose):
        chunk, imgs, dims, t0, (boxes, valid) = pending
        boxes = np.asarray(boxes)  # host readback = true sync
        valid = np.asarray(valid)
        dt = (time.time() - t0) / len(chunk)
        for j, path in enumerate(chunk):
            name = os.path.basename(path)
            w, h = dims[j]
            rows = self._unletterbox(boxes[j][valid[j]], w, h)
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

    def _unletterbox(self, rows: np.ndarray, w: int, h: int) -> np.ndarray:
        if len(rows) == 0:
            return rows
        return unletterbox_boxes(rows, w, h, self.size,
                                 params_fn=letterbox_params_round)
