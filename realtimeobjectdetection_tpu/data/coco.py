"""COCO dataset (instances_*.json) -> letterboxed NHWC samples.

Rebuild of the reference ``COCO`` Dataset (/root/reference/src/dataset.py:
179-376): non-crowd image ids, the 91->80 category remap with the same
deleted-id table (dataset.py:204, 227-242), rows
``[cx, cy, w, h, 1.0, one-hot(80)]`` in letterbox pixel space
(dataset.py:288-303), plus the ``keep_img_name`` / ``only_ground_truth``
modes the validator relies on (dataset.py:348-357).

Fixed (documented): the reference rescans the full annotation list for
every sample (O(images x annotations), dataset.py:290); we index
annotations by image id once at load.
"""

from __future__ import annotations

import json
import os
from contextlib import contextmanager
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

from .cache import decode_canvas_u8 as _decode_canvas_u8

__all__ = ["COCODataset"]

# category ids absent from the 80-class YOLO set (dataset.py:204)
DELETED_CLS = [12, 26, 29, 30, 45, 66, 68, 69, 71, 83, 91]


def coco2yolo(category_id: int) -> int:
    """91-id space -> contiguous index (parity: dataset.py:227-242).

    NOTE the reference convention: the returned index is 1-based into an
    [obj, 80-class] vector, i.e. class slot = coco2yolo(id) - 1.
    """
    ex = 0
    for d in DELETED_CLS:
        if category_id < d:
            return category_id - ex
        ex += 1
    return category_id - ex


class COCODataset:
    def __init__(self, annotations_json: str, img_dir: str,
                 resolution: int = 416, keep_img_name: bool = False,
                 only_ground_truth: bool = False, non_crowd: bool = True,
                 uint8: bool = False, cache_dir: Optional[str] = None,
                 host_prep: str = "cv2"):
        # uint8=True: __getitem__ returns the RGB uint8 letterbox canvas
        # (prep_image_host_u8) instead of the /255 float — bit-identical
        # after the train step's on-device normalization, 4x less
        # host->device upload per batch (the training twin of the
        # serving pipeline's uint8 feed).
        #
        # cache_dir: on-disk letterboxed-canvas cache (data/cache.py) —
        # each image is decoded+letterboxed ONCE per (path, resolution);
        # epochs 2+ serve the memmapped uint8 canvas, bit-identical to a
        # fresh decode (the reference re-decodes every epoch,
        # /root/reference/src/dataset.py:288-303).
        #
        # host_prep: "cv2" = PIL decode + cv2 INTER_CUBIC (bit-parity
        # with the goldens); "native" = cv2.imread + the C++ fixed-point
        # bicubic letterbox engine (native/letterbox.cpp, ±1 LSB vs cv2,
        # threaded) — the fast path the detection pipeline already uses
        # (pipeline/detector.py host_prep="native").
        assert host_prep in ("cv2", "native")
        self.resolution = int(resolution)
        self.img_dir = img_dir
        self.keep_img_name = keep_img_name
        self.only_gt = only_ground_truth
        self.uint8 = uint8
        self.host_prep = host_prep
        if host_prep == "native":
            from ..native import available
            if not available():
                raise ValueError("host_prep='native' but the native "
                                 "letterbox engine is unavailable")

        ann = json.load(open(annotations_json))
        self.images = {i["id"]: i for i in ann["images"]}
        by_img: Dict[int, List[dict]] = {}
        ids = []
        for a in ann["annotations"]:
            if non_crowd and a.get("iscrowd"):
                continue
            ids.append(a["image_id"])
            by_img.setdefault(a["image_id"], []).append(a)
        # parity: reference keeps list(set(ids)) — unordered in principle,
        # CPython-set order in practice; we sort for determinism
        self.img_ids = sorted(set(ids))
        self.by_img = by_img

        self._cache = None
        if cache_dir is not None:
            from .cache import CanvasCache
            paths = [os.path.join(img_dir,
                                  self.images[i]["file_name"])
                     for i in self.img_ids]
            self._cache = CanvasCache(cache_dir, paths, self.resolution,
                                      prep_tag=host_prep)

    def __len__(self) -> int:
        return len(self.img_ids)

    def _pad_ratio(self, w: int, h: int):
        max_side = max(w, h)
        ratio = self.resolution / max_side
        pad = (int((max_side - w) * ratio / 2),
               int((max_side - h) * ratio / 2))
        return pad, ratio

    def boxes_for(self, img_id: int, pad, ratio) -> Optional[np.ndarray]:
        annots = self.by_img.get(img_id, [])
        rows = []
        for a in annots:
            row = np.zeros(85, np.float32)
            x, y, w, h = a["bbox"][:4]
            row[0] = x * ratio + w * ratio / 2 + pad[0]
            row[1] = y * ratio + h * ratio / 2 + pad[1]
            row[2] = w * ratio
            row[3] = h * ratio
            row[4] = 1.0
            cls_slot = coco2yolo(a["category_id"])  # 1-based (see above)
            row[4 + cls_slot] = 1.0
            rows.append(row)
        return np.stack(rows, axis=0) if rows else None

    def __getitem__(self, index: int):
        img_id = self.img_ids[index]
        info = self.images[img_id]
        path = os.path.join(self.img_dir, info["file_name"])
        if self.only_gt:
            # no pixel decode needed: dims come from the annotation json
            # (or a lazy header read) — offline re-scoring of a 5k-image
            # set shouldn't pay 5k JPEG decodes
            if "width" in info and "height" in info:
                w, h = int(info["width"]), int(info["height"])
            else:
                with Image.open(path) as im:
                    w, h = im.size
            pad, ratio = self._pad_ratio(w, h)
            boxes = self.boxes_for(img_id, pad, ratio)
            return (info["file_name"], boxes) if self.keep_img_name \
                else boxes

        if "width" in info and "height" in info:
            w, h = int(info["width"]), int(info["height"])
        else:
            with Image.open(path) as im:  # header read, no pixel decode
                w, h = im.size
        pad, ratio = self._pad_ratio(w, h)
        boxes = self.boxes_for(img_id, pad, ratio)
        canvas = _decode_canvas_u8(path, self.resolution, self.host_prep,
                                   self._cache, index)
        # u8 canvas -> /255 float is bit-identical to prep_image_host
        # (integral canvas values, see ops/letterbox.prep_image_host_u8)
        sample = canvas if self.uint8 \
            else canvas.astype(np.float32) / np.float32(255.0)
        if self.keep_img_name:
            return info["file_name"], sample, boxes
        return sample, boxes

    @contextmanager
    def only_ground_truth(self):
        """Parity with dataset.py:348-357."""
        prev = self.only_gt
        try:
            self.only_gt = True
            yield
        finally:
            self.only_gt = prev
