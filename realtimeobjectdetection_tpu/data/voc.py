"""PASCAL VOC dataset (XML annotations) -> letterboxed NHWC samples.

Rebuild of the reference ``VOC`` Dataset (/root/reference/src/dataset.py:
19-176): globs ``<xml_dir>/*.xml``, parses ``<object><name>person</name>``
boxes only (dataset.py:86-95), and emits target rows
``[cx, cy, w, h, 1, 1, 0*79]`` (85 cols) in letterbox pixel space
(dataset.py:130-140).

Deviation (documented): the reference derives the image filename from a
fixed character slice ``xml_path[-15:-4]`` (dataset.py:51), which only
works for 11-char VOC stems; we use the xml basename, identical for real
VOC files and correct for everything else.
"""

from __future__ import annotations

import glob
import os
from typing import Optional, Tuple
from xml.etree import ElementTree as ET

import numpy as np
from PIL import Image

from .cache import decode_canvas_u8 as _decode_canvas_u8

__all__ = ["VOCDataset"]


class VOCDataset:
    def __init__(self, xml_directory: str, img_directory: str,
                 resolution: int = 416, fformat: str = ".jpg",
                 uint8: bool = False, cache_dir: Optional[str] = None,
                 host_prep: str = "cv2"):
        # uint8=True: return the RGB uint8 letterbox canvas (see
        # COCODataset) — bit-identical after on-device /255, 4x less
        # host->device upload.
        # cache_dir / host_prep: letterboxed-canvas memoization + native
        # C++ prep — same contract as COCODataset (data/cache.py).
        assert host_prep in ("cv2", "native")
        self.uint8 = uint8
        self.host_prep = host_prep
        if host_prep == "native":
            from ..native import available
            if not available():
                raise ValueError("host_prep='native' but the native "
                                 "letterbox engine is unavailable")
        self.resolution = int(resolution)
        self.xml_paths = sorted(glob.glob(os.path.join(xml_directory,
                                                       "*.xml")))
        if not self.xml_paths:
            raise FileNotFoundError(
                f"no .xml files under {xml_directory!r}")
        self.img_paths = [
            os.path.join(img_directory,
                         os.path.basename(p)[:-4] + fformat)
            for p in self.xml_paths
        ]
        self._cache = None
        if cache_dir is not None:
            from .cache import CanvasCache
            self._cache = CanvasCache(cache_dir, self.img_paths,
                                      self.resolution,
                                      prep_tag=host_prep)

    def __len__(self) -> int:
        return len(self.xml_paths)

    @staticmethod
    def read_boxes(xml_path: str) -> Optional[np.ndarray]:
        """Person xyxy boxes from one annotation file, or None."""
        doc = ET.parse(xml_path).getroot()
        out = []
        for elem in doc.findall("object"):
            if elem.find("name").text == "person":
                bb = elem.find("bndbox")
                out.append([float(bb.find("xmin").text),
                            float(bb.find("ymin").text),
                            float(bb.find("xmax").text),
                            float(bb.find("ymax").text)])
        return np.asarray(out, np.float32) if out else None

    def __getitem__(self, i: int) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        """-> (image [D, D, 3] float32 NHWC-RGB, boxes [n, 85] or None)."""
        with Image.open(self.img_paths[i]) as im:  # header read only
            w, h = im.size
        canvas = _decode_canvas_u8(self.img_paths[i], self.resolution,
                                   self.host_prep, self._cache, i)
        # u8 -> /255 float is bit-identical to prep_image_host (integral
        # canvas values, see ops/letterbox.prep_image_host_u8)
        sample = canvas if self.uint8 \
            else canvas.astype(np.float32) / np.float32(255.0)

        xyxy = self.read_boxes(self.xml_paths[i])
        if xyxy is None:
            return sample, None
        # xyxy -> letterbox-space cxcywh + [obj=1, person one-hot]
        # (reference math: dataset.py:117-140 — integer pad offsets)
        max_side = max(w, h)
        ratio = self.resolution / max_side
        pad = (int((max_side - w) * ratio / 2),
               int((max_side - h) * ratio / 2))
        n = xyxy.shape[0]
        rows = np.zeros((n, 85), np.float32)
        rows[:, 0] = (xyxy[:, 0] + xyxy[:, 2]) / 2 * ratio + pad[0]
        rows[:, 1] = (xyxy[:, 1] + xyxy[:, 3]) / 2 * ratio + pad[1]
        rows[:, 2] = (xyxy[:, 2] - xyxy[:, 0]) * ratio
        rows[:, 3] = (xyxy[:, 3] - xyxy[:, 1]) * ratio
        rows[:, 4] = 1.0
        rows[:, 5] = 1.0  # person one-hot (class 0)
        return sample, rows
