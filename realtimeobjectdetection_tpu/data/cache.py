"""On-disk letterboxed-canvas cache: decode each image ONCE per
(path, resolution), then serve epochs 2+ straight from a memmap.

Why: the reference re-decodes and re-letterboxes every image every epoch
(/root/reference/src/dataset.py:288-303 — PIL open + cv2 INTER_CUBIC per
__getitem__); on a 1-core host that caps the REAL loader at ~7 img/s
while the v5s train step sustains 700 img/s (PERFORMANCE.md).  The
letterboxed uint8 canvas at the BASE resolution is the exact loader
output (multiscale rescales in-graph, train/trainer.py), is integral
(so /255 on device is bit-identical to the float path,
ops/letterbox.prep_image_host_u8), and is immutable for a given source
file — the textbook memoization target.

Layout (under ``cache_dir``), one trio per dataset fingerprint:

* ``<key>.canvases.npy`` — ``np.lib.format`` memmap, [N, D, D, 3] u8
* ``<key>.filled.npy``   — memmap, [N] u8 (1 = slot valid)
* ``<key>.manifest.json``— paths + resolution + prep tag (debug)

The fingerprint covers the ordered path list, each file's (size, mtime),
the resolution, and a prep tag (cv2 vs native bicubic produce ±1 LSB
different canvases — they must not share slots).  Any source change
yields a new key; stale trios are just dead files.

Writes are per-index and disjoint, so the loader's decode thread pool
can fill the cache concurrently without locking; the ``filled`` flag is
written after the canvas slice, so a torn write is re-decoded, never
served.
"""

from __future__ import annotations

import hashlib
import json
import os
import threading
from typing import List, Optional

import numpy as np

__all__ = ["CanvasCache", "decode_canvas_u8"]


def decode_canvas_u8(path: str, resolution: int, host_prep: str = "cv2",
                     cache: "Optional[CanvasCache]" = None,
                     index: Optional[int] = None) -> np.ndarray:
    """Letterboxed RGB uint8 canvas for one image — the shared pixel
    path of the VOC/COCO datasets (data/voc.py, data/coco.py).

    ``host_prep="cv2"``: PIL decode + cv2 INTER_CUBIC (golden parity,
    ops/letterbox.prep_image_host_u8).  ``"native"``: cv2.imread + the
    C++ fixed-point bicubic engine (native/letterbox.cpp, ±1 LSB).
    With ``cache``, the decode is skipped on a hit and memoized on a
    miss.
    """
    if cache is not None:
        c = cache.get(index)
        if c is not None:
            return c
    if host_prep == "native":
        import cv2

        from ..native import letterbox_batch_native
        bgr = cv2.imread(path)
        if bgr is None:
            raise FileNotFoundError(path)
        canvas = letterbox_batch_native([bgr], resolution)[0]
    else:
        from PIL import Image

        from ..ops.letterbox import prep_image_host_u8
        with Image.open(path) as im:
            arr = np.asarray(im.convert("RGB"))
        canvas = prep_image_host_u8(arr, resolution, mode="RGB")[0]
    if cache is not None:
        cache.put(index, canvas)
    return canvas


class CanvasCache:
    def __init__(self, cache_dir: str, paths: List[str], resolution: int,
                 prep_tag: str = "cv2"):
        self.resolution = int(resolution)
        self.paths = list(paths)
        self.prep_tag = prep_tag
        os.makedirs(cache_dir, exist_ok=True)

        h = hashlib.sha1()
        h.update(f"v1:{self.resolution}:{prep_tag}:{len(paths)}"
                 .encode())
        for p in self.paths:
            try:
                st = os.stat(p)
                sig = f"{p}:{st.st_size}:{int(st.st_mtime)}"
            except OSError:
                sig = f"{p}:missing"
            h.update(sig.encode())
        self.key = h.hexdigest()[:16]
        self._canvases_path = os.path.join(cache_dir,
                                           f"{self.key}.canvases.npy")
        self._filled_path = os.path.join(cache_dir, f"{self.key}.filled.npy")
        self._manifest_path = os.path.join(cache_dir,
                                           f"{self.key}.manifest.json")
        self._lock = threading.Lock()
        self._canvases = None
        self._filled = None
        self._open()

    # -- storage ------------------------------------------------------
    def _open(self):
        n, d = len(self.paths), self.resolution
        with self._lock:
            fresh = not (os.path.exists(self._canvases_path)
                         and os.path.exists(self._filled_path))
            if fresh:
                # w+ creates zero-filled files of the full size up front;
                # sparse on every mainstream filesystem, so an unfilled
                # cache costs near-zero disk.
                self._canvases = np.lib.format.open_memmap(
                    self._canvases_path, mode="w+", dtype=np.uint8,
                    shape=(n, d, d, 3))
                self._filled = np.lib.format.open_memmap(
                    self._filled_path, mode="w+", dtype=np.uint8,
                    shape=(n,))
                with open(self._manifest_path, "w") as f:
                    json.dump({"resolution": d, "prep_tag": self.prep_tag,
                               "n": n, "paths": self.paths}, f)
            else:
                self._canvases = np.lib.format.open_memmap(
                    self._canvases_path, mode="r+")
                self._filled = np.lib.format.open_memmap(
                    self._filled_path, mode="r+")
                if (self._canvases.shape != (n, d, d, 3)
                        or self._filled.shape != (n,)):
                    raise ValueError(
                        f"canvas cache {self.key} shape mismatch: "
                        f"{self._canvases.shape} vs {(n, d, d, 3)}")

    # -- API ----------------------------------------------------------
    def get(self, index: int) -> Optional[np.ndarray]:
        """Cached [D, D, 3] uint8 canvas, or None if not yet decoded."""
        if not self._filled[index]:
            return None
        return np.asarray(self._canvases[index])

    def put(self, index: int, canvas: np.ndarray) -> None:
        assert canvas.dtype == np.uint8 and canvas.shape == (
            self.resolution, self.resolution, 3), (canvas.dtype,
                                                   canvas.shape)
        self._canvases[index] = canvas
        self._filled[index] = 1

    def hits(self) -> int:
        return int(np.asarray(self._filled).sum())

    def complete(self) -> bool:
        return self.hits() == len(self.paths)
