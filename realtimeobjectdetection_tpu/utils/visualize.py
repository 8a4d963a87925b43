"""Debug visualization of dataset targets (the reference's draw_boxes
dev helper, /root/reference/src/util.py:78-103).

Draws xywh ground-truth rows on an image and saves/returns it instead of
calling ``.show()`` (headless TPU hosts have no display).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from PIL import Image, ImageDraw

__all__ = ["draw_target_boxes"]


def draw_target_boxes(img, boxes, out_path: Optional[str] = None,
                      require_person_flag: bool = True):
    """Draw [cx, cy, w, h, obj, one-hot...] rows; returns a PIL image.

    ``img`` is an NHWC float [0,1] array, HWC uint8 array, or PIL image.
    ``require_person_flag`` skips rows whose column 5 != 1 — the
    reference's behavior (src/util.py:94-95).
    """
    if isinstance(img, np.ndarray):
        arr = img
        if arr.ndim == 4:
            arr = arr[0]
        if arr.dtype != np.uint8:
            arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
        img = Image.fromarray(arr)
    draw = ImageDraw.Draw(img)
    for b in np.asarray(boxes):
        if require_person_flag and b[5] != 1:
            continue
        cx, cy, w, h = b[:4]
        draw.rectangle([int(cx - w / 2), int(cy - h / 2),
                        int(cx + w / 2), int(cy + h / 2)], outline="red")
    if out_path:
        img.save(out_path)
    return img
