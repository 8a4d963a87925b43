"""Box geometry ops (jnp, fixed-shape, vectorized).

IoU keeps the Darknet "+1" convention of the reference
(/root/reference/src/util.py:144-149): both intersection extents and areas
use ``x2 - x1 + 1``.  NMS/validator parity depends on it.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["xyxy2xywh", "xywh2xyxy", "iou_xyxy", "iou_matrix", "wh_iou"]


def xyxy2xywh(box):
    """Corner -> center format; extra trailing attrs pass through.

    Parity: /root/reference/src/util.py:10-26.
    """
    x1, y1, x2, y2 = box[..., 0], box[..., 1], box[..., 2], box[..., 3]
    out = jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)
    return jnp.concatenate([out, box[..., 4:]], axis=-1)


def xywh2xyxy(box):
    """Center -> corner format; extra trailing attrs pass through.

    Parity: /root/reference/src/util.py:29-45.
    """
    cx, cy, w, h = box[..., 0], box[..., 1], box[..., 2], box[..., 3]
    out = jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)
    return jnp.concatenate([out, box[..., 4:]], axis=-1)


def iou_xyxy(box1, box2, plus_one: bool = True):
    """Elementwise IoU of broadcastable corner-format boxes [..., 4]."""
    e = 1.0 if plus_one else 0.0
    ix1 = jnp.maximum(box1[..., 0], box2[..., 0])
    iy1 = jnp.maximum(box1[..., 1], box2[..., 1])
    ix2 = jnp.minimum(box1[..., 2], box2[..., 2])
    iy2 = jnp.minimum(box1[..., 3], box2[..., 3])
    inter = jnp.clip(ix2 - ix1 + e, 0, None) * jnp.clip(iy2 - iy1 + e, 0, None)
    a1 = (box1[..., 2] - box1[..., 0] + e) * (box1[..., 3] - box1[..., 1] + e)
    a2 = (box2[..., 2] - box2[..., 0] + e) * (box2[..., 3] - box2[..., 1] + e)
    return inter / (a1 + a2 - inter)


def iou_matrix(boxes1, boxes2, plus_one: bool = True):
    """[N, 4] x [M, 4] -> [N, M] dense IoU matrix."""
    return iou_xyxy(boxes1[:, None, :], boxes2[None, :, :], plus_one=plus_one)


def wh_iou(wh1, wh2, reference_bug: bool = False):
    """IoU of (w, h) pairs anchored at a common corner.

    ``reference_bug=True`` replicates /root/reference/src/util.py:169 where
    ``w2, h2 = wh2[0], wh2[0]`` uses the width twice — the reference's
    training anchor assignment effectively matched width-square anchors.
    Default is the fixed formula.
    """
    wh1 = jnp.asarray(wh1, jnp.float32)
    wh2 = jnp.asarray(wh2, jnp.float32)
    w1, h1 = wh1[..., 0], wh1[..., 1]
    w2 = wh2[..., 0]
    h2 = wh2[..., 0] if reference_bug else wh2[..., 1]
    inter = jnp.minimum(w1, w2) * jnp.minimum(h1, h2)
    union = w1 * h1 + w2 * h2 - inter
    return inter / union


def xywh_to_yolo_cell(box, stride: float, anchor):
    """Grid-encode one xywh box for training targets.

    Parity with the reference ``xywh2YOLO`` (src/util.py:48-75) including
    its return order ``(y_cell, x_cell, y_frac, x_frac, log_w, log_h)``
    — note the y-first convention its caller then mis-unpacks (see
    train/targets.py ``parity_swap_xy``).  The vectorized trainer path is
    :func:`realtimeobjectdetection_tpu.train.targets.build_targets`; this
    scalar helper exists for API completeness and tests.
    """
    box = jnp.asarray(box, jnp.float32)
    x = box[..., 0] / stride
    y = box[..., 1] / stride
    x_cell = jnp.floor(x).astype(jnp.int32)
    y_cell = jnp.floor(y).astype(jnp.int32)
    anchor = jnp.asarray(anchor, jnp.float32)
    lw = jnp.log(box[..., 2] / anchor[..., 0] + 1e-16)
    lh = jnp.log(box[..., 3] / anchor[..., 1] + 1e-16)
    return y_cell, x_cell, y - y_cell, x - x_cell, lw, lh
