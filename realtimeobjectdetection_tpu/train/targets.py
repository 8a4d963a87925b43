"""Vectorized multi-scale target assignment (TRAIN-mode YOLO encoding).

The reference builds targets with a per-image, per-box Python loop on the
host (/root/reference/train.py:129-209).  This is the same assignment as
one fully-vectorized, jittable scatter over padded boxes, so it runs
in-graph inside the pjit'd train step.

Semantics (train.py:167-209 and src/util.py:48-75):

* per scale G in (13, 26[, 52]) with that scale's 3 anchors taken from
  the detection-order anchor list (train.py:142-147,158);
* a gt box participates iff its class passes the filter (the reference
  trains only boxes whose class-0/person bit is set, train.py:181-182)
  and w,h >= 24 px (train.py:183-184);
* best anchor by (w,h) IoU — the reference formula reads the width twice
  (src/util.py:169), replicated behind ``reference_bug_wh_iou``;
* flat location ``(cell_y*G + cell_x)*A + anchor`` — row-major cells,
  anchor-minor, exactly the decode ordering;
* target row: in-cell offsets, ``log(wh/anchor + 1e-16)``, then the
  box's objectness+one-hot tail copied through.

Quirk flag ``parity_swap_xy``: the reference stores the *y* fraction in
column 0 and *x* in column 1 (train.py:187-191 unpacks xywh2YOLO's
``(y_coor, x_coor, y, x, ...)`` into ``(w_coor, h_coor, w_center,
h_center)``), i.e. transposed relative to the decode layout it is
trained against.  Default is the corrected orientation; the flag
reproduces the reference bit-for-bit for parity tests.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from ..cfg_parser import GraphSpec
from ..ops.boxes import wh_iou

__all__ = ["build_targets", "scale_sizes"]


def scale_sizes(spec: GraphSpec, resolution: int) -> List[int]:
    """Grid size per yolo head at the given input resolution."""
    from ..model import head_shapes
    return [s[1] for s in head_shapes(spec, 1, resolution, resolution)]


def _scale_targets(boxes, valid, anchors, grid, stride, num_attrs,
                   reference_bug_wh_iou, parity_swap_xy):
    """One scale, one image: scatter [M, 5+C] boxes -> [G*G*A, 5+C]."""
    a = anchors.shape[0]
    cx, cy, w, h = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]

    ious = wh_iou(boxes[:, None, 2:4], anchors[None, :, :],
                  reference_bug=reference_bug_wh_iou)      # [M, A]
    fit = jnp.argmax(ious, axis=1)                          # [M]
    anc = anchors[fit]                                      # [M, 2]

    cxs, cys = cx / stride, cy / stride
    cell_x = jnp.floor(cxs).astype(jnp.int32)
    cell_y = jnp.floor(cys).astype(jnp.int32)
    off_x, off_y = cxs - cell_x, cys - cell_y
    lw = jnp.log(w / anc[:, 0] + 1e-16)
    lh = jnp.log(h / anc[:, 1] + 1e-16)

    if parity_swap_xy:
        head = jnp.stack([off_y, off_x, lw, lh], axis=1)   # reference layout
    else:
        head = jnp.stack([off_x, off_y, lw, lh], axis=1)
    rows = jnp.concatenate([head, boxes[:, 4:]], axis=1)    # [M, 5+C]

    in_grid = (cell_x >= 0) & (cell_x < grid) & (cell_y >= 0) & (cell_y < grid)
    ok = valid & in_grid
    loc = jnp.where(ok, (cell_y * grid + cell_x) * a + fit,
                    grid * grid * a)                        # park invalid rows

    # later boxes win on slot collisions, exactly like the reference's
    # sequential overwrite (train.py:190).  XLA scatter with duplicate
    # indices is order-undefined, so resolve the winner deterministically
    # with a scatter-max of box priority (index+1), then gather its row.
    m = rows.shape[0]
    prio = jnp.zeros((grid * grid * a + 1,), jnp.int32)
    prio = prio.at[loc].max(jnp.arange(1, m + 1, dtype=jnp.int32))
    mask = prio[:-1] > 0
    winner = jnp.maximum(prio[:-1] - 1, 0)
    out = rows[winner] * mask[:, None].astype(rows.dtype)
    return out, mask


def build_targets(spec: GraphSpec, boxes: jnp.ndarray, box_mask: jnp.ndarray,
                  resolution: int = 416,
                  class_filter: int | None = 0,
                  min_box_size: float = 24.0,
                  reference_bug_wh_iou: bool = True,
                  parity_swap_xy: bool = False
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build dense training targets for all scales.

    Args:
      boxes: ``[B, M, 5+C]`` padded gt rows ``[cx, cy, w, h, obj, one-hot]``
        in letterbox input pixels (the dataset layer's format,
        src/dataset.py:130-140, 288-303).
      box_mask: ``[B, M]`` validity of the padded rows.
      class_filter: train only boxes with this one-hot class set (the
        reference uses 0/person, train.py:181); ``None`` trains all.
      reference_bug_wh_iou: replicate src/util.py:169 (default True — it
        is what the reference's training actually does).
      parity_swap_xy: replicate the transposed xy encoding (default off).

    Returns:
      targets ``[B, N, 5+C]`` and object mask ``[B, N]`` where N is the
      total box count across scales in detection order — aligned with
      ``decode_heads(..., train=True)``.
    """
    anchors_all = jnp.asarray(spec.anchors_in_detection_order, jnp.float32)
    grids = scale_sizes(spec, resolution)
    num_attrs = boxes.shape[-1]

    valid = box_mask.astype(bool)
    if class_filter is not None:
        valid = valid & (boxes[..., 5 + class_filter] == 1.0)
    valid = valid & (boxes[..., 2] >= min_box_size) \
                  & (boxes[..., 3] >= min_box_size)

    outs, masks = [], []
    for si, grid in enumerate(grids):
        anchors = anchors_all[3 * si:3 * si + 3]
        stride = resolution / grid
        fn = lambda b, v: _scale_targets(
            b, v, anchors, grid, stride, num_attrs,
            reference_bug_wh_iou, parity_swap_xy)
        o, m = jax.vmap(fn)(boxes, valid)
        outs.append(o)
        masks.append(m)
    return jnp.concatenate(outs, axis=1), jnp.concatenate(masks, axis=1)
