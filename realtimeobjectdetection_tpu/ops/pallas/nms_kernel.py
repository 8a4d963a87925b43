"""Pallas TPU kernel for the greedy NMS suppression loop.

The XLA path (ops/nms.py) materializes a K x K IoU matrix in HBM and runs
the greedy scan as a ``fori_loop`` of [K]-vector updates — K sequential
steps, each reading a matrix row back from HBM.  This kernel keeps the
whole problem resident on-chip: corner coordinates live twice, as
[8, K] f32 rows in VMEM for the vectorized IoU of "box i vs all", and as
an [K, 4] SMEM copy for the scalar loads of box i inside the loop.  The
keep mask is a loop-carried VMEM value; one kernel call performs the
entire suppression with zero intermediate HBM traffic.

IoU uses the Darknet "+1" convention when ``plus_one`` is set (parity
with src/util.py:144-149); ``plus_one=False`` gives the standard v5
semantics.  Suppression: box i kills later same-class boxes with
``iou >= thresh`` (strict ``>`` when ``strict=False`` for v5 parity).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["nms_suppress_pallas"]

LANES = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(corners_smem, rows_ref, cls_ref, valid_ref, keep_ref, *,
            k: int, thresh: float, plus_one: bool, ge: bool):
    e = 1.0 if plus_one else 0.0
    x1 = rows_ref[0:1, :]
    y1 = rows_ref[1:2, :]
    x2 = rows_ref[2:3, :]
    y2 = rows_ref[3:4, :]
    area = (x2 - x1 + e) * (y2 - y1 + e)
    cls = cls_ref[0:1, :]
    kpad = rows_ref.shape[1]
    col = lax.broadcasted_iota(jnp.int32, (1, kpad), 1)

    def body(i, keep):
        bx1 = corners_smem[i, 0]
        by1 = corners_smem[i, 1]
        bx2 = corners_smem[i, 2]
        by2 = corners_smem[i, 3]
        bcls = corners_smem[i, 4]
        barea = (bx2 - bx1 + e) * (by2 - by1 + e)
        ix1 = jnp.maximum(x1, bx1)
        iy1 = jnp.maximum(y1, by1)
        ix2 = jnp.minimum(x2, bx2)
        iy2 = jnp.minimum(y2, by2)
        inter = jnp.maximum(ix2 - ix1 + e, 0.0) * \
            jnp.maximum(iy2 - iy1 + e, 0.0)
        iou = inter / (area + barea - inter)
        hit = (iou >= thresh) if ge else (iou > thresh)
        # keep[0, i] as a scalar predicate (box i must itself survive);
        # dynamic_slice of a carried value doesn't lower in Mosaic, so
        # extract it with a masked reduction instead
        alive_i = jnp.sum(jnp.where(col == i, keep, 0.0)) > 0.0
        kill = hit & (cls == bcls) & (col > i) & alive_i
        return jnp.where(kill, 0.0, keep)

    keep = lax.fori_loop(0, k, body, valid_ref[0:1, :] * 1.0)
    keep_ref[:, :] = keep


def nms_suppress_pallas(corners: jnp.ndarray, cls_id: jnp.ndarray,
                        valid: jnp.ndarray, thresh: float,
                        plus_one: bool = True, ge: bool = True,
                        interpret: bool = False) -> jnp.ndarray:
    """Greedy same-class suppression.

    Args:
      corners: [K, 4] xyxy (objectness-descending order).
      cls_id:  [K] int class ids.
      valid:   [K] bool candidate validity.
    Returns:
      keep: [K] bool survivors.
    """
    k = corners.shape[0]
    kpad = _round_up(k, LANES)

    # SMEM copy [K, 8]: x1 y1 x2 y2 cls (padded cols for alignment)
    smem_rows = jnp.zeros((k, 8), jnp.float32)
    smem_rows = smem_rows.at[:, 0:4].set(corners.astype(jnp.float32))
    smem_rows = smem_rows.at[:, 4].set(cls_id.astype(jnp.float32))

    # VMEM lanes [8, Kpad]: rows 0-3 corners, padded tail is harmless
    rows = jnp.zeros((8, kpad), jnp.float32)
    rows = rows.at[0:4, :k].set(corners.astype(jnp.float32).T)
    cls_l = jnp.full((1, kpad), -1.0, jnp.float32)
    cls_l = cls_l.at[0, :k].set(cls_id.astype(jnp.float32))
    valid_l = jnp.zeros((1, kpad), jnp.float32)
    valid_l = valid_l.at[0, :k].set(valid.astype(jnp.float32))

    kernel = functools.partial(_kernel, k=k, thresh=float(thresh),
                               plus_one=plus_one, ge=ge)
    keep = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, kpad), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(smem_rows, rows, cls_l, valid_l)
    return keep[0, :k] > 0.0
