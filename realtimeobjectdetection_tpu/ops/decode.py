"""YOLO head decode — the TPU rebuild of ``predict_transform``.

Reference semantics (/root/reference/src/util.py:175-239):

* reshape ``[B, A*(5+C), G, G]`` -> ``[B, G*G*A, 5+C]`` — rows ordered
  cell-major (row-major over the grid), anchor-minor;
* sigmoid on x, y and on columns 4: (objectness + classes);
* inference adds grid-cell offsets, ``wh = exp(raw) * anchor`` (anchor in
  input pixels), and scales xy by the stride;
* TRAIN mode skips the geometric decode (raw grid-space wh, no offsets).

Our heads are NHWC ``[B, H, W, A*(5+C)]``; the channel axis carries the
same anchor-major packing as torch's channel dim, so
``reshape(B, H*W, A, 5+C)`` reproduces the row order exactly.

Everything here is elementwise + reshape on fixed shapes: XLA fuses it
into the tail of the head conv — no custom kernel needed for this op.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..cfg_parser import GraphSpec

__all__ = ["decode_head", "decode_heads", "make_decoder"]


def decode_head(head: jnp.ndarray, anchors: Sequence[Tuple[int, int]],
                num_classes: int, input_dim: int, train: bool = False):
    """Decode one raw head ``[B, H, W, A*(5+C)]`` -> ``[B, H*W*A, 5+C]``."""
    b, h, w, _ = head.shape
    a = len(anchors)
    c = 5 + num_classes
    stride = input_dim // h
    p = head.reshape(b, h * w, a, c)

    xy = jax.nn.sigmoid(p[..., 0:2])
    wh = p[..., 2:4]
    objcls = jax.nn.sigmoid(p[..., 4:])

    if not train:
        # cell offsets: x = column index, y = row index (row-major cells)
        cols = jnp.arange(w, dtype=head.dtype)
        rows = jnp.arange(h, dtype=head.dtype)
        gx, gy = jnp.meshgrid(cols, rows)  # [h, w] each, gx varies on axis 1
        offs = jnp.stack([gx, gy], axis=-1).reshape(1, h * w, 1, 2)
        anc = jnp.asarray(anchors, dtype=head.dtype).reshape(1, 1, a, 2)
        xy = (xy + offs) * stride
        wh = jnp.exp(wh) * anc
    out = jnp.concatenate([xy, wh, objcls], axis=-1)
    return out.reshape(b, h * w * a, c)


def decode_heads(heads: List[jnp.ndarray], spec: GraphSpec, input_dim: int,
                 train: bool = False) -> jnp.ndarray:
    """Decode + concat all heads along the box axis (detection order).

    Matches the forward interpreter's scale-by-scale concat
    (/root/reference/src/darknet.py:238-244).
    """
    yolos = spec.yolo_nodes
    assert len(heads) == len(yolos)
    parts = [
        decode_head(head, y.anchors, y.num_classes, input_dim, train=train)
        for head, y in zip(heads, yolos)
    ]
    return jnp.concatenate(parts, axis=1)


def make_decoder(spec: GraphSpec, input_dim: int, train: bool = False):
    def decoder(heads):
        return decode_heads(heads, spec, input_dim, train=train)
    return decoder
