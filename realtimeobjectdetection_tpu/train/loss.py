"""Multi-scale YOLO training loss — masked sum-MSE, reference weights.

Parity with ``DarknetTrainer.darknet_loss`` (/root/reference/train.py:
211-230): sum-reduction MSE with YOLO-paper weights 5*xy + 5*wh + 1*obj +
0.5*no-obj + 1*class, computed against TRAIN-mode decode-lite predictions
(sigmoided xy/obj/cls, raw wh — src/util.py:206-211).  The reference's
boolean fancy-indexing becomes mask multiplication (identical sums,
fixed shapes).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["yolo_loss"]


def yolo_loss(pred: jnp.ndarray, target: jnp.ndarray,
              obj_mask: jnp.ndarray,
              w_xy: float = 5.0, w_wh: float = 5.0, w_obj: float = 1.0,
              w_noobj: float = 0.5, w_cls: float = 1.0) -> jnp.ndarray:
    """pred/target: [B, N, 5+C]; obj_mask: [B, N] bool."""
    m = obj_mask.astype(pred.dtype)[..., None]
    no_m = 1.0 - m

    def sq(a, b):
        d = a - b
        return d * d

    loss = w_xy * jnp.sum(m * sq(pred[..., 0:2], target[..., 0:2]))
    loss += w_wh * jnp.sum(m * sq(pred[..., 2:4], target[..., 2:4]))
    loss += w_obj * jnp.sum(m[..., 0] * sq(pred[..., 4], target[..., 4]))
    loss += w_noobj * jnp.sum(no_m[..., 0] * sq(pred[..., 4],
                                                target[..., 4]))
    loss += w_cls * jnp.sum(m * sq(pred[..., 5:], target[..., 5:]))
    return loss
