"""In-graph training augmentation (optional; the reference has none).

The reference's cfg declares augmentation hyperparameters (angle,
saturation, exposure, hue — cfg/yolov3.cfg [net]) that its code never
reads.  This module implements the photometric ones plus horizontal
flip, fully on-device and box-consistent, as a jittable transform the
train step applies when the trainer enables it:

* horizontal flip (p=0.5) with cx mirrored;
* HSV-style jitter following darknet semantics: saturation and exposure
  (value) scaled by U[1/s, s], hue rotated by U[-h, h].

All randomness comes from a threaded ``jax.random`` key, so augmented
training remains reproducible and pjit-shardable (per-image independent
decisions).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["augment_batch"]


def _rgb_to_hsv(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(delta, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(r == maxc, bc - gc,
                  jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = jnp.where(delta == 0, 0.0, h)
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def augment_batch(key, images: jnp.ndarray, boxes: jnp.ndarray,
                  flip_p: float = 0.5, saturation: float = 1.5,
                  exposure: float = 1.5, hue: float = 0.1
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Augment a letterboxed batch; boxes stay consistent.

    images: [B, D, D, 3] float RGB in [0,1];
    boxes:  [B, M, 5+C] rows [cx, cy, w, h, ...] in pixel space.
    """
    b = images.shape[0]
    d = images.shape[1]
    k_flip, k_sat, k_exp, k_hue = jax.random.split(key, 4)

    # horizontal flip, per image
    do_flip = jax.random.bernoulli(k_flip, flip_p, (b,))
    flipped = images[:, :, ::-1, :]
    images = jnp.where(do_flip[:, None, None, None], flipped, images)
    flipped_cx = d - boxes[..., 0]
    new_cx = jnp.where(do_flip[:, None], flipped_cx, boxes[..., 0])
    boxes = boxes.at[..., 0].set(new_cx)

    # darknet rand_scale: U[1/s, s] with equal probability of either side
    def rand_scale(k, s):
        lo = jax.random.uniform(k, (b,), minval=1.0, maxval=s)
        inv = jax.random.bernoulli(jax.random.fold_in(k, 1), 0.5, (b,))
        return jnp.where(inv, 1.0 / lo, lo)

    sat = rand_scale(k_sat, saturation)[:, None, None]
    val = rand_scale(k_exp, exposure)[:, None, None]
    dhue = jax.random.uniform(k_hue, (b,), minval=-hue,
                              maxval=hue)[:, None, None]

    hsv = _rgb_to_hsv(jnp.clip(images, 0.0, 1.0))
    h = (hsv[..., 0] + dhue) % 1.0
    s = jnp.clip(hsv[..., 1] * sat, 0.0, 1.0)
    v = jnp.clip(hsv[..., 2] * val, 0.0, 1.0)
    images = _hsv_to_rgb(jnp.stack([h, s, v], axis=-1))
    return images, boxes
