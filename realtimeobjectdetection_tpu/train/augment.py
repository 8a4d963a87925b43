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

__all__ = ["augment_batch", "mosaic_batch"]


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


def mosaic_batch(key, images: jnp.ndarray, boxes: jnp.ndarray,
                 mask: jnp.ndarray, center_range: float = 0.25,
                 min_box_px: float = 2.0):
    """In-graph 4-image mosaic — the ultralytics recipe rebuilt TPU-first.

    ultralytics mosaic (yolov5 utils/dataloaders.py load_mosaic) pastes
    4 images at native scale around a random center on a 2x canvas and
    random-affine-crops back — host-side Python with dynamic shapes.
    The XLA-native equivalent here keeps every shape static: per output
    image a random center (cx, cy) splits the D x D canvas into four
    quadrants, and four batch images (self + three random partners via
    batch rolls) are warped onto the quadrants with
    ``jax.image.scale_and_translate`` (scale/translation are TRACED
    operands, so one compiled program serves every random geometry).
    Boxes ride the same affine per quadrant; rows shrunk below
    ``min_box_px`` are masked out.  Deviation (documented): each source
    is scaled to fit its quadrant (aspect distortion in [1/2, 2] at the
    default ``center_range``) instead of pasted at native scale and
    cropped — same diversity mechanism, no data-dependent shapes.

    images: [B, D, D, 3]; boxes: [B, M, 5+C] (cx cy w h in pixels);
    mask: [B, M] -> returns the same shapes (box budget stays M; rows
    past the first M valid across the 4 sources are dropped, matching
    the padded_batches contract).
    """
    b, d = images.shape[0], images.shape[1]
    m = boxes.shape[1]
    k_roll, k_c = jax.random.split(key)
    # partners: three distinct batch rolls shared across the batch (one
    # gather each; per-image rolls would need [B] gathers)
    rolls = jax.random.choice(k_roll, jnp.arange(1, max(b, 2)), (3,),
                              replace=b <= 3)
    src = [images] + [jnp.roll(images, s, axis=0) for s in rolls]
    src_boxes = [boxes] + [jnp.roll(boxes, s, axis=0) for s in rolls]
    src_mask = [mask] + [jnp.roll(mask, s, axis=0) for s in rolls]

    lo, hi = (0.5 - center_range) * d, (0.5 + center_range) * d
    cxy = jax.random.uniform(k_c, (b, 2), minval=lo, maxval=hi)

    def warp_one(img, scale_yx, trans_yx):
        return jax.image.scale_and_translate(
            img, (d, d, 3), (0, 1),
            jnp.asarray(scale_yx), jnp.asarray(trans_yx),
            method="linear", antialias=False)

    warp = jax.vmap(warp_one)
    out = jnp.zeros_like(images)
    out_boxes, out_mask = [], []
    cx, cy = cxy[:, 0], cxy[:, 1]
    # quadrant extents (x0, y0, x1, y1) as [B] vectors
    zeros = jnp.zeros_like(cx)
    dd = jnp.full_like(cx, float(d))
    quads = [(zeros, zeros, cx, cy), (cx, zeros, dd, cy),
             (zeros, cy, cx, dd), (cx, cy, dd, dd)]
    for (x0, y0, x1, y1), im, bx, mk in zip(quads, src, src_boxes,
                                            src_mask):
        sx, sy = (x1 - x0) / d, (y1 - y0) / d
        out = out + warp(im, jnp.stack([sy, sx], -1),
                         jnp.stack([y0, x0], -1))
        nbx = bx.at[..., 0].set(bx[..., 0] * sx[:, None] + x0[:, None])
        nbx = nbx.at[..., 1].set(bx[..., 1] * sy[:, None] + y0[:, None])
        nbx = nbx.at[..., 2].set(bx[..., 2] * sx[:, None])
        nbx = nbx.at[..., 3].set(bx[..., 3] * sy[:, None])
        out_boxes.append(nbx)
        out_mask.append(mk & (nbx[..., 2] >= min_box_px)
                        & (nbx[..., 3] >= min_box_px))
    all_boxes = jnp.concatenate(out_boxes, axis=1)     # [B, 4M, 5+C]
    all_mask = jnp.concatenate(out_mask, axis=1)       # [B, 4M]
    # compact: stable-sort valid rows first, keep the box budget M
    order = jnp.argsort(~all_mask, axis=1, stable=True)[:, :m]
    new_boxes = jnp.take_along_axis(all_boxes, order[..., None], axis=1)
    new_mask = jnp.take_along_axis(all_mask, order, axis=1)
    return out, new_boxes, new_mask
