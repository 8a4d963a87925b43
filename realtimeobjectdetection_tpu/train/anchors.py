"""Anchor prior fitting: IoU-k-means over dataset box shapes.

The darknet ecosystem recomputes anchor priors per dataset
(``calc_anchors``); the reference hardcodes the COCO anchors from its
cfgs.  This utility clusters ground-truth (w, h) pairs with k-means
under the 1 - IoU(wh) distance (the convention that makes anchors match
the assignment metric in train/targets.py) so custom datasets can train
with fitted priors: ``rodtpu anchors --annot ... --images ... -n 6``.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

__all__ = ["kmeans_anchors", "collect_wh", "fit_anchors"]


def _wh_iou_np(wh: np.ndarray, centers: np.ndarray) -> np.ndarray:
    """[N, 2] x [K, 2] -> [N, K] corner-anchored IoU."""
    inter = np.minimum(wh[:, None, 0], centers[None, :, 0]) * \
        np.minimum(wh[:, None, 1], centers[None, :, 1])
    union = wh[:, None, 0] * wh[:, None, 1] + \
        centers[None, :, 0] * centers[None, :, 1] - inter
    return inter / np.maximum(union, 1e-12)


def kmeans_anchors(wh: np.ndarray, k: int, iters: int = 100,
                   seed: int = 0) -> Tuple[np.ndarray, float]:
    """Cluster (w, h) pairs under the 1-IoU distance.

    Returns (anchors [k, 2] sorted by area, mean best-IoU) — the latter
    is the standard 'avg IoU' quality number darknet prints.
    """
    wh = np.asarray(wh, np.float64)
    assert wh.ndim == 2 and wh.shape[1] == 2 and len(wh) >= k
    rng = np.random.RandomState(seed)
    centers = wh[rng.choice(len(wh), k, replace=False)].copy()
    assign = None
    for _ in range(iters):
        ious = _wh_iou_np(wh, centers)
        new_assign = ious.argmax(axis=1)
        if assign is not None and (new_assign == assign).all():
            break
        assign = new_assign
        for j in range(k):
            members = wh[assign == j]
            if len(members):
                centers[j] = np.median(members, axis=0)
    order = np.argsort(centers[:, 0] * centers[:, 1])
    centers = centers[order]
    avg_iou = float(_wh_iou_np(wh, centers).max(axis=1).mean())
    return centers, avg_iou


def collect_wh(dataset) -> np.ndarray:
    """Gather every gt (w, h) in letterbox pixels from a dataset that
    yields 85-col box rows (data/coco.py, data/voc.py)."""
    out: List[np.ndarray] = []
    for i in range(len(dataset)):
        item = dataset[i]
        # datasets yield (img, rows), (name, img, rows), (name, rows) or
        # bare rows depending on mode — the box array is the last element
        rows = item[-1] if isinstance(item, tuple) else item
        if rows is not None and len(rows):
            out.append(np.asarray(rows)[:, 2:4])
    if not out:
        raise ValueError("dataset has no ground-truth boxes")
    return np.concatenate(out, axis=0)


def fit_anchors(dataset, k: int = 6, seed: int = 0):
    """collect_wh + kmeans; returns (anchors as int tuples, avg IoU)."""
    wh = collect_wh(dataset)
    centers, avg = kmeans_anchors(wh, k, seed=seed)
    return [(int(round(w)), int(round(h))) for w, h in centers], avg
