"""COCO-style mean Average Precision (mAP) evaluator.

The reference only reports person-class precision/recall/F at a fixed
threshold (test.py:272-280); the project baseline ("COCO mAP … parity")
needs a real AP metric.  This implements the standard evaluation:

* per class: predictions sorted by confidence, greedily matched to the
  unmatched ground-truth box with the highest IoU above the threshold
  (each gt matched at most once);
* AP = area under the interpolated precision-recall curve, either
  101-point interpolation (COCO convention) or continuous (VOC2010+);
* mAP@[.5:.95]: averaged over IoU thresholds 0.50:0.05:0.95.

Pure numpy on the host — the per-image detections come out of the jitted
detect path; AP bookkeeping is tiny and inherently ragged.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["DetectionRecord", "average_precision", "evaluate_map"]


def _iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Standard corner IoU (no +1), [N,4] x [M,4] -> [N,M]."""
    ix1 = np.maximum(a[:, None, 0], b[None, :, 0])
    iy1 = np.maximum(a[:, None, 1], b[None, :, 1])
    ix2 = np.minimum(a[:, None, 2], b[None, :, 2])
    iy2 = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
    aa = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    ab = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = aa[:, None] + ab[None, :] - inter
    return np.where(union > 0, inter / union, 0.0)


class DetectionRecord:
    """Accumulates (prediction, ground-truth) pairs per image."""

    def __init__(self, num_classes: int = 80):
        self.num_classes = num_classes
        # per class: list of (confidence, is_tp) over all images, and a
        # running gt count — built per IoU threshold at evaluate time
        self.images: List[Tuple[np.ndarray, np.ndarray]] = []

    def add_image(self, pred_rows: Optional[np.ndarray],
                  gt_rows: Optional[np.ndarray]):
        """pred_rows: [n, 6+] ``[x1,y1,x2,y2,conf,cls]``;
        gt_rows: [m, 5+] ``[x1,y1,x2,y2,cls]`` (corner format)."""
        p = np.zeros((0, 6), np.float32) if pred_rows is None or \
            len(pred_rows) == 0 else np.asarray(pred_rows, np.float32)
        g = np.zeros((0, 5), np.float32) if gt_rows is None or \
            len(gt_rows) == 0 else np.asarray(gt_rows, np.float32)
        self.images.append((p, g))

    def _class_matches(self, cls: int, iou_thresholds):
        """One pass per class: build each image's IoU matrix once and run
        the greedy matcher for every threshold against it.

        Returns (confs [N], tps [T, N], n_gt) with thresholds stacked on
        the first axis of tps.
        """
        t_count = len(iou_thresholds)
        confs = []
        tps = [[] for _ in range(t_count)]
        n_gt = 0
        for p, g in self.images:
            pc = p[p[:, 5] == cls]
            gc = g[g[:, 4] == cls]
            n_gt += len(gc)
            if len(pc) == 0:
                continue
            order = np.argsort(-pc[:, 4], kind="stable")
            pc = pc[order]
            confs.extend(pc[:, 4])
            ious = _iou_matrix(pc[:, :4], gc[:, :4]) if len(gc) else None
            for ti, thresh in enumerate(iou_thresholds):
                matched = np.zeros(len(gc), bool)
                for i in range(len(pc)):
                    if ious is None:
                        tps[ti].append(False)
                        continue
                    cand = np.where(~matched & (ious[i] >= thresh))[0]
                    if len(cand) == 0:
                        tps[ti].append(False)
                        continue
                    j = cand[np.argmax(ious[i, cand])]
                    matched[j] = True
                    tps[ti].append(True)
        return (np.asarray(confs, np.float32),
                np.asarray(tps, bool).reshape(t_count, -1), n_gt)


def average_precision(confs: np.ndarray, tps: np.ndarray, n_gt: int,
                      interpolation: str = "101") -> float:
    """AP from a flat (confidence, tp) list and the gt count."""
    if n_gt == 0:
        return float("nan")
    if len(confs) == 0:
        return 0.0
    order = np.argsort(-confs, kind="stable")
    tps = tps[order]
    tp_cum = np.cumsum(tps)
    fp_cum = np.cumsum(~tps)
    recall = tp_cum / n_gt
    precision = tp_cum / (tp_cum + fp_cum)
    if interpolation == "101":
        pts = np.linspace(0, 1, 101)
        # precision envelope (monotone non-increasing from the right)
        env = np.maximum.accumulate(precision[::-1])[::-1]
        idx = np.searchsorted(recall, pts, side="left")
        vals = np.where(idx < len(env), env[np.minimum(idx, len(env) - 1)],
                        0.0)
        return float(vals.mean())
    # continuous (VOC2010+)
    mrec = np.concatenate([[0.0], recall, [1.0]])
    mpre = np.concatenate([[1.0], precision, [0.0]])
    mpre = np.maximum.accumulate(mpre[::-1])[::-1]
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))


def evaluate_map(record: DetectionRecord,
                 iou_thresholds: Optional[Sequence[float]] = None,
                 interpolation: str = "101") -> Dict[str, float]:
    """Compute mAP@0.5, mAP@0.75 and mAP@[.5:.95] (+ per-class AP@0.5)."""
    if iou_thresholds is None:
        iou_thresholds = np.arange(0.5, 0.96, 0.05)
    iou_thresholds = [float(t) for t in iou_thresholds]
    per_thresh_aps: List[List[float]] = [[] for _ in iou_thresholds]
    per_class_50: Dict[int, float] = {}
    for cls in range(record.num_classes):
        confs, tps, n_gt = record._class_matches(cls, iou_thresholds)
        if n_gt == 0:
            continue
        for ti, t in enumerate(iou_thresholds):
            ap = average_precision(confs, tps[ti], n_gt, interpolation)
            per_thresh_aps[ti].append(ap)
            if abs(t - 0.5) < 1e-9:
                per_class_50[cls] = ap
    per_thresh = [float(np.mean(a)) if a else float("nan")
                  for a in per_thresh_aps]
    out: Dict[str, float] = {
        "mAP@[.5:.95]" if len(per_thresh) > 1 else "mAP":
            float(np.nanmean(per_thresh)),
    }
    for t, v in zip(iou_thresholds, per_thresh):
        out[f"mAP@{t:g}"] = v
    if per_class_50:
        out["per_class_AP@0.5"] = per_class_50
    return out
