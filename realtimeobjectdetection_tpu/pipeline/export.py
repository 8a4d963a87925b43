"""Ahead-of-time export of the detection program (jax.export / StableHLO).

Serving completeness: package the whole jitted pipeline — normalize,
forward (BN folded), decode, fixed-shape NMS — with the weights baked in
as constants, into one portable StableHLO artifact.  A consumer process
deserializes and calls it without the model-construction code, and the
artifact pins the exact numerics that were validated.

    save_detector("model.stablehlo", spec, params, batch_size=8)
    det = load_detector("model.stablehlo")
    boxes, valid = det(x_uint8)            # [B, D, D, 3] RGB uint8
"""

from __future__ import annotations

import json
import struct
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import export as jexport

from ..cfg_parser import GraphSpec
from ..model import fold_batchnorm, make_forward
from ..ops.decode import decode_heads
from ..ops.nms import nms_batch

__all__ = ["save_detector", "save_detector_v5", "load_detector",
           "save_detector_bundle", "save_detector_bundle_v5",
           "load_detector_bundle"]

_MAGIC = b"RODTPU1\n"
_MAGIC2 = b"RODTPU2\n"  # multi-batch-size bundle


def save_detector(path: str, spec: GraphSpec, params,
                  batch_size: int = 8, resolution: int = 416,
                  confidence: float = 0.6, nms_thresh: float = 0.5,
                  num_classes: int = 80, top_k: int = 128,
                  compute_dtype=jnp.bfloat16, fold: bool = True,
                  platforms: Optional[Tuple[str, ...]] = None) -> dict:
    """Export the full detect program with weights as constants."""
    if fold:
        params = fold_batchnorm(spec, params)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    fwd = make_forward(spec, bn_mode="fold" if fold else "running",
                       compute_dtype=compute_dtype, scan_ladders=True)

    def detect(x):
        x = x.astype(jnp.float32) / 255.0
        pred = decode_heads(fwd(params, x), spec, resolution)
        return nms_batch(pred, num_classes, confidence, nms_thresh,
                         top_k=top_k)

    x_spec = jax.ShapeDtypeStruct(
        (batch_size, resolution, resolution, 3), jnp.uint8)
    kwargs = {"platforms": platforms} if platforms else {}
    exp = jexport.export(jax.jit(detect), **kwargs)(x_spec)
    blob = exp.serialize()
    meta = {
        "batch_size": batch_size, "resolution": resolution,
        "confidence": confidence, "nms_thresh": nms_thresh,
        "num_classes": num_classes, "top_k": top_k,
        "platforms": list(exp.platforms),
    }
    meta_bytes = json.dumps(meta).encode()
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(meta_bytes)))
        f.write(meta_bytes)
        f.write(blob)
    return meta


def save_detector_v5(path: str, model_size: str, params,
                     batch_size: int = 8, size: int = 640,
                     confidence: float = 0.25, iou_thresh: float = 0.45,
                     num_classes: int = 80, top_k: int = 512,
                     max_det: int = 300, compute_dtype=jnp.bfloat16,
                     fast: bool = True,
                     platforms: Optional[Tuple[str, ...]] = None) -> dict:
    """Export the native YOLOv5 detect program (same artifact format;
    ``load_detector`` consumes it unchanged).  ``params`` may be the
    training (BN) layout — folded here — or the inference layout.
    ``fast``: bf16 activation residency + fused decode_v5_topk (the
    serving default); False = fp32 residency + full decode (AutoShape
    parity numerics)."""
    from ..models.yolov5 import (YoloV5Config, decode_v5, decode_v5_topk,
                                 fold_v5_batchnorm, make_yolov5_forward)
    from ..ops.nms import nms_batch_v5
    cfg = YoloV5Config(model_size.lower(), num_classes)
    if isinstance(params, dict) and "bn_gamma" in params.get("m0", {}):
        params = fold_v5_batchnorm(params)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    act = jnp.bfloat16 if fast else None
    fwd = make_yolov5_forward(cfg, compute_dtype=compute_dtype,
                              activation_dtype=act, head_dtype=act)

    def detect(x):
        x = x.astype(jnp.float32) / 255.0
        heads = fwd(params, x)
        if fast:
            pred = decode_v5_topk(heads, num_classes, top_k, confidence)
        else:
            pred = decode_v5([h.astype(jnp.float32) for h in heads],
                             num_classes)
        return nms_batch_v5(pred, num_classes, confidence, iou_thresh,
                            top_k=top_k, max_det=max_det)

    x_spec = jax.ShapeDtypeStruct((batch_size, size, size, 3), jnp.uint8)
    kwargs = {"platforms": platforms} if platforms else {}
    exp = jexport.export(jax.jit(detect), **kwargs)(x_spec)
    blob = exp.serialize()
    meta = {
        "family": f"yolov5{cfg.size}", "batch_size": batch_size,
        "resolution": size, "confidence": confidence,
        "nms_thresh": iou_thresh, "num_classes": num_classes,
        "top_k": top_k, "max_det": max_det, "fast": fast,
        "platforms": list(exp.platforms),
    }
    meta_bytes = json.dumps(meta).encode()
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(meta_bytes)))
        f.write(meta_bytes)
        f.write(blob)
    return meta


class _LoadedDetector:
    def __init__(self, exported, meta):
        self._exported = exported
        self.meta = meta

    def __call__(self, x):
        return self._exported.call(jnp.asarray(x, jnp.uint8))


def load_detector(path: str):
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic == _MAGIC2:
            return _load_bundle_body(f)
        if magic != _MAGIC:
            raise ValueError(f"{path!r} is not a rodtpu export")
        (mlen,) = struct.unpack("<I", f.read(4))
        meta = json.loads(f.read(mlen))
        blob = f.read()
    return _LoadedDetector(jexport.deserialize(blob), meta)


# ----------------------------------------------------------------------
# multi-batch-size bundle: one artifact, several compiled batch shapes.
# Serving traffic is bursty; padding every request up to one big static
# batch wastes device time at low load, while one small batch throttles
# bursts.  The bundle ships programs for a ladder of batch sizes and the
# loader dispatches each call to the smallest program that fits (padding
# the tail, slicing the result back).

def _save_bundle(path: str, save_one, batch_sizes) -> dict:
    """Shared bundle writer: ``save_one(tmp_path, bs) -> meta`` exports
    one batch size; the per-size blobs are concatenated under one
    _MAGIC2 header."""
    import os
    import tempfile

    batch_sizes = sorted(set(int(b) for b in batch_sizes))
    blobs, metas = [], []
    for bs in batch_sizes:
        tmp = tempfile.NamedTemporaryFile(delete=False)
        tmp.close()
        try:
            metas.append(save_one(tmp.name, bs))
            with open(tmp.name, "rb") as f:
                f.read(len(_MAGIC))
                (mlen,) = struct.unpack("<I", f.read(4))
                f.read(mlen)
                blobs.append(f.read())
        finally:
            os.unlink(tmp.name)
    meta = dict(metas[0])
    meta["batch_sizes"] = batch_sizes
    del meta["batch_size"]
    meta_bytes = json.dumps(meta).encode()
    with open(path, "wb") as f:
        f.write(_MAGIC2)
        f.write(struct.pack("<I", len(meta_bytes)))
        f.write(meta_bytes)
        for blob in blobs:
            f.write(struct.pack("<Q", len(blob)))
            f.write(blob)
    return meta


def save_detector_bundle(path: str, spec: GraphSpec, params,
                         batch_sizes=(1, 8, 32), **kw) -> dict:
    """Export the detect program at several static batch sizes into one
    artifact.  ``kw`` = the save_detector knobs (resolution, confidence,
    nms_thresh, num_classes, top_k, compute_dtype, fold, platforms)."""
    return _save_bundle(
        path, lambda p, bs: save_detector(p, spec, params,
                                          batch_size=bs, **kw),
        batch_sizes)


def save_detector_bundle_v5(path: str, model_size: str, params,
                            batch_sizes=(1, 8, 32), **kw) -> dict:
    """The YOLOv5 twin of :func:`save_detector_bundle` (``kw`` = the
    save_detector_v5 knobs).  The bundle's ``family`` meta key lets the
    AOT serving backend pick the v5 letterbox/rescale path."""
    return _save_bundle(
        path, lambda p, bs: save_detector_v5(p, model_size, params,
                                             batch_size=bs, **kw),
        batch_sizes)


class _LoadedBundle:
    """Dispatches each call to the smallest exported batch size >= B."""

    def __init__(self, exported_by_bs, meta):
        self._by_bs = exported_by_bs  # {bs: Exported}, ascending keys
        self.meta = meta
        self.batch_sizes = sorted(exported_by_bs)

    def __call__(self, x):
        x = jnp.asarray(x, jnp.uint8)
        b = x.shape[0]
        fits = [bs for bs in self.batch_sizes if bs >= b]
        if not fits:
            raise ValueError(
                f"batch {b} exceeds the largest exported size "
                f"{self.batch_sizes[-1]}; split the batch or re-export")
        bs = fits[0]
        if bs != b:
            pad = jnp.repeat(x[-1:], bs - b, axis=0)  # repeat, not zeros:
            # zero frames would be fine for folded BN but repeating the
            # last real image keeps any BN mode safe
            x = jnp.concatenate([x, pad], axis=0)
        out = self._by_bs[bs].call(x)
        return jax.tree_util.tree_map(lambda a: a[:b], out)


def _load_bundle_body(f) -> _LoadedBundle:
    (mlen,) = struct.unpack("<I", f.read(4))
    meta = json.loads(f.read(mlen))
    by_bs = {}
    for bs in meta["batch_sizes"]:
        (blen,) = struct.unpack("<Q", f.read(8))
        by_bs[bs] = jexport.deserialize(f.read(blen))
    return _LoadedBundle(by_bs, meta)


def load_detector_bundle(path: str) -> _LoadedBundle:
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC2))
        if magic != _MAGIC2:
            raise ValueError(f"{path!r} is not a rodtpu bundle")
        return _load_bundle_body(f)
