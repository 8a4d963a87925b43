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

__all__ = ["save_detector", "load_detector"]

_MAGIC = b"RODTPU1\n"


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


class _LoadedDetector:
    def __init__(self, exported, meta):
        self._exported = exported
        self.meta = meta

    def __call__(self, x):
        return self._exported.call(jnp.asarray(x, jnp.uint8))


def load_detector(path: str) -> _LoadedDetector:
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path!r} is not a rodtpu export")
        (mlen,) = struct.unpack("<I", f.read(4))
        meta = json.loads(f.read(mlen))
        blob = f.read()
    return _LoadedDetector(jexport.deserialize(blob), meta)
