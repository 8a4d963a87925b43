"""Int8 quantization groundwork for the folded-conv inference path.

The v5e MXU runs int8 matmuls at ~2x the bf16 rate, making int8 the
largest remaining single-chip throughput lever (ROADMAP 6 / VERDICT r1
task 10).  This module provides:

* :func:`quantize_folded_int8` — per-output-channel symmetric int8
  quantization of BN-folded conv kernels (fold first: quantizing raw
  kernels and then folding would bake the BN scale into the int8 grid
  twice);
* two execution modes consumed by ``make_forward(quantize=...)``:

  - ``"w8"``  weight-only int8: kernels live in HBM as int8 (4x smaller),
    are cast to the compute dtype inside the conv, and the per-channel
    scale is applied to the conv *output* (mathematically identical to
    scaling the kernel, but keeps the cast cheap and fusable).  Numerics
    drift = weight rounding only.
  - ``"w8a8"`` full int8: activations are dynamically quantized
    per-tensor (symmetric, abs-max) and the conv accumulates in int32 on
    the int8 MXU; the output is rescaled by ``s_x * s_w``.  Numerics
    drift = weight + activation rounding.

Accuracy is gated by tests/test_quantize.py: decoded-box drift vs the
fp32 folded path on the golden dog input must stay bounded, and the
dequantized kernels must match the originals to the quantization step.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
from jax import lax

from ..cfg_parser import GraphSpec

__all__ = ["quantize_folded_int8", "conv_w8", "conv_w8a8"]


def quantize_folded_int8(spec: GraphSpec, folded: Dict) -> Dict:
    """Quantize BN-folded conv params to per-output-channel int8.

    Args:
      spec: the graph spec (conv traversal order).
      folded: ``fold_batchnorm`` output — {node_i: {"w": HWIO f32,
        "b": [O] f32}}.

    Returns:
      {node_i: {"w_q": HWIO int8, "scale": [O] f32, "b": [O] f32}}.
    """
    out = {}
    for node in spec.conv_nodes:
        key = f"node_{node.index}"
        w = jnp.asarray(folded[key]["w"], jnp.float32)
        amax = jnp.max(jnp.abs(w), axis=(0, 1, 2))
        scale = jnp.maximum(amax, 1e-12) / 127.0
        w_q = jnp.clip(jnp.round(w / scale[None, None, None, :]),
                       -127, 127).astype(jnp.int8)
        out[key] = {"w_q": w_q, "scale": scale,
                    "b": jnp.asarray(folded[key]["b"], jnp.float32)}
    return out


def conv_w8(x, w_q, scale, stride: int, pad: int, compute_dtype,
            precision=None):
    """Weight-only int8 conv: int8 kernel cast to compute dtype, output
    rescaled per channel."""
    preferred = jnp.float32 if compute_dtype == jnp.float32 else None
    y = lax.conv_general_dilated(
        x.astype(compute_dtype), w_q.astype(compute_dtype),
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred,
        precision=precision,
    )
    return y.astype(jnp.float32) * scale[None, None, None, :]


def conv_w8a8(x, w_q, scale, stride: int, pad: int):
    """Full int8 conv: dynamic per-tensor activation quantization,
    int32 accumulation on the int8 MXU, fp32 rescale."""
    s_x = jnp.maximum(jnp.max(jnp.abs(x)), 1e-12) / 127.0
    x_q = jnp.clip(jnp.round(x / s_x), -127, 127).astype(jnp.int8)
    y = lax.conv_general_dilated(
        x_q, w_q,
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * (s_x * scale)[None, None, None, :]
