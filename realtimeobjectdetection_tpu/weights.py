"""Darknet ``.weights`` binary -> JAX parameter pytree.

Replicates the exact traversal and per-layer slice order of the reference
loader (/root/reference/src/darknet.py:316-410):

* 5 x int32 header (major, minor, subversion, seen, pad),
* flat float32 array,
* walked over conv nodes in cfg order; per conv:
    - with BN:   [bn_bias(beta), bn_weight(gamma), running_mean, running_var]
    - without:   [conv_bias]
  then conv weights in OIHW order (``view_as(conv.weight)``).

The only deviation is layout: kernels are transposed OIHW -> HWIO for
NHWC TPU convolutions.  ``export_darknet_weights`` inverts the mapping
bit-exactly so round-trips are lossless.
"""

from __future__ import annotations

import io
from typing import Dict, Tuple

import numpy as np

from .cfg_parser import GraphSpec

__all__ = [
    "load_darknet_weights",
    "export_darknet_weights",
    "init_params",
    "params_from_torch_state_dict",
    "param_count",
]

Params = Dict[str, Dict[str, np.ndarray]]


def _conv_key(i: int) -> str:
    return f"node_{i}"


def param_count(spec: GraphSpec) -> int:
    return sum(n.num_params for n in spec.conv_nodes)


def load_darknet_weights(spec: GraphSpec, path_or_bytes) -> Tuple[Params, Dict[str, int]]:
    """Read a raw Darknet .weights file into an HWIO/NHWC parameter pytree.

    Returns ``(params, header)`` where header carries the version fields and
    the ``seen`` image counter (src/darknet.py:397-410).
    """
    if isinstance(path_or_bytes, (bytes, bytearray)):
        buf = io.BytesIO(path_or_bytes)
    else:
        buf = open(path_or_bytes, "rb")
    try:
        raw_header = buf.read(5 * 4)
        if len(raw_header) < 5 * 4:
            raise ValueError("weights file too short for the 5-int32 header")
        header = np.frombuffer(raw_header, dtype=np.int32)
        payload = buf.read()
        flat = np.frombuffer(payload[:len(payload) - len(payload) % 4],
                             dtype=np.float32)
    finally:
        buf.close()

    params: Params = {}
    ptr = 0
    for node in spec.conv_nodes:
        o, i, k = node.out_channels, node.in_channels, node.kernel_size
        entry: Dict[str, np.ndarray] = {}
        if node.batch_normalize:
            beta = flat[ptr:ptr + o]; ptr += o
            gamma = flat[ptr:ptr + o]; ptr += o
            mean = flat[ptr:ptr + o]; ptr += o
            var = flat[ptr:ptr + o]; ptr += o
            entry["bn_beta"] = np.asarray(beta, dtype=np.float32)
            entry["bn_gamma"] = np.asarray(gamma, dtype=np.float32)
            entry["bn_mean"] = np.asarray(mean, dtype=np.float32)
            entry["bn_var"] = np.asarray(var, dtype=np.float32)
        else:
            bias = flat[ptr:ptr + o]; ptr += o
            entry["b"] = np.asarray(bias, dtype=np.float32)
        n_w = o * i * k * k
        w = flat[ptr:ptr + n_w]; ptr += n_w
        if w.size != n_w:
            raise ValueError(
                f"weights file exhausted at node {node.index}: "
                f"wanted {n_w} floats, got {w.size}")
        w = w.reshape(o, i, k, k).transpose(2, 3, 1, 0)  # OIHW -> HWIO
        entry["w"] = np.ascontiguousarray(w, dtype=np.float32)
        params[_conv_key(node.index)] = entry

    if ptr != flat.size:
        raise ValueError(
            f"weights file has {flat.size - ptr} unread floats "
            f"(consumed {ptr}); cfg/weights mismatch")
    hdr = {
        "major": int(header[0]), "minor": int(header[1]),
        "subversion": int(header[2]), "seen": int(header[3]),
    }
    return params, hdr


def export_darknet_weights(spec: GraphSpec, params: Params,
                           seen: int = 0) -> bytes:
    """Serialize params back to the Darknet binary format (round-trip)."""
    out = [np.array([0, 2, 0, seen, 0], dtype=np.int32).tobytes()]
    for node in spec.conv_nodes:
        entry = params[_conv_key(node.index)]
        if node.batch_normalize:
            for key in ("bn_beta", "bn_gamma", "bn_mean", "bn_var"):
                out.append(np.asarray(entry[key], np.float32).tobytes())
        else:
            out.append(np.asarray(entry["b"], np.float32).tobytes())
        w = np.asarray(entry["w"], np.float32).transpose(3, 2, 0, 1)  # HWIO->OIHW
        out.append(np.ascontiguousarray(w).tobytes())
    return b"".join(out)


def init_params(spec: GraphSpec, seed: int = 0) -> Params:
    """He-style random init (fan-in scaled), BN at identity.

    The reference relies on torch's default Conv2d init; exact init parity
    is irrelevant (training from scratch), numerical stability is not.
    """
    rng = np.random.RandomState(seed)
    params: Params = {}
    for node in spec.conv_nodes:
        o, i, k = node.out_channels, node.in_channels, node.kernel_size
        fan_in = i * k * k
        w = rng.normal(0.0, np.sqrt(2.0 / fan_in), size=(k, k, i, o))
        entry: Dict[str, np.ndarray] = {"w": w.astype(np.float32)}
        if node.batch_normalize:
            entry["bn_gamma"] = np.ones(o, np.float32)
            entry["bn_beta"] = np.zeros(o, np.float32)
            entry["bn_mean"] = np.zeros(o, np.float32)
            entry["bn_var"] = np.ones(o, np.float32)
        else:
            entry["b"] = np.zeros(o, np.float32)
        params[_conv_key(node.index)] = entry
    return params


def params_from_torch_state_dict(spec: GraphSpec, state_dict) -> Params:
    """Convert a reference torch ``state_dict`` into our pytree.

    Reference key schema (src/darknet.py:449-533):
      ``module_list.{i}.conv_{i}.weight|bias``
      ``module_list.{i}.batch_norm_{i}.weight|bias|running_mean|running_var``
    Accepts tensors or ndarrays; handles an optional ``module.`` prefix
    (``nn.DataParallel`` checkpoints, train.py:71-72).
    """
    def to_np(v):
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v, dtype=np.float32)

    sd = {}
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[len("module."):]
        sd[k] = v

    params: Params = {}
    for node in spec.conv_nodes:
        i = node.index
        base = f"module_list.{i}"
        entry: Dict[str, np.ndarray] = {}
        w = to_np(sd[f"{base}.conv_{i}.weight"])  # OIHW
        entry["w"] = np.ascontiguousarray(w.transpose(2, 3, 1, 0))
        if node.batch_normalize:
            entry["bn_gamma"] = to_np(sd[f"{base}.batch_norm_{i}.weight"])
            entry["bn_beta"] = to_np(sd[f"{base}.batch_norm_{i}.bias"])
            entry["bn_mean"] = to_np(sd[f"{base}.batch_norm_{i}.running_mean"])
            entry["bn_var"] = to_np(sd[f"{base}.batch_norm_{i}.running_var"])
        else:
            entry["b"] = to_np(sd[f"{base}.conv_{i}.bias"])
        params[_conv_key(i)] = entry
    return params
