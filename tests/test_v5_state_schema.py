"""Converter-drift gate against the vendored ultralytics yolov5s schema.

tests/golden/yolov5s_state_schema.json records the exact key list +
shapes of an ultralytics yolov5s (v6.x) ``model.state_dict()``, written
from the documented architecture independently of YoloV5Config (see
scripts/gen_v5_state_schema.py).  These tests prove, without the
egress-gated checkpoint, that ``params_from_ultralytics`` consumes a
state dict with exactly those keys/shapes and that the resulting pytree
matches the native graph's parameter shapes (VERDICT r2 next-5).  The
on-line proof against a real yolov5s.pt remains
scripts/fetch_and_verify.sh, which diffs the download against this
schema first.
"""

import json
import os

import numpy as np
import pytest

from realtimeobjectdetection_tpu.models.yolov5 import (
    YoloV5Config, init_yolov5_params, params_from_ultralytics)

SCHEMA = os.path.join(os.path.dirname(__file__), "golden",
                      "yolov5s_state_schema.json")


def load_schema():
    with open(SCHEMA) as f:
        return json.load(f)


def synthetic_state_dict():
    rng = np.random.RandomState(0)
    sd = {}
    for key, shape in load_schema().items():
        if key.endswith("num_batches_tracked"):
            sd[key] = np.asarray(0, np.int64)
        elif key.endswith("running_var"):
            sd[key] = rng.uniform(0.5, 2.0, shape).astype(np.float32)
        else:
            sd[key] = rng.normal(0, 0.05, shape).astype(np.float32)
    return sd


def tree_shapes(p, prefix=""):
    out = {}
    if isinstance(p, dict):
        for k, v in p.items():
            out.update(tree_shapes(v, f"{prefix}{k}/"))
    elif isinstance(p, list):
        for i, v in enumerate(p):
            out.update(tree_shapes(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = tuple(np.shape(p))
    return out


def test_converter_consumes_exact_schema():
    """The converter runs on a state dict with EXACTLY the schema's
    keys (any key it asks for beyond the schema would KeyError), and
    the schema's conv kernels map 1:1 onto the converted tree's conv
    leaves (no real-checkpoint weight is silently ignored)."""
    sd = synthetic_state_dict()
    cfg = YoloV5Config("s")
    tree = params_from_ultralytics(cfg, sd)   # KeyError = drift
    kernel_keys = [k for k in sd
                   if k.endswith(".conv.weight")
                   or (k.startswith("model.24.m.") and
                       k.endswith(".weight"))]
    w_leaves = [k for k in tree_shapes(tree) if k.endswith("/w")]
    assert len(kernel_keys) == len(w_leaves)


def test_converter_detects_missing_keys():
    """Dropping a required checkpoint key fails loudly, not silently."""
    cfg = YoloV5Config("s")
    for victim in ("model.13.m.0.cv2.conv.weight",
                   "model.24.m.1.bias",
                   "model.9.cv2.bn.running_var"):
        sd = synthetic_state_dict()
        del sd[victim]
        with pytest.raises(KeyError):
            params_from_ultralytics(cfg, sd)


def test_converted_tree_matches_native_shapes():
    """Converted pytree is shape-identical to init_yolov5_params('s')."""
    sd = synthetic_state_dict()
    cfg = YoloV5Config("s")
    got = tree_shapes(params_from_ultralytics(cfg, sd))
    want = tree_shapes(init_yolov5_params(cfg, seed=0))
    assert got == want


def test_schema_matches_config_arithmetic():
    """The independently-written schema and YoloV5Config agree on every
    conv's channel arithmetic (catches config drift the other way)."""
    schema = load_schema()
    cfg = YoloV5Config("s")
    # spot anchors of the width math: stem, SPPF, detect heads
    assert schema["model.0.conv.weight"] == [cfg.ch[0], 3, 6, 6]
    assert schema["model.9.cv1.conv.weight"] == \
        [cfg.ch[4] // 2, cfg.ch[4], 1, 1]
    for s, cin in enumerate((cfg.ch[2], cfg.ch[3], cfg.ch[4])):
        assert schema[f"model.24.m.{s}.weight"] == [cfg.no, cin, 1, 1]
    # depth math: number of bottlenecks per C3
    for idx, n in zip((2, 4, 6, 8), cfg.depths):
        assert f"model.{idx}.m.{n - 1}.cv1.conv.weight" in schema
        assert f"model.{idx}.m.{n}.cv1.conv.weight" not in schema


def test_regenerator_is_deterministic():
    """scripts/gen_v5_state_schema.py reproduces the committed fixture."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "gen_v5_state_schema",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "gen_v5_state_schema.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.build_schema() == load_schema()
