import os

import pytest

from realtimeobjectdetection_tpu.cfg_parser import (
    ConvSpec, MaxPoolSpec, RouteSpec, ShortcutSpec, UpsampleSpec, YoloSpec,
    build_graph_spec, load_graph_spec, parse_cfg_blocks)
from realtimeobjectdetection_tpu.models import (to_cfg_text, yolov3_spec,
                                                yolov3_tiny_spec)

from conftest import REFERENCE_DIR, reference_available


def test_parse_blocks_tolerant():
    text = """
# a comment
[net]
width=416
height = 416
channels=3

[convolutional]
batch_normalize=1
filters=16
size=3
stride=1
pad=1
activation=leaky
"""
    blocks = parse_cfg_blocks(text)
    assert blocks[0]["type"] == "net"
    assert blocks[1]["filters"] == "16"
    assert blocks[0]["height"] == "416"  # whitespace around '=' stripped


def test_tiny_structure():
    spec = yolov3_tiny_spec()
    assert len(spec.nodes) == 24
    assert len(spec.conv_nodes) == 13
    assert len(spec.yolo_nodes) == 2
    assert isinstance(spec.nodes[11], MaxPoolSpec)
    assert spec.nodes[11].stride == 1  # the replicate-pad pool
    assert spec.anchors_in_detection_order == [
        (81, 82), (135, 169), (344, 319), (10, 14), (23, 27), (37, 58)]
    # route channel math: node 20 concats upsampled 128 + backbone 256
    route = spec.nodes[20]
    assert isinstance(route, RouteSpec)
    assert route.sources == (19, 8) and route.channels == 384


def test_v3_structure():
    spec = yolov3_spec()
    assert len(spec.nodes) == 107
    assert len(spec.conv_nodes) == 75
    assert len([n for n in spec.nodes if isinstance(n, ShortcutSpec)]) == 23
    assert len(spec.yolo_nodes) == 3
    assert spec.yolo_nodes[0].anchors == ((116, 90), (156, 198), (373, 326))
    assert spec.num_classes == 80


def test_cfg_text_round_trip():
    for fn in (yolov3_spec, yolov3_tiny_spec):
        spec = fn()
        again = build_graph_spec(parse_cfg_blocks(to_cfg_text(spec)))
        assert again.nodes == spec.nodes


def test_param_counts_match_known_weight_files():
    """Counts imply exactly the public .weights file sizes (20B header)."""
    from realtimeobjectdetection_tpu.weights import param_count
    assert param_count(yolov3_spec()) == 62001757      # 248007048-byte file
    assert param_count(yolov3_tiny_spec()) == 8858734  # 35434956-byte file


def test_live_after_liveness():
    spec = yolov3_tiny_spec()
    live = spec.live_after()
    assert live[13] == 17  # conv 13 feeds route 17
    assert live[8] == 20   # backbone feature feeds the concat route


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_zoo_matches_reference_cfgs():
    for name, fn in (("yolov3", yolov3_spec), ("yolov3-tiny", yolov3_tiny_spec)):
        zoo = fn()
        ref = load_graph_spec(os.path.join(REFERENCE_DIR, "cfg", f"{name}.cfg"))
        assert zoo.nodes == ref.nodes


def test_scan_ladder_trims_on_midladder_route():
    """A route tapping a mid-ladder residual output must block rolling
    that region into lax.scan (the activation wouldn't exist)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from realtimeobjectdetection_tpu.model import (_find_ladders,
                                                   make_forward)
    from realtimeobjectdetection_tpu.weights import init_params

    cfg = """
[net]
width=64
height=64
channels=3
[convolutional]
batch_normalize=1
filters=16
size=3
stride=1
pad=1
activation=leaky
"""
    # 3 residual triples, then a route back into triple 1's output
    triple = """
[convolutional]
batch_normalize=1
filters=8
size=1
stride=1
pad=1
activation=leaky
[convolutional]
batch_normalize=1
filters=16
size=3
stride=1
pad=1
activation=leaky
[shortcut]
from=-3
activation=linear
"""
    cfg += triple * 3
    cfg += """
[route]
layers=3
"""
    spec = build_graph_spec(parse_cfg_blocks(cfg))
    ladders = _find_ladders(spec)
    # node 3 (triple-1 output) is externally routed: only triples 2+3
    # of the run may stay rolled — never a region containing node 3 as
    # an interior (non-materialized) activation
    for start, reps in ladders.items():
        interior = set(range(start, start + 3 * reps - 1))
        assert 3 not in interior, (start, reps)
    params = init_params(spec, 0)
    fwd = jax.jit(make_forward(spec, bn_mode="running", scan_ladders=True))
    heads_or_out = fwd(params, jnp.zeros((1, 64, 64, 3), jnp.float32))
    # graph has no yolo node; forward returns empty heads without crashing
    assert heads_or_out == []
