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
