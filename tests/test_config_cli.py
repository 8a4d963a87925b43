"""params.json config layer + CLI dispatch surface."""

import json
import os

import pytest

from realtimeobjectdetection_tpu.config import configure_json, fetch_parameters


def test_tolerant_json(tmp_path):
    p = tmp_path / "p.json"
    p.write_text('{\n\t"a": [1, 2,],\n "b": {"c": 1,},\n}')
    assert configure_json(str(p)) == {"a": [1, 2], "b": {"c": 1}}


def test_fetch_parameters_schema(tmp_path):
    params = {
        "detector_params": {
            "images_path": "imgs", "destination_path": "det",
            "yolo_version": 3, "yolov5_size": "L",
            "cfg_file_path": "yolov3", "weights_file_path": "",
            "resolution": 416, "confidence": 0.6, "nms_threshold": 0.5,
            "CUDA": True, "use_torch_weights": False,
        },
        "training_params": {
            "number_of_epoch": 50, "batch_size": 16,
            "start_from_checkpoint": False,
            "train_img_dir": "/ti", "train_annot_dir": "/ta",
            "train_dataset_type": "VOC",
            "valid_img_dir": "/vi", "valid_annot_dir": "/va",
            "valid_dataset_type": "COCO",
        },
    }
    p = tmp_path / "params.json"
    p.write_text(json.dumps(params))
    det, trn, val, tra = fetch_parameters(str(p))
    assert det["images"] == "imgs" and det["yolo_version"] == 3
    assert det["weights_path"] is None  # empty string -> None
    assert trn["epochs"] == 50 and trn["batch_size"] == 16
    assert val == {"annotation_dir": "/va", "img_dir": "/vi"}
    assert tra["dataset_type"] == "VOC"


def test_cli_unknown_command():
    from realtimeobjectdetection_tpu.cli import main
    with pytest.raises(Exception, match="Unknown Command"):
        main(["frobnicate"])


def test_cli_usage_line(capsys):
    from realtimeobjectdetection_tpu.cli import main
    assert main([]) == 2
    assert "usage" in capsys.readouterr().err
