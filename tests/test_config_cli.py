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

def test_module_entrypoint_every_subcommand():
    """Fence for the round-1 `anchors` NameError regression.

    `python -m realtimeobjectdetection_tpu.cli <cmd>` runs the module
    top-to-bottom before main() dispatches, so a subcommand function
    appended *after* the `__main__` block is undefined at dispatch time.
    The `rodtpu` console script imports the module fully and cannot catch
    this, so every subcommand must be exercised through `python -m` in a
    real subprocess.
    """
    import subprocess
    import sys

    cmds = ["detect", "train", "validate", "stream", "serve",
            "convert", "export", "anchors", "warmup"]
    env = dict(os.environ, JAX_PLATFORM_NAME="cpu")
    procs = {
        cmd: subprocess.Popen(
            [sys.executable, "-m", "realtimeobjectdetection_tpu.cli",
             cmd, "--help"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env)
        for cmd in cmds
    }
    for cmd, proc in procs.items():
        out, err = proc.communicate(timeout=120)
        assert proc.returncode == 0, (
            f"`python -m ...cli {cmd} --help` exited "
            f"{proc.returncode}:\n{err.decode()}")
        assert b"usage" in out.lower() or b"usage" in err.lower(), cmd


def test_warmup_cli_compiles_programs(capsys):
    """`rodtpu warmup` pre-compiles the serving program for each listed
    config and exits cleanly (off-TPU the persistent cache stays off but
    the compile exercise is identical)."""
    from realtimeobjectdetection_tpu.cli import warmup_cli
    rc = warmup_cli(["--cfg", "yolov3-tiny", "--reso", "96",
                     "--batch_size", "1"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "warmup yolov3-tiny" in out
    assert "serve bs=1" in out
    assert "warmup done" in out


def test_enable_persistent_cache_off_tpu():
    """TPU-only guard: on the CPU test backend the cache must stay
    disabled (XLA:CPU AOT entries poison cross-host — see
    utils/compile_cache.py)."""
    from realtimeobjectdetection_tpu.utils.compile_cache import \
        enable_persistent_cache
    assert enable_persistent_cache() is False
