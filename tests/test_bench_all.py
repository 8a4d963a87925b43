"""Fences for scripts/bench_all.py + BENCH_CANON.json (VERDICT r3
next-6): the canonical-number regression harness must keep its config
names stable and the committed canon file must stay in lockstep with
them, so future rounds diff against the repo's own record."""

import importlib.util
import json
import os

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _load_bench_all():
    path = os.path.join(REPO, "scripts", "bench_all.py")
    spec = importlib.util.spec_from_file_location("bench_all", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_config_names_stable():
    mod = _load_bench_all()
    assert set(mod.CONFIGS) == {
        "yolov3_416_serve", "yolov3_608_serve", "yolov5s_serve",
        "yolov5l_serve", "yolov3_train", "yolov5s_train"}
    for name, (thunk, cfg) in mod.CONFIGS.items():
        assert callable(thunk), name
        assert isinstance(cfg, dict) and cfg, name


def test_canon_file_matches_configs():
    canon_path = os.path.join(REPO, "BENCH_CANON.json")
    if not os.path.exists(canon_path):
        import pytest
        pytest.skip("BENCH_CANON.json not yet recorded (needs real TPU)")
    mod = _load_bench_all()
    doc = json.load(open(canon_path))
    rows = {r["metric"]: r for r in doc["rows"]}
    assert set(rows) <= set(mod.CONFIGS), set(rows) - set(mod.CONFIGS)
    for name, row in rows.items():
        assert row.get("value", 0) > 0, name
        assert row.get("unit") == "img/s", name
        # embedded config must match the harness's current one — a
        # drifted harness invalidates the record
        assert row.get("config") == mod.CONFIGS[name][1], name
