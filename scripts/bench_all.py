#!/usr/bin/env python
"""Canonical-number regression harness (VERDICT r3 next-6).

One process, one config at a time (NEVER two TPU processes — see
CLAUDE.md), emitting one BENCH-style JSON line per canonical config and
diffing each against the committed record in ``BENCH_CANON.json`` so a
future round compares against the repo's own numbers instead of
re-deriving them from PERFORMANCE.md prose.

Canonical configs = the shipping operating points PERFORMANCE.md
documents:

* ``yolov3_416_serve``  — the judged bench.py default (bs=256 K=512)
* ``yolov3_608_serve``  — the reference's --reso 608 surface, dense
                          K=1024 (the blocked-NMS auto-path)
* ``yolov5s_serve``     — v5s bs=512 fast path, depth-4 pipelined
* ``yolov5l_serve``     — v5l bs=64 fast path, depth-2 pipelined
* ``yolov3_train``      — 416² bs=128 bf16+act chain4, donated state,
                          lag-1 loop (the trainer's actual hot loop)
* ``yolov5s_train``     — 640² bs=128 bf16+act chain4, same loop

Usage:
  python scripts/bench_all.py                 # run all, diff vs canon
  python scripts/bench_all.py --only yolov3_416_serve,yolov5s_train
  python scripts/bench_all.py --update        # rewrite BENCH_CANON.json
  python scripts/bench_all.py --check         # exit 1 if any row <90%
                                              # of canon (the ratchet:
                                              # run after `rodtpu warmup`
                                              # at round end so a capture
                                              # regression is caught
                                              # BEFORE the driver's
                                              # scored bench.py run)

Every row reads back its outputs on the host (axon block_until_ready is
not a true sync) and reports best-of-N windows (tunnel RPC variance is
±15%; single runs are not comparable).
"""
import argparse
import importlib.util
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
CANON_PATH = os.path.join(REPO, "BENCH_CANON.json")


def _enable_compile_cache():
    try:
        import jax
        if jax.default_backend() == "tpu":
            jax.config.update("jax_compilation_cache_dir",
                              "/root/.cache/jax")
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------- serving
def _serve_v3(reso, batch, top_k):
    bench = _load(os.path.join(REPO, "bench.py"), "bench")
    r = bench.bench_tpu("yolov3", reso, batch, iters=20, top_k=top_k)
    return {"value": round(r["fps"], 1), "unit": "img/s",
            "mfu_pct": round(r["mfu_pct"], 1),
            "ms_per_batch": round(r["ms_per_batch"], 1)}


def _serve_v5(size, bs, depth=2):
    bv5 = _load(os.path.join(HERE, "bench_v5.py"), "bench_v5")
    r = bv5.run(size, bs, fast=True, depth=depth)
    return {"value": round(r["fps"], 1), "unit": "img/s",
            "mfu_pct": round(r["mfu"], 1)}


# ---------------------------------------------------------------- training
def _train_loop(step_fn, state, xa, bxa, mka, chain, bs, gflop_img,
                steps=8, rounds=3):
    """The trainer's lag-1 hot loop: dispatch step k, read back loss
    k-1, donated state threaded across windows (re-uploading params +
    Adam moments each window reads 2.7x slow — PERFORMANCE.md)."""
    import jax
    import numpy as np

    def last(loss):
        return float(np.asarray(loss).ravel()[-1])

    t0 = time.time()
    state, loss = step_fn(state, xa, bxa, mka)
    last(loss)
    compile_s = time.time() - t0
    best = None
    for _ in range(rounds):
        prev = None
        t0 = time.time()
        for _ in range(steps):
            if prev is not None:
                last(prev)
            state, prev = step_fn(state, xa, bxa, mka)
        last(prev)
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]).ravel()[0]
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    imgs = bs / (best / (steps * chain))
    mfu = imgs * gflop_img / 1000.0 / 197.0 * 100
    return {"value": round(imgs, 1), "unit": "img/s",
            "mfu_pct": round(mfu, 1), "compile_s": round(compile_s, 1)}


def _train_batch(rng, bs, reso, m=16, n=6):
    import jax
    import jax.numpy as jnp
    import numpy as np
    boxes = np.zeros((bs, m, 85), np.float32)
    boxes[:, :n, 0:2] = rng.uniform(0.2 * reso, 0.8 * reso, (bs, n, 2))
    boxes[:, :n, 2:4] = rng.uniform(0.05 * reso, 0.3 * reso, (bs, n, 2))
    boxes[:, :n, 4] = 1.0
    boxes[:, :n, 5] = 1.0
    mask = np.zeros((bs, m), bool)
    mask[:, :n] = True
    x = jax.device_put(jnp.asarray(rng.rand(bs, reso, reso, 3),
                                   jnp.float32))
    return x, jax.device_put(jnp.asarray(boxes)), \
        jax.device_put(jnp.asarray(mask))


def _stack(chain, *arrs):
    import jax.numpy as jnp
    return tuple(jnp.broadcast_to(a, (chain,) + a.shape) for a in arrs)


def _train_v3(bs=128, reso=416, chain=4):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from realtimeobjectdetection_tpu.models import get_spec
    from realtimeobjectdetection_tpu.train.step import (
        init_train_state, make_chained_step, make_train_step)
    from realtimeobjectdetection_tpu.utils.profiling import conv_flops
    from realtimeobjectdetection_tpu.weights import init_params

    spec = get_spec("yolov3", width=reso, height=reso)
    opt = optax.adam(1e-3)
    step = make_train_step(spec, opt, resolution=reso,
                           compute_dtype=jnp.bfloat16,
                           activation_dtype=jnp.bfloat16)
    f = jax.jit(make_chained_step(step, chain), donate_argnums=0)
    state = jax.device_put(init_train_state(init_params(spec, 0), opt))
    rng = np.random.RandomState(0)
    x, bx, mk = _train_batch(rng, bs, reso)
    xa, bxa, mka = _stack(chain, x, bx, mk)
    gflop_img = 3.0 * conv_flops(spec, reso) / 1e9
    return _train_loop(f, state, xa, bxa, mka, chain, bs, gflop_img)


def _train_v5(bs=128, reso=640, chain=4, size="s"):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from realtimeobjectdetection_tpu.models.yolov5 import (
        init_yolov5_params, yolov5_config)
    from realtimeobjectdetection_tpu.train.step import (
        init_train_state, make_chained_step)
    from realtimeobjectdetection_tpu.train.v5 import make_train_step_v5
    from realtimeobjectdetection_tpu.utils.profiling import conv_flops_v5

    cfg = yolov5_config(size)
    opt = optax.adam(1e-3)
    step = make_train_step_v5(cfg, opt, resolution=reso,
                              compute_dtype=jnp.bfloat16,
                              activation_dtype=jnp.bfloat16)
    f = jax.jit(make_chained_step(step, chain), donate_argnums=0)
    state = jax.device_put(init_train_state(
        init_yolov5_params(cfg, seed=0, batch_norm=True), opt))
    rng = np.random.RandomState(0)
    x, bx, mk = _train_batch(rng, bs, reso, m=32, n=8)
    xa, bxa, mka = _stack(chain, x, bx, mk)
    gflop_img = 3.0 * conv_flops_v5(cfg, reso) / 1e9
    return _train_loop(f, state, xa, bxa, mka, chain, bs, gflop_img)


# Name -> (thunk, config-dict recorded in the canon file).  Keep the
# config dicts in lockstep with the thunk defaults — the canon file's
# rows embed them so a drifted harness is visible in the diff.
CONFIGS = {
    "yolov3_416_serve": (lambda: _serve_v3(416, 256, 512),
                         {"reso": 416, "bs": 256, "top_k": 512,
                          "bench_metric": "yolov3_detect_fps_416"}),
    "yolov3_608_serve": (lambda: _serve_v3(608, 256, 1024),
                         {"reso": 608, "bs": 256, "top_k": 1024,
                          "bench_metric": "yolov3_detect_fps_608"}),
    "yolov5s_serve": (lambda: _serve_v5("s", 512, depth=4),
                      {"reso": 640, "bs": 512, "mode": "fast+pipe4"}),
    "yolov5l_serve": (lambda: _serve_v5("l", 64),
                      {"reso": 640, "bs": 64, "mode": "fast+pipe2"}),
    "yolov3_train": (lambda: _train_v3(),
                     {"reso": 416, "bs": 128, "chain": 4,
                      "variant": "bf16act"}),
    "yolov5s_train": (lambda: _train_v5(),
                      {"reso": 640, "bs": 128, "chain": 4,
                       "variant": "bf16act"}),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="comma-separated subset of config names")
    ap.add_argument("--update", action="store_true",
                    help="rewrite BENCH_CANON.json with this run")
    ap.add_argument("--check", action="store_true",
                    help="ratchet mode: exit 1 when any measured row "
                         "lands below --check_frac of its canon record "
                         "(or errors)")
    ap.add_argument("--check_frac", type=float, default=0.90)
    a = ap.parse_args()
    _enable_compile_cache()

    names = list(CONFIGS) if not a.only else \
        [n.strip() for n in a.only.split(",") if n.strip()]
    unknown = [n for n in names if n not in CONFIGS]
    if unknown:
        raise SystemExit(f"unknown configs {unknown}; "
                         f"known: {list(CONFIGS)}")

    canon = {}
    if os.path.exists(CANON_PATH):
        canon = {r["metric"]: r for r in json.load(open(CANON_PATH))["rows"]}

    rows = []
    failures = []
    for name in names:
        thunk, cfg = CONFIGS[name]
        try:
            r = thunk()
        except Exception as e:  # OOM / compiler wall: report, continue
            print(json.dumps({"metric": name, "error":
                              f"{type(e).__name__}: {str(e)[:160]}"}),
                  flush=True)
            failures.append(f"{name}: errored")
            continue
        row = {"metric": name, **r, "config": cfg}
        prev = canon.get(name)
        if prev and prev.get("value"):
            row["vs_canon"] = round(r["value"] / prev["value"], 3)
            if row["vs_canon"] < a.check_frac:
                failures.append(f"{name}: {r['value']} = "
                                f"{row['vs_canon']:.0%} of canon "
                                f"{prev['value']}")
        rows.append(row)
        print(json.dumps(row), flush=True)

    if a.update and rows:
        kept = [r for r in rows if "error" not in r]
        for name, prev in canon.items():  # keep rows a partial run skipped
            if name not in {r["metric"] for r in kept}:
                kept.append(prev)
        kept.sort(key=lambda r: list(CONFIGS).index(r["metric"])
                  if r["metric"] in CONFIGS else 99)
        with open(CANON_PATH, "w") as f:
            json.dump({"note": "canonical per-config records; regenerate "
                               "with scripts/bench_all.py --update "
                               "(real TPU)",
                       "rows": kept}, f, indent=1)
        print(f"updated {CANON_PATH} ({len(kept)} rows)", flush=True)
    if a.check and failures:
        print("bench_all --check FAILED:", flush=True)
        for f_ in failures:
            print(f"  {f_}", flush=True)
        return 1
    if a.check:
        print(f"bench_all --check OK: all rows >= "
              f"{a.check_frac:.0%} of canon", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
