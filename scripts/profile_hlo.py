#!/usr/bin/env python
"""Per-HLO device-time drill-down for any pinned program on the TPU.

Codifies the round-2 profiling recipe (PERFORMANCE.md "What the device
time is spent on") so it stops being re-derived each round:

1. run a warmed jitted program N times inside ``jax.profiler.trace``;
2. parse the written ``*.xplane.pb`` with the in-container ``xprof``
   converter (``raw_to_tool_data``), tool ``hlo_stats``;
3. print the top rows by device time + an op-category rollup.

Usage:
  python scripts/profile_hlo.py --target v5s_fast --bs 512 [--iters 3]
  python scripts/profile_hlo.py --target yolov3 --bs 256
  python scripts/profile_hlo.py --target v5_train --bs 16
  python scripts/profile_hlo.py --parse /tmp/trace_dir   # re-parse only

Targets build the same pinned programs as bench.py / scripts/bench_v5.py
/ train/v5.py.  NEVER run two TPU processes at once (CLAUDE.md).
"""
import argparse
import glob
import json
import os
import sys
import time


def _enable_compile_cache():
    try:
        import jax
        if jax.default_backend() == "tpu":
            jax.config.update("jax_compilation_cache_dir",
                              "/root/.cache/jax")
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
    except Exception:
        pass


def build_target(name: str, bs: int, reso: int, dtype: str = None,
                 act: str = None, scan_ladders: bool = False):
    """Return (fn, args, sync) for a pinned program."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    rng = np.random.RandomState(0)

    if name.startswith("v5") and not name.endswith("_train"):
        # v5<size>_<fast|full>, e.g. v5s_fast
        from realtimeobjectdetection_tpu.models.yolov5 import (
            decode_v5, decode_v5_topk, init_yolov5_params,
            make_yolov5_forward, yolov5_config)
        from realtimeobjectdetection_tpu.ops.nms import nms_batch_v5
        size, mode = name[2:].split("_")
        # fast = bf16 residency + fused exact top-k decode; ship = the
        # canonical shipping config on top of fast (approx_max_k +
        # per-head gather — scripts/bench_v5.py's `fast` rows); shipn =
        # approx + nhwc_select (conv-layout score+gather, round 4)
        fast = mode in ("fast", "ship", "shipn", "shipc", "ships")
        ship = mode == "ship"
        shipn = mode == "shipn"
        shipc = mode == "shipc"
        ships = mode == "ships"  # split per-anchor heads + split decode
        reso = reso or 640
        cfg = yolov5_config(size)
        params = jax.device_put(init_yolov5_params(cfg, seed=0))
        fwd = make_yolov5_forward(
            cfg, compute_dtype=jnp.bfloat16,
            activation_dtype=jnp.bfloat16 if fast else None,
            head_dtype=jnp.bfloat16 if fast else None,
            split_heads=ships)

        def detect(p, x):
            x = x.astype(jnp.float32) / 255.0
            heads = fwd(p, x)
            if fast:
                if ships:
                    from realtimeobjectdetection_tpu.models.yolov5 \
                        import decode_v5_topk_split
                    pred = decode_v5_topk_split(heads, 80, 512, 0.25,
                                                approx=True)
                    return nms_batch_v5(pred, 80, 0.25, 0.45, top_k=512,
                                        max_det=300, compact=True)
                if shipc:
                    from realtimeobjectdetection_tpu.models.yolov5 \
                        import decode_v5_topk_compact
                    pred = decode_v5_topk_compact(heads, 80, 512, 0.25,
                                                  approx=True)
                    return nms_batch_v5(pred, 80, 0.25, 0.45, top_k=512,
                                        max_det=300, compact=True)
                pred = decode_v5_topk(heads, 80, 512, 0.25,
                                      approx=ship or shipn,
                                      per_head_gather=ship,
                                      nhwc_select=shipn)
                return nms_batch_v5(pred, 80, 0.25, 0.45, top_k=512,
                                    max_det=300)
            pred = decode_v5([h.astype(jnp.float32) for h in heads], 80)
            return nms_batch_v5(pred, 80, 0.25, 0.45, max_det=300)

        x = jax.device_put(jnp.asarray(
            rng.randint(0, 256, (bs, reso, reso, 3), np.uint8)))
        return jax.jit(detect), (params, x), lambda r: np.asarray(r[0])

    if name == "yolov3":
        from realtimeobjectdetection_tpu.models import get_spec
        from realtimeobjectdetection_tpu.model import (fold_batchnorm,
                                                       make_forward)
        from realtimeobjectdetection_tpu.ops.decode import decode_topk
        from realtimeobjectdetection_tpu.ops.nms import nms_batch
        from realtimeobjectdetection_tpu.testing import bench_params
        reso = reso or 416
        spec = get_spec("yolov3", width=reso, height=reso)
        params = fold_batchnorm(spec, bench_params(spec, "yolov3"))
        fwd = make_forward(spec, bn_mode="fold",
                           compute_dtype=jnp.bfloat16, scan_ladders=True,
                           activation_dtype=jnp.bfloat16,
                           head_dtype=jnp.bfloat16)

        def detect(p, x):
            x = x.astype(jnp.float32) / 255.0
            pred, _ = decode_topk(fwd(p, x), spec, reso, 512,
                                  confidence=0.6)
            return nms_batch(pred, 80, 0.6, 0.5, top_k=512)

        params = jax.device_put(params)
        x = jax.device_put(jnp.asarray(
            rng.randint(0, 256, (bs, reso, reso, 3), np.uint8)))
        return jax.jit(detect), (params, x), lambda r: np.asarray(r[0])

    if name == "v3_train" or name.endswith("_train"):
        import optax
        cd = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        ad = jnp.bfloat16 if act == "bfloat16" else None
        if name != "v3_train":
            # v5_train (= v5s) or v5<size>_train, e.g. v5l_train
            from realtimeobjectdetection_tpu.train.v5 import \
                make_train_step_v5
            from realtimeobjectdetection_tpu.models.yolov5 import (
                init_yolov5_params, yolov5_config)
            from realtimeobjectdetection_tpu.train.step import \
                init_train_state
            reso = reso or 640
            size = "s" if name == "v5_train" else name[2:-6]
            cfg = yolov5_config(size)
            params = init_yolov5_params(cfg, seed=0, batch_norm=True)
            opt = optax.adam(1e-3)
            step = make_train_step_v5(cfg, opt, resolution=reso,
                                      compute_dtype=cd,
                                      activation_dtype=ad,
                                      scan_ladders=scan_ladders)
            state = init_train_state(params, opt)
        else:
            from realtimeobjectdetection_tpu.models import get_spec
            from realtimeobjectdetection_tpu.weights import init_params
            from realtimeobjectdetection_tpu.train.step import (
                init_train_state, make_train_step)
            reso = reso or 416
            spec = get_spec("yolov3", width=reso, height=reso)
            params = init_params(spec, 0)
            opt = optax.adam(1e-3)
            step = make_train_step(spec, opt, resolution=reso,
                                   compute_dtype=cd,
                                   activation_dtype=ad)
            state = init_train_state(params, opt)
        m = 16
        images = jnp.asarray(rng.rand(bs, reso, reso, 3), np.float32)
        boxes = np.zeros((bs, m, 85), np.float32)
        boxes[:, :3, 0:2] = rng.uniform(0.3 * reso, 0.7 * reso, (bs, 3, 2))
        boxes[:, :3, 2:4] = rng.uniform(0.1 * reso, 0.3 * reso, (bs, 3, 2))
        boxes[:, :3, 4] = 1.0
        boxes[:, :3, 5] = 1.0
        mask = np.zeros((bs, m), bool)
        mask[:, :3] = True
        state = jax.device_put(state)
        args = (state, images, jnp.asarray(boxes), jnp.asarray(mask))
        # jit is load-bearing: an unjitted step executes op-by-op
        # (eager), which profiles as a sea of unfused elementwise HLOs
        # and ~20x the wall time — it measures the dispatch path, not
        # the train program (round-3 artifact, see PERFORMANCE.md).
        # Sync on an updated param leaf so the Adam tail is included.
        def sync(r):
            float(r[1])
            np.asarray(jax.tree_util.tree_leaves(r[0].params)[0]).ravel()[0]
        return jax.jit(step), args, sync

    raise SystemExit(f"unknown target {name}")


def capture(fn, args, sync, trace_dir: str, iters: int):
    import jax
    t0 = time.time()
    sync(fn(*args))
    print(f"compile+first run {time.time() - t0:.1f}s", flush=True)
    best = 1e9
    for _ in range(2):
        t0 = time.time()
        sync(fn(*args))
        best = min(best, time.time() - t0)
    print(f"warm {best * 1000:.1f} ms", flush=True)
    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            sync(fn(*args))
    print(f"trace written to {trace_dir}", flush=True)


def parse(trace_dir: str, top: int = 25, iters: int = 1):
    from xprof.convert import raw_to_tool_data as rtd
    xs = sorted(glob.glob(trace_dir + "/plugins/profile/*/*.xplane.pb"))
    assert xs, f"no xplane.pb under {trace_dir}"
    xs = xs[-1:]  # latest capture
    data, _ = rtd.xspace_to_tool_data(xs, "hlo_stats", {})
    s = data.decode() if isinstance(data, bytes) else str(data)
    tbl = json.loads(s)
    t = tbl[0] if isinstance(tbl, list) else tbl
    cols = [c["id"] for c in t["cols"]]
    rows = [{cols[i]: c["v"] for i, c in enumerate(r["c"])}
            for r in t["rows"]]
    # device-side rows only, by self time
    def get(r, *names, default=0.0):
        for n in names:
            if n in r and r[n] is not None:
                return r[n]
        return default

    drows = [r for r in rows
             if str(get(r, "host_or_device", default="")).lower()
             != "host"]
    key_time = None
    for cand in ("total_self_time_in_us", "self_time_us", "total_self_time",
                 "occurrences_total_self_time_in_us"):
        if drows and cand in drows[0]:
            key_time = cand
            break
    if key_time is None:
        print("available columns:", cols)
        raise SystemExit("no self-time column found")
    drows.sort(key=lambda r: -float(get(r, key_time)))
    total = sum(float(get(r, key_time)) for r in drows)
    print(f"\n== top {top} device HLOs by self time "
          f"(total {total / 1e3 / iters:.2f} ms/iter over {iters} iters)")
    groups = {}
    for r in drows:
        cat = str(get(r, "hlo_op_category", "category", default="?"))
        groups[cat] = groups.get(cat, 0.0) + float(get(r, key_time))
    for r in drows[:top]:
        us = float(get(r, key_time))
        name = str(get(r, "hlo_op_name", "hlo_name", "name", default="?"))
        cat = str(get(r, "hlo_op_category", "category", default="?"))
        gfs = get(r, "measured_gflops_per_second", "gflops_per_second",
                  default="")
        expr = str(get(r, "hlo_op_expression", default=""))[:90]
        print(f"{us / 1e3 / iters:9.3f} ms  {us / total * 100:5.1f}%  "
              f"[{cat}] {name}  {gfs}  {expr}")
    print("\n== op-category rollup")
    for cat, us in sorted(groups.items(), key=lambda kv: -kv[1]):
        print(f"{us / 1e3 / iters:9.3f} ms  {us / total * 100:5.1f}%  {cat}")
    return drows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", default=None,
                    help="v5{n,s,m,l,x}_{fast,full} | yolov3 | v3_train | "
                         "v5_train | v5{n,s,m,l,x}_train")
    ap.add_argument("--bs", type=int, default=64)
    ap.add_argument("--reso", type=int, default=None)
    ap.add_argument("--dtype", default=None, choices=["float32", "bfloat16"],
                    help="train targets: step compute dtype")
    ap.add_argument("--act", default=None, choices=["float32", "bfloat16"],
                    help="train targets: activation residency dtype "
                         "(--act bfloat16 = the bf16act record config)")
    ap.add_argument("--scan_ladders", action="store_true",
                    help="v5 train targets: roll the C3 ladders into "
                         "lax.scan (the v5l/x compile-robustness lever)")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--trace_dir", default=None)
    ap.add_argument("--parse", default=None,
                    help="only parse an existing trace dir")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()
    if args.parse:
        parse(args.parse, args.top, args.iters)
        return 0
    assert args.target, "--target or --parse required"
    _enable_compile_cache()
    trace_dir = args.trace_dir or \
        f"/tmp/trace_{args.target}_bs{args.bs}"
    fn, fargs, sync = build_target(args.target, args.bs, args.reso,
                                   dtype=args.dtype, act=args.act,
                                   scan_ladders=args.scan_ladders)
    capture(fn, fargs, sync, trace_dir, args.iters)
    parse(trace_dir, args.top, args.iters)
    return 0


if __name__ == "__main__":
    sys.exit(main())
