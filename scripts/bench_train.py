#!/usr/bin/env python
"""Repeatable darknet (yolov3) train-step benchmark on the real TPU.

Times the full step (fwd + in-graph targets + loss + bwd + Adam + BN
running-stat update) with a host readback per step — the honest sync on
the axon backend, whose ``block_until_ready`` returns early.  Variants
run interleaved in one process so tunnel drift hits all sides equally.

Reports ms/step, img/s, and train MFU.  Train FLOPs are estimated as
3x the counted forward conv FLOPs (fwd + input-grad + weight-grad, the
standard accounting), so MFU here is comparable across runs but ~exact
only to that convention.

Usage: python scripts/bench_train.py [--bs 16 32] [--reso 416]
       [--variants rolled unrolled] [--dtype bfloat16]
"""
import argparse
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, nargs="+", default=[16])
    ap.add_argument("--reso", type=int, default=416)
    ap.add_argument("--model", default="yolov3")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--variants", nargs="+", default=["rolled"],
                    choices=["rolled", "unrolled", "rolled_noremat",
                             "bf16act"])
    ap.add_argument("--accum", type=int, nargs="+", default=[],
                    help="extra accum_steps=k variants (in-graph "
                         "gradient accumulation) to interleave against "
                         "the rolled step")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--lag_ab", type=int, nargs="+", default=[],
                    help="trainer-loop A/B: run --loop_steps consecutive "
                         "steps with the loss readback deferred this many "
                         "steps behind dispatch (trainer._LaggedLoss; 0 = "
                         "the reference-style per-batch sync) and report "
                         "wall ms/step per lag, interleaved")
    ap.add_argument("--loop_steps", type=int, default=8)
    ap.add_argument("--chain", type=int, nargs="+", default=[],
                    help="A/B the chained dispatch (train.step."
                         "make_chained_step): run --loop_steps steps as "
                         "loop_steps/k dispatches of k in-graph steps "
                         "each (bf16act rolled step), lag-1 loop timing")
    ap.add_argument("--donate", action="store_true",
                    help="donate the state argument (the real trainer's "
                         "default) — halves train-state HBM residency, "
                         "required to probe the true batch-size "
                         "capability boundary; each variant then times "
                         "a state CHAIN instead of replaying one state")
    args = ap.parse_args()

    import jax
    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    import optax
    from realtimeobjectdetection_tpu.models import get_spec
    from realtimeobjectdetection_tpu.train.step import (init_train_state,
                                                        make_train_step)
    from realtimeobjectdetection_tpu.utils.profiling import conv_flops
    from realtimeobjectdetection_tpu.weights import init_params

    reso = args.reso
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    spec = get_spec(args.model, width=reso, height=reso)
    params = init_params(spec, 0)
    opt = optax.adam(1e-3)
    # donate mode: no long-lived global state (it would pin ~3x params
    # of HBM next to the per-variant chains)
    state = None if args.donate \
        else jax.device_put(init_train_state(params, opt))
    train_gflop_per_img = 3.0 * conv_flops(spec, reso) / 1e9
    peak_tflops = 197.0 if args.dtype == "bfloat16" else 197.0 / 4

    donate_kw = {"donate_argnums": (0,)} if args.donate else {}

    variants = {}
    for v in args.variants:
        if v == "bf16act":
            # rolled+remat step with bf16 activation residency
            variants[v] = jax.jit(make_train_step(
                spec, opt, resolution=reso, compute_dtype=dtype,
                activation_dtype=jnp.bfloat16), **donate_kw)
            continue
        variants[v] = jax.jit(make_train_step(
            spec, opt, resolution=reso, compute_dtype=dtype,
            scan_ladders=v.startswith("rolled"),
            scan_remat=(v == "rolled")), **donate_kw)
    for k in args.accum:
        variants[f"accum{k}"] = jax.jit(make_train_step(
            spec, opt, resolution=reso, compute_dtype=dtype,
            accum_steps=k), **donate_kw)

    def fresh_state():
        return jax.device_put(init_train_state(params, opt))

    rng = np.random.RandomState(0)
    for bs in args.bs:
        images = jax.device_put(jnp.asarray(
            rng.rand(bs, reso, reso, 3), jnp.float32))
        m = 16
        boxes = np.zeros((bs, m, 85), np.float32)
        boxes[:, :6, 0:2] = rng.uniform(0.2 * reso, 0.8 * reso, (bs, 6, 2))
        boxes[:, :6, 2:4] = rng.uniform(0.05 * reso, 0.3 * reso, (bs, 6, 2))
        boxes[:, :6, 4] = 1.0
        boxes[:, :6, 5] = 1.0
        mask = np.zeros((bs, m), bool)
        mask[:, :6] = True
        boxes = jax.device_put(jnp.asarray(boxes))
        mask = jax.device_put(jnp.asarray(mask))

        def sync(s2, loss):
            # host readback = the only true sync on axon.  Read BOTH the
            # loss and an updated param leaf: the loss is computed
            # mid-program, so it alone could come back before the Adam
            # tail finishes if the runtime surfaces outputs eagerly.
            float(loss)
            float(jax.tree_util.tree_leaves(s2.params)[0].ravel()[0])

        dead = set()
        chains = {}      # donate mode: per-variant state chain
        for name, f in variants.items():
            t0 = time.time()
            try:
                s_in = fresh_state() if args.donate else state
                s2, loss = f(s_in, images, boxes, mask)
                sync(s2, loss)
                chains[name] = s2
            except Exception as e:  # e.g. RESOURCE_EXHAUSTED at large bs
                dead.add(name)
                print(f"bs={bs} {name}: FAILED {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)
                continue
            print(f"bs={bs} {name}: compile+first {time.time() - t0:.1f}s "
                  f"loss={float(loss):.2f}", flush=True)

        best = {k: 1e9 for k in variants if k not in dead}
        for _ in range(args.rounds):
            for name, f in variants.items():
                if name in dead:
                    continue
                for _ in range(args.iters):
                    t0 = time.time()
                    s_in = chains[name] if args.donate else state
                    s2, loss = f(s_in, images, boxes, mask)
                    sync(s2, loss)
                    if args.donate:
                        chains[name] = s2
                    best[name] = min(best[name], time.time() - t0)
        for name, t in best.items():
            img_s = bs / t
            tflops = img_s * train_gflop_per_img / 1000.0
            print(f"{args.model} {reso}² bs={bs} {args.dtype} "
                  f"train[{name}]: {t * 1000:.1f} ms/step = "
                  f"{img_s:.0f} img/s, {tflops:.1f} TFLOP/s = "
                  f"{100 * tflops / peak_tflops:.1f}% MFU "
                  f"(3x-fwd convention, "
                  f"{train_gflop_per_img:.0f} GFLOP/img)", flush=True)

        if args.lag_ab:
            # trainer-loop A/B: K back-to-back steps, reading each loss
            # back `lag` steps late (exactly what _LaggedLoss does in the
            # epoch loop).  lag=0 is the per-batch sync the reference's
            # torch loop implies; higher lags keep the device queue full
            # through the tunnel.
            from collections import deque
            alive = [v for k, v in variants.items() if k not in dead]
            if not alive:
                print(f"bs={bs}: all variants dead — skipping lag A/B",
                      flush=True)
                continue
            f = alive[0]
            K = args.loop_steps

            def run_loop(lag):
                s = fresh_state() if args.donate else state
                pend = deque()
                t0 = time.time()
                for _ in range(K):
                    s, loss = f(s, images, boxes, mask)
                    pend.append(loss)
                    while len(pend) > lag:
                        float(pend.popleft())
                while pend:
                    float(pend.popleft())
                float(jax.tree_util.tree_leaves(s.params)[0].ravel()[0])
                return time.time() - t0

            for lag in args.lag_ab:   # warm each path once
                run_loop(lag)
            best_lag = {lag: 1e9 for lag in args.lag_ab}
            for _ in range(args.rounds):
                for lag in args.lag_ab:
                    best_lag[lag] = min(best_lag[lag], run_loop(lag))
            for lag, t in best_lag.items():
                per = t / K
                print(f"{args.model} {reso}² bs={bs} {args.dtype} "
                      f"loop[lag={lag}] x{K}: {per * 1000:.1f} ms/step = "
                      f"{bs / per:.0f} img/s", flush=True)
        if args.chain:
            from realtimeobjectdetection_tpu.train.step import \
                make_chained_step
            base_fn = make_train_step(
                spec, opt, resolution=reso, compute_dtype=dtype,
                activation_dtype=jnp.bfloat16)
            K = args.loop_steps
            for k in args.chain:
                assert K % k == 0, (K, k)
                cf = jax.jit(make_chained_step(base_fn, k), **donate_kw)
                xc = jnp.broadcast_to(images, (k,) + images.shape) \
                    if k > 1 else images
                bc = jnp.broadcast_to(boxes, (k,) + boxes.shape) \
                    if k > 1 else boxes
                mc = jnp.broadcast_to(mask, (k,) + mask.shape) \
                    if k > 1 else mask

                # thread ONE state across all windows (a fresh state
                # per window would put ~750 MB of params+Adam moments
                # back through the tunnel inside the timed region —
                # measured 2.7x inflation)
                cs = fresh_state()

                def run_chain():
                    nonlocal cs
                    prev = None
                    t0 = time.time()
                    for _ in range(K // k):
                        if prev is not None:
                            float(np.asarray(prev).ravel()[-1])
                        cs, prev = cf(cs, xc, bc, mc)
                    float(np.asarray(prev).ravel()[-1])
                    float(jax.tree_util.tree_leaves(
                        cs.params)[0].ravel()[0])
                    return time.time() - t0

                try:
                    t0 = time.time()
                    run_chain()
                    print(f"bs={bs} chain{k}: compile+first "
                          f"{time.time() - t0:.1f}s", flush=True)
                except Exception as e:
                    print(f"bs={bs} chain{k}: FAILED "
                          f"{type(e).__name__}: {str(e)[:160]}",
                          flush=True)
                    continue
                bt = min(run_chain() for _ in range(args.rounds))
                del cs
                per = bt / K
                img_s = bs / per
                tflops = img_s * train_gflop_per_img / 1000.0
                print(f"{args.model} {reso}² bs={bs} {args.dtype} "
                      f"chain[{k}] x{K}: {per * 1000:.1f} ms/step = "
                      f"{img_s:.0f} img/s, {tflops:.1f} TFLOP/s = "
                      f"{100 * tflops / peak_tflops:.1f}% MFU",
                      flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
