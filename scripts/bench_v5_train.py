#!/usr/bin/env python
"""Pipelined v5 train-step throughput + MFU on the real TPU.

Round-3 finding (profile_hlo --target v5_train --bs 16): the v5s train
step's device time is ~38 ms while the readback-synced wall is ~104 ms
— ~2/3 of every serially-timed step is tunnel RPC, which the trainer's
``loss_lag=1`` loop overlaps away.  The serial tables in PERFORMANCE.md
therefore UNDERSELL v5 training; this harness times the lag=1 loop the
trainer actually runs (dispatch step k, read back loss k-1) and prints
a train-MFU line against counted conv FLOPs (3x-forward convention,
``utils.profiling.conv_flops_v5``) — the same rigor bench_train.py
gives the darknet step.

Variants (each an independent jitted program, donated state like the
real trainer):
  act      — bf16 compute + bf16 activation residency (shipping step)
  act+s2d  — + exact space-to-depth stem rewrite (the stem backward is
             the profile's largest single HLO)
  accumK   — + in-graph gradient accumulation (--accum K)

Usage:
  python scripts/bench_v5_train.py --bs 16 32 64 [--size s --reso 640]
  python scripts/bench_v5_train.py --bs 16 --variants act act+s2d
"""
import argparse
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="s")
    ap.add_argument("--bs", type=int, nargs="+", default=[16])
    ap.add_argument("--reso", type=int, default=640)
    ap.add_argument("--variants", nargs="+", default=["act"],
                    help="any of: act act+s2d accum2 accum4 fp32res "
                         "chain2 chain4 chain8 ladders onepass (k steps "
                         "per "
                         "dispatch via train.step.make_chained_step; "
                         "parts compose with '+': chain4+s2d, "
                         "act+chain4+accum2+ladders — the compile-wall "
                         "ladder for bs>=256 / v5l)")
    ap.add_argument("--steps", type=int, default=8,
                    help="steps per timed lag-loop window")
    ap.add_argument("--rounds", type=int, default=3,
                    help="windows per variant (best reported)")
    args = ap.parse_args()

    import jax
    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    import optax
    from realtimeobjectdetection_tpu.models.yolov5 import (
        init_yolov5_params, yolov5_config)
    from realtimeobjectdetection_tpu.train.step import init_train_state
    from realtimeobjectdetection_tpu.train.v5 import make_train_step_v5
    from realtimeobjectdetection_tpu.utils.profiling import conv_flops_v5

    cfg = yolov5_config(args.size)
    opt = optax.adam(1e-3)
    gflop_img = 3 * conv_flops_v5(cfg, args.reso) / 1e9  # fwd+bwd ~ 3x fwd
    peak_tflops = 197.0

    from realtimeobjectdetection_tpu.train.step import make_chained_step

    def parse_variant(variant):
        chain = 1
        kw = dict(resolution=args.reso, compute_dtype=jnp.bfloat16,
                  activation_dtype=jnp.bfloat16)
        for part in variant.split("+"):
            if part == "fp32res":
                kw["activation_dtype"] = None
            elif part in ("s2d", "act+s2d", "act"):
                if part != "act":
                    kw["s2d_stem"] = True
            elif part == "flatloss":
                # legacy full-flatten loss path (round-4 A/B control;
                # grid_native is the shipping default)
                kw["grid_native_loss"] = False
            elif part.startswith("accum"):
                kw["accum_steps"] = int(part[5:])
            elif part.startswith("chain"):
                chain = int(part[5:])
            elif part == "ladders":
                kw["scan_ladders"] = True
            elif part == "onepass":
                # one-pass BN batch stats (E[x²]−E[x]², bn_mode
                # "batch1p") — the round-5 stat-reduce lever
                kw["onepass_stats"] = True
            else:
                raise SystemExit(f"unknown variant part {part}")
        return kw, chain

    def build(variant, bs):
        kw, chain = parse_variant(variant)
        step = make_train_step_v5(cfg, opt, **kw)
        if chain > 1:
            step = make_chained_step(step, chain)
        # donate the state like TrainerV5 does (in-place param/opt
        # update — the realistic memory profile)
        return jax.jit(step, donate_argnums=0), chain

    rng = np.random.RandomState(0)
    for bs in args.bs:
        m = 32
        images = jnp.asarray(rng.rand(bs, args.reso, args.reso, 3),
                             jnp.float32)
        boxes = np.zeros((bs, m, 85), np.float32)
        boxes[:, :8, 0:2] = rng.uniform(0.2 * args.reso, 0.8 * args.reso,
                                        (bs, 8, 2))
        boxes[:, :8, 2:4] = rng.uniform(0.05 * args.reso, 0.3 * args.reso,
                                        (bs, 8, 2))
        boxes[:, :8, 4] = 1.0
        boxes[:, :8, 5] = 1.0
        mask = np.zeros((bs, m), bool)
        mask[:, :8] = True
        x = jax.device_put(images)
        bx = jax.device_put(jnp.asarray(boxes))
        mk = jax.device_put(jnp.asarray(mask))

        for variant in args.variants:
            params = init_yolov5_params(cfg, seed=0, batch_norm=True)
            _, chain = parse_variant(variant)
            if chain > 1:
                xa = jnp.broadcast_to(x, (chain,) + x.shape)
                bxa = jnp.broadcast_to(bx, (chain,) + bx.shape)
                mka = jnp.broadcast_to(mk, (chain,) + mk.shape)
            else:
                xa, bxa, mka = x, bx, mk

            def last(loss):
                return float(np.asarray(loss).ravel()[-1])

            try:
                f, chain = build(variant, bs)
                state = jax.device_put(init_train_state(params, opt))
                t0 = time.time()
                state, loss = f(state, xa, bxa, mka)
                last(loss)
                compile_s = time.time() - t0
            except Exception as e:  # OOM / compiler wall — report, go on
                print(f"v5{args.size} {args.reso}² bs={bs} {variant}: "
                      f"FAILED ({type(e).__name__}: {str(e)[:140]})",
                      flush=True)
                continue
            # warm + one serial reference step (readback-synced)
            t0 = time.time()
            state, loss = f(state, xa, bxa, mka)
            last(loss)
            serial_ms = (time.time() - t0) * 1000 / chain

            best = None
            for _ in range(args.rounds):
                prev = None
                t0 = time.time()
                for _ in range(args.steps):
                    if prev is not None:
                        last(prev)  # lag=1: read loss k-1 after dispatch k
                    state, prev = f(state, xa, bxa, mka)
                last(prev)
                # param-leaf readback: the loss is computed mid-program,
                # the Adam tail finishes after it (axon block_until_ready
                # is not a true sync)
                np.asarray(jax.tree_util.tree_leaves(state.params)[0]
                           ).ravel()[0]
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            ms = best / (args.steps * chain) * 1000
            imgs = bs / (best / (args.steps * chain))
            mfu = imgs * gflop_img / 1000.0 / peak_tflops * 100
            print(f"v5{args.size} {args.reso}² bs={bs} {variant}: "
                  f"lag1 {ms:.1f} ms/step = {imgs:.0f} img/s "
                  f"({mfu:.1f}% train MFU @ {gflop_img:.1f} GFLOP/img), "
                  f"serial {serial_ms:.1f} ms, compile {compile_s:.1f}s",
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
