#!/usr/bin/env python
"""Interleaved A/B of scan-rolled ladders on THE SCORED bench program.

VERDICT r4 weak-2(b): the scored serving program rolls its residual
ladders (benchprog.BENCH_DEFAULTS scan_ladders=True) while the 1901-fps
r02 record predates that flip, and PERFORMANCE.md's train-side A/B
already measured the unrolled graph ~5-10% faster when it compiles
well.  With ``rodtpu warmup --bench`` pre-seeding the persistent cache,
compile robustness no longer justifies rolling the *scored* program —
this harness measures both variants of the EXACT program bench.py
times (benchprog.build_detect_program, same flags, same HLO) with
interleaved pipelined windows so tunnel drift hits both arms equally.

Ship whichever wins: flip benchprog.BENCH_DEFAULTS + bench.py argparse
defaults together (tests/test_benchprog.py fences the lockstep) and
re-seed the cache for BOTH variants so a flip never pays a cold
compile on the scored run.

Usage: python scripts/ab_bench_scan.py [--rounds 3 --iters 2 --depth 3]
"""
import argparse
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--iters", type=int, default=2,
                    help="windows per variant per round")
    ap.add_argument("--batch_iters", type=int, default=10,
                    help="batches per timed window")
    ap.add_argument("--depth", type=int, default=3)
    args = ap.parse_args()

    import jax
    if jax.default_backend() == "tpu":
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np
    from realtimeobjectdetection_tpu.benchprog import (BENCH_DEFAULTS,
                                                       build_detect_program)

    progs = {}
    for name, scan in (("scan", True), ("unrolled", False)):
        kw = dict(BENCH_DEFAULTS)
        kw["scan_ladders"] = scan
        t0 = time.time()
        progs[name] = build_detect_program(**kw)
        jd, p, x, _ = progs[name]
        np.asarray(jd(p, x)[0])
        print(f"{name}: compile+first {time.time() - t0:.1f}s", flush=True)

    bs = BENCH_DEFAULTS["batch"]
    best = {k: 1e9 for k in progs}
    d = max(1, args.depth)
    for r in range(args.rounds):
        for name, (jd, p, x, _) in progs.items():
            for _ in range(args.iters):
                t0 = time.time()
                inflight = [jd(p, x) for _ in range(d - 1)]
                for _ in range(args.batch_iters - d + 1):
                    inflight.append(jd(p, x))
                    np.asarray(inflight.pop(0)[0])
                while inflight:
                    np.asarray(inflight.pop(0)[0])
                dt = (time.time() - t0) / args.batch_iters
                best[name] = min(best[name], dt)
        print(f"round {r + 1}: " + "  ".join(
            f"{k}={bs / v:.0f} fps" for k, v in best.items()), flush=True)
    for name, t in best.items():
        print(f"{BENCH_DEFAULTS['model']} bs={bs} pipe{d} {name}: "
              f"{t * 1000:.2f} ms/batch = {bs / t:.0f} fps", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
