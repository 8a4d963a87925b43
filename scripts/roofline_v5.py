#!/usr/bin/env python
"""Analytic summed per-conv roofline for the native YOLOv5 graphs.

Codifies the hand arithmetic of PERFORMANCE.md's "v5l floor proof"
(VERDICT r3 next-2 asked for the same closure on v5s): per conv,
``floor = max(compute, memory)`` with

* compute = 2·s_out²·k²·cin·cout·B / 197e12  (v5e bf16 peak)
* memory  = 2B·(s_in²·cin + s_out²·cout) + 2·k²·cin·cout, over 819 GB/s
            (bf16 activations read+written once — XLA fuses the
            BN-folded bias+SiLU into the conv — plus one weight read
            per batch)

The conv list is models/yolov5.v5_conv_inventory, FLOP-pinned to
v5_step_flops (tested).  The summed floor is conv-only, like the v5l
proof: concat/add/pool bytes are real but small beside the conv
traffic, and the non-conv tail (decode/top-k/NMS) is measured
separately by profile_hlo.

``--train`` switches to the train-step cost model (the VERDICT r3
next-3 closure): per conv the backward adds a dgrad and a wgrad pass,
so compute is 3x forward, and the minimal HBM traffic is

* activations: X read (fwd), Y written (fwd), dY read (dgrad+wgrad,
  counted once — a floor, not a schedule), dX written, X re-read
  (wgrad) — 2 bytes each (bf16 residency, the shipping step)
* weights: fp32 master weights read twice (fwd + dgrad; the bf16 cast
  is fused) + one fp32 weight-grad write

BN batch-stat reduction passes, remat recompute, Adam, and the loss
are NOT in this floor — the profiled "convolution fusion" category
includes the fused BN-stat reduces, so the measured/floor ratio
absorbs them (called out in PERFORMANCE.md's v5 train drill-down).

Usage:
  python scripts/roofline_v5.py --size s --bs 512
  python scripts/roofline_v5.py --size s --bs 512 --measured_conv_ms 97.6
  python scripts/roofline_v5.py --size s --bs 128 --train \
      --measured_conv_ms 95.3
"""
import argparse

PEAK_FLOPS = 197e12   # v5e bf16
HBM_BW = 819e9        # v5e HBM bytes/s


def roofline(size: str, bs: int, reso: int = 640, top: int = 12,
             train: bool = False):
    from realtimeobjectdetection_tpu.models.yolov5 import (
        v5_conv_inventory, yolov5_config)
    cfg = yolov5_config(size)
    rows = []
    for r in v5_conv_inventory(cfg, reso):
        flops = 2 * r["s_out"] ** 2 * r["k"] ** 2 * r["cin"] * r["cout"]
        w_elems = r["k"] ** 2 * r["cin"] * r["cout"]
        if train:
            comp_ms = 3 * flops * bs / PEAK_FLOPS * 1e3
            act_elems = bs * (3 * r["s_in"] ** 2 * r["cin"]
                              + 2 * r["s_out"] ** 2 * r["cout"])
            bytes_ = 2 * act_elems + 2 * 4 * w_elems + 4 * w_elems
        else:
            comp_ms = flops * bs / PEAK_FLOPS * 1e3
            bytes_ = (2 * bs * (r["s_in"] ** 2 * r["cin"]
                                + r["s_out"] ** 2 * r["cout"])
                      + 2 * w_elems)
        mem_ms = bytes_ / HBM_BW * 1e3
        rows.append({**r, "comp_ms": comp_ms, "mem_ms": mem_ms,
                     "floor_ms": max(comp_ms, mem_ms),
                     "bound": "mem" if mem_ms > comp_ms else "mxu"})
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="s")
    ap.add_argument("--bs", type=int, default=512)
    ap.add_argument("--reso", type=int, default=640)
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--measured_conv_ms", type=float, default=None,
                    help="profiled conv total (profile_hlo conv "
                         "category) to close the loop against")
    ap.add_argument("--train", action="store_true",
                    help="train-step cost model (3x compute, "
                         "fwd+dgrad+wgrad traffic) — see docstring")
    a = ap.parse_args()
    rows = roofline(a.size, a.bs, a.reso, train=a.train)
    tot_c = sum(r["comp_ms"] for r in rows)
    tot_m = sum(r["mem_ms"] for r in rows)
    tot_f = sum(r["floor_ms"] for r in rows)
    mem_bound = sum(r["floor_ms"] for r in rows if r["bound"] == "mem")
    print(f"yolov5{a.size} {a.reso}² bs={a.bs}: {len(rows)} convs")
    print(f"{'conv':18s} {'shape':>22s} {'comp_ms':>8s} {'mem_ms':>8s} "
          f"{'floor':>8s} bound")
    for r in sorted(rows, key=lambda r: -r["floor_ms"])[:a.top]:
        shape = (f"{r['s_in']}->{r['s_out']} k{r['k']} "
                 f"{r['cin']}x{r['cout']}")
        print(f"{r['name']:18s} {shape:>22s} {r['comp_ms']:8.2f} "
              f"{r['mem_ms']:8.2f} {r['floor_ms']:8.2f} {r['bound']}")
    print(f"{'SUM':18s} {'':>22s} {tot_c:8.1f} {tot_m:8.1f} {tot_f:8.1f} "
          f"({mem_bound:.1f} ms of the floor is memory-bound)")
    if a.measured_conv_ms:
        print(f"measured conv total {a.measured_conv_ms:.1f} ms = "
              f"{a.measured_conv_ms / tot_f:.2f}x the summed roofline")
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
