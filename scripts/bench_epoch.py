#!/usr/bin/env python
"""REAL loader->device training-epoch benchmark (VERDICT r3 next-4).

Every training record in PERFORMANCE.md up to round 3 fed the step from
device-resident synthetic batches; the REAL pipeline decodes JPEGs,
letterboxes on the host, and uploads through the tunnel — the
reference's epoch loop re-does all of that every epoch
(/root/reference/src/dataset.py:288-303 + train.py:333-348).  This
harness measures the actual trainer classes (DarknetTrainer /
TrainerV5) end-to-end on an on-disk VOC-format dataset and reports
per-epoch img/s, so the decoded-canvas cache (data/cache.py) and the
native C++ prep path show up as REAL epoch-time wins:

* epoch 1 = decode + letterbox + cache-fill (the cold epoch)
* epochs 2+ = memmap-served canvases (bit-identical; the steady state)

Usage:
  python scripts/bench_epoch.py --family v3 --n 256 --bs 16 --epochs 2 \
      --cache --host_prep cv2
  python scripts/bench_epoch.py --family v5 --n 256 --bs 16 --epochs 2

One TPU process at a time (CLAUDE.md).  The synthetic JPEG dataset
(480x640, quality 90 — a realistic camera frame) is reused across
invocations via a content-stable data dir, so A/Bs pay generation once.
"""
import argparse
import json
import os
import shutil
import sys
import tempfile
import time


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


def make_data(n: int, root: str):
    """VOC-format JPEGs at 480x640 (camera-shaped, like the streaming
    bench) — generated once, reused by path."""
    from realtimeobjectdetection_tpu.testing import make_synthetic_voc
    stamp = os.path.join(root, f"ok_{n}")
    xml_dir = os.path.join(root, "Annotations")
    img_dir = os.path.join(root, "JPEGImages")
    if os.path.exists(stamp):
        return xml_dir, img_dir
    if os.path.exists(root):
        shutil.rmtree(root)
    os.makedirs(root)
    t0 = time.time()
    xml_dir, img_dir = make_synthetic_voc(root, n_images=n,
                                          img_size=(480, 640))
    open(stamp, "w").close()
    print(f"[data] generated {n} JPEGs in {time.time() - t0:.1f}s",
          file=sys.stderr)
    return xml_dir, img_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="v3", choices=["v3", "v5"])
    ap.add_argument("--n", type=int, default=256, help="dataset size")
    ap.add_argument("--bs", type=int, default=16)
    ap.add_argument("--reso", type=int, default=None,
                    help="default: 416 (v3) / 640 (v5)")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--cache", action="store_true",
                    help="enable the letterboxed-canvas cache "
                         "(data/cache.py); epoch 1 fills, epochs 2+ "
                         "serve memmaps")
    ap.add_argument("--host_prep", default="cv2",
                    choices=["cv2", "native"])
    ap.add_argument("--chain", type=int, default=1)
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--data_dir", default="/tmp/bench_epoch_data")
    a = ap.parse_args()
    _enable_compile_cache()

    import jax.numpy as jnp

    xml_dir, img_dir = make_data(a.n, f"{a.data_dir}_{a.n}")
    out_dir = tempfile.mkdtemp(prefix="bench_epoch_out_")
    cache_dir = tempfile.mkdtemp(prefix="bench_epoch_cache_") \
        if a.cache else None
    dtype = jnp.bfloat16 if a.bf16 else jnp.float32

    t_setup = time.time()
    if a.family == "v3":
        from realtimeobjectdetection_tpu.train.trainer import DarknetTrainer
        tr = DarknetTrainer(
            "yolov3", epochs=a.epochs, batch_size=a.bs,
            resolution=a.reso or 416, out_dir=out_dir,
            compute_dtype=dtype, activation_dtype=dtype if a.bf16
            else None, chain_steps=a.chain, cache_dir=cache_dir,
            host_prep=a.host_prep)
    else:
        from realtimeobjectdetection_tpu.train.v5 import TrainerV5
        tr = TrainerV5(
            "s", epochs=a.epochs, batch_size=a.bs,
            resolution=a.reso or 640, out_dir=out_dir,
            compute_dtype=dtype, activation_dtype=dtype if a.bf16
            else None, chain_steps=a.chain, cache_dir=cache_dir,
            host_prep=a.host_prep)
    tr.train(xml_dir, img_dir, dataset_type="VOC")
    total_s = time.time() - t_setup

    rows = [json.loads(line)
            for line in open(os.path.join(out_dir, "history.jsonl"))]
    for r in rows:
        rec = {
            "metric": f"{a.family}_real_epoch",
            "epoch": r["epoch"], "wall_s": r["wall_s"],
            "value": round(a.n / r["wall_s"], 2), "unit": "img/s",
            "n_images": a.n, "bs": a.bs, "chain": a.chain,
            "cache": bool(a.cache), "host_prep": a.host_prep,
        }
        if r.get("loop_s"):
            # the data+step loop alone; wall_s additionally pays the
            # per-epoch checkpoint tiers (device->host pulls)
            rec["loop_s"] = r["loop_s"]
            rec["loop_img_s"] = round(a.n / r["loop_s"], 2)
        print(json.dumps(rec), flush=True)
    print(f"[total] {total_s:.1f}s incl. compile/checkpoints; "
          f"out={out_dir} cache={cache_dir}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
