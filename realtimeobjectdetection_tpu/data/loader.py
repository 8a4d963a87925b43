"""Batching + prefetch for training: padded fixed-shape device batches.

The reference uses torch DataLoader worker processes with a ragged
collate (variable-length box tuples, src/dataset.py:142-156, 320-346).
Fixed XLA shapes need padded targets instead: every batch is
``(images [B,D,D,3], boxes [B,M,5+C], mask [B,M])`` with a static box
budget M.  A background thread overlaps host decode/letterbox with
device compute, and ``num_workers`` threads decode the samples of each
batch concurrently (PIL/cv2 release the GIL around decode/resize) —
the same role as the reference DataLoader's ``num_workers=4``
(src/dataset.py:142-176, 320-376) without worker processes.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Tuple

import numpy as np

__all__ = ["padded_batches"]


def padded_batches(dataset, batch_size: int, max_boxes: int = 64,
                   shuffle: bool = True, seed: int = 42,
                   num_attrs: int = 85, drop_last: bool = False,
                   prefetch: int = 4,
                   epoch: int = 0,
                   host_id: int = 0,
                   num_hosts: int = 1,
                   num_workers: int = 0) -> Iterator[Tuple[np.ndarray,
                                                         np.ndarray,
                                                         np.ndarray]]:
    """Yield fixed-shape (images, boxes, mask) batches.

    Boxes beyond ``max_boxes`` per image are dropped (logged-by-contract:
    COCO p99 is ~40 boxes, default 64 loses <0.1% of gt).  The trailing
    partial batch is padded by REPEATING the last real sample with an
    all-false box mask (zero frames would pollute batch-statistics BN for
    the real images — the train step runs BN in batch mode); pass
    ``drop_last=True`` for strict epoch statistics.

    ``host_id``/``num_hosts``: multi-host data sharding for
    ``jax.distributed`` training (parallel/distributed.py) — every host
    shuffles the SAME (seed, epoch) order, takes the round-robin slice
    ``order[host_id::num_hosts]``, and all slices are trimmed to the
    common floor(n/num_hosts) length so every host sees the same batch
    count (unequal counts would deadlock lockstep collectives).  Shards
    are disjoint and their union covers all but at most
    ``num_hosts - 1`` samples per epoch
    (tests/test_trainer_and_validator.py::test_loader_host_sharding).
    """
    # num_workers=0: auto — one decode thread per core up to 4 (the
    # reference's DataLoader default), 1 on single-core hosts where
    # extra threads only add contention
    if num_workers <= 0:
        import os
        num_workers = max(1, min(4, os.cpu_count() or 1))
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        np.random.RandomState(seed + epoch).shuffle(order)
    if num_hosts > 1:
        assert 0 <= host_id < num_hosts, (host_id, num_hosts)
        order = order[host_id::num_hosts][:n // num_hosts]
        n = len(order)

    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    stop = threading.Event()

    def produce():
        try:
            for start in range(0, n, batch_size):
                if stop.is_set():
                    return
                idxs = order[start:start + batch_size]
                if drop_last and len(idxs) < batch_size:
                    break
                first = dataset[int(idxs[0])]
                d = first[0].shape[0]
                # dtype follows the dataset (uint8 canvases upload 4x
                # less than /255 floats; the train step normalizes
                # on device — bit-identical either way)
                images = np.zeros((batch_size, d, d, 3), first[0].dtype)
                boxes = np.zeros((batch_size, max_boxes, num_attrs),
                                 np.float32)
                mask = np.zeros((batch_size, max_boxes), bool)
                for j, di in enumerate(idxs):
                    sample, rows = dataset[int(di)] if j else first
                    images[j] = sample
                    if rows is not None and len(rows):
                        m = min(len(rows), max_boxes)
                        boxes[j, :m] = rows[:m]
                        mask[j, :m] = True
                for j in range(len(idxs), batch_size):
                    images[j] = images[len(idxs) - 1]  # repeat, see docstring
                q.put((images, boxes, mask))
            q.put(None)
        except BaseException as e:  # surface loader errors to the consumer
            q.put(e)

    t = threading.Thread(target=produce, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
