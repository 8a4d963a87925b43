"""Explicit-collective data-parallel training step (shard_map + psum).

The default path (parallel/mesh.shard_train_step) annotates shardings and
lets GSPMD insert the gradient all-reduce.  This module is the manual
alternative: the per-device step runs inside ``jax.shard_map`` and the
gradient/loss reductions are explicit ``jax.lax.psum`` over the ``data``
axis — the collective rides ICI exactly where written.  Useful when you
want deterministic control of what is reduced and when (e.g. to fuse
additional metrics into one reduction, or to later swap the psum for a
Pallas ring all-reduce), and as an executable specification of the DP
semantics the GSPMD path must match (tested equal on the CPU mesh).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..cfg_parser import GraphSpec
from ..model import make_forward
from ..ops.decode import decode_heads
from ..train.loss import yolo_loss
from ..train.step import TrainState, _update_running_stats
from ..train.targets import build_targets

__all__ = ["make_shard_map_train_step"]


def make_shard_map_train_step(spec: GraphSpec, optimizer, mesh: Mesh,
                              resolution: int = 416,
                              class_filter: Optional[int] = 0,
                              compute_dtype=jnp.float32,
                              update_bn_stats: bool = True):
    """Build a jitted DP step with explicit psum gradient reduction.

    The global batch is split over the mesh's ``data`` axis; each device
    computes per-shard targets, loss and grads; one ``psum`` reduces
    grads (and the scalar loss) across devices; the optimizer update runs
    replicated.  Note: batch-stats BN here normalizes per *shard* (like
    per-GPU BN in DDP), unlike the GSPMD path which computes global batch
    stats — both are valid DP semantics; this one is what multi-GPU torch
    would have produced.
    """
    # this step only parallelizes over 'data'; a space>1 mesh would make
    # every space-replica redundantly recompute the same shard — use the
    # GSPMD path (mesh.shard_train_step) for spatial sharding
    assert dict(mesh.shape).get("space", 1) == 1, \
        "make_shard_map_train_step needs a data-only mesh (space=1)"
    fwd = make_forward(spec, bn_mode="batch", compute_dtype=compute_dtype,
                       return_stats=True)

    def per_device(state: TrainState, images, boxes, box_mask):
        targets, obj_mask = build_targets(
            spec, boxes, box_mask, resolution, class_filter=class_filter)

        def loss_fn(params):
            heads, stats = fwd(params, images)
            pred = decode_heads(heads, spec, resolution, train=True)
            return yolo_loss(pred, targets, obj_mask), stats

        (loss, stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        # THE collective: sum-reduce grads + loss over the data axis (ICI)
        grads = jax.lax.psum(grads, axis_name="data")
        loss = jax.lax.psum(loss, axis_name="data")

        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        if update_bn_stats:
            # average the per-shard batch stats before the running update
            stats = jax.lax.pmean(stats, axis_name="data")
            b, h, w = images.shape[0], images.shape[1], images.shape[2]
            params = _update_running_stats(params, stats, b * h * w)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), loss

    sharded = shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)
