"""Device mesh + sharding layer — the framework's parallelism component.

The reference's entire parallelism inventory is single-process
``nn.DataParallel`` (replicate + scatter/gather over local GPUs,
/root/reference/detect.py:177-183, train.py:71-72).  The TPU-native
equivalent is a ``jax.sharding.Mesh`` with GSPMD partitioning:

* ``data`` axis — batch sharding (DP).  Gradients all-reduce over ICI
  automatically (XLA inserts the psum from the sharding annotations).
* ``space`` axis — optional spatial sharding of activation H (SP): XLA
  partitions the convs and inserts halo exchanges.  Useful when a batch
  is too small to fill the mesh or activations exceed HBM.

Multi-host extends the same mesh over DCN via ``jax.distributed``
(initialize once per host; ``jax.devices()`` then spans hosts) — the
sharding code below is topology-agnostic.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "replicated", "batch_sharding", "shard_train_step",
           "shard_detect_fn"]


def make_mesh(n_devices: Optional[int] = None, data: Optional[int] = None,
              space: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'space') mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if data is None:
        data = n // space
    assert data * space == n, (data, space, n)
    arr = mesh_utils.create_device_mesh((data, space), devices=devices)
    return Mesh(arr, axis_names=("data", "space"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, spatial_axis: Optional[int] = None,
                   ndim: int = 4) -> NamedSharding:
    """Shard axis 0 over 'data' (and optionally one axis over 'space')."""
    spec = [None] * ndim
    spec[0] = "data"
    if spatial_axis is not None and "space" in mesh.axis_names \
            and mesh.shape["space"] > 1:
        spec[spatial_axis] = "space"
    return NamedSharding(mesh, P(*spec))


def shard_train_step(step_fn, mesh: Mesh, spatial: bool = True,
                     donate: bool = False):
    """jit a train step with DP(+SP) shardings over the mesh.

    state is replicated; images are sharded [B->data, H->space];
    boxes/box_mask are batch-sharded.  XLA inserts the gradient
    all-reduce and conv halo exchanges.  ``donate=True`` donates the
    state argument (params/opt-state buffers update in place — halves
    the train-state HBM footprint and removes a full state copy per
    step); the caller must not reuse the old state object afterwards.
    """
    rep = replicated(mesh)
    img_sh = batch_sharding(mesh, spatial_axis=1 if spatial else None)
    box_sh = batch_sharding(mesh, ndim=3)
    mask_sh = batch_sharding(mesh, ndim=2)
    return jax.jit(step_fn,
                   in_shardings=(rep, img_sh, box_sh, mask_sh),
                   out_shardings=(rep, rep),
                   donate_argnums=(0,) if donate else ())


def shard_detect_fn(detect_fn, mesh: Mesh, spatial: bool = False,
                    with_stats: bool = True):
    """jit a detect fn (params, images) -> (boxes, valid[, counts]) with
    DP sharding.  ``with_stats`` matches nms_batch(..., with_stats=True)'s
    extra [B] candidate-count output (top_k saturation reporting)."""
    rep = replicated(mesh)
    img_sh = batch_sharding(mesh, spatial_axis=1 if spatial else None)
    out_b = batch_sharding(mesh, ndim=3)
    out_v = batch_sharding(mesh, ndim=2)
    out_c = batch_sharding(mesh, ndim=1)
    outs = (out_b, out_v, out_c) if with_stats else (out_b, out_v)
    return jax.jit(detect_fn, in_shardings=(rep, img_sh),
                   out_shardings=outs)
