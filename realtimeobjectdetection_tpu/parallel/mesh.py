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
* ``model`` axis — optional tensor parallelism (TP): conv kernels are
  sharded over their output-channel dim (HWIO dim 3) and the per-channel
  BN/bias vectors over theirs, so each device holds and computes a
  channel slice of every large conv; GSPMD propagates the channel
  sharding through the graph and inserts the all-gathers/
  reduce-scatters where a consumer needs full channels (routes, heads).
  Also halves per-device *weight + optimizer state* memory per 2× model
  (the ZeRO-style sharded-state effect falls out of the same
  annotations).  Sub-64-channel and head (255-ch) tensors stay
  replicated — see :func:`param_shardings`.

Multi-host extends the same mesh over DCN via ``jax.distributed``
(initialize once per host; ``jax.devices()`` then spans hosts) — the
sharding code below is topology-agnostic.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "replicated", "batch_sharding", "param_shardings",
           "shard_params", "shard_train_step", "shard_detect_fn"]


def make_mesh(n_devices: Optional[int] = None, data: Optional[int] = None,
              space: int = 1, model: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'space'[, 'model']) mesh over the available devices.

    The 'model' axis is only materialized when ``model > 1`` so existing
    2-axis callers (and their cached compilations) are untouched.

    'space' and 'model' are mutually exclusive (>1): an H-sharded conv
    input combined with an O-sharded kernel miscompiles in the XLA SPMD
    partitioner — measured on XLA:CPU 8-device emulation, a single
    3x3 SAME conv returns wrong values (max err 9.0 on O(8) outputs)
    for every sp×tp mesh while dp×tp, dp×sp, and each axis alone are
    exact (tests/test_parallel_tp.py::test_space_model_mesh_rejected
    records the guard).  TP meshes therefore combine with 'data' only.
    """
    if devices is None:
        devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if space > 1 and model > 1:
        raise ValueError(
            "mesh axes 'space' and 'model' cannot both be >1: the XLA "
            "SPMD partitioner miscompiles H-sharded conv inputs against "
            "O-sharded kernels (see parallel/mesh.make_mesh docstring); "
            "use data*model or data*space meshes")
    if data is None:
        data = n // (space * model)
    assert data * space * model == n, (data, space, model, n)
    if model > 1:
        arr = mesh_utils.create_device_mesh((data, space, model),
                                            devices=devices)
        return Mesh(arr, axis_names=("data", "space", "model"))
    arr = mesh_utils.create_device_mesh((data, space), devices=devices)
    return Mesh(arr, axis_names=("data", "space"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, spatial_axis: Optional[int] = None,
                   ndim: int = 4, batch_axis: int = 0) -> NamedSharding:
    """Shard ``batch_axis`` over 'data' (and optionally one axis over
    'space').  ``batch_axis=1`` serves chained-dispatch inputs, whose
    leading axis is the in-graph step index and stays replicated."""
    spec = [None] * ndim
    spec[batch_axis] = "data"
    if spatial_axis is not None and "space" in mesh.axis_names \
            and mesh.shape["space"] > 1:
        spec[spatial_axis] = "space"
    return NamedSharding(mesh, P(*spec))


def _tp_spec(shape, model_size: int, min_channels: int):
    """PartitionSpec sharding the last (channel) dim over 'model', or None.

    The rule is shape-only and uniform across the param/opt-state trees:
    conv kernels (HWIO — dim 3 is C_out) and their per-channel BN/bias
    vectors shard iff the channel count is divisible by the axis size
    and at least ``min_channels`` (sub-64 tensors and the 255-channel
    YOLO heads cost more in collectives than they save — replicated).
    Adam's mu/nu mirror the param shapes, so the same rule shards the
    optimizer state identically (per-device state memory drops ~1/model).
    """
    if not shape or shape[-1] < min_channels or shape[-1] % model_size:
        return None
    return P(*([None] * (len(shape) - 1) + ["model"]))


def param_shardings(mesh: Mesh, tree, min_channels: int = 64):
    """NamedSharding pytree for TP: channel-shard every eligible leaf.

    Works on a raw param dict, a TrainState (params + EMA + Adam
    mu/nu all mirror the same shapes), or any pytree of arrays.
    Leaves that don't match the rule — scalars (step counts), small
    vectors, head convs — come back replicated.
    """
    model_size = dict(zip(mesh.axis_names, mesh.devices.shape)).get(
        "model", 1)

    def leaf(x):
        spec = _tp_spec(getattr(x, "shape", ()), model_size,
                        min_channels) if model_size > 1 else None
        return NamedSharding(mesh, spec if spec is not None else P())

    return jax.tree_util.tree_map(leaf, tree)


def shard_params(params, mesh: Mesh, min_channels: int = 64):
    """device_put a param/state pytree with its TP shardings."""
    return jax.device_put(params, param_shardings(mesh, params,
                                                  min_channels))


def shard_train_step(step_fn, mesh: Mesh, spatial: bool = True,
                     donate: bool = False, state=None, chain: int = 1):
    """jit a train step with DP(+SP[+TP]) shardings over the mesh.

    Images are sharded [B->data, H->space]; boxes/box_mask are
    batch-sharded.  XLA inserts the gradient all-reduce and conv halo
    exchanges.  ``donate=True`` donates the state argument (params/
    opt-state buffers update in place — halves the train-state HBM
    footprint and removes a full state copy per step); the caller must
    not reuse the old state object afterwards.

    When the mesh has a 'model' axis (``make_mesh(model=N)``), pass the
    ``state`` example pytree: its eligible leaves (conv kernels, BN
    vectors, Adam moments — see :func:`param_shardings`) are sharded
    over 'model' in and out, giving tensor-parallel compute plus
    ZeRO-style sharded optimizer state.  Without a 'model' axis the
    state is replicated as before.

    ``chain=k`` (k>1): ``step_fn`` is a chained program
    (train/step.make_chained_step) whose inputs carry a leading [k]
    step axis — that axis stays replicated (every device walks the k
    in-graph steps in order) and the batch axis moves to 1.  Per-chain
    losses come back as a replicated [k] vector.  This composes
    dispatch amortization with DP and TP: one RPC runs k sharded
    optimizer steps, gradient all-reduces riding ICI inside the scan
    (equality vs k sequential sharded steps pinned in
    tests/test_train_targets.py + test_parallel_tp.py).  SPATIAL
    sharding is rejected with chain>1: on the 8-device CPU emulation
    the SPMD partitioner mis-reduces the BN batch means of
    odd-small-grid layers (13², 3²…) inside the scan body — they come
    back multiplied by exactly the 'data' axis size (sum of per-shard
    means instead of the global mean) while the same program unchained
    is exact.  DP/TP meshes are unaffected (measured, same harness).
    """
    rep = replicated(mesh)
    lead = 1 if chain > 1 else 0
    if (chain > 1 and spatial and "space" in mesh.axis_names
            and mesh.shape["space"] > 1):
        raise ValueError(
            "chained dispatch (chain>1) cannot combine with spatial "
            "sharding: the XLA SPMD partitioner mis-reduces BN batch "
            "statistics of unevenly H-sharded layers inside lax.scan "
            "(see shard_train_step docstring); use a data[*model] mesh "
            "or chain=1")
    img_sh = batch_sharding(mesh,
                            spatial_axis=(1 + lead) if spatial else None,
                            ndim=4 + lead, batch_axis=lead)
    box_sh = batch_sharding(mesh, ndim=3 + lead, batch_axis=lead)
    mask_sh = batch_sharding(mesh, ndim=2 + lead, batch_axis=lead)
    if "model" in mesh.axis_names and mesh.shape["model"] > 1:
        assert state is not None, \
            "TP mesh needs the state example to build its sharding tree"
        st_sh = param_shardings(mesh, state)
    else:
        st_sh = rep
    return jax.jit(step_fn,
                   in_shardings=(st_sh, img_sh, box_sh, mask_sh),
                   out_shardings=(st_sh, rep),
                   donate_argnums=(0,) if donate else ())


def shard_detect_fn(detect_fn, mesh: Mesh, spatial: bool = False,
                    with_stats: bool = True, params=None):
    """jit a detect fn (params, images) -> (boxes, valid[, counts]) with
    DP(+TP) sharding.  ``with_stats`` matches nms_batch(...,
    with_stats=True)'s extra [B] candidate-count output (top_k
    saturation reporting).  On a TP mesh pass ``params`` (the example
    pytree) so the conv kernels shard over 'model'."""
    rep = replicated(mesh)
    img_sh = batch_sharding(mesh, spatial_axis=1 if spatial else None)
    if "model" in mesh.axis_names and mesh.shape["model"] > 1:
        assert params is not None, \
            "TP mesh needs the params example to build its sharding tree"
        p_sh = param_shardings(mesh, params)
    else:
        p_sh = rep
    out_b = batch_sharding(mesh, ndim=3)
    out_v = batch_sharding(mesh, ndim=2)
    out_c = batch_sharding(mesh, ndim=1)
    outs = (out_b, out_v, out_c) if with_stats else (out_b, out_v)
    return jax.jit(detect_fn, in_shardings=(p_sh, img_sh),
                   out_shardings=outs)
