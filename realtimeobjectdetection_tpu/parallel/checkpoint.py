"""Sharding-aware checkpoint save/restore: mesh-shape-agnostic resume.

The trainer's orbax tiers (train/trainer.py save/restore) gather the
state to host and re-replicate on restore — correct single-chip, wrong
at scale: a TP/ZeRO-sharded TrainState should restore DIRECTLY into the
target mesh's shardings, and the target mesh need not be the one that
saved.  ``restore_sharded`` makes checkpoints elastic: save on
``(data=4, model=2)``, restore on ``(data=2, model=4)``, a single chip,
or any other topology — orbax reads each device's shard straight from
the array file, so no host-size bottleneck at scale.

The reference has no counterpart (``torch.save`` of a replicated module,
/root/reference/train.py:340-341, 376-380); this is the scaling-book
resume story the rebuild must own once the state is sharded
(parallel/mesh.param_shardings ZeRO-shards Adam's mu/nu).
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from .mesh import param_shardings

__all__ = ["save_sharded", "restore_sharded"]


def save_sharded(path: str, state) -> None:
    """Save a (possibly sharded) pytree of jax.Arrays with orbax.

    Works on replicated and mesh-sharded state alike — orbax consumes
    the global view of each ``jax.Array``; no explicit host gather.
    """
    import orbax.checkpoint as ocp
    ocp.PyTreeCheckpointer().save(os.path.abspath(path),
                                  jax.tree_util.tree_map(lambda x: x, state),
                                  force=True)


def restore_sharded(path: str, template, mesh=None,
                    min_channels: int = 64):
    """Restore a checkpoint directly into target shardings.

    ``template``: a pytree with the checkpoint's structure whose leaves
    carry ``.shape``/``.dtype`` (real arrays or ``jax.ShapeDtypeStruct``).
    Target shardings are ``param_shardings(mesh, template)`` when
    ``mesh`` is given (the same shape-only TP rule the train step uses,
    so the restored state drops into ``shard_train_step`` unchanged); a
    ``NamedSharding`` pytree passed as ``mesh=None, template=<arrays
    already holding .sharding>`` reuses the leaves' own shardings.

    Returns the restored pytree with the template's structure (NamedTuple
    states come back as the same NamedTuple type).
    """
    import orbax.checkpoint as ocp
    if mesh is not None:
        shardings = param_shardings(mesh, template, min_channels)
    else:
        shardings = jax.tree_util.tree_map(lambda x: x.sharding, template)
    abstract = jax.tree_util.tree_map(
        lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s),
        template, shardings)
    restore_args = ocp.checkpoint_utils.construct_restore_args(abstract)
    restored = ocp.PyTreeCheckpointer().restore(
        os.path.abspath(path), item=abstract, restore_args=restore_args)
    # orbax may hand tuples back as lists; re-impose the template's
    # structure so NamedTuple states round-trip as themselves
    leaves = jax.tree_util.tree_leaves(restored)
    treedef = jax.tree_util.tree_structure(template)
    return jax.tree_util.tree_unflatten(treedef, leaves)
