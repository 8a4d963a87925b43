"""Multi-host (DCN) initialization for the mesh layer.

The reference has no multi-node story (its only parallelism is
single-process nn.DataParallel, detect.py:177-183).  TPU pods extend the
same ('data','space') mesh across hosts: call :func:`init_multihost` once
per process before any jax usage, and ``jax.devices()`` then spans every
host — parallel/mesh.py code is topology-agnostic, so trainers and
detectors shard identically over ICI within a host and DCN across hosts.
"""

from __future__ import annotations

from typing import Optional

__all__ = ["init_multihost", "is_multihost", "local_batch_slice"]


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> None:
    """Wraps ``jax.distributed.initialize``.

    With no arguments, relies on the cluster environment (TPU pod
    metadata / SLURM / OMPI auto-detection built into jax).
    """
    import jax
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def is_multihost() -> bool:
    import jax
    return jax.process_count() > 1


def local_batch_slice(global_batch: int):
    """This process's slice of a globally-sharded batch (host data
    loading: each host feeds only its shard)."""
    import jax
    per = global_batch // jax.process_count()
    start = per * jax.process_index()
    return slice(start, start + per)
