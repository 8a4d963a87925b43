"""Multi-host (jax.distributed) validation: REAL multi-process SPMD.

parallel/distributed.py is the pod seam (SURVEY §2.8: the reference has
no multi-node story at all).  These tests run it for real: two OS
processes, each with two virtual CPU devices, joined through
``jax.distributed.initialize`` (Gloo-backed cross-process collectives)
into one 4-device ('data','space') mesh — the darknet train step then
runs with gradient all-reduce AND conv halo exchanges crossing the
process boundary, which is exactly what a TPU pod does over DCN.

When run directly (``python test_distributed.py <pid> <port>``) this
file is the worker; pytest spawns two of them and checks both report
the same loss as a single-process run of the same step/inputs.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

RESO = 64


def _inputs():
    rng = np.random.RandomState(0)
    images = rng.rand(4, RESO, RESO, 3).astype(np.float32)
    boxes = np.zeros((4, 3, 85), np.float32)
    boxes[:, 0, 0:4] = [32, 32, 20, 20]
    boxes[:, 0, 4] = 1.0
    boxes[:, 0, 5] = 1.0
    mask = np.zeros((4, 3), bool)
    mask[:, 0] = True
    return images, boxes, mask


def _worker(pid: int, port: str) -> None:
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from realtimeobjectdetection_tpu.parallel.distributed import (
        init_multihost, is_multihost, local_batch_slice)
    init_multihost(coordinator_address=f"localhost:{port}",
                   num_processes=2, process_id=pid)
    assert is_multihost() and jax.process_count() == 2
    assert local_batch_slice(8) == slice(pid * 4, pid * 4 + 4)

    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from realtimeobjectdetection_tpu.models import get_spec
    from realtimeobjectdetection_tpu.parallel.mesh import (make_mesh,
                                                           shard_train_step)
    from realtimeobjectdetection_tpu.train.step import (init_train_state,
                                                        make_train_step)
    from realtimeobjectdetection_tpu.weights import init_params

    assert len(jax.devices()) == 4  # 2 processes x 2 local devices
    spec = get_spec("yolov3-tiny", width=RESO, height=RESO)
    step = make_train_step(spec, optax.adam(1e-3), resolution=RESO)
    mesh = make_mesh(4, data=2, space=2)
    sharded = shard_train_step(step, mesh, spatial=True)
    state = init_train_state(init_params(spec, 0), optax.adam(1e-3))
    images, boxes, mask = _inputs()

    state = jax.device_put(state, NamedSharding(mesh, P()))
    x = jax.device_put(images, NamedSharding(mesh, P("data", "space")))
    bx = jax.device_put(boxes, NamedSharding(mesh, P("data")))
    mk = jax.device_put(mask, NamedSharding(mesh, P("data")))
    with mesh:
        for _ in range(2):
            state, loss = sharded(state, x, bx, mk)
    print(f"RESULT {pid} {float(loss):.6f}", flush=True)


def test_two_process_multihost_train_step(cpu_devices):
    """Spawn 2 jax.distributed processes; both must report the loss of
    the equivalent single-process run (the mesh layer is topology-
    agnostic: DCN-crossing collectives change nothing numerically)."""
    import jax
    import jax.numpy as jnp
    import optax
    from realtimeobjectdetection_tpu.models import get_spec
    from realtimeobjectdetection_tpu.train.step import (init_train_state,
                                                        make_train_step)
    from realtimeobjectdetection_tpu.weights import init_params

    # single-process baseline (unsharded, same seed/inputs)
    spec = get_spec("yolov3-tiny", width=RESO, height=RESO)
    step = jax.jit(make_train_step(spec, optax.adam(1e-3),
                                   resolution=RESO))
    state = init_train_state(init_params(spec, 0), optax.adam(1e-3))
    images, boxes, mask = _inputs()
    for _ in range(2):
        state, ref_loss = step(state, jnp.asarray(images),
                               jnp.asarray(boxes), jnp.asarray(mask))
    ref_loss = float(ref_loss)

    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), str(i), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        for i in range(2)]
    losses = {}
    for p in procs:
        out, _ = p.communicate(timeout=500)
        text = out.decode()
        assert p.returncode == 0, text[-2000:]
        for line in text.splitlines():
            if line.startswith("RESULT"):
                _, pid, val = line.split()
                losses[int(pid)] = float(val)
    assert set(losses) == {0, 1}, losses
    # the two processes must agree bitwise (same SPMD program)
    assert losses[0] == losses[1], losses
    # vs the unsharded run only reassociation drift is allowed: sharded
    # batch-stats BN reduces per-shard then psums, so fp32 sums
    # reassociate (~0.3% after two training steps through 13 BN layers)
    assert losses[0] == pytest.approx(ref_loss, rel=1e-2), (losses,
                                                            ref_loss)


if __name__ == "__main__":
    _worker(int(sys.argv[1]), sys.argv[2])
