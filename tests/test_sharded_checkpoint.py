"""Sharding-aware checkpointing (parallel/checkpoint.py) on emulated
devices: save under one mesh topology, restore under another, values
identical — checkpoints must be mesh-shape-agnostic (elastic resume).
"""

import jax
import numpy as np
import optax
import pytest

from realtimeobjectdetection_tpu.models import get_spec
from realtimeobjectdetection_tpu.parallel.checkpoint import (restore_sharded,
                                                             save_sharded)
from realtimeobjectdetection_tpu.parallel.mesh import make_mesh, shard_params
from realtimeobjectdetection_tpu.train.step import (TrainState,
                                                    init_train_state)
from realtimeobjectdetection_tpu.weights import init_params


@pytest.fixture(scope="module")
def tiny_state():
    spec = get_spec("yolov3-tiny", width=64, height=64)
    params = init_params(spec, 0)
    return init_train_state(params, optax.adam(1e-3))


def _assert_tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_save_tp2_restore_tp4(tmp_path, cpu_devices, tiny_state):
    """ZeRO/TP state saved on (data=4, model=2) restores bit-identically
    into (data=2, model=4) shardings — a different mesh topology."""
    mesh_a = make_mesh(8, data=4, space=1, model=2)
    state_a = shard_params(tiny_state, mesh_a)
    path = str(tmp_path / "ckpt_tp2")
    save_sharded(path, state_a)

    mesh_b = make_mesh(8, data=2, space=1, model=4)
    restored = restore_sharded(path, tiny_state, mesh_b)
    assert isinstance(restored, TrainState)
    _assert_tree_equal(restored, tiny_state)
    # the restored leaves actually CARRY mesh_b's shardings (a
    # channel-shardable kernel is split over 'model'=4, not gathered)
    from realtimeobjectdetection_tpu.parallel.mesh import param_shardings
    want = param_shardings(mesh_b, tiny_state)
    got_sh = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda x: x.sharding, restored))
    want_sh = jax.tree_util.tree_leaves(want)
    assert got_sh == want_sh


def test_save_sharded_restore_single_device(tmp_path, cpu_devices,
                                            tiny_state):
    """A TP-sharded checkpoint restores on a 1-device 'mesh' (elastic
    scale-down: resume a pod checkpoint on one chip)."""
    mesh_a = make_mesh(8, data=4, space=1, model=2)
    path = str(tmp_path / "ckpt_down")
    save_sharded(path, shard_params(tiny_state, mesh_a))
    mesh_1 = make_mesh(1, data=1, space=1)
    restored = restore_sharded(path, tiny_state, mesh_1)
    _assert_tree_equal(restored, tiny_state)


def test_trainer_tp_restore_resharded(tmp_path, cpu_devices):
    """DarknetTrainer(tensor_parallel=2).restore() lands the state back
    in TP shardings and the next sharded step runs on it."""
    from realtimeobjectdetection_tpu.testing import make_synthetic_coco
    from realtimeobjectdetection_tpu.train.trainer import DarknetTrainer
    ann, imgs = make_synthetic_coco(tmp_path, n_images=8)
    tr = DarknetTrainer("yolov3-tiny", epochs=1, batch_size=8,
                        resolution=64, lr=1e-3, max_boxes=8,
                        out_dir=str(tmp_path / "out"), tensor_parallel=2,
                        prewarm=False)
    assert tr._tp, "8 cpu devices must give a (data=4, model=2) mesh"
    tr.save("weight_epoch0")
    before = jax.device_get(tr.state)
    tr.restore(str(tmp_path / "out" / "weight_epoch0"))
    _assert_tree_equal(tr.state, before)
    from realtimeobjectdetection_tpu.parallel.mesh import param_shardings
    want = jax.tree_util.tree_leaves(param_shardings(tr.mesh, before))
    got = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda x: x.sharding, tr.state))
    assert got == want
    # one epoch on the restored sharded state must execute
    hist = tr.train(ann, imgs, dataset_type="COCO", verbose=False)
    assert np.isfinite(hist["train_loss"]).all()
    assert int(tr.state.step) > 0


def test_trainer_v5_tp_restore_resharded(tmp_path, cpu_devices):
    """TrainerV5(tensor_parallel=2).restore() lands the state back in
    TP shardings (same contract as the darknet trainer)."""
    from realtimeobjectdetection_tpu.train.v5 import TrainerV5
    tr = TrainerV5("s", epochs=1, batch_size=8, resolution=64,
                   out_dir=str(tmp_path / "out"), tensor_parallel=2,
                   num_classes=80)
    assert tr._tp
    tr.save("weight_epoch0")
    before = jax.device_get(tr.state)
    tr.restore(str(tmp_path / "out" / "weight_epoch0"))
    _assert_tree_equal(tr.state, before)
    from realtimeobjectdetection_tpu.parallel.mesh import param_shardings
    want = jax.tree_util.tree_leaves(param_shardings(tr.mesh, before))
    got = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda x: x.sharding, tr.state))
    assert got == want
