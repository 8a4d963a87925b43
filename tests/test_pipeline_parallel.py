"""Pipeline-parallel serving (parallel/pipeline.py) on emulated devices.

Bit-for-bit bar: a stage-split forward is the SAME interpreter walking
the same nodes (model.make_forward(stage_range=...)), so its heads must
match the single-device forward exactly — any deviation means the
boundary liveness set is wrong.
"""

import jax
import jax.numpy as jnp
import numpy as np

from realtimeobjectdetection_tpu.model import make_forward
from realtimeobjectdetection_tpu.models import get_spec
from realtimeobjectdetection_tpu.parallel.pipeline import (PipelinedForward,
                                                           balance_cuts)
from realtimeobjectdetection_tpu.weights import init_params


def _heads_ref(spec, params, x, **kw):
    return jax.jit(make_forward(spec, **kw))(params, x)


def test_balance_cuts_shape_and_balance(cpu_devices):
    spec = get_spec("yolov3", width=416, height=416)
    cuts = balance_cuts(spec, 4, scan_ladders=True)
    assert len(cuts) == 3
    assert cuts == sorted(cuts)
    assert all(0 < c < len(spec.nodes) for c in cuts)
    # snapped cuts never fall inside a rolled ladder
    from realtimeobjectdetection_tpu.model import _find_ladders
    for s, r in _find_ladders(spec).items():
        for c in cuts:
            assert not (s < c < s + 3 * r), (c, s, r)


def test_balance_cuts_collision_keeps_stage_count(cpu_devices):
    """Two FLOP thresholds snapping to the same ladder end must not
    drop a cut (code-review r3 finding: n_stages=6 returned 4 cuts and
    crashed every PP constructor)."""
    spec = get_spec("yolov3", width=416, height=416)
    for n in range(2, 10):
        cuts = balance_cuts(spec, n, scan_ladders=True)
        assert len(cuts) == n - 1, (n, cuts)
        assert cuts == sorted(set(cuts)), (n, cuts)
    # the previously-crashing constructor path now builds and runs
    reso = 96
    spec6 = get_spec("yolov3", width=reso, height=reso)
    params = init_params(spec6, 0)
    from realtimeobjectdetection_tpu.model import fold_batchnorm
    ref = _heads_ref(spec6, fold_batchnorm(spec6, params),
                     jnp.zeros((1, reso, reso, 3), np.float32),
                     scan_ladders=True)
    pf = PipelinedForward(spec6, params, n_stages=6, resolution=reso,
                          scan_ladders=True)
    got = pf(jnp.zeros((1, reso, reso, 3), np.float32))
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gather_params_merges_split_v5_heads(cpu_devices):
    """gather_params must deep-merge the m24 detect-head dict when cuts
    place the heads in different stages (code-review r3 finding:
    shallow update dropped m24['0'])."""
    import optax
    from realtimeobjectdetection_tpu.models.yolov5 import (
        init_yolov5_params, yolov5_config)
    from realtimeobjectdetection_tpu.parallel.pipeline import (
        PipelinedTrainStepV5)
    cfg = yolov5_config("n")
    params = init_yolov5_params(cfg, 0, batch_norm=True)
    # cut at 17: stage 0 = steps [0,17) incl. m24.0 (index 16),
    # stage 1 = [17,23) with m24.1 / m24.2
    pp = PipelinedTrainStepV5(cfg, params, optax.adam(1e-3), n_stages=2,
                              cuts=[17], resolution=64, n_micro=1)
    assert pp._n_heads == [1, 2]
    got = pp.gather_params()
    assert set(got["m24"]) == {"0", "1", "2"}, set(got["m24"])


def test_pipelined_tiny_matches_single_device(cpu_devices):
    reso = 160
    spec = get_spec("yolov3-tiny", width=reso, height=reso)
    params = init_params(spec, 0)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, reso, reso, 3), np.float32)
    ref = _heads_ref(spec, __import__(
        "realtimeobjectdetection_tpu.model", fromlist=["fold_batchnorm"]
    ).fold_batchnorm(spec, params), x)
    pf = PipelinedForward(spec, params, n_stages=4, resolution=reso)
    got = pf(x)
    assert len(got) == len(ref)
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pipelined_full_yolov3_with_ladders(cpu_devices):
    reso = 96
    spec = get_spec("yolov3", width=reso, height=reso)
    params = init_params(spec, 0)
    from realtimeobjectdetection_tpu.model import fold_batchnorm
    fparams = fold_batchnorm(spec, params)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(1, reso, reso, 3), np.float32)
    ref = _heads_ref(spec, fparams, x, scan_ladders=True)
    pf = PipelinedForward(spec, params, n_stages=2, resolution=reso,
                          scan_ladders=True)
    got = pf(x)
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the stage weights really live on distinct devices
    d0 = jax.tree_util.tree_leaves(pf._params[0])[0].devices()
    d1 = jax.tree_util.tree_leaves(pf._params[1])[0].devices()
    assert d0 != d1


def test_pp_dp_composition_matches_single_device(cpu_devices):
    """PP(2) x DP(4) on 8 devices: each stage batch-sharded over its own
    4-device group; heads match the single-device forward (allclose, not
    bit-equal: per-shard convs run at B=1 instead of B=4, which legally
    reassociates fp32 accumulation) and the stage weights replicate
    within each group."""
    reso = 160
    spec = get_spec("yolov3-tiny", width=reso, height=reso)
    params = init_params(spec, 5)
    from realtimeobjectdetection_tpu.model import fold_batchnorm
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.rand(4, reso, reso, 3), np.float32)
    ref = _heads_ref(spec, fold_batchnorm(spec, params), x)
    pf = PipelinedForward(spec, params, n_stages=2, data_parallel=4,
                          resolution=reso)
    assert pf.data_parallel == 4 and len(pf.ranges) == 2
    got = pf(x)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
    # stage 0's params span its 4-device group; stage 1 a disjoint group
    d0 = {d.id for d in
          jax.tree_util.tree_leaves(pf._params[0])[0].sharding.device_set}
    d1 = {d.id for d in
          jax.tree_util.tree_leaves(pf._params[1])[0].sharding.device_set}
    assert len(d0) == 4 and len(d1) == 4 and not (d0 & d1)
    # make_detect end-to-end on the composed layout
    from realtimeobjectdetection_tpu.ops.decode import decode_heads
    from realtimeobjectdetection_tpu.ops.nms import nms_batch

    def post(heads):
        pred = decode_heads(heads, spec, reso)
        return nms_batch(pred, 80, 0.7, 0.5, top_k=32)

    det = pf.make_detect(post)
    u8 = (np.asarray(x) * 255).astype(np.uint8)
    boxes, valid = det(None, jnp.asarray(u8))
    assert np.asarray(boxes).shape[0] == 4


def test_v5_step_flops_sum_matches_total(cpu_devices):
    """Per-step FLOPs (the PP balance input) must sum to the canonical
    conv_flops_v5 total for every size — one graph, two walks."""
    from realtimeobjectdetection_tpu.models.yolov5 import (v5_step_flops,
                                                           yolov5_config)
    from realtimeobjectdetection_tpu.utils.profiling import conv_flops_v5
    for size in ("s", "m", "l", "x"):
        cfg = yolov5_config(size)
        assert sum(v5_step_flops(cfg, 640)) == conv_flops_v5(cfg, 640), size


def test_pipelined_v5_matches_single_device(cpu_devices):
    """PipelinedForwardV5 (4 stages) == single-device v5 forward,
    bit-exact, heads in [p3, p4, p5] order."""
    from realtimeobjectdetection_tpu.models.yolov5 import (
        init_yolov5_params, make_yolov5_forward, yolov5_config)
    from realtimeobjectdetection_tpu.parallel.pipeline import (
        PipelinedForwardV5, balance_cuts_v5)
    reso = 128
    cfg = yolov5_config("s")
    params = init_yolov5_params(cfg, 0)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(1, reso, reso, 3), np.float32)
    ref = jax.jit(make_yolov5_forward(cfg, compute_dtype=jnp.float32))(
        params, x)
    cuts = balance_cuts_v5(cfg, 4, resolution=reso)
    assert len(cuts) == 3 and cuts == sorted(cuts)
    pf = PipelinedForwardV5(cfg, params, n_stages=4,
                            compute_dtype=jnp.float32, resolution=reso)
    got = pf(x)
    assert len(got) == 3
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # stage weights on distinct devices
    d0 = jax.tree_util.tree_leaves(pf._params[0])[0].devices()
    d3 = jax.tree_util.tree_leaves(pf._params[3])[0].devices()
    assert d0 != d3


def test_pipelined_v5_every_cut_position(cpu_devices):
    """2-stage split at EVERY legal cut index must be bit-exact — pins
    the boundary liveness set for all 23 steps."""
    from realtimeobjectdetection_tpu.models.yolov5 import (
        _v5_steps, init_yolov5_params, make_yolov5_forward, yolov5_config)
    from realtimeobjectdetection_tpu.parallel.pipeline import (
        PipelinedForwardV5)
    reso = 64
    cfg = yolov5_config("s")
    params = init_yolov5_params(cfg, 1)
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.rand(1, reso, reso, 3), np.float32)
    ref = jax.jit(make_yolov5_forward(cfg, compute_dtype=jnp.float32))(
        params, x)
    n = len(_v5_steps())
    for cut in range(1, n):
        pf = PipelinedForwardV5(cfg, params, n_stages=2, cuts=[cut],
                                compute_dtype=jnp.float32, resolution=reso)
        got = pf(x)
        assert len(got) == 3, cut
        for a, b in zip(got, ref):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=f"cut={cut}")


def test_detector_pipeline_stages_matches_single_device(tmp_path,
                                                        cpu_devices):
    """DetectorV3(pipeline_stages=4) end-to-end == the single-device
    detector: identical metrics.json content (boxes, sentinels)."""
    import os
    from realtimeobjectdetection_tpu.models import get_spec as _gs
    from realtimeobjectdetection_tpu.pipeline.detector import DetectorV3
    from realtimeobjectdetection_tpu.testing import synthetic_darknet_weights
    imgs = "/root/reference/imgs"
    if not os.path.isdir(imgs):
        import pytest
        pytest.skip("reference images not mounted")
    w = tmp_path / "tiny.weights"
    w.write_bytes(synthetic_darknet_weights(_gs("yolov3-tiny"), 0))
    kw = dict(images=os.path.join(imgs, "dog.jpg"),
              cfg_path="yolov3-tiny", weights_path=str(w),
              confidence=0.75, top_k=128, precision="highest",
              bn_mode="fold")
    m1 = DetectorV3(destination=str(tmp_path / "one"), **kw)(verbose=False)
    mp = DetectorV3(destination=str(tmp_path / "pp"), pipeline_stages=4,
                    **kw)(verbose=False)
    assert set(m1) == set(mp)
    for k in m1:
        a, b = m1[k], mp[k]
        if isinstance(a, int) or isinstance(b, int):
            assert a == b, k
        else:
            np.testing.assert_allclose(np.array(a), np.array(b), atol=1e-3)


def test_detector_v5_pipeline_stages_matches_single_device(tmp_path,
                                                           cpu_devices):
    """DetectorV5(pipeline_stages=4) end-to-end == single-device v5
    detector (random-init weights, fp32 compute for bit-equality)."""
    import os
    import pytest
    from realtimeobjectdetection_tpu.pipeline.yolov5 import DetectorV5
    imgs = "/root/reference/imgs"
    if not os.path.isdir(imgs):
        pytest.skip("reference images not mounted")
    src = str(tmp_path / "imgs")
    os.makedirs(src)
    import shutil
    shutil.copy(os.path.join(imgs, "dog.jpg"), src)
    kw = dict(model_size="S", size=320, confidence=0.25,
              compute_dtype=jnp.float32)
    m1 = DetectorV5(src, destination=str(tmp_path / "one"),
                    **kw)(verbose=False)
    mp = DetectorV5(src, destination=str(tmp_path / "pp"),
                    pipeline_stages=4, **kw)(verbose=False)
    assert set(m1) == set(mp)
    for k in m1:
        a, b = m1[k], mp[k]
        if isinstance(a, int) or isinstance(b, int):
            assert a == b, k
        else:
            np.testing.assert_allclose(np.array(a), np.array(b), atol=1e-4)


def test_detector_pipeline_stages_rejects_bad_combos(tmp_path, cpu_devices):
    import os
    import pytest
    from realtimeobjectdetection_tpu.models import get_spec as _gs
    from realtimeobjectdetection_tpu.pipeline.detector import DetectorV3
    from realtimeobjectdetection_tpu.testing import synthetic_darknet_weights
    w = tmp_path / "tiny.weights"
    w.write_bytes(synthetic_darknet_weights(_gs("yolov3-tiny"), 0))
    kw = dict(images=".", destination=str(tmp_path / "d"),
              cfg_path="yolov3-tiny", weights_path=str(w))
    with pytest.raises(ValueError, match="bn_mode"):
        DetectorV3(pipeline_stages=2, bn_mode="batch", **kw)
    with pytest.raises(ValueError, match="quantize"):
        DetectorV3(pipeline_stages=2, bn_mode="fold", quantize="w8", **kw)
    from realtimeobjectdetection_tpu.parallel.mesh import make_mesh
    with pytest.raises(ValueError, match="mutually exclusive"):
        DetectorV3(pipeline_stages=2, bn_mode="fold",
                   mesh=make_mesh(2, data=2, space=1), **kw)


def _train_batch(reso, bsz, seed):
    rng = np.random.RandomState(seed)
    images = jnp.asarray(rng.rand(bsz, reso, reso, 3), np.float32)
    boxes = np.zeros((bsz, 4, 85), np.float32)
    boxes[:, :, 0:2] = rng.uniform(0.25 * reso, 0.75 * reso, (bsz, 4, 2))
    boxes[:, :, 2:4] = rng.uniform(0.3 * reso, 0.6 * reso, (bsz, 4, 2))
    boxes[:, :, 4] = 1.0
    boxes[:, :, 5] = 1.0
    mask = np.ones((bsz, 4), bool)
    return images, jnp.asarray(boxes), jnp.asarray(mask)


def test_pipelined_train_step_matches_single_device(cpu_devices):
    """PipelinedTrainStep (2 stages x 2 microbatches, GPipe schedule,
    per-stage Adam) == a single-device running-BN train step: same loss,
    same updated params after 2 steps (sum-MSE loss is additive over
    microbatches, so accumulation is exact up to float ordering)."""
    import optax
    from realtimeobjectdetection_tpu.model import make_forward
    from realtimeobjectdetection_tpu.ops.decode import decode_heads
    from realtimeobjectdetection_tpu.parallel.pipeline import (
        PipelinedTrainStep)
    from realtimeobjectdetection_tpu.train.loss import yolo_loss
    from realtimeobjectdetection_tpu.train.targets import build_targets

    reso = 96
    spec = get_spec("yolov3-tiny", width=reso, height=reso)
    params = init_params(spec, 0)
    opt = optax.adam(1e-3)

    fwd = make_forward(spec, bn_mode="running")

    @jax.jit
    def ref_step(p, o, images, boxes, mask):
        targets, obj_mask = build_targets(spec, boxes, mask, reso,
                                          class_filter=0,
                                          reference_bug_wh_iou=True)

        def loss_fn(pp):
            pred = decode_heads(fwd(pp, images), spec, reso, train=True)
            return yolo_loss(pred, targets, obj_mask)

        loss, g = jax.value_and_grad(loss_fn)(p)
        u, o2 = opt.update(g, o, p)
        return optax.apply_updates(p, u), o2, loss

    pp = PipelinedTrainStep(spec, params, opt, n_stages=2,
                            resolution=reso, n_micro=2)
    ref_p, ref_o = params, opt.init(params)
    for step_i in range(2):
        images, boxes, mask = _train_batch(reso, 4, 10 + step_i)
        loss_pp = pp.step(images, boxes, mask)
        ref_p, ref_o, loss_ref = ref_step(ref_p, ref_o, images,
                                          boxes, mask)
        np.testing.assert_allclose(float(loss_pp), float(loss_ref),
                                   rtol=1e-5)
    got = pp.gather_params()
    for k in ref_p:
        for kk in ref_p[k]:
            # microbatch grad sums reorder float additions; through
            # Adam's rsqrt this shows up as ~1e-5-abs wiggles on a
            # handful of elements (2/4.7M observed) — not a math error
            np.testing.assert_allclose(
                np.asarray(got[k][kk]), np.asarray(ref_p[k][kk]),
                rtol=2e-4, atol=5e-5, err_msg=f"{k}/{kk}")
    # stage params and Adam state really live on distinct devices
    d0 = jax.tree_util.tree_leaves(pp._params[0])[0].devices()
    d1 = jax.tree_util.tree_leaves(pp._params[1])[0].devices()
    o0 = jax.tree_util.tree_leaves(pp._opt[0])[0].devices()
    o1 = jax.tree_util.tree_leaves(pp._opt[1])[0].devices()
    assert d0 != d1 and o0 != o1 and d0 == o0 and d1 == o1


def test_pipelined_train_four_stages_learns(cpu_devices):
    """4 stages x 4 microbatches on a repeated batch: the loss must
    drop — gradient signal crosses every stage boundary."""
    import optax
    from realtimeobjectdetection_tpu.parallel.pipeline import (
        PipelinedTrainStep)
    reso = 64
    spec = get_spec("yolov3-tiny", width=reso, height=reso)
    pp = PipelinedTrainStep(spec, init_params(spec, 1), optax.adam(1e-3),
                            n_stages=4, resolution=reso, n_micro=4)
    images, boxes, mask = _train_batch(reso, 4, 42)
    losses = [float(pp.step(images, boxes, mask)) for _ in range(4)]
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses
    assert pp.step_count == 4


def test_pipelined_train_v5_matches_accumulated_single_device(cpu_devices):
    """PipelinedTrainStepV5 (2 stages x 2 microbatches) == a
    single-device v5 step that accumulates the SAME microbatches
    (ultralytics gradient-accumulation semantics — the v5 loss is
    batch-normalized, so full-batch equality is not the contract)."""
    import optax
    from realtimeobjectdetection_tpu.models.yolov5 import (
        init_yolov5_params, make_yolov5_forward, yolov5_config)
    from realtimeobjectdetection_tpu.parallel.pipeline import (
        PipelinedTrainStepV5)
    from realtimeobjectdetection_tpu.train.v5 import yolo_loss_v5

    reso = 64
    cfg = yolov5_config("n")
    params = init_yolov5_params(cfg, 0, batch_norm=True)
    opt = optax.adam(1e-3)
    fwd = make_yolov5_forward(cfg, compute_dtype=jnp.float32,
                              bn_mode="running")

    @jax.jit
    def micro_grads(p, images, boxes, mask):
        def loss_fn(pp):
            total, _ = yolo_loss_v5(fwd(pp, images), boxes, mask,
                                    80, reso)
            return total

        return jax.value_and_grad(loss_fn)(p)

    pp = PipelinedTrainStepV5(cfg, params, opt, n_stages=2,
                              resolution=reso, n_micro=2)
    ref_p, ref_o = params, opt.init(params)
    for step_i in range(2):
        images, boxes, mask = _train_batch(reso, 4, 20 + step_i)
        loss_pp = pp.step(images, boxes, mask)
        total, g_acc = 0.0, None
        for m in range(2):
            sl = slice(2 * m, 2 * (m + 1))
            l_m, g_m = micro_grads(ref_p, images[sl], boxes[sl], mask[sl])
            total = total + l_m
            g_acc = g_m if g_acc is None else jax.tree_util.tree_map(
                jnp.add, g_acc, g_m)
        u, ref_o = opt.update(g_acc, ref_o, ref_p)
        import optax as _ox
        ref_p = _ox.apply_updates(ref_p, u)
        np.testing.assert_allclose(float(loss_pp), float(total),
                                   rtol=1e-5)
    got = pp.gather_params()
    ref_leaves = jax.tree_util.tree_leaves_with_path(ref_p)
    got_flat = {jax.tree_util.keystr(k): v for k, v in
                jax.tree_util.tree_leaves_with_path(got)}
    assert len(ref_leaves) == len(got_flat)
    for k, v in ref_leaves:
        np.testing.assert_allclose(
            np.asarray(got_flat[jax.tree_util.keystr(k)]),
            np.asarray(v), rtol=2e-4, atol=5e-5,
            err_msg=jax.tree_util.keystr(k))


def test_pipelined_train_checkpoint_roundtrip(tmp_path, cpu_devices):
    """save_checkpoint/restore_checkpoint resume PP training exactly:
    a fresh PipelinedTrainStep restored from step-1's checkpoint takes
    the same step 2 as the uninterrupted run."""
    import optax
    from realtimeobjectdetection_tpu.parallel.pipeline import (
        PipelinedTrainStep)
    reso = 64
    spec = get_spec("yolov3-tiny", width=reso, height=reso)
    params = init_params(spec, 2)
    opt = optax.adam(1e-3)
    images, boxes, mask = _train_batch(reso, 4, 30)
    images2, boxes2, mask2 = _train_batch(reso, 4, 31)

    cont = PipelinedTrainStep(spec, params, opt, n_stages=2,
                              resolution=reso, n_micro=2)
    cont.step(images, boxes, mask)
    cont.save_checkpoint(str(tmp_path / "pp_ckpt"))
    loss_cont = float(cont.step(images2, boxes2, mask2))

    fresh = PipelinedTrainStep(spec, params, opt, n_stages=2,
                               resolution=reso, n_micro=2)
    fresh.restore_checkpoint(str(tmp_path / "pp_ckpt"))
    assert fresh.step_count == 1
    loss_resume = float(fresh.step(images2, boxes2, mask2))
    np.testing.assert_allclose(loss_resume, loss_cont, rtol=1e-6)
    a = cont.gather_params()
    b = fresh.gather_params()
    for k in a:
        for kk in a[k]:
            np.testing.assert_array_equal(np.asarray(a[k][kk]),
                                          np.asarray(b[k][kk]))


def test_map_stream_pipelined_dispatch(cpu_devices):
    reso = 160
    spec = get_spec("yolov3-tiny", width=reso, height=reso)
    params = init_params(spec, 0)
    pf = PipelinedForward(spec, params, n_stages=2, resolution=reso)
    rng = np.random.RandomState(2)
    batches = [jnp.asarray(rng.rand(1, reso, reso, 3), np.float32)
               for _ in range(5)]
    direct = [pf(b) for b in batches]
    streamed = list(pf.map_stream(iter(batches), depth=3))
    assert len(streamed) == 5
    for ds, ss in zip(direct, streamed):
        for a, b in zip(ds, ss):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pipelined_train_clip_global_norm_matches_chain(cpu_devices):
    """clip_global_norm= on the GPipe trainer == optax.chain(
    clip_by_global_norm(c), adam) on one device.  The PP side computes
    the norm across stage slices (per-stage sqnorms reduced on the last
    device); equality proves the reduction really is the GLOBAL norm,
    not a per-stage one.  c is chosen small enough that the clip
    triggers on every step (asserted via the reference grad norm)."""
    import optax
    from realtimeobjectdetection_tpu.model import make_forward
    from realtimeobjectdetection_tpu.ops.decode import decode_heads
    from realtimeobjectdetection_tpu.parallel.pipeline import (
        PipelinedTrainStep)
    from realtimeobjectdetection_tpu.train.loss import yolo_loss
    from realtimeobjectdetection_tpu.train.targets import build_targets

    reso = 96
    clip = 0.5
    spec = get_spec("yolov3-tiny", width=reso, height=reso)
    params = init_params(spec, 0)
    chain = optax.chain(optax.clip_by_global_norm(clip), optax.adam(1e-3))
    fwd = make_forward(spec, bn_mode="running")

    @jax.jit
    def ref_step(p, o, images, boxes, mask):
        targets, obj_mask = build_targets(spec, boxes, mask, reso,
                                          class_filter=0,
                                          reference_bug_wh_iou=True)

        def loss_fn(pp):
            pred = decode_heads(fwd(pp, images), spec, reso, train=True)
            return yolo_loss(pred, targets, obj_mask)

        loss, g = jax.value_and_grad(loss_fn)(p)
        u, o2 = chain.update(g, o, p)
        return optax.apply_updates(p, u), o2, loss, optax.global_norm(g)

    pp = PipelinedTrainStep(spec, params, optax.adam(1e-3), n_stages=2,
                            resolution=reso, n_micro=2,
                            clip_global_norm=clip)
    ref_p, ref_o = params, chain.init(params)
    for step_i in range(2):
        images, boxes, mask = _train_batch(reso, 4, 20 + step_i)
        loss_pp = pp.step(images, boxes, mask)
        ref_p, ref_o, loss_ref, gnorm = ref_step(ref_p, ref_o, images,
                                                 boxes, mask)
        assert float(gnorm) > clip  # the clip path really engaged
        np.testing.assert_allclose(float(loss_pp), float(loss_ref),
                                   rtol=1e-5)
    got = pp.gather_params()
    for k in ref_p:
        for kk in ref_p[k]:
            np.testing.assert_allclose(
                np.asarray(got[k][kk]), np.asarray(ref_p[k][kk]),
                rtol=2e-4, atol=5e-5, err_msg=f"{k}/{kk}")
