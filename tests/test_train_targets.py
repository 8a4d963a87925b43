"""Target assignment + loss parity vs the reference trainer goldens,
plus a full sharded train-step smoke test on the 8-device CPU mesh."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from realtimeobjectdetection_tpu.models import get_spec
from realtimeobjectdetection_tpu.train.loss import yolo_loss
from realtimeobjectdetection_tpu.train.targets import build_targets
from realtimeobjectdetection_tpu.train.step import (init_train_state,
                                                    make_train_step)
from realtimeobjectdetection_tpu.weights import init_params

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.mark.parametrize("name", ["yolov3-tiny", "yolov3"])
def test_targets_match_reference(name):
    d = np.load(os.path.join(GOLDEN, f"{name}_train_targets.npz"))
    spec = get_spec(name)
    np.testing.assert_array_equal(
        np.array(spec.anchors_in_detection_order, np.float32), d["anchors"])
    target, mask = build_targets(
        spec, jnp.asarray(d["boxes"]), jnp.asarray(d["box_mask"]),
        resolution=416, class_filter=0,
        reference_bug_wh_iou=True, parity_swap_xy=True)
    np.testing.assert_array_equal(np.asarray(mask), d["obj_mask"])
    np.testing.assert_allclose(np.asarray(target), d["target"],
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("name", ["yolov3-tiny"])
def test_loss_matches_reference(name):
    d = np.load(os.path.join(GOLDEN, f"{name}_train_targets.npz"))
    loss = yolo_loss(jnp.asarray(d["pred"]), jnp.asarray(d["target"]),
                     jnp.asarray(d["obj_mask"]))
    np.testing.assert_allclose(float(loss), float(d["loss"]),
                               rtol=1e-5)


def test_corrected_xy_orientation():
    """Default (non-parity) targets put the x-fraction in column 0."""
    spec = get_spec("yolov3-tiny")
    # one box: cx=100.5*32/32... pick cx so x-frac != y-frac
    box = np.zeros((1, 1, 85), np.float32)
    box[0, 0, :4] = [110.0, 50.0, 100.0, 60.0]  # cx=110 cy=50
    box[0, 0, 4] = 1.0
    box[0, 0, 5] = 1.0
    m = np.ones((1, 1), bool)
    t, tm = build_targets(spec, jnp.asarray(box), jnp.asarray(m),
                          parity_swap_xy=False)
    rows = np.asarray(t[0][np.asarray(tm[0])])
    # grid 13: stride 32 -> x_frac=110/32-3=0.4375, y_frac=50/32-1=0.5625
    assert rows.shape[0] >= 1
    r13 = rows[0]
    np.testing.assert_allclose(r13[0], 0.4375, atol=1e-6)
    np.testing.assert_allclose(r13[1], 0.5625, atol=1e-6)


def test_sharded_train_step_8dev(cpu_devices):
    """Full DP+SP train step on the emulated 8-device mesh: loss finite,
    params update, BN running stats move."""
    from realtimeobjectdetection_tpu.parallel.mesh import (make_mesh,
                                                           shard_train_step)
    spec = get_spec("yolov3-tiny", width=160, height=160)
    params = init_params(spec, 0)
    opt = optax.adam(1e-3)
    step = make_train_step(spec, opt, resolution=160)
    mesh = make_mesh(8, data=4, space=2)
    sharded = shard_train_step(step, mesh, spatial=True)

    state = init_train_state(params, opt)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(8, 160, 160, 3), jnp.float32)
    boxes = np.zeros((8, 4, 85), np.float32)
    boxes[:, :, 0:4] = rng.uniform(30, 130, (8, 4, 4))
    boxes[:, :, 4] = 1.0
    boxes[:, :, 5] = 1.0
    mask = np.ones((8, 4), bool)

    with mesh:
        state2, loss = sharded(state, images, jnp.asarray(boxes),
                               jnp.asarray(mask))
        state3, loss2 = sharded(state2, images, jnp.asarray(boxes),
                                jnp.asarray(mask))
    assert np.isfinite(float(loss)) and np.isfinite(float(loss2))
    assert float(loss2) != float(loss)  # optimizer actually moved
    w0 = np.asarray(params["node_0"]["w"])
    w2 = np.asarray(state2.params["node_0"]["w"])
    assert np.abs(w2 - w0).max() > 0
    # running stats moved toward batch stats
    assert np.abs(np.asarray(state2.params["node_0"]["bn_mean"])).max() > 0
    assert int(state3.step) == 2


def test_shard_map_step_matches_single_device(cpu_devices):
    """Explicit-psum DP step == single-device step on the same global
    batch (grads sum identically; BN batch stats differ per shard, so
    compare with stats updates off)."""
    from realtimeobjectdetection_tpu.parallel.mesh import make_mesh
    from realtimeobjectdetection_tpu.parallel.shard_map_step import \
        make_shard_map_train_step
    spec = get_spec("yolov3-tiny", width=96, height=96)
    params = init_params(spec, 0)
    opt = optax.sgd(1e-3)

    mesh = make_mesh(2, data=2, space=1)
    step_sm = make_shard_map_train_step(spec, opt, mesh, resolution=96,
                                        update_bn_stats=False)

    from realtimeobjectdetection_tpu.train.step import make_train_step
    # single-device reference on the same global batch.  per-shard BN
    # stats differ from global-batch BN, so make each shard's stats equal
    # by feeding two identical shard halves.
    step_1 = jax.jit(make_train_step(spec, opt, resolution=96,
                                     update_bn_stats=False))

    rng = np.random.RandomState(0)
    half = rng.rand(1, 96, 96, 3).astype(np.float32)
    images = jnp.asarray(np.concatenate([half, half], 0))
    boxes = np.zeros((2, 2, 85), np.float32)
    boxes[:, :, 0:4] = [48, 48, 40, 40]
    boxes[:, :, 4:6] = 1.0
    boxes = jnp.asarray(boxes)
    mask = jnp.ones((2, 2), bool)

    s0 = init_train_state(params, opt)
    with mesh:
        s_sm, loss_sm = step_sm(s0, images, boxes, mask)
    s_1, loss_1 = step_1(s0, images, boxes, mask)

    # identical shards: per-shard BN == global BN, psum(grads) == grads
    # (tolerances absorb fp32 reduction-order noise through 13 convs)
    np.testing.assert_allclose(float(loss_sm), float(loss_1), rtol=1e-5)
    a = np.asarray(s_sm.params["node_0"]["w"])
    b = np.asarray(s_1.params["node_0"]["w"])
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5)


def test_voc_pipeline_matches_reference_golden(tmp_path):
    """VOC-path golden (regenerated synthetic fixture -> reference VOC
    Dataset + target_creator recorded offline): image tensors, 85-col box
    rows (letterbox space, integer pads, dataset.py:113-122) and the
    resulting training targets must all match."""
    from realtimeobjectdetection_tpu.data.voc import VOCDataset
    from realtimeobjectdetection_tpu.testing import make_synthetic_voc

    d = np.load(os.path.join(GOLDEN, "voc_train_targets.npz"))
    xml_dir, img_dir = make_synthetic_voc(tmp_path, n_images=4,
                                          img_size=(240, 320), seed=3)
    ds = VOCDataset(xml_dir, img_dir, resolution=416)
    assert len(ds) == 4

    ref_imgs = d["images_nchw"]             # [4, 3, 416, 416]
    ref_boxes, ref_mask = d["boxes"], d["box_mask"]
    for i in range(4):
        img, rows = ds[i]
        np.testing.assert_allclose(img.transpose(2, 0, 1), ref_imgs[i],
                                   atol=1e-6)
        ref_rows = ref_boxes[i][ref_mask[i]]
        assert rows.shape == ref_rows.shape  # dog object filtered out
        np.testing.assert_allclose(rows, ref_rows, atol=1e-4)

    spec = get_spec("yolov3-tiny")
    target, mask = build_targets(
        spec, jnp.asarray(ref_boxes), jnp.asarray(ref_mask),
        resolution=416, class_filter=0,
        reference_bug_wh_iou=True, parity_swap_xy=True)
    np.testing.assert_array_equal(np.asarray(mask), d["obj_mask"])
    np.testing.assert_allclose(np.asarray(target), d["target"],
                               rtol=1e-5, atol=1e-5)


def test_train_step_accum_semantics():
    """make_train_step(accum_steps=2): with two IDENTICAL microbatch
    halves the per-microbatch BN stats equal the full-batch stats, so
    (a) with running-stat updates off, the accumulated update must
    reproduce the plain full-batch step exactly (sum-MSE is additive;
    SGD so the update is linear in the grads — Adam's rsqrt flips the
    update sign on near-zero grads under float reordering);
    (b) with updates on, the k sequential running-mean updates follow
    the closed-form EMA: mean_accum = (2 - m) * mean_plain from zero
    init (m = BN momentum 0.1)."""
    from realtimeobjectdetection_tpu.train.step import BN_MOMENTUM
    spec = get_spec("yolov3-tiny", width=96, height=96)
    params = init_params(spec, 0)
    opt = optax.adam(1e-3)

    rng = np.random.RandomState(0)
    half_img = rng.rand(2, 96, 96, 3).astype(np.float32)
    images = jnp.asarray(np.concatenate([half_img, half_img], 0))
    half_box = np.zeros((2, 3, 85), np.float32)
    half_box[:, :, 0:2] = rng.uniform(30, 66, (2, 3, 2))
    half_box[:, :, 2:4] = rng.uniform(30, 50, (2, 3, 2))
    half_box[:, :, 4:6] = 1.0
    boxes = jnp.asarray(np.concatenate([half_box, half_box], 0))
    mask = jnp.ones((4, 3), bool)

    # (a) exact equality, stats updates off, linear optimizer
    sgd = optax.sgd(1e-3)
    s0_sgd = init_train_state(params, sgd)
    plain = jax.jit(make_train_step(spec, sgd, resolution=96,
                                    update_bn_stats=False))
    accum = jax.jit(make_train_step(spec, sgd, resolution=96,
                                    update_bn_stats=False, accum_steps=2))
    sp, lp = plain(s0_sgd, images, boxes, mask)
    sa, la = accum(s0_sgd, images, boxes, mask)
    np.testing.assert_allclose(float(la), float(lp), rtol=1e-6)
    for k in sp.params:
        for kk in sp.params[k]:
            # half-grad sums reorder float additions: <= ~1e-6 abs
            # wiggle on a handful of elements (measured 7e-7 max)
            np.testing.assert_allclose(
                np.asarray(sa.params[k][kk]), np.asarray(sp.params[k][kk]),
                rtol=1e-5, atol=2e-6, err_msg=f"{k}/{kk}")

    # (b) sequential running-stat updates, zero-init mean
    s0 = init_train_state(params, opt)
    plain_s = jax.jit(make_train_step(spec, opt, resolution=96))
    accum_s = jax.jit(make_train_step(spec, opt, resolution=96,
                                      accum_steps=2))
    sp2, _ = plain_s(s0, images, boxes, mask)
    sa2, _ = accum_s(s0, images, boxes, mask)
    mp = np.asarray(sp2.params["node_0"]["bn_mean"])
    ma = np.asarray(sa2.params["node_0"]["bn_mean"])
    np.testing.assert_allclose(ma, (2.0 - BN_MOMENTUM) * mp,
                               rtol=1e-5, atol=1e-7)


def test_train_step_accum_shards_over_mesh(cpu_devices):
    """accum_steps composes with the DP mesh: the in-graph [B] ->
    [k, B/k] reshape partitions under GSPMD (microbatch dim unsharded,
    batch shards within each microbatch); loss finite, params move."""
    from realtimeobjectdetection_tpu.parallel.mesh import (make_mesh,
                                                           shard_train_step)
    spec = get_spec("yolov3-tiny", width=96, height=96)
    params = init_params(spec, 0)
    opt = optax.adam(1e-3)
    step = make_train_step(spec, opt, resolution=96, accum_steps=2)
    mesh = make_mesh(8, data=4, space=2)
    sharded = shard_train_step(step, mesh, spatial=True)

    state = init_train_state(params, opt)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(8, 96, 96, 3), jnp.float32)
    boxes = np.zeros((8, 4, 85), np.float32)
    boxes[:, :, 0:4] = rng.uniform(20, 76, (8, 4, 4))
    boxes[:, :, 4:6] = 1.0
    mask = np.ones((8, 4), bool)
    with mesh:
        s2, loss = sharded(state, images, jnp.asarray(boxes),
                           jnp.asarray(mask))
    assert np.isfinite(float(loss))
    w0 = np.asarray(params["node_0"]["w"])
    assert np.abs(np.asarray(s2.params["node_0"]["w"]) - w0).max() > 0


def test_train_step_skip_nonfinite_guard():
    """make_train_step(skip_nonfinite=True): a batch producing a
    non-finite loss leaves params, optimizer moments, BN running stats
    and the EMA buffers bit-identical to the pre-step state (only the
    step counter advances); on a healthy batch the guarded step equals
    the unguarded one exactly."""
    spec = get_spec("yolov3-tiny", width=96, height=96)
    params = init_params(spec, 0)
    opt = optax.adam(1e-3)
    plain = jax.jit(make_train_step(spec, opt, resolution=96,
                                    ema_decay=0.99))
    guarded = jax.jit(make_train_step(spec, opt, resolution=96,
                                      ema_decay=0.99,
                                      skip_nonfinite=True))
    s0 = init_train_state(params, opt, ema_decay=0.99)

    rng = np.random.RandomState(0)
    images = rng.rand(2, 96, 96, 3).astype(np.float32)
    boxes = np.zeros((2, 3, 85), np.float32)
    boxes[:, :, 0:2] = rng.uniform(30, 66, (2, 3, 2))
    boxes[:, :, 2:4] = rng.uniform(30, 50, (2, 3, 2))
    boxes[:, :, 4:6] = 1.0
    mask = jnp.ones((2, 3), bool)

    # healthy batch: guard is transparent.  The extra where-selects
    # change XLA's fusion choices, so allow 1-ULP fp32 drift (measured
    # max 1.2e-7); the poisoned-batch check below stays bit-exact.
    sp, lp = plain(s0, jnp.asarray(images), jnp.asarray(boxes), mask)
    sg, lg = guarded(s0, jnp.asarray(images), jnp.asarray(boxes), mask)
    np.testing.assert_allclose(float(lg), float(lp), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), rtol=1e-5,
                                                atol=1e-6), sp, sg)

    # poisoned batch: NaN pixels -> NaN loss -> every state leaf except
    # the step counter must be IDENTICAL to the pre-step state
    bad = images.copy()
    bad[0, 0, 0, 0] = np.nan
    sb, lb = guarded(s0, jnp.asarray(bad), jnp.asarray(boxes), mask)
    assert not np.isfinite(float(lb))
    assert int(sb.step) == int(s0.step) + 1
    for tree_new, tree_old in ((sb.params, s0.params),
                               (sb.ema_params, s0.ema_params),
                               (sb.opt_state, s0.opt_state)):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            tree_new, tree_old)

    # ...and the unguarded step would have been poisoned (the guard is
    # load-bearing, not vacuous)
    su, lu = plain(s0, jnp.asarray(bad), jnp.asarray(boxes), mask)
    assert not np.isfinite(float(lu))
    assert np.isnan(np.asarray(su.params["node_0"]["w"])).any()


def test_train_step_bf16_activation_residency():
    """make_train_step(activation_dtype=bf16): the step runs, the loss
    lands within bf16 drift of the fp32-resident step, params update
    finitely, and the BN running stats (fp32 in the state) move — the
    training twin of the serving residency lever."""
    spec = get_spec("yolov3-tiny", width=96, height=96)
    params = init_params(spec, 0)
    opt = optax.adam(1e-3)
    s0 = init_train_state(params, opt)
    rng = np.random.RandomState(0)
    images = rng.rand(2, 96, 96, 3).astype(np.float32)
    boxes = np.zeros((2, 3, 85), np.float32)
    boxes[:, :, 0:2] = rng.uniform(30, 66, (2, 3, 2))
    boxes[:, :, 2:4] = rng.uniform(30, 50, (2, 3, 2))
    boxes[:, :, 4:6] = 1.0
    mask = jnp.ones((2, 3), bool)
    losses = {}
    states = {}
    for name, adt in (("fp32", None), ("bf16", jnp.bfloat16)):
        step = jax.jit(make_train_step(spec, opt, resolution=96,
                                       activation_dtype=adt))
        s1, loss = step(s0, jnp.asarray(images), jnp.asarray(boxes), mask)
        losses[name] = float(loss)
        states[name] = s1
    assert np.isfinite(losses["bf16"])
    np.testing.assert_allclose(losses["bf16"], losses["fp32"], rtol=0.05)
    s1 = states["bf16"]
    for leaf in jax.tree_util.tree_leaves(s1.params):
        assert leaf.dtype == jnp.float32          # master weights stay fp32
        assert np.isfinite(np.asarray(leaf)).all()
    # BN running stats moved
    moved = np.abs(np.asarray(s1.params["node_0"]["bn_mean"])
                   - np.asarray(s0.params["node_0"]["bn_mean"])).max()
    assert moved > 0
    # fp32-stats invariant: the FIRST conv's batch statistics see the
    # same fp32 conv output in both variants (the bf16 cast happens at
    # materialization, after BN) — its running-stat update must match
    # the fp32-resident step to fp32 tolerance, NOT bf16 rounding
    np.testing.assert_allclose(
        np.asarray(states["bf16"].params["node_0"]["bn_mean"]),
        np.asarray(states["fp32"].params["node_0"]["bn_mean"]),
        rtol=1e-6, atol=1e-7)


def test_chained_step_equals_sequential():
    """train.step.make_chained_step(step, k): one dispatch running k
    in-graph optimizer steps over DISTINCT stacked batches equals k
    sequential jitted calls of the same step — params, BN running
    stats, and the per-step loss vector all match up to XLA fusion ULPs
    (the scan body fuses slightly differently than the standalone jitted
    program).  The lever exists purely to amortize the per-dispatch
    tunnel RPC; semantics must not move."""
    from realtimeobjectdetection_tpu.train.step import (init_train_state,
                                                        make_chained_step,
                                                        make_train_step)
    spec = get_spec("yolov3-tiny", width=96, height=96)
    opt = optax.adam(1e-3)
    step = make_train_step(spec, opt, resolution=96)
    k = 3
    rng = np.random.RandomState(7)
    images = jnp.asarray(rng.rand(k, 2, 96, 96, 3), jnp.float32)
    boxes = np.zeros((k, 2, 3, 85), np.float32)
    boxes[..., 0, 0:2] = rng.uniform(30, 66, (k, 2, 2))
    boxes[..., 0, 2:4] = rng.uniform(30, 50, (k, 2, 2))
    boxes[..., 0, 4] = 1.0
    boxes[..., 0, 5] = 1.0
    mask = np.zeros((k, 2, 3), bool)
    mask[..., 0] = True
    boxes = jnp.asarray(boxes)
    mask = jnp.asarray(mask)

    s0 = init_train_state(init_params(spec, 0), opt)
    chained = jax.jit(make_chained_step(step, k))
    sc, losses = chained(s0, images, boxes, mask)

    sstep = jax.jit(step)
    ss = s0
    ref = []
    for i in range(k):
        ss, l = sstep(ss, images[i], boxes[i], mask[i])
        ref.append(float(l))
    np.testing.assert_allclose(np.asarray(losses), ref, rtol=1e-5)
    # atol: Adam's update is sign-like (g/(sqrt(v)+eps)) for near-zero
    # gradients, so a fusion-ULP grad difference can move one weight by
    # up to ~lr per step (k*lr = 3e-3 worst case over the chain) — the
    # per-step loss vector above is the tight semantic gate.
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=3e-3),
        sc.params, ss.params)
    # k=1 passthrough returns the step itself
    assert make_chained_step(step, 1) is step


def test_chained_step_sharded_equals_sequential(cpu_devices):
    """Chained dispatch composes with the DP mesh
    (shard_train_step(chain=k)): one sharded program running k in-graph
    optimizer steps over the 8-device mesh equals k sequential sharded
    steps — leading [k] step axis replicated, batch axis sharded, the
    gradient all-reduces riding inside the scan.  Semantics gate for
    the multi-chip dispatch-amortization lever.  Spatial meshes are
    REJECTED with chain>1 (SPMD BN-stat miscompile — the batch means of
    odd-small-grid layers come back ×data-axis-size; measured on this
    harness, see shard_train_step docstring)."""
    from realtimeobjectdetection_tpu.parallel.mesh import (make_mesh,
                                                           shard_train_step)
    from realtimeobjectdetection_tpu.train.step import (init_train_state,
                                                        make_chained_step,
                                                        make_train_step)
    spec = get_spec("yolov3-tiny", width=96, height=96)
    opt = optax.adam(1e-3)
    step = make_train_step(spec, opt, resolution=96)
    with pytest.raises(ValueError, match="spatial"):
        shard_train_step(make_chained_step(step, 2),
                         make_mesh(8, data=4, space=2),
                         spatial=True, chain=2)
    mesh = make_mesh(8, data=8, space=1)
    k, B = 2, 8
    rng = np.random.RandomState(11)
    images = jnp.asarray(rng.rand(k, B, 96, 96, 3), jnp.float32)
    boxes = np.zeros((k, B, 3, 85), np.float32)
    boxes[..., 0, 0:2] = rng.uniform(30, 66, (k, B, 2))
    boxes[..., 0, 2:4] = rng.uniform(30, 50, (k, B, 2))
    boxes[..., 0, 4] = 1.0
    boxes[..., 0, 5] = 1.0
    mask = np.zeros((k, B, 3), bool)
    mask[..., 0] = True
    boxes = jnp.asarray(boxes)
    mask = jnp.asarray(mask)

    chained = shard_train_step(make_chained_step(step, k), mesh,
                               spatial=True, chain=k)
    seq = shard_train_step(step, mesh, spatial=True)
    s0 = init_train_state(init_params(spec, 0), opt)
    with mesh:
        sc, losses = chained(s0, images, boxes, mask)
        ss = s0
        ref = []
        for i in range(k):
            ss, l = seq(ss, images[i], boxes[i], mask[i])
            ref.append(float(l))
    # step 1 matches to fusion ULPs; step 2's loss sees step-1 params
    # already perturbed by Adam's sign-like amplification of those ULPs
    # (measured 3e-5 rel on the 8-device mesh), hence 1e-4 not 1e-5
    np.testing.assert_allclose(np.asarray(losses), ref, rtol=1e-4)
    # same atol rationale as the single-device chain test: Adam's
    # sign-like update amplifies fusion-ULP grad noise to ~lr per step
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=2e-3),
        sc.params, ss.params)
    assert int(sc.step) == k
