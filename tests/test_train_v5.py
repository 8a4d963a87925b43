"""YOLOv5 training: target assignment semantics, loss, learning, BN fold,
sharded step.  The reference never trains v5 (hub checkpoints only,
/root/reference/detect.py:258); these tests pin the ultralytics
ComputeLoss/build_targets semantics the native implementation replicates
(anchor ratio gate, 3-cell neighbor assignment, CIoU/BCE terms)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from realtimeobjectdetection_tpu.models.yolov5 import (
    YoloV5Config, fold_v5_batchnorm, init_yolov5_params,
    make_yolov5_forward)
from realtimeobjectdetection_tpu.train.step import init_train_state
from realtimeobjectdetection_tpu.train.v5 import (build_targets_v5,
                                                  make_train_step_v5,
                                                  yolo_loss_v5)


def _gt(batch=1, m=4):
    boxes = np.zeros((batch, m, 85), np.float32)
    mask = np.zeros((batch, m), bool)
    return boxes, mask


def test_build_targets_cell_slots():
    """Center + exactly the two ultralytics neighbor cells: fx<0.5 picks
    the left cell, fy>0.5 picks the cell below (utils/loss.py offsets)."""
    stride, grid = 8, 12
    boxes, mask = _gt()
    # gxy = (10.3, 5.7) at stride 8; wh == anchor 0 (10, 13) exactly
    boxes[0, 0] = 0
    boxes[0, 0, 0:4] = [10.3 * stride, 5.7 * stride, 10, 13]
    boxes[0, 0, 4] = 1.0
    boxes[0, 0, 5 + 7] = 1.0
    mask[0, 0] = True
    t = build_targets_v5(jnp.asarray(boxes), jnp.asarray(mask), grid,
                         stride, ((10, 13), (16, 30), (33, 23)))
    valid = np.asarray(t["valid"])[0, 0]   # [A, S]
    flat = np.asarray(t["flat"])[0, 0]
    # anchor 0 matches exactly; anchors 1/2 pass the <4.0 ratio gate too
    # (16/10=1.6, 33/10=3.3) — all ratios under anchor_t participate
    assert valid[0, 0] and valid[1, 0] and valid[2, 0]
    # slots: center, left (fx=0.3<0.5), NOT up (fy=0.7), NOT right, down
    assert list(valid[0]) == [True, True, False, False, True]
    a = 3
    assert flat[0, 0] == (5 * grid + 10) * a + 0        # center (10, 5)
    assert flat[0, 1] == (5 * grid + 9) * a + 0         # left   (9, 5)
    assert flat[0, 4] == (6 * grid + 10) * a + 0        # below  (10, 6)
    # xy regression target lives in (-0.5, 1.5)
    txy = np.asarray(t["txy"])[0, 0, 0]
    assert np.allclose(txy[0], [0.3, 0.7], atol=1e-5)
    assert np.allclose(txy[1], [1.3, 0.7], atol=1e-5)   # left cell frame
    assert np.allclose(txy[4], [0.3, -0.3], atol=1e-5)  # below-cell frame


def test_build_targets_anchor_ratio_gate():
    """max(wh/anchor, anchor/wh) >= 4 excludes the anchor."""
    stride, grid = 8, 12
    boxes, mask = _gt()
    boxes[0, 0, 0:4] = [40, 40, 10 * 8 * 4.5, 13 * 8]  # w 4.5x anchor0 w
    boxes[0, 0, 4] = 1.0
    boxes[0, 0, 5] = 1.0
    mask[0, 0] = True
    t = build_targets_v5(jnp.asarray(boxes), jnp.asarray(mask), grid,
                         stride, ((10, 13), (16, 30), (33, 23)))
    valid = np.asarray(t["valid"])[0, 0]
    assert not valid[0].any()      # anchor 0 gated out by the ratio
    assert not valid[1].any()      # 360/16 = 22.5 — gated
    # 360 px wide at stride 8 = 45 cells vs anchor 2 w 33/8: also gated
    assert not valid[2].any()


def test_padded_rows_do_not_contribute():
    boxes, mask = _gt(batch=2, m=6)
    boxes[0, 0, 0:4] = [48, 48, 30, 30]
    boxes[0, 0, 4] = 1.0
    boxes[0, 0, 5] = 1.0
    mask[0, 0] = True
    # row 1 has plausible numbers but mask False -> must be ignored
    boxes[0, 1] = boxes[0, 0]
    heads = [jnp.zeros((2, g, g, 255), jnp.float32) for g in (12, 6, 3)]
    l_with, _ = yolo_loss_v5(heads, jnp.asarray(boxes), jnp.asarray(mask),
                             80, 96)
    mask2 = mask.copy()
    mask2[0, 1] = True
    l_dup, _ = yolo_loss_v5(heads, jnp.asarray(boxes), jnp.asarray(mask2),
                            80, 96)
    assert np.isfinite(float(l_with))
    # the duplicate row changes the loss -> masking is load-bearing
    assert float(l_with) != pytest.approx(float(l_dup))


def test_grid_native_loss_matches_legacy():
    """grid_native=True (NHWC slice/gather loss) vs the legacy
    full-flatten path: same logits reach every term, so loss AND
    head-gradients must agree to fp reduction order — in both f32 and
    bf16 head dtypes (the bf16->f32 widening is exact either side of
    the gather)."""
    rng = np.random.RandomState(3)
    b, m = 3, 5
    boxes, mask = _gt(batch=b, m=m)
    for i in range(b):
        for j in range(3):
            boxes[i, j, 0:2] = rng.uniform(8, 88, 2)
            boxes[i, j, 2:4] = rng.uniform(6, 40, 2)
            boxes[i, j, 4] = 1.0
            boxes[i, j, 5 + rng.randint(80)] = 1.0
            mask[i, j] = True
    for dtype in (jnp.float32, jnp.bfloat16):
        heads = [jnp.asarray(rng.randn(b, g, g, 255), np.float32
                             ).astype(dtype) for g in (12, 6, 3)]

        def loss_of(hs, gn):
            return yolo_loss_v5(hs, jnp.asarray(boxes), jnp.asarray(mask),
                                80, 96, grid_native=gn)[0]

        l_new, g_new = jax.value_and_grad(loss_of)(heads, True)
        l_old, g_old = jax.value_and_grad(loss_of)(heads, False)
        assert float(l_new) == pytest.approx(float(l_old), rel=1e-5)
        for gn, go in zip(g_new, g_old):
            np.testing.assert_allclose(np.asarray(gn, np.float32),
                                       np.asarray(go, np.float32),
                                       rtol=1e-4, atol=1e-5)


def test_v5_step_learns_and_updates_bn():
    """Full step: loss decreases over a few iterations on a fixed batch,
    BN running stats move (momentum 0.03), step counter increments."""
    cfg = YoloV5Config("n")
    params = init_yolov5_params(cfg, 0, batch_norm=True)
    opt = optax.adam(1e-3)
    step = jax.jit(make_train_step_v5(cfg, opt, resolution=96))
    state = init_train_state(params, opt)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(4, 96, 96, 3), jnp.float32)
    boxes, mask = _gt(batch=4, m=8)
    boxes[:, :2, 0:2] = rng.uniform(20, 76, (4, 2, 2))
    boxes[:, :2, 2:4] = rng.uniform(12, 48, (4, 2, 2))
    boxes[:, :2, 4] = 1.0
    boxes[:, :2, 5] = 1.0
    mask[:, :2] = True
    s, loss0 = step(state, images, jnp.asarray(boxes), jnp.asarray(mask))
    losses = [float(loss0)]
    for _ in range(12):
        s, loss = step(s, images, jnp.asarray(boxes), jnp.asarray(mask))
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0] * 0.9
    assert int(s.step) == 13
    assert float(jnp.abs(jnp.asarray(s.params["m0"]["bn_mean"])).max()) > 0


def test_fold_after_training_matches_running():
    """fold_v5_batchnorm(trained params) == running-stats forward."""
    cfg = YoloV5Config("n")
    params = init_yolov5_params(cfg, 3, batch_norm=True)
    opt = optax.sgd(1e-3)
    step = jax.jit(make_train_step_v5(cfg, opt, resolution=96))
    state = init_train_state(params, opt)
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.rand(2, 96, 96, 3), jnp.float32)
    boxes, mask = _gt(batch=2, m=4)
    boxes[:, 0, 0:4] = [48, 48, 24, 24]
    boxes[:, 0, 4] = 1.0
    boxes[:, 0, 5] = 1.0
    mask[:, 0] = True
    s, _ = step(state, images, jnp.asarray(boxes), jnp.asarray(mask))

    x = jnp.asarray(rng.rand(1, 96, 96, 3), jnp.float32)
    f_run = jax.jit(make_yolov5_forward(cfg, jnp.float32,
                                        bn_mode="running"))
    f_fold = jax.jit(make_yolov5_forward(cfg, jnp.float32,
                                         bn_mode="fold"))
    hr = f_run(s.params, x)
    hf = f_fold(fold_v5_batchnorm(s.params), x)
    for a, b in zip(hr, hf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-2, rtol=1e-3)


def test_v5_step_shards_over_mesh(cpu_devices):
    """The v5 step rides the same ('data','space') mesh machinery as the
    darknet step (parallel/mesh.shard_train_step, unchanged)."""
    from realtimeobjectdetection_tpu.parallel.mesh import (make_mesh,
                                                           shard_train_step)
    cfg = YoloV5Config("n")
    params = init_yolov5_params(cfg, 0, batch_norm=True)
    opt = optax.adam(1e-3)
    step = make_train_step_v5(cfg, opt, resolution=96)
    mesh = make_mesh(8, data=4, space=2)
    sharded = shard_train_step(step, mesh, spatial=True)
    state = init_train_state(params, opt)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(8, 96, 96, 3), jnp.float32)
    boxes, mask = _gt(batch=8, m=4)
    boxes[:, 0, 0:4] = [48, 48, 30, 30]
    boxes[:, 0, 4] = 1.0
    boxes[:, 0, 5] = 1.0
    mask[:, 0] = True
    with mesh:
        s2, loss = sharded(state, images, jnp.asarray(boxes),
                           jnp.asarray(mask))
    assert np.isfinite(float(loss))
    assert int(s2.step) == 1


def test_trainer_v5_end_to_end(tmp_path):
    """TrainerV5: two epochs on a synthetic COCO set — loss history,
    three checkpoint tiers + folded .npz deploy artifact, resume."""
    from realtimeobjectdetection_tpu.testing import make_synthetic_coco
    from realtimeobjectdetection_tpu.train.v5 import TrainerV5
    ann, imgs = make_synthetic_coco(tmp_path, n_images=4,
                                    img_size=(96, 128))
    out = str(tmp_path / "w5")
    tr = TrainerV5(model_size="n", epochs=2, batch_size=2, resolution=96,
                   lr=1e-3, out_dir=out, max_boxes=8, mesh=False)
    hist = tr.train(ann, imgs, dataset_type="COCO", verbose=False)
    assert len(hist["train_loss"]) == 2
    assert all(np.isfinite(hist["train_loss"]))
    import os
    for tier in ["weight_epoch1", "weight_epoch2", "checkpoint",
                 "training_output"]:
        assert os.path.isdir(os.path.join(out, tier)), tier
        assert os.path.isfile(os.path.join(out, tier + ".npz")), tier

    # the folded npz is a loadable inference artifact: same loader path
    # DetectorV5(weights_path=...) uses
    from realtimeobjectdetection_tpu.models.yolov5 import load_v5_checkpoint
    loaded = load_v5_checkpoint(tr.cfg, os.path.join(
        out, "training_output.npz"))
    f_fold = jax.jit(make_yolov5_forward(tr.cfg, jnp.float32))
    heads = f_fold(loaded, jnp.zeros((1, 96, 96, 3), jnp.float32))
    assert heads[0].shape == (1, 12, 12, 255)
    assert all(bool(jnp.isfinite(h).all()) for h in heads)

    # resume restores the step counter
    tr2 = TrainerV5(model_size="n", epochs=2, batch_size=2, resolution=96,
                    out_dir=out, max_boxes=8, mesh=False, resume=True)
    assert int(tr2.state.step) == int(tr.state.step)


def test_validate_map_v5_runs(tmp_path):
    """v5 mAP evaluation closes the train->eval loop: runs on both the
    training (BN) layout and the folded deploy layout, same scores."""
    from realtimeobjectdetection_tpu.eval.validator import validate_map_v5
    from realtimeobjectdetection_tpu.testing import make_synthetic_coco
    ann, imgs = make_synthetic_coco(tmp_path, n_images=3,
                                    img_size=(96, 128))
    cfg = YoloV5Config("n")
    params = init_yolov5_params(cfg, 0, batch_norm=True)
    out = validate_map_v5(ann, imgs, "n", params, size=96,
                          confidence=0.01, verbose=False)
    assert set(out) >= {"mAP@0.5", "mAP@[.5:.95]"}
    out2 = validate_map_v5(ann, imgs, "n", fold_v5_batchnorm(params),
                           size=96, confidence=0.01, verbose=False)
    for k in ("mAP@0.5", "mAP@[.5:.95]"):
        a, b = out[k], out2[k]
        if np.isnan(a) and np.isnan(b):
            continue
        assert a == pytest.approx(b, abs=2e-2)


def test_trainer_v5_best_on_map_and_augment(tmp_path):
    """best_on='map' evaluates per-epoch mAP for the checkpoint tier;
    augment=True runs the shared in-graph flip/HSV augmentation."""
    from realtimeobjectdetection_tpu.testing import make_synthetic_coco
    from realtimeobjectdetection_tpu.train.v5 import TrainerV5
    ann, imgs = make_synthetic_coco(tmp_path, n_images=2,
                                    img_size=(96, 128))
    out = str(tmp_path / "w5m")
    tr = TrainerV5(model_size="n", epochs=1, batch_size=2, resolution=96,
                   out_dir=out, max_boxes=8, mesh=False, augment=True,
                   best_on="map")
    hist = tr.train(ann, imgs, dataset_type="COCO", verbose=False)
    assert "train_map50" in hist and len(hist["train_map50"]) == 1
    import os
    assert os.path.isdir(os.path.join(out, "checkpoint")) or \
        np.isnan(hist["train_map50"][0])


def test_v5_multiscale_input_resolution():
    """input_resolution != resolution: batch rescaled in-graph, boxes
    scaled to match — shared multi-scale mode with the darknet step."""
    cfg = YoloV5Config("n")
    params = init_yolov5_params(cfg, 0, batch_norm=True)
    opt = optax.adam(1e-3)
    step = jax.jit(make_train_step_v5(cfg, opt, resolution=128,
                                      input_resolution=96))
    state = init_train_state(params, opt)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(2, 96, 96, 3), jnp.float32)  # base reso
    boxes, mask = _gt(batch=2, m=4)
    boxes[:, 0, 0:4] = [48, 48, 30, 30]   # pixels at 96
    boxes[:, 0, 4] = 1.0
    boxes[:, 0, 5] = 1.0
    mask[:, 0] = True
    s, loss = step(state, images, jnp.asarray(boxes), jnp.asarray(mask))
    assert np.isfinite(float(loss))
    assert int(s.step) == 1


def test_build_targets_edge_center_clamped_kept():
    """ultralytics clamps gij into [0, grid-1] and KEEPS the assignment
    (``gij.clamp_``): a gt centered exactly on the right/bottom image
    edge (gxy == grid) must train the last cell, not vanish (ADVICE r2)."""
    grid, stride = 8, 8
    boxes, mask = _gt()
    d = grid * stride
    boxes[0, 0, :4] = [d, d, 24, 24]   # center exactly on the corner
    boxes[0, 0, 4] = 1.0
    boxes[0, 0, 5] = 1.0
    mask[0, 0] = True
    t = build_targets_v5(jnp.asarray(boxes), jnp.asarray(mask),
                         grid, stride, ((16, 16), (32, 32), (64, 64)))
    valid = np.asarray(t["valid"])[0, 0]          # [A, S]
    flat = np.asarray(t["flat"])[0, 0]
    assert valid[:, 0].any(), "edge-center assignment was dropped"
    # the clamped cell is the bottom-right one
    a = valid[:, 0].argmax()
    cell = flat[a, 0] // 3
    assert cell == grid * grid - 1


def test_mosaic_batch_geometry():
    """In-graph mosaic: full canvas coverage, quadrant-consistent box
    transforms, budget-M compaction with valid rows first."""
    from realtimeobjectdetection_tpu.train.augment import mosaic_batch
    b, d, m = 4, 64, 6
    imgs = np.zeros((b, d, d, 3), np.float32)
    for i in range(b):
        imgs[i] = (i + 1) / b           # constant value tags the source
    boxes = np.zeros((b, m, 85), np.float32)
    mask = np.zeros((b, m), bool)
    for i in range(b):
        boxes[i, 0, :4] = [d / 2, d / 2, 20, 20]
        boxes[i, 0, 4] = 1.0
        boxes[i, 0, 5 + i] = 1.0        # class tags the source too
        mask[i, 0] = True
    out, nb, nm = jax.jit(mosaic_batch)(
        jax.random.PRNGKey(0), jnp.asarray(imgs), jnp.asarray(boxes),
        jnp.asarray(mask))
    out, nb, nm = np.asarray(out), np.asarray(nb), np.asarray(nm)
    assert out.shape == imgs.shape and nb.shape == boxes.shape
    assert (out > 0).all()              # every canvas pixel covered
    assert nm.sum() == 4 * b            # one box per quadrant survives
    # valid rows are compacted to the front
    assert (nm.argmin(axis=1) >= nm.sum(axis=1)).all() or nm.all()
    v = nb[nm]
    assert (v[:, 0] >= 0).all() and (v[:, 0] <= d).all()
    assert (v[:, 2] > 0).all() and (v[:, 2] <= d).all()


def test_mosaic_box_stays_inside_source_region():
    """A box fully inside its source image maps inside that source's
    quadrant on the canvas (checked via the pixel value at the box
    center, which tags the source image)."""
    from realtimeobjectdetection_tpu.train.augment import mosaic_batch
    b, d = 4, 64
    imgs = np.zeros((b, d, d, 3), np.float32)
    for i in range(b):
        imgs[i] = (i + 1) / 10.0
    boxes = np.zeros((b, 2, 85), np.float32)
    mask = np.zeros((b, 2), bool)
    for i in range(b):
        boxes[i, 0, :4] = [20, 40, 16, 16]
        boxes[i, 0, 4] = 1.0
        boxes[i, 0, 5] = 1.0
        mask[i, 0] = True
    out, nb, nm = jax.jit(mosaic_batch)(
        jax.random.PRNGKey(3), jnp.asarray(imgs), jnp.asarray(boxes),
        jnp.asarray(mask))
    out, nb, nm = np.asarray(out), np.asarray(nb), np.asarray(nm)
    for i in range(b):
        for r in nb[i][nm[i]]:
            px = out[i, min(int(r[1]), d - 1), min(int(r[0]), d - 1), 0]
            assert min(abs(px - (j + 1) / 10.0) for j in range(b)) < 1e-5


def test_cosine_schedule_v5_shape():
    from realtimeobjectdetection_tpu.train.schedule import \
        cosine_schedule_v5
    base, epochs, spe = 0.01, 10, 100
    s = cosine_schedule_v5(base, epochs, spe, warmup_epochs=3, lrf=0.01)
    lr0 = float(s(0))
    lr_warm_mid = float(s(150))
    lr_after_warm = float(s(300))
    lr_mid = float(s(5 * spe))
    lr_end = float(s(10 * spe))
    assert lr0 == pytest.approx(0.0, abs=1e-9)          # warmup from 0
    assert 0 < lr_warm_mid < lr_after_warm               # ramping up
    assert lr_after_warm == pytest.approx(
        base * (0.01 + 0.99 * 0.5 * (1 + np.cos(np.pi * 3 / 10))),
        rel=1e-3)
    assert lr_mid == pytest.approx(base * (0.01 + 0.99 * 0.5), rel=1e-3)
    assert lr_end == pytest.approx(base * 0.01, rel=1e-3)  # floor = lrf
    assert float(s(12 * spe)) == pytest.approx(base * 0.01, rel=1e-3)


def test_v5_step_with_mosaic_and_bf16_runs():
    """The full recipe step (mosaic + flip/HSV + bf16 MXU compute)
    compiles and produces a finite loss with grads applied."""
    cfg = YoloV5Config("n", num_classes=4)
    opt = optax.adam(1e-3)
    step = jax.jit(make_train_step_v5(
        cfg, opt, resolution=64, compute_dtype=jnp.bfloat16,
        augment=True, mosaic=True))
    params = init_yolov5_params(cfg, 0, batch_norm=True)
    state = init_train_state(params, opt)
    rng = np.random.RandomState(0)
    imgs = rng.rand(4, 64, 64, 3).astype(np.float32)
    boxes = np.zeros((4, 4, 9), np.float32)
    boxes[:, 0, :4] = [32, 32, 24, 24]
    boxes[:, 0, 4] = 1.0
    boxes[:, 0, 5] = 1.0
    mask = np.zeros((4, 4), bool)
    mask[:, 0] = True
    state2, loss = step(state, jnp.asarray(imgs), jnp.asarray(boxes),
                        jnp.asarray(mask))
    assert np.isfinite(float(loss))
    assert int(state2.step) == 1
    # params actually moved
    d0 = np.asarray(state.params["m0"]["w"])
    d1 = np.asarray(state2.params["m0"]["w"])
    assert not np.allclose(d0, d1)


def test_trainer_v5_cosine_recipe(tmp_path):
    """TrainerV5 with the full ultralytics-recipe flags: cosine LR is
    resolved at train() (same opt_state structure) and the loop runs."""
    from realtimeobjectdetection_tpu.testing import make_synthetic_coco
    from realtimeobjectdetection_tpu.train.v5 import TrainerV5
    ann, imgs = make_synthetic_coco(tmp_path, n_images=4, img_size=(64, 64))
    tr = TrainerV5(model_size="n", epochs=2, batch_size=2, resolution=64,
                   num_classes=80, out_dir=str(tmp_path / "w"),
                   mosaic=True, augment=True, lr_schedule="cosine",
                   warmup_epochs=1.0, mesh=False)
    hist = tr.train(ann, imgs, verbose=False)
    assert len(hist["train_loss"]) == 2
    assert all(np.isfinite(v) for v in hist["train_loss"])
    assert tr._lr_schedule == "resolved"


def test_trainer_v5_preempt(tmp_path):
    """TrainerV5 shares the SIGTERM-safe preempt tier (train/preempt.py):
    a pending request exits after one batch with the 'preempt'
    checkpoint + sidecar written; restore continues from step 1."""
    import json
    import os
    from realtimeobjectdetection_tpu.testing import make_synthetic_coco
    from realtimeobjectdetection_tpu.train.v5 import TrainerV5
    ann, imgs = make_synthetic_coco(tmp_path, n_images=4,
                                    img_size=(96, 128))
    out = str(tmp_path / "w5")
    tr = TrainerV5(model_size="n", epochs=2, batch_size=2, resolution=96,
                   lr=1e-3, out_dir=out, max_boxes=8, mesh=False)
    tr.request_preempt()
    tr.train(ann, imgs, dataset_type="COCO", verbose=False)
    assert int(tr.state.step) == 1
    assert os.path.isdir(os.path.join(out, "preempt"))
    meta = json.load(open(os.path.join(out, "preempt.json")))
    assert meta == {"epoch": 1, "batch": 1, "step": 1}
    tr2 = TrainerV5(model_size="n", epochs=1, batch_size=2, resolution=96,
                    lr=1e-3, out_dir=out, max_boxes=8, mesh=False)
    tr2.restore(os.path.join(out, "preempt"))
    assert int(tr2.state.step) == 1


def test_v5_step_accum_matches_manual_sum():
    """make_train_step_v5(accum_steps=2) == manually accumulating the
    two microbatch halves (per-half batch-stats forward, summed grads,
    one update) — ultralytics gradient-accumulation semantics; SGD so
    the update is linear in the grads.  Loss is the sum of the two
    per-microbatch normalized losses."""
    cfg = YoloV5Config("n")
    reso = 64
    params = init_yolov5_params(cfg, 0, batch_norm=True)
    sgd = optax.sgd(1e-3)
    step = jax.jit(make_train_step_v5(cfg, sgd, resolution=reso,
                                      update_bn_stats=False,
                                      accum_steps=2))
    fwd = make_yolov5_forward(cfg, compute_dtype=jnp.float32,
                              bn_mode="batch", return_stats=True)

    @jax.jit
    def micro(p, im, bx, om):
        def lf(pp):
            heads, _ = fwd(pp, im)
            total, _ = yolo_loss_v5(heads, bx, om, 80, reso)
            return total
        return jax.value_and_grad(lf)(p)

    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.rand(4, reso, reso, 3), jnp.float32)
    boxes, mask = _gt(batch=4, m=6)
    boxes[:, :2, 0:2] = rng.uniform(16, 48, (4, 2, 2))
    boxes[:, :2, 2:4] = rng.uniform(10, 30, (4, 2, 2))
    boxes[:, :2, 4] = boxes[:, :2, 5] = 1.0
    mask[:, :2] = True
    boxes, mask = jnp.asarray(boxes), jnp.asarray(mask)

    state = init_train_state(params, sgd)
    s1, loss = step(state, images, boxes, mask)

    total, g_acc = 0.0, None
    for m in range(2):
        sl = slice(2 * m, 2 * (m + 1))
        l_m, g_m = micro(params, images[sl], boxes[sl], mask[sl])
        total = total + l_m
        g_acc = g_m if g_acc is None else jax.tree_util.tree_map(
            jnp.add, g_acc, g_m)
    u, _ = sgd.update(g_acc, sgd.init(params), params)
    ref_p = optax.apply_updates(params, u)
    np.testing.assert_allclose(float(loss), float(total), rtol=1e-6)
    ref_leaves = jax.tree_util.tree_leaves_with_path(ref_p)
    got_flat = {jax.tree_util.keystr(k): v for k, v in
                jax.tree_util.tree_leaves_with_path(s1.params)}
    assert len(ref_leaves) == len(got_flat)
    for k, v in ref_leaves:
        np.testing.assert_allclose(
            np.asarray(got_flat[jax.tree_util.keystr(k)]),
            np.asarray(v), rtol=1e-5, atol=2e-6,
            err_msg=jax.tree_util.keystr(k))


def test_trainer_v5_multiscale(tmp_path):
    """TrainerV5 multiscale: same machinery as DarknetTrainer — loader
    fixed at the base resolution, per-scale jitted steps rescale
    in-graph, every scale prewarmed before epoch 1."""
    from realtimeobjectdetection_tpu.testing import make_synthetic_coco
    from realtimeobjectdetection_tpu.train.v5 import TrainerV5
    ann, imgs = make_synthetic_coco(tmp_path, n_images=4,
                                    img_size=(96, 128))
    tr = TrainerV5(model_size="n", epochs=1, batch_size=2, resolution=96,
                   lr=1e-3, out_dir=str(tmp_path / "w5"), max_boxes=8,
                   mesh=False, multiscale=True,
                   multiscale_scales=(64, 96, 128), multiscale_every=1)
    hist = tr.train(ann, imgs, dataset_type="COCO", verbose=False)
    assert tr._prewarmed
    assert set(tr._step_cache) == {(64, 1), (96, 1), (128, 1)}
    assert np.isfinite(hist["train_loss"][0])


def test_v5_step_skip_nonfinite_guard():
    """make_train_step_v5(skip_nonfinite=True): a NaN batch leaves every
    state leaf except the step counter bit-identical; a healthy batch is
    unaffected by the guard (shared train/step._guard_nonfinite)."""
    cfg = YoloV5Config("n")
    params = init_yolov5_params(cfg, 0, batch_norm=True)
    opt = optax.adam(1e-3)
    plain = jax.jit(make_train_step_v5(cfg, opt, resolution=96))
    guarded = jax.jit(make_train_step_v5(cfg, opt, resolution=96,
                                         skip_nonfinite=True))
    s0 = init_train_state(params, opt)
    rng = np.random.RandomState(0)
    images = rng.rand(2, 96, 96, 3).astype(np.float32)
    boxes, mask = _gt(batch=2, m=4)
    boxes[:, 0, 0:4] = [48, 48, 24, 24]
    boxes[:, 0, 4] = 1.0
    boxes[:, 0, 5] = 1.0
    mask[:, 0] = True

    sp, lp = plain(s0, jnp.asarray(images), jnp.asarray(boxes),
                   jnp.asarray(mask))
    sg, lg = guarded(s0, jnp.asarray(images), jnp.asarray(boxes),
                     jnp.asarray(mask))
    # allow 1-ULP fp32 drift from the guard's where-selects changing
    # XLA fusion (same rationale as the darknet guard test)
    np.testing.assert_allclose(float(lg), float(lp), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), rtol=1e-5,
                                                atol=1e-6), sp, sg)

    bad = images.copy()
    bad[0, 0, 0, 0] = np.nan
    sb, lb = guarded(s0, jnp.asarray(bad), jnp.asarray(boxes),
                     jnp.asarray(mask))
    assert not np.isfinite(float(lb))
    assert int(sb.step) == int(s0.step) + 1
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        sb.params, s0.params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        sb.opt_state, s0.opt_state)


def test_v5_step_scan_ladders_equivalence():
    """make_train_step_v5(scan_ladders=True): one full step (fwd +
    targets + loss + bwd + Adam + BN running-stat update) lands within
    fp32 fusion tolerance of the unrolled step — params, BN stats, and
    loss all close, so the rolled program is a drop-in for yolov5l/x
    training where the unrolled HLO is depth-times larger."""
    cfg = YoloV5Config("n")
    params = init_yolov5_params(cfg, 0, batch_norm=True)
    opt = optax.adam(1e-3)
    s0 = init_train_state(params, opt)
    rng = np.random.RandomState(1)
    images = rng.rand(2, 96, 96, 3).astype(np.float32)
    boxes, mask = _gt(batch=2, m=4)
    boxes[:, 0, 0:4] = [48, 48, 24, 24]
    boxes[:, 0, 4] = 1.0
    boxes[:, 0, 5] = 1.0
    mask[:, 0] = True
    outs = []
    for scan in (False, True):
        step = jax.jit(make_train_step_v5(cfg, opt, resolution=96,
                                          scan_ladders=scan,
                                          scan_remat=scan))
        s1, loss = step(s0, jnp.asarray(images), jnp.asarray(boxes),
                        jnp.asarray(mask))
        outs.append((s1, float(loss)))
    (su, lu), (sr, lr) = outs
    np.testing.assert_allclose(lr, lu, rtol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), rtol=2e-3,
                                                atol=2e-5),
        su.params, sr.params)


def test_v5_step_bf16_activation_residency():
    """make_train_step_v5(activation_dtype=bf16): runs, loss within bf16
    drift of the fp32-resident step, fp32 master weights, stats move."""
    cfg = YoloV5Config("n")
    params = init_yolov5_params(cfg, 0, batch_norm=True)
    opt = optax.adam(1e-3)
    s0 = init_train_state(params, opt)
    rng = np.random.RandomState(2)
    images = rng.rand(2, 96, 96, 3).astype(np.float32)
    boxes, mask = _gt(batch=2, m=4)
    boxes[:, 0, 0:4] = [48, 48, 24, 24]
    boxes[:, 0, 4] = 1.0
    boxes[:, 0, 5] = 1.0
    mask[:, 0] = True
    losses = {}
    final = None
    for name, adt in (("fp32", None), ("bf16", jnp.bfloat16)):
        step = jax.jit(make_train_step_v5(cfg, opt, resolution=96,
                                          activation_dtype=adt))
        s1, loss = step(s0, jnp.asarray(images), jnp.asarray(boxes),
                        jnp.asarray(mask))
        losses[name] = float(loss)
        if name == "bf16":
            final = s1
    assert np.isfinite(losses["bf16"])
    np.testing.assert_allclose(losses["bf16"], losses["fp32"], rtol=0.05)
    for leaf in jax.tree_util.tree_leaves(final.params):
        assert leaf.dtype == jnp.float32
        assert np.isfinite(np.asarray(leaf)).all()
    assert float(jnp.abs(jnp.asarray(
        final.params["m0"]["bn_mean"])).max()) > 0


def test_v5_step_s2d_stem_gradient_exact():
    """make_train_step_v5(s2d_stem=True): the space-to-depth stem
    rewrite happens on p["w"] INSIDE the trace, so the gradient maps
    back onto the original 6x6 parameter — one full step (fwd + targets
    + loss + bwd + Adam + BN stats) matches the plain-stem step to fp
    summation-order tolerance (models/yolov5._stem_s2d)."""
    cfg = YoloV5Config("n")
    params = init_yolov5_params(cfg, 0, batch_norm=True)
    opt = optax.adam(1e-3)
    s0 = init_train_state(params, opt)
    rng = np.random.RandomState(3)
    images = rng.rand(2, 96, 96, 3).astype(np.float32)
    boxes, mask = _gt(batch=2, m=4)
    boxes[:, 0, 0:4] = [48, 48, 24, 24]
    boxes[:, 0, 4] = 1.0
    boxes[:, 0, 5] = 1.0
    mask[:, 0] = True
    outs = []
    for s2d in (False, True):
        step = jax.jit(make_train_step_v5(cfg, opt, resolution=96,
                                          s2d_stem=s2d))
        s1, loss = step(s0, jnp.asarray(images), jnp.asarray(boxes),
                        jnp.asarray(mask))
        outs.append((s1, float(loss)))
    (sp, lp), (ss, ls) = outs
    np.testing.assert_allclose(ls, lp, rtol=1e-5)
    # stem param shape is unchanged (6x6 kernel) and its update matches.
    # atol: Adam's g/(sqrt(v)+eps) is sign-like for near-zero grads, so
    # fp summation-order drift can move a single update by up to 2*lr
    # (2e-3 here) — the loss check above is the tight gate.
    assert ss.params["m0"]["w"].shape == sp.params["m0"]["w"].shape
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), rtol=2e-3,
                                                atol=2.5e-3),
        sp.params, ss.params)


def test_v5_step_onepass_stats_close():
    """make_train_step_v5(onepass_stats=True): BN batch stats via the
    one-pass E[x²]−E[x]² form (models/yolov5 bn_mode="batch1p" — one
    fused read of each conv output instead of two).  Same-fp32-input
    values differ from the torch-matching deviation form only by
    cancellation, so the full step (loss, params, running stats) must
    land within fp32 tolerance of the two-pass step — the round-5
    stat-reduce A/B lever (VERDICT r4 item 7)."""
    cfg = YoloV5Config("n")
    params = init_yolov5_params(cfg, 0, batch_norm=True)
    opt = optax.adam(1e-3)
    s0 = init_train_state(params, opt)
    rng = np.random.RandomState(3)
    images = rng.rand(2, 96, 96, 3).astype(np.float32)
    boxes, mask = _gt(batch=2, m=4)
    boxes[:, 0, 0:4] = [48, 48, 24, 24]
    boxes[:, 0, 4] = 1.0
    boxes[:, 0, 5] = 1.0
    mask[:, 0] = True
    outs = []
    for onepass in (False, True):
        step = jax.jit(make_train_step_v5(cfg, opt, resolution=96,
                                          onepass_stats=onepass))
        s1, loss = step(s0, jnp.asarray(images), jnp.asarray(boxes),
                        jnp.asarray(mask))
        outs.append((s1, float(loss)))
    (s2p, l2p), (s1p, l1p) = outs
    np.testing.assert_allclose(l1p, l2p, rtol=1e-4)
    # running BN variances moved and stayed positive (one-pass
    # cancellation must not produce negative variances at these scales)
    for name, p in s1p.params.items():
        if isinstance(p, dict) and "bn_var" in p:
            assert (np.asarray(p["bn_var"]) > 0).all(), name
    # Adam's sign-like near-zero updates: same atol rationale as the
    # s2d gradient-exactness test above
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), rtol=2e-3,
                                                atol=2.5e-3),
        s2p.params, s1p.params)
