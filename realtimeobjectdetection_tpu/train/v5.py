"""YOLOv5 training: ultralytics-semantics loss + jittable train step.

The reference never trains v5 — it consumes ultralytics checkpoints via
torch.hub (/root/reference/detect.py:258).  A complete framework must be
able to train the model family it serves, so this module implements the
ultralytics v6.x ``ComputeLoss``/``build_targets`` semantics TPU-first:
the per-gt Python loops and boolean-mask indexing of the original become
fixed-shape candidate tensors (``[B, M, A, S]`` — M padded gt rows, A=3
anchors, S=5 cell slots) with validity masks, so the whole step is one
XLA program shardable with the same ('data','space') mesh as the
darknet step (parallel/mesh.shard_train_step).

Semantics implemented (ultralytics yolov5 utils/loss.py, v6.x defaults):

* anchor filter: keep (gt, anchor) iff ``max(wh/anchor, anchor/wh) <
  anchor_t`` (4.0) — no best-anchor argmax, all passing anchors train;
* cell slots: center + the four half-cell-offset neighbors with the
  exact ultralytics gates (``gxy%1 < 0.5 & gxy > 1`` and the inverse-
  coordinate mirror), ``gij = floor(gxy - offset)`` so the xy target
  lives in (-0.5, 1.5) matching ``sigmoid*2-0.5``;
* box: CIoU between decoded pred (``xy=2σ-0.5``, ``wh=(2σ)²·anchor``)
  and the gt in grid units, ``lbox = mean(1 - CIoU)`` per layer;
* obj: BCE over the full grid against ``tobj`` = CIoU (detached,
  clamped ≥0) scattered at assigned cells, weighted by the layer
  balance [4.0, 1.0, 0.4];
* cls: BCE at assigned rows vs one-hot (cp=1, cn=0), only when nc > 1;
* weights box 0.05 / obj 1.0·(imgsz/640)² / cls 0.5·nc/80, total
  scaled by the batch size (ultralytics returns loss * bs).

Deviation (documented): where several assignments land on the same
(cell, anchor), ultralytics' in-order writes keep the last gt's IoU in
``tobj``; the scatter here keeps the max.  lbox/lcls count duplicates
exactly like ultralytics (every assignment row contributes).

Gt boxes ride the repo-wide training convention (train/step.py): padded
``[B, M, 5+C]`` rows, xywh center-format in PIXELS at the train
resolution, col 4 objectness flag, cols 5: one-hot class.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.yolov5 import (BN_MOMENTUM_V5, V5_ANCHORS, V5_STRIDES,
                             YoloV5Config, make_yolov5_forward)
from .preempt import PreemptSupport
from .step import EmaTrainState, TrainState, init_train_state

__all__ = ["build_targets_v5", "yolo_loss_v5", "make_train_step_v5",
           "update_running_stats_v5", "TrainerV5"]

# ultralytics hyp.scratch-low.yaml defaults
ANCHOR_T = 4.0
BALANCE = (4.0, 1.0, 0.4)
W_BOX, W_OBJ, W_CLS = 0.05, 1.0, 0.5

# cell-slot offsets (in cells, scaled by g=0.5): center, left, up,
# right, down — ultralytics ComputeLoss.build_targets `off` table
_OFFSETS = np.array([[0.0, 0.0], [0.5, 0.0], [0.0, 0.5],
                     [-0.5, 0.0], [0.0, -0.5]], np.float32)


def _ciou(pxy, pwh, txy, twh, eps=1e-7):
    """CIoU on xywh boxes (grid units) — ultralytics metrics.bbox_iou."""
    px1, px2 = pxy[..., 0] - pwh[..., 0] / 2, pxy[..., 0] + pwh[..., 0] / 2
    py1, py2 = pxy[..., 1] - pwh[..., 1] / 2, pxy[..., 1] + pwh[..., 1] / 2
    tx1, tx2 = txy[..., 0] - twh[..., 0] / 2, txy[..., 0] + twh[..., 0] / 2
    ty1, ty2 = txy[..., 1] - twh[..., 1] / 2, txy[..., 1] + twh[..., 1] / 2
    iw = jnp.clip(jnp.minimum(px2, tx2) - jnp.maximum(px1, tx1), 0)
    ih = jnp.clip(jnp.minimum(py2, ty2) - jnp.maximum(py1, ty1), 0)
    inter = iw * ih
    union = (pwh[..., 0] * pwh[..., 1] + twh[..., 0] * twh[..., 1]
             - inter + eps)
    iou = inter / union
    cw = jnp.maximum(px2, tx2) - jnp.minimum(px1, tx1)
    ch = jnp.maximum(py2, ty2) - jnp.minimum(py1, ty1)
    c2 = cw * cw + ch * ch + eps
    rho2 = (jnp.square(txy[..., 0] - pxy[..., 0])
            + jnp.square(txy[..., 1] - pxy[..., 1]))
    v = (4.0 / np.pi ** 2) * jnp.square(
        jnp.arctan(twh[..., 0] / (twh[..., 1] + eps))
        - jnp.arctan(pwh[..., 0] / (pwh[..., 1] + eps)))
    alpha = v / (v - iou + (1.0 + eps))
    alpha = jax.lax.stop_gradient(alpha)  # ultralytics: alpha no-grad
    return iou - (rho2 / c2 + v * alpha)


def _bce_logits(logits, targets, reduce=None):
    """Numerically-stable BCEWithLogits (mean if reduce='mean')."""
    l = jnp.clip(logits, -60, 60)
    loss = jnp.maximum(l, 0) - l * targets + jnp.log1p(jnp.exp(-jnp.abs(l)))
    return loss.mean() if reduce == "mean" else loss


def build_targets_v5(boxes: jnp.ndarray, box_mask: jnp.ndarray,
                     grid: int, stride: int,
                     anchors_px, anchor_t: float = ANCHOR_T):
    """One layer's fixed-shape assignment tensors.

    Returns dict of ``[B, M, A, S]``-shaped arrays: ``valid`` mask,
    ``flat`` index into the ``G*G*A`` decode-ordered grid, ``txy``
    (gxy - gij, the sigmoid*2-0.5 regression target), ``twh`` (gt wh in
    grid units), ``anc`` (anchor wh in grid units), ``cls`` (int class).
    """
    b, m = boxes.shape[0], boxes.shape[1]
    anc = jnp.asarray(np.asarray(anchors_px, np.float32) / stride)  # [A,2]
    a = anc.shape[0]
    s = _OFFSETS.shape[0]

    gxy = boxes[..., 0:2] / stride                     # [B, M, 2]
    gwh = boxes[..., 2:4] / stride
    cls = jnp.argmax(boxes[..., 5:], axis=-1)          # [B, M]

    r = gwh[:, :, None, :] / anc[None, None, :, :]     # [B, M, A, 2]
    anc_ok = jnp.max(jnp.maximum(r, 1.0 / r), axis=-1) < anchor_t
    gt_ok = box_mask & (boxes[..., 4] > 0) \
        & (gwh[..., 0] > 0) & (gwh[..., 1] > 0)        # [B, M]

    off = jnp.asarray(_OFFSETS)                        # [S, 2]
    gij = jnp.floor(gxy[:, :, None, :] - off[None, None, :, :])  # [B,M,S,2]
    fx, fy = gxy[..., 0] % 1.0, gxy[..., 1] % 1.0
    gx, gy = gxy[..., 0], gxy[..., 1]
    slot_ok = jnp.stack([
        jnp.ones_like(fx, bool),
        (fx < 0.5) & (gx > 1.0),                         # left
        (fy < 0.5) & (gy > 1.0),                         # up
        ((grid - gx) % 1.0 < 0.5) & (grid - gx > 1.0),   # right
        ((grid - gy) % 1.0 < 0.5) & (grid - gy > 1.0),   # down
    ], axis=-1)                                          # [B, M, S]
    # ultralytics clamps gij into [0, grid-1] and KEEPS the assignment
    # (``gij.clamp_(0, gain-1)``) — a gt centered exactly on the
    # right/bottom image edge (gxy == grid) trains the last cell.  The
    # slot gates above already bound the four offset slots, so the only
    # rows the clamp moves are those edge centers.  (ADVICE r2: an
    # earlier in_bounds mask silently dropped them.)
    valid = (gt_ok[:, :, None, None] & anc_ok[:, :, :, None]
             & slot_ok[:, :, None, :])                   # [B, M, A, S]

    gij_c = jnp.clip(gij, 0, grid - 1).astype(jnp.int32)  # [B, M, S, 2]
    cell = gij_c[..., 1] * grid + gij_c[..., 0]           # [B, M, S]
    flat = (cell[:, :, None, :] * a
            + jnp.arange(a, dtype=jnp.int32)[None, None, :, None])
    txy = gxy[:, :, None, None, :] - gij_c[:, :, None, :, :]  # [B,M,1,S,2]
    txy = jnp.broadcast_to(txy, (b, m, a, s, 2))
    twh = jnp.broadcast_to(gwh[:, :, None, None, :], (b, m, a, s, 2))
    anc_b = jnp.broadcast_to(anc[None, None, :, None, :], (b, m, a, s, 2))
    cls_b = jnp.broadcast_to(cls[:, :, None, None], (b, m, a, s))
    return {"valid": valid, "flat": flat, "txy": txy, "twh": twh,
            "anc": anc_b, "cls": cls_b}


def yolo_loss_v5(heads: List[jnp.ndarray], boxes: jnp.ndarray,
                 box_mask: jnp.ndarray, num_classes: int,
                 resolution: int, anchors=V5_ANCHORS,
                 strides=V5_STRIDES,
                 grid_native: bool = True) -> Tuple[jnp.ndarray, Dict]:
    """Total ultralytics-semantics loss over the three detect layers.

    ``grid_native=True`` (default): consume each head in its native
    NHWC layout — obj logits via one strided channel slice, the ~K
    matched rows via two small gathers, the f32 cast AFTER the gather.
    The legacy path (``False``) reshaped+cast the FULL head to
    f32 [B, G*G*A, 85] first, which at bs=128 640² cost ~22 ms/step of
    pure layout copies plus a 4.3 ms f32[85, B*N] materialization
    (13%+ of device time — the round-4 v5 train per-HLO drill-down in
    PERFORMANCE.md).  Both paths see identical logits (bf16→f32
    widening is exact, so gather-then-cast == cast-then-gather); only
    fp reduction order differs.  Equality pinned in
    tests/test_train_v5.py.
    """
    b = heads[0].shape[0]
    c = 5 + num_classes
    lbox = lobj = lcls = 0.0
    for li, (head, anc, stride) in enumerate(zip(heads, anchors, strides)):
        g = head.shape[1]
        a = len(anc)
        t = build_targets_v5(boxes, box_mask, g, stride, anc)
        valid = t["valid"].reshape(b, -1)                 # [B, K]
        flat = t["flat"].reshape(b, -1)
        k = flat.shape[1]

        if grid_native:
            # head stays [B, g, g, a*c]; flat = (y*g + x)*a + anchor.
            cell = flat // a                              # [B, K]
            aidx = flat % a
            p2 = head.reshape(b, g * g, a * c)            # layout-free
            rows_full = jnp.take_along_axis(
                p2, cell[..., None], axis=1)              # [B, K, a*c]
            # Select the anchor's 85-col window by gathering along a
            # separate anchor AXIS (window gather, cheap scatter-window
            # backward).  A per-element column gather here is a trap:
            # its backward is a 2.6M-update scatter-add that XLA:TPU
            # lowers via sort — measured 58 ms/layer at bs=128 (round-4
            # profile) vs ~0 for this form.
            rows4 = rows_full.reshape(b, k, a, c)
            rows = jnp.take_along_axis(
                rows4, aidx[:, :, None, None], axis=2)[:, :, 0, :]
            rows = rows.astype(jnp.float32)
            obj_logits = head[..., 4::c].astype(jnp.float32)  # [B,g,g,a]
        else:
            p = head.reshape(b, g * g * a, c).astype(jnp.float32)
            rows = jnp.take_along_axis(p, flat[..., None], axis=1)
            obj_logits = p[..., 4]                        # [B, G*G*A]

        pxy = jax.nn.sigmoid(rows[..., 0:2]) * 2.0 - 0.5
        pwh = jnp.square(jax.nn.sigmoid(rows[..., 2:4]) * 2.0) \
            * t["anc"].reshape(b, k, 2)
        iou = _ciou(pxy, pwh, t["txy"].reshape(b, k, 2),
                    t["twh"].reshape(b, k, 2))            # [B, K]
        n = jnp.maximum(valid.sum(), 1)
        lbox = lbox + (jnp.where(valid, 1.0 - iou, 0.0).sum() / n)

        # obj targets: detached CIoU (gr=1), max at collisions
        tobj_upd = jnp.where(
            valid, jnp.clip(jax.lax.stop_gradient(iou), 0.0), -1.0)
        if grid_native:
            gy, gx = cell // g, cell % g
            tobj = jnp.zeros((b, g, g, a), jnp.float32)
            tobj = tobj.at[jnp.arange(b)[:, None], gy, gx, aidx].max(
                tobj_upd)
        else:
            tobj = jnp.zeros((b, g * g * a), jnp.float32)
            tobj = tobj.at[jnp.arange(b)[:, None], flat].max(tobj_upd)
        lobj = lobj + _bce_logits(obj_logits, tobj, "mean") * BALANCE[li]

        if num_classes > 1:
            onehot = jax.nn.one_hot(t["cls"].reshape(b, k), num_classes)
            ce = _bce_logits(rows[..., 5:], onehot)       # [B, K, nc]
            lcls = lcls + (jnp.where(valid[..., None], ce, 0.0).sum()
                           / (n * num_classes))

    w_obj = W_OBJ * (resolution / 640.0) ** 2
    total = (lbox * W_BOX + lobj * w_obj
             + lcls * W_CLS * num_classes / 80.0) * b
    return total, {"box": lbox, "obj": lobj, "cls": lcls}


def _walk(tree, path: str):
    node = tree
    for seg in path.split("."):
        if isinstance(node, dict) and seg in node:
            node = node[seg]
        else:  # bottleneck list: "m<j>" inside a C3
            node = node["m"][int(seg[1:])]
    return node


def update_running_stats_v5(params, stats: Dict, n_per_channel: int,
                            momentum: float = BN_MOMENTUM_V5):
    """Running-mean/var update (ultralytics BatchNorm2d momentum 0.03,
    unbiased variance for the running estimate, like torch)."""
    unbias = n_per_channel / max(n_per_channel - 1, 1)
    new = _deep_copy_containers(params)  # containers copied, leaves shared
    for path, (mean, var) in stats.items():
        entry = _walk(new, path)
        entry["bn_mean"] = (1 - momentum) * entry["bn_mean"] \
            + momentum * mean
        entry["bn_var"] = (1 - momentum) * entry["bn_var"] \
            + momentum * var * unbias
    return new


def _deep_copy_containers(node):
    """Copy dict/list structure (leaves shared) so in-place path updates
    don't alias the input pytree."""
    if isinstance(node, dict):
        return {k: _deep_copy_containers(v) for k, v in node.items()}
    if isinstance(node, list):
        return [_deep_copy_containers(v) for v in node]
    return node


def make_train_step_v5(cfg: YoloV5Config, optimizer,
                       resolution: int = 640,
                       compute_dtype=jnp.float32,
                       update_bn_stats: bool = True,
                       ema_decay: Optional[float] = None,
                       augment: bool = False, aug_seed: int = 0,
                       aug_kwargs: Optional[Dict] = None,
                       mosaic: bool = False,
                       input_resolution: Optional[int] = None,
                       accum_steps: int = 1,
                       skip_nonfinite: bool = False,
                       scan_ladders: bool = False,
                       scan_remat: bool = False,
                       activation_dtype=None,
                       s2d_stem: bool = False,
                       grid_native_loss: bool = True,
                       onepass_stats: bool = False):
    """Build ``step(state, images, boxes, box_mask) -> (state, loss)``
    for the native v5 graph — same contract as train/step.py's darknet
    step, so ``parallel.mesh.shard_train_step`` shards it unchanged.

    ``images``: [B, H, W, 3] float 0-1; ``boxes``: [B, M, 5+C] padded gt
    rows (pixels at ``resolution``); ``box_mask``: [B, M] bool.
    ``augment``: the in-graph flip/HSV augmentation shared with the
    darknet step (train/augment.py, model-agnostic).
    ``mosaic``: the in-graph 4-image mosaic (train/augment.mosaic_batch
    — the ultralytics recipe ingredient the hub checkpoints were trained
    with, rebuilt with static shapes), applied before flip/HSV.
    ``input_resolution``: when it differs from ``resolution``, the batch
    is bilinearly rescaled in-graph with the boxes scaled to match —
    the multi-scale training mode shared with the darknet step (loader
    stays fixed-shape at the base resolution).
    ``accum_steps=k``: in-graph gradient accumulation (lax.scan over k
    microbatches, peak activation memory B/k, one optimizer update).
    The v5 loss normalizes by the microbatch's matched-anchor count, so
    summing per-microbatch gradients IS ultralytics' nominal-batch
    accumulation semantics (utils/torch_utils accumulate; same contract
    as PipelinedTrainStepV5's microbatching) — not bitwise full-batch
    equality.  BN batch stats are per microbatch, running stats apply
    the k updates in order.
    ``skip_nonfinite=True``: in-graph guard — a batch whose loss or any
    gradient leaf is inf/NaN leaves params/moments/BN-stats/EMA
    untouched (train/step._guard_nonfinite; same semantics and tests as
    the darknet step).
    ``scan_ladders``/``scan_remat``: roll the C3 bottleneck repeats into
    ``lax.scan`` (smaller HLO for the deep sizes; optional body remat) —
    see make_yolov5_forward; the batch statistics re-key to the unrolled
    names so the running-stat update below is layout-agnostic.
    ``grid_native_loss``: consume the heads in NHWC layout inside the
    loss (yolo_loss_v5 ``grid_native`` — kills the full-head flatten
    relayouts the round-4 per-HLO drill-down measured at 13%+ of
    device time); ``False`` restores the legacy full-flatten loss
    (same values to fp reduction order — equality test in
    tests/test_train_v5.py).
    ``s2d_stem``: exact space-to-depth rewrite of the 6x6/2 stem in the
    train forward (gradient-exact — the rewrite is a reshape of the
    same parameter; see the comment at the ``make_yolov5_forward``
    call below and PERFORMANCE.md for the measured verdict).
    """
    # activation_dtype=bfloat16: bf16 inter-layer residency in the train
    # forward (batch statistics are still computed from fp32 casts in
    # models/yolov5._conv); halves the activation bytes the backward
    # pass re-reads — the train twin of the serving fast path.
    # s2d_stem: train-side use of the exact 6x6/2 -> s2d+3x3/1 stem
    # rewrite (models/yolov5._stem_s2d).  The rearrangement happens on
    # p["w"] inside the trace, so autodiff maps the gradient back onto
    # the ORIGINAL 6x6 parameter — loss and grads are bit-equal to the
    # plain stem up to fp summation order.  Measured because the stem
    # BACKWARD is the train profile's single largest HLO (6% of device
    # time at bs=16; PERFORMANCE.md round-3 v5 train drill-down).
    # onepass_stats: BN batch stats via one-pass E[x²]−E[x]² (bn_mode
    # "batch1p") — halves the per-conv stat-read traffic the round-4
    # floor proof priced at ~18 ms/step; opt-in A/B lever (values differ
    # from the torch deviation form only by fp cancellation, but they DO
    # differ, so the parity default stays two-pass).
    fwd = make_yolov5_forward(cfg, compute_dtype=compute_dtype,
                              bn_mode="batch1p" if onepass_stats
                              else "batch", return_stats=True,
                              activation_dtype=activation_dtype,
                              scan_ladders=scan_ladders,
                              scan_remat=scan_remat,
                              s2d_stem=s2d_stem)
    nc = cfg.num_classes
    base = input_resolution or resolution

    def step(state, images, boxes, box_mask):
        if images.dtype == jnp.uint8:
            # uint8 canvases from the loaders' uint8 mode: on-device
            # /255, bit-identical to the host float path, 4x less
            # upload (see data/coco.py uint8 + train/step.py twin).
            images = images.astype(jnp.float32) / 255.0
        if base != resolution:
            bsz = images.shape[0]
            images = jax.image.resize(
                images, (bsz, resolution, resolution, images.shape[3]),
                "bilinear")
            boxes = boxes.at[..., 0:4].multiply(resolution / base)
        if mosaic:
            from .augment import mosaic_batch
            mkey = jax.random.fold_in(
                jax.random.PRNGKey(aug_seed + 7919), state.step)
            images, boxes, box_mask = mosaic_batch(mkey, images, boxes,
                                                   box_mask)
        if augment:
            from .augment import augment_batch
            key = jax.random.fold_in(jax.random.PRNGKey(aug_seed),
                                     state.step)
            images, boxes = augment_batch(key, images, boxes,
                                          **(aug_kwargs or {}))

        def loss_fn(params, images_, boxes_, mask_):
            heads, stats = fwd(params, images_)
            loss, _parts = yolo_loss_v5(heads, boxes_, mask_, nc,
                                        resolution,
                                        grid_native=grid_native_loss)
            return loss, stats

        bsz, h, w = images.shape[0], images.shape[1], images.shape[2]
        if accum_steps > 1:
            k = accum_steps
            assert bsz % k == 0, (bsz, k)
            mb = bsz // k

            def micro(g_acc, inp):
                im, bx, om = inp
                (l, st), g = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params, im, bx, om)
                return jax.tree_util.tree_map(jnp.add, g_acc, g), (l, st)

            g0 = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            grads, (losses, stats_stack) = jax.lax.scan(
                micro, g0,
                (images.reshape(k, mb, h, w, images.shape[3]),
                 boxes.reshape(k, mb, *boxes.shape[1:]),
                 box_mask.reshape(k, mb, box_mask.shape[1])))
            loss = losses.sum()
        else:
            (loss, stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, images, boxes,
                                       box_mask)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        if update_bn_stats:
            if accum_steps > 1:
                for i in range(accum_steps):  # k sequential EMA updates
                    params = update_running_stats_v5(
                        params,
                        jax.tree_util.tree_map(lambda s: s[i],
                                               stats_stack),
                        (bsz // accum_steps) * h * w)
            else:
                params = update_running_stats_v5(params, stats, bsz * h * w)
        if ema_decay is not None:
            ema = jax.tree_util.tree_map(
                lambda e, q: ema_decay * e + (1.0 - ema_decay) * q,
                state.ema_params, params)
            new_state = EmaTrainState(params=params, opt_state=opt_state,
                                      step=state.step + 1, ema_params=ema)
        else:
            new_state = TrainState(params=params, opt_state=opt_state,
                                   step=state.step + 1)
        if skip_nonfinite:
            from .step import _guard_nonfinite
            new_state = _guard_nonfinite(loss, grads, new_state, state)
        return new_state, loss

    return step


class TrainerV5(PreemptSupport):
    """Epoch-loop trainer for the native YOLOv5 graph.

    Mirrors DarknetTrainer's surface (same loaders, three checkpoint
    tiers ``weight_epoch<N>`` / ``checkpoint`` (best) / ``training_
    output``, orbax pytrees, optional EMA, optional ('data','space')
    mesh) for the model family the reference can only consume as a
    frozen hub checkpoint.  The folded deploy artifact is written next
    to each pytree as ``<name>.npz`` (inference layout, loadable by
    ``DetectorV5(weights_path=...)``).
    """

    def __init__(self, model_size: str = "s", epochs: int = 10,
                 batch_size: int = 16, resolution: int = 640,
                 num_classes: int = 80, lr: float = 1e-3,
                 out_dir: str = "weights_v5", max_boxes: int = 64,
                 seed: int = 42, mesh=None, spatial: bool = False,
                 compute_dtype=jnp.float32, resume: bool = False,
                 ema_decay: Optional[float] = None,
                 augment: bool = False, mosaic: bool = False,
                 lr_schedule: str = "constant",
                 warmup_epochs: float = 3.0, lrf: float = 0.01,
                 donate: bool = True,
                 best_on: str = "loss",
                 tensor_parallel: int = 1,
                 accum_steps: int = 1,
                 multiscale: bool = False,
                 multiscale_scales=(512, 640, 768),
                 multiscale_every: int = 10,
                 prewarm: bool = True,
                 skip_nonfinite: bool = False,
                 loss_lag: int = 1,
                 scan_ladders: bool = False,
                 scan_remat: bool = False,
                 activation_dtype=None,
                 s2d_stem: bool = False,
                 chain_steps: int = 1,
                 cache_dir: Optional[str] = None,
                 host_prep: str = "cv2",
                 onepass_stats: bool = False):
        from ..models.yolov5 import init_yolov5_params
        from ..parallel.mesh import make_mesh, shard_train_step
        assert resolution % 32 == 0
        assert best_on in ("loss", "map")
        assert lr_schedule in ("constant", "cosine")
        # canvas cache + native prep for the real loader (data/cache.py)
        self.cache_dir = cache_dir
        self.host_prep = host_prep
        self.cfg = YoloV5Config(model_size.lower(), num_classes)
        self.model_size = model_size.lower()
        self.num_classes = num_classes
        self.epochs = epochs
        self.batch_size = batch_size
        self.resolution = int(resolution)
        self.out_dir = out_dir
        self.max_boxes = max_boxes
        self.seed = seed
        self.ema_decay = ema_decay
        self.best_on = best_on
        self.history: Dict[str, List[float]] = {}
        # recipe knobs resolved when steps_per_epoch is known (train())
        self._lr = lr
        self._lr_schedule = lr_schedule
        self._warmup_epochs = warmup_epochs
        self._lrf = lrf
        assert batch_size % max(accum_steps, 1) == 0, \
            (batch_size, accum_steps)
        # skip_nonfinite: same in-graph bad-batch guard as DarknetTrainer
        # (train/step._guard_nonfinite) — skipped batches counted in
        # ``nonfinite_steps`` and excluded from the epoch loss
        self.skip_nonfinite = skip_nonfinite
        self.nonfinite_steps = 0
        # loss_lag: defer the per-batch loss readback (trainer._LaggedLoss)
        self.loss_lag = max(0, int(loss_lag))
        # chain_steps=k: k optimizer steps per device dispatch (see
        # DarknetTrainer chain_steps — same buffering, same {k, 1}
        # program bound).  Measured +21% at bs=128 640² on the v5s step
        # (PERFORMANCE.md "chained dispatch").  Composes with the mesh
        # (shard_train_step(chain=k): leading [k] axis replicated,
        # batch axis sharded; equality in tests/test_train_targets.py + test_parallel_tp.py).
        self.chain_steps = max(1, int(chain_steps))
        self._step_kwargs = dict(
            compute_dtype=compute_dtype,
            ema_decay=ema_decay, augment=augment, mosaic=mosaic,
            aug_seed=seed, accum_steps=max(accum_steps, 1),
            input_resolution=self.resolution,
            skip_nonfinite=skip_nonfinite,
            scan_ladders=scan_ladders, scan_remat=scan_remat,
            activation_dtype=activation_dtype,
            s2d_stem=s2d_stem,
            # one-pass E[x²]−E[x]² BN batch stats (bn_mode "batch1p"):
            # measured +8.5% step throughput at the record config (r5
            # A/B, PERFORMANCE.md); opt-in — stats differ from the
            # torch deviation form by fp cancellation only
            onepass_stats=onepass_stats)
        self._spatial = spatial
        self._donate = donate
        # multi-scale training, same machinery as DarknetTrainer: the
        # loader stays fixed-shape at the base resolution, per-scale
        # jitted steps rescale in-graph; one program per scale, all
        # prewarmed before epoch 1 (compile economics in trainer.py)
        self.multiscale = multiscale
        self.multiscale_every = multiscale_every
        self.prewarm = prewarm
        if multiscale:
            self._scales = sorted(int(r) for r in multiscale_scales)
            assert all(r % 32 == 0 for r in self._scales), multiscale_scales
            if self.resolution not in self._scales:
                self._scales.append(self.resolution)
        else:
            self._scales = [self.resolution]
        self._prewarmed = False

        params = init_yolov5_params(self.cfg, seed, batch_norm=True)
        # lr as a (constant) schedule so the opt_state structure stays
        # identical when _resolve_schedule swaps in the cosine one-cycle
        # (optax: scalar lr -> ScaleState, callable -> ScaleByScheduleState)
        self.optimizer = optax.adam(lambda count: lr)
        self.step_fn = make_train_step_v5(
            self.cfg, self.optimizer, resolution=self.resolution,
            **self._step_kwargs)
        # tensor_parallel=N: 'model' mesh axis (channel-sharded conv
        # kernels + ZeRO-sharded Adam state); incompatible with spatial
        # (parallel/mesh.make_mesh documents the partitioner miscompile)
        if mesh is None:
            n = len(jax.devices())
            if tensor_parallel > 1:
                assert not spatial and n % tensor_parallel == 0, \
                    (spatial, n, tensor_parallel)
                dp = n // tensor_parallel
                if batch_size % max(dp, 1) != 0:
                    # an explicit TP request must not silently degrade
                    # to unsharded single-device training (the user
                    # asked for sharded state to fit memory)
                    raise ValueError(
                        f"tensor_parallel={tensor_parallel} on {n} "
                        f"devices gives data={dp}; batch_size="
                        f"{batch_size} must be divisible by it")
                self.mesh = make_mesh(n, data=dp, model=tensor_parallel)
            else:
                self.mesh = make_mesh() if (n > 1 and
                                            batch_size % n == 0) else None
        else:
            self.mesh = mesh or None
        if (self.chain_steps > 1 and self.mesh is not None and spatial
                and "space" in self.mesh.axis_names
                and self.mesh.shape["space"] > 1):
            # fail at init, not at the first chained dispatch mid-epoch
            # (shard_train_step(chain=k) rejects spatial meshes — SPMD
            # BN-stat miscompile, see parallel/mesh.shard_train_step)
            raise ValueError(
                "chain_steps>1 cannot combine with a spatial-sharded "
                "mesh; use a data[*model] mesh or chain_steps=1")
        self._tp = (self.mesh is not None
                    and "model" in self.mesh.axis_names
                    and self.mesh.shape["model"] > 1)
        self.state = init_train_state(params, self.optimizer,
                                      ema_decay=ema_decay)
        if self._tp:
            from ..parallel.mesh import shard_params
            self.state = shard_params(self.state, self.mesh)
        self.step_jit = self._jit_step(self.step_fn)
        self._step_cache = {(self.resolution, 1): self.step_jit}
        if resume:
            import os
            self.restore(os.path.join(self.out_dir, "training_output"))

    def _jit_step(self, step_fn, chain: int = 1):
        # donate: in-place state update (see DarknetTrainer); the epoch
        # loop rebinds self.state every step, never reusing the input
        from ..parallel.mesh import shard_train_step
        if self.mesh is not None:
            return shard_train_step(step_fn, self.mesh,
                                    spatial=self._spatial,
                                    donate=self._donate,
                                    state=self.state if self._tp
                                    else None, chain=chain)
        return jax.jit(step_fn,
                       donate_argnums=(0,) if self._donate else ())

    def _resolve_schedule(self, steps_per_epoch: int):
        """Swap in the cosine one-cycle optimizer once steps_per_epoch is
        known (ultralytics defaults: 3-epoch linear warmup, lrf=0.01).
        optax.adam(schedule) has the same state structure as adam(lr), so
        the live (possibly restored) opt_state stays valid."""
        if self._lr_schedule != "cosine":
            return
        from .schedule import cosine_schedule_v5
        sched = cosine_schedule_v5(self._lr, self.epochs, steps_per_epoch,
                                   warmup_epochs=self._warmup_epochs,
                                   lrf=self._lrf)
        self.optimizer = optax.adam(sched)
        self.step_fn = make_train_step_v5(
            self.cfg, self.optimizer, resolution=self.resolution,
            **self._step_kwargs)
        self.step_jit = self._jit_step(self.step_fn)
        # the cached per-scale steps hold the old optimizer — drop them
        self._step_cache = {(self.resolution, 1): self.step_jit}
        self._prewarmed = False
        self._lr_schedule = "resolved"

    def _get_step(self, resolution: int, chain: int = 1):
        """Jitted train step for one target resolution (cached).
        ``chain>1``: k-steps-per-dispatch (train/step.make_chained_step;
        leading [k] input axis, replicated on a mesh)."""
        key = (resolution, chain)
        if key not in self._step_cache:
            fn = make_train_step_v5(self.cfg, self.optimizer,
                                    resolution=resolution,
                                    **self._step_kwargs)
            if chain > 1:
                from .step import make_chained_step
                fn = make_chained_step(fn, chain)
            self._step_cache[key] = self._jit_step(fn, chain=chain)
        return self._step_cache[key]

    def warm_step_cache(self, verbose: bool = True):
        """Compile-and-execute one dummy step per multi-scale resolution
        before epoch 1 (same compile economics as
        DarknetTrainer.warm_step_cache; state untouched)."""
        import time
        if self._prewarmed:
            return
        for r in sorted(set(self._scales)):
            t0 = time.time()
            step = self._get_step(r)
            # uint8: the loaders ship uint8 canvases (dtype is part of
            # the jit signature)
            imgs = jnp.zeros((self.batch_size, self.resolution,
                              self.resolution, 3), jnp.uint8)
            boxes = jnp.zeros((self.batch_size, self.max_boxes, 85),
                              jnp.float32)
            mask = jnp.zeros((self.batch_size, self.max_boxes), bool)
            warm_state = jax.tree_util.tree_map(jnp.array, self.state) \
                if self._donate else self.state
            _, loss = step(warm_state, imgs, boxes, mask)
            float(loss)  # host readback = true completion sync on axon
            if self.chain_steps > 1:
                k = self.chain_steps
                cstep = self._get_step(r, k)
                warm_state = jax.tree_util.tree_map(
                    jnp.array, self.state) if self._donate else self.state
                _, losses = cstep(
                    warm_state,
                    jnp.zeros((k,) + tuple(imgs.shape), imgs.dtype),
                    jnp.zeros((k,) + tuple(boxes.shape), boxes.dtype),
                    jnp.zeros((k,) + tuple(mask.shape), mask.dtype))
                float(losses[-1])
            if verbose and len(self._scales) > 1:
                print(f"\twarmed v5 step @ {r}x{r} in "
                      f"{time.time() - t0:.1f}s")
        self._prewarmed = True

    @property
    def eval_params(self):
        if isinstance(self.state, EmaTrainState):
            return self.state.ema_params
        return self.state.params

    def save(self, name: str):
        import os
        import orbax.checkpoint as ocp
        from ..models.yolov5 import fold_v5_batchnorm
        from ..utils.transfer import parallel_device_get
        path = os.path.abspath(os.path.join(self.out_dir, name))
        # parallel_device_get: ~6x faster than a monolithic device_get
        # through the tunnel (utils/transfer.py; measured in trainer.py
        # save)
        host_state = parallel_device_get(self.state)
        ocp.PyTreeCheckpointer().save(path, host_state, force=True)
        # deploy artifact: folded inference params, flat npz.
        # eval_params is a view into the state — fold the HOST copy
        # (pure numpy math) instead of pulling a second time.
        host_eval = (host_state.ema_params
                     if isinstance(host_state, EmaTrainState)
                     else host_state.params)
        folded = jax.device_get(fold_v5_batchnorm(host_eval))
        flat = {}

        def _dump(node, prefix):
            # "/"-separated keys: the models.yolov5._unflatten layout, so
            # DetectorV5(weights_path=<this .npz>) loads it directly
            if isinstance(node, dict):
                for k, v in node.items():
                    _dump(v, f"{prefix}/{k}" if prefix else k)
            elif isinstance(node, list):  # C3 "m" stacks
                for j, v in enumerate(node):
                    _dump(v, f"{prefix}/{j}")
            else:
                flat[prefix] = np.asarray(node)

        _dump(folded, "")
        np.savez(path + ".npz", **flat)

    def restore(self, path: str):
        if self._tp:
            # restore straight into the TP/ZeRO shardings (same fix as
            # DarknetTrainer.restore: a plain device_put re-replicates
            # onto one device and breaks the sharded step)
            from ..parallel.checkpoint import restore_sharded
            self.state = restore_sharded(path, self.state, self.mesh)
            return
        import os
        import orbax.checkpoint as ocp
        from ..utils.transfer import parallel_device_get
        path = os.path.abspath(path)
        # chunked/threaded template pull — see utils/transfer.py
        template = parallel_device_get(self.state)
        restored = ocp.PyTreeCheckpointer().restore(path, item=template)
        self.state = jax.device_put(type(self.state)(*restored))

    def train(self, annotation_dir: str, img_dir: str,
              dataset_type: str = "COCO", verbose: bool = True):
        import os
        os.makedirs(self.out_dir, exist_ok=True)
        restore_sig = self._install_preempt()  # SIGTERM -> 'preempt' tier
        try:
            return self._train(annotation_dir, img_dir, dataset_type,
                               verbose)
        finally:
            restore_sig()

    def _train(self, annotation_dir, img_dir, dataset_type, verbose):
        import os
        import time
        from ..data.coco import COCODataset
        from ..data.loader import padded_batches
        from ..data.voc import VOCDataset
        from .trainer import DarknetTrainer
        # uint8 canvases + on-device /255: bit-identical, 4x less
        # upload (see DarknetTrainer._make_dataset).
        if dataset_type.upper() == "VOC":
            dataset = VOCDataset(annotation_dir, img_dir, self.resolution,
                                 uint8=True, cache_dir=self.cache_dir,
                                 host_prep=self.host_prep)
        else:
            dataset = COCODataset(annotation_dir, img_dir, self.resolution,
                                  uint8=True, cache_dir=self.cache_dir,
                                  host_prep=self.host_prep)
        # per-host epoch length under multi-host data sharding (see
        # DarknetTrainer._train / data/loader.padded_batches)
        data_num = (len(dataset) if jax.process_count() == 1
                    else len(dataset) // jax.process_count())
        batch_num = max(1, (data_num + self.batch_size - 1)
                        // self.batch_size)
        self._resolve_schedule(batch_num)
        if self.prewarm and len(self._scales) > 1:
            self.warm_step_cache(verbose=verbose)
        self.history.setdefault("train_loss", [])
        best = None
        # mid-epoch preempt resume: same fast-forward contract as
        # DarknetTrainer._train (preempt.PreemptSupport.resume_preempt)
        start_epoch, skip = self._resume_position()
        if skip >= batch_num:   # preempt fired at an epoch's final batch
            start_epoch, skip = start_epoch + 1, 0
        for epoch in range(start_epoch, self.epochs + 1):
            t0 = time.time()
            n_batches = max(1, batch_num
                            - (skip if epoch == start_epoch else 0))
            from .trainer import _LaggedLoss
            acct = _LaggedLoss(self, epoch, batch_num, verbose,
                               lag=self.loss_lag)
            rng = np.random.RandomState(self.seed + epoch)
            cur_res = self.resolution
            # chain_steps buffering — see DarknetTrainer._train
            buf, buf_res = [], cur_res

            def _flush():
                if not buf:
                    return
                if len(buf) == self.chain_steps and self.chain_steps > 1:
                    step = self._get_step(buf_res, self.chain_steps)
                    self.state, losses = step(
                        self.state,
                        jnp.asarray(np.stack([x[1] for x in buf])),
                        jnp.asarray(np.stack([x[2] for x in buf])),
                        jnp.asarray(np.stack([x[3] for x in buf])))
                    for i, (bi, *_r) in enumerate(buf):
                        acct.push(bi + 1, losses[i])
                else:
                    step = self._get_step(buf_res)
                    for bi, im, bx, mk in buf:
                        self.state, loss = step(
                            self.state, jnp.asarray(im), jnp.asarray(bx),
                            jnp.asarray(mk))
                        acct.push(bi + 1, loss)
                buf.clear()

            for b, (images, boxes, mask) in enumerate(padded_batches(
                    dataset, self.batch_size, self.max_boxes,
                    shuffle=True, seed=self.seed, epoch=epoch,
                    host_id=jax.process_index(),
                    num_hosts=jax.process_count())):
                if self.multiscale and b % self.multiscale_every == 0:
                    cur_res = int(rng.choice(self._scales))
                if epoch == start_epoch and b < skip:
                    continue
                if buf and buf_res != cur_res:
                    _flush()
                buf_res = cur_res
                buf.append((b, images, boxes, mask))
                if len(buf) == self.chain_steps:
                    _flush()
                if self._preempted:
                    _flush()
                    acct.finish()
                    return self._save_preempt(epoch, b + 1, verbose)
            _flush()
            running = acct.finish()
            t_loop = time.time()
            self.save(f"weight_epoch{epoch}")
            if self.best_on == "map" and dataset_type.upper() != "VOC":
                from ..eval.validator import validate_map_v5
                scores = validate_map_v5(
                    annotation_dir, img_dir, self.model_size,
                    self.eval_params, size=self.resolution,
                    num_classes=self.num_classes, verbose=verbose)
                metric = scores["mAP@0.5"]
                self.history.setdefault("train_map50", []).append(metric)
                improved = (not np.isnan(metric)
                            and (best is None or metric > best))
            else:
                # per-batch average (not the sum): a partial resumed
                # epoch must not pin the best tier with a small raw sum
                metric = running / n_batches
                improved = (not np.isnan(metric)
                            and (best is None or metric < best))
            if improved:
                best = metric
                self.save("checkpoint")
            self.history["train_loss"].append(running / n_batches)
            from .trainer import append_history_jsonl
            # loop_s = the data+step loop alone; wall_s additionally
            # pays the checkpoint tiers (device->host pulls) and any
            # per-epoch validation — scripts/bench_epoch.py reports both
            rec = {"epoch": epoch, "loss": running / n_batches,
                   "wall_s": round(time.time() - t0, 2),
                   "loop_s": round(t_loop - t0, 2)}
            if self.history.get("train_map50"):
                rec["map50"] = self.history["train_map50"][-1]
            append_history_jsonl(self.out_dir, rec)
            if verbose:
                print(f"\n\tAverage Epoch Loss: {running / n_batches}")
                DarknetTrainer.epoch_eta(t0, time.time(),
                                         self.epochs - epoch)
        self.save("training_output")
        return self.history
