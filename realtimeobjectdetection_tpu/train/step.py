"""The jittable training step: forward (batch-stats BN) -> in-graph
target build -> masked loss -> optax update -> running-stat maintenance.

The reference equivalent spreads across train.py:412-425 (zero_grad /
forward / target_creator / loss.backward / optimizer.step) with the
target creator running as a host-side Python loop; here everything is
one XLA program, so the whole step is shardable with pjit (see
:mod:`..parallel.mesh`).

Optimizer parity: Adam lr=1e-2 (train.py:57; optax defaults match torch
b1=0.9, b2=0.999, eps=1e-8).  BN running statistics follow torch
train-mode semantics: ``running = (1-m)*running + m*batch_stat`` with
momentum 0.1 and the *unbiased* batch variance for the running update.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..cfg_parser import GraphSpec
from ..model import make_forward
from ..ops.decode import decode_heads
from .loss import yolo_loss
from .targets import build_targets

__all__ = ["TrainState", "make_train_step", "init_train_state"]

BN_MOMENTUM = 0.1  # torch.nn.BatchNorm2d default


class TrainState(NamedTuple):
    params: Dict[str, Dict[str, jnp.ndarray]]
    opt_state: Any
    step: jnp.ndarray


class EmaTrainState(NamedTuple):
    """TrainState + an exponential moving average of the weights.

    EMA weights are the standard deploy/eval artifact for detection
    training (the reference has no equivalent; production framework
    surface).  Kept as a separate NamedTuple so plain TrainState
    checkpoints stay byte-compatible."""
    params: Dict[str, Dict[str, jnp.ndarray]]
    opt_state: Any
    step: jnp.ndarray
    ema_params: Dict[str, Dict[str, jnp.ndarray]]


def init_train_state(params, optimizer, ema_decay=None):
    params = jax.tree_util.tree_map(jnp.asarray, params)
    if ema_decay is not None:
        # ema starts equal to params but must be INDEPENDENT buffers:
        # a donated train step (trainer donate=True) rejects pytrees
        # with aliased leaves ("attempt to donate the same buffer twice")
        ema = jax.tree_util.tree_map(jnp.array, params)
        return EmaTrainState(params=params,
                             opt_state=optimizer.init(params),
                             step=jnp.zeros((), jnp.int32),
                             ema_params=ema)
    return TrainState(params=params, opt_state=optimizer.init(params),
                      step=jnp.zeros((), jnp.int32))


def _update_running_stats(params, stats, n_per_channel: int):
    """Torch train-mode BN running-average update."""
    unbias = n_per_channel / max(n_per_channel - 1, 1)
    new = dict(params)
    for key, (mean, var) in stats.items():
        entry = dict(new[key])
        entry["bn_mean"] = (1 - BN_MOMENTUM) * entry["bn_mean"] \
            + BN_MOMENTUM * mean
        entry["bn_var"] = (1 - BN_MOMENTUM) * entry["bn_var"] \
            + BN_MOMENTUM * var * unbias
        new[key] = entry
    return new


def make_train_step(spec: GraphSpec, optimizer, resolution: int = 416,
                    class_filter: Optional[int] = 0,
                    reference_bug_wh_iou: bool = True,
                    parity_swap_xy: bool = False,
                    compute_dtype=jnp.float32, precision=None,
                    activation_dtype=None,
                    update_bn_stats: bool = True,
                    remat: bool = False,
                    augment: bool = False, aug_seed: int = 0,
                    aug_kwargs: Optional[Dict] = None,
                    input_resolution: Optional[int] = None,
                    ema_decay: Optional[float] = None,
                    scan_ladders: bool = True,
                    scan_remat: bool = True,
                    accum_steps: int = 1,
                    skip_nonfinite: bool = False):
    """Build ``step(state, images, boxes, box_mask) -> (state, loss)``.

    ``images``: [B, H, W, 3]; ``boxes``: [B, M, 5+C] padded gt rows;
    ``box_mask``: [B, M].  Pure function of its inputs — jit/pjit it with
    whatever shardings the mesh layer chooses.

    ``input_resolution``: when it differs from ``resolution``, images are
    bilinearly rescaled in-graph and boxes scaled accordingly — the
    multi-scale training mode (darknet ``random=1``, which the reference
    parses but ignores): the loader stays fixed-shape at the base
    resolution and the device handles the scale jitter.

    ``accum_steps=k``: in-graph gradient accumulation — the batch is
    split into k microbatches and a ``lax.scan`` runs forward+backward
    per microbatch (each scan iteration differentiates only its own
    microbatch, so peak activation memory is that of B/k images),
    summing gradients into one optimizer update.  BN batch statistics
    are computed per microbatch — exactly what a k-step torch
    accumulation loop sees, and the one place the result differs from
    the full-batch step (the sum-MSE loss itself is additive over
    rows).  Equality is pinned with identical microbatch halves (which
    make per-microbatch and full-batch BN stats coincide): the accum
    step then reproduces the plain step exactly, and the k sequential
    running-stat updates follow the closed-form EMA
    (tests/test_train_targets.py::test_train_step_accum_semantics).
    This is the single-device route to the reference-scale effective
    batch when B doesn't fit — the in-graph analog of ultralytics'
    nominal-batch accumulation.

    ``skip_nonfinite=True``: guard every state mutation behind an
    in-graph finiteness check of the loss AND every gradient leaf — a
    bad batch (inf/NaN from bf16 overflow, corrupt data, an unlucky LR
    spike) leaves params, optimizer moments, BN running stats and the
    EMA untouched instead of poisoning the run irrecoverably.  The step
    still returns the non-finite loss, so the host loop can count and
    log skipped steps (trainers expose ``nonfinite_steps``).  The
    reference has no equivalent (a NaN loss destroys the torch run);
    production guardrail alongside the preempt tier (train/preempt.py).
    """
    # scan_ladders (default on): rolls the residual ladders into
    # lax.scan with the batch statistics riding out as stacked ys —
    # same numerics (tests/test_forward_parity.py::
    # test_scan_ladders_batch_stats_identical), ~4x smaller train HLO.
    # Round-3 finding: the unrolled yolov3 train graph took 18-27 min
    # on the remote compile service and could come back as a degraded
    # executable (5.8 s/step vs 50 ms); the rolled graph avoids both.
    # scan_remat (default on): without it the rolled backward stores the
    # per-iteration residual activations stacked ([reps, B, H, W, C]
    # buffers), which OOMs the full yolov3 step at bs=64 on a 16 GB
    # chip; checkpointing the scan body stores only carries and
    # recomputes body intermediates in the backward pass.
    # activation_dtype=bfloat16: materialize the inter-layer activations
    # (and therefore everything autodiff stashes for the backward pass)
    # in bf16 while BN statistics/normalization and the loss stay fp32 —
    # the training twin of the serving residency lever
    # (make_forward(activation_dtype=...)); measured verdict in
    # PERFORMANCE.md.
    fwd = make_forward(spec, bn_mode="batch", compute_dtype=compute_dtype,
                       return_stats=True, precision=precision,
                       activation_dtype=activation_dtype,
                       scan_ladders=scan_ladders,
                       scan_remat=scan_remat and scan_ladders)
    if remat:
        fwd = jax.checkpoint(fwd)
    base = input_resolution or resolution

    def step(state: TrainState, images, boxes, box_mask):
        if images.dtype == jnp.uint8:
            # uint8 letterbox canvases (data loaders' uint8 mode):
            # normalize on device — bit-identical to a host-side /255,
            # 4x less host->device upload per batch.
            images = images.astype(jnp.float32) / 255.0
        if base != resolution:
            b = images.shape[0]
            images = jax.image.resize(
                images, (b, resolution, resolution, images.shape[3]),
                "bilinear")
            ratio = resolution / base
            boxes = boxes.at[..., 0:4].multiply(ratio)
        if augment:
            from .augment import augment_batch
            key = jax.random.fold_in(jax.random.PRNGKey(aug_seed),
                                     state.step)
            images, boxes = augment_batch(key, images, boxes,
                                          **(aug_kwargs or {}))
        targets, obj_mask = build_targets(
            spec, boxes, box_mask, resolution,
            class_filter=class_filter,
            reference_bug_wh_iou=reference_bug_wh_iou,
            parity_swap_xy=parity_swap_xy)

        def loss_fn(params, images_, targets_, obj_mask_):
            heads, stats = fwd(params, images_)
            pred = decode_heads(heads, spec, resolution, train=True)
            return yolo_loss(pred, targets_, obj_mask_), stats

        b, h, w = images.shape[0], images.shape[1], images.shape[2]
        if accum_steps > 1:
            k = accum_steps
            assert b % k == 0, (b, k)
            mb = b // k

            def micro(g_acc, inp):
                im, tg, om = inp
                (l, st), g = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params, im, tg, om)
                return jax.tree_util.tree_map(jnp.add, g_acc, g), (l, st)

            g0 = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            grads, (losses, stats_stack) = jax.lax.scan(
                micro, g0,
                (images.reshape(k, mb, h, w, images.shape[3]),
                 targets.reshape(k, mb, *targets.shape[1:]),
                 obj_mask.reshape(k, mb, obj_mask.shape[1])))
            loss = losses.sum()
        else:
            (loss, stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, images, targets,
                                       obj_mask)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        if update_bn_stats:
            # note: per-conv spatial dims differ; the unbias factor uses
            # the input-resolution count as torch does per layer — with
            # n ~ 1e4..1e6 the correction is negligible, so one factor
            # per net is an accepted approximation (documented)
            if accum_steps > 1:
                for i in range(accum_steps):  # k sequential EMA updates
                    params = _update_running_stats(
                        params,
                        {key: (m[i], v[i])
                         for key, (m, v) in stats_stack.items()},
                        (b // accum_steps) * h * w)
            else:
                params = _update_running_stats(params, stats, b * h * w)
        if ema_decay is not None:
            # debias-free EMA over the full params tree (incl. BN stats)
            ema = jax.tree_util.tree_map(
                lambda e, q: ema_decay * e + (1.0 - ema_decay) * q,
                state.ema_params, params)
            new_state = EmaTrainState(params=params, opt_state=opt_state,
                                      step=state.step + 1, ema_params=ema)
        else:
            new_state = TrainState(params=params, opt_state=opt_state,
                                   step=state.step + 1)
        if skip_nonfinite:
            new_state = _guard_nonfinite(loss, grads, new_state, state)
        return new_state, loss

    return step


def _guard_nonfinite(loss, grads, new_state, old_state):
    """Select ``new_state`` when the loss and every gradient leaf are
    finite, ``old_state`` otherwise (params, optimizer moments, BN
    running stats AND the EMA buffers all stay put on a bad step) — one
    scalar predicate broadcast through a leafwise ``where``, so the step
    remains a single XLA program with no host sync.  The step counter
    still advances: LR schedules and augmentation keys track wall
    progress, and the non-finite loss the step returns lets the host
    loop count skips (trainer ``nonfinite_steps``)."""
    ok = jnp.isfinite(loss)
    ok = jax.tree_util.tree_reduce(
        lambda a, g: jnp.logical_and(a, jnp.all(jnp.isfinite(g))),
        grads, ok)
    guarded = jax.tree_util.tree_map(
        lambda n, o: jnp.where(ok, n, o), new_state, old_state)
    return guarded._replace(step=old_state.step + 1)


def make_chained_step(step, k: int):
    """Wrap a ``step(state, images, boxes, mask) -> (state, loss)`` into
    one XLA program running ``k`` consecutive optimizer steps via
    ``lax.scan`` over pre-stacked inputs.

    TPU-first dispatch amortization: through the axon tunnel a single
    train-step dispatch costs tens of ms of host/RPC time that ``k``
    in-graph steps pay ONCE (round-3 profile: v5s bs=16 device time
    38 ms vs ~76 ms wall even with the lag=1 loop).  Semantics are
    exactly ``k`` sequential calls of ``step`` — distinct batches, one
    optimizer update per batch, BN running stats applied in order —
    NOT gradient accumulation (that is ``make_train_step(accum_steps=
    k)``, one update from k microbatches).

    Inputs gain a leading chain axis: ``images [k,B,H,W,3]``, ``boxes
    [k,B,M,5+C]``, ``mask [k,B,M]``; returns ``(state, losses[k])``.
    The host keeps uploading the next superbatch while the device runs
    the current one (same double-buffering as the per-step loop), so
    the trade is purely dispatch-count vs per-loss readback latency —
    the per-step losses still come back, one scan ys vector per chain.
    """
    assert k >= 1
    if k == 1:
        return step

    def chained(state, images, boxes, box_mask):
        def body(st, xs):
            x, b, m = xs
            st, loss = step(st, x, b, m)
            return st, loss
        state, losses = jax.lax.scan(body, state,
                                     (images, boxes, box_mask))
        return state, losses

    return chained
