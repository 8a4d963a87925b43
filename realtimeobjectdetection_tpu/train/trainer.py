"""Training driver — the TPU rebuild of ``DarknetTrainer``.

Reference behavior (/root/reference/train.py:34-432) rebuilt around one
pjit'd train step (see :mod:`.step`) over a device mesh:

* Adam lr=1e-2 (train.py:57), seed 42 (train.py:14), resolution % 32
  asserted (train.py:43);
* per-epoch progress bar with batch loss + ETA printer
  (train.py:242-283);
* checkpoint tiers (train.py:340-341, 376-380, 403-410):
  ``weight_epoch<N>`` per epoch, ``checkpoint`` on best metric,
  ``training_output`` at the end — orbax pytrees of
  {params, opt_state, step}, plus a Darknet ``.weights`` export per tier
  so the detector can consume any checkpoint;
* per-epoch validator hook appending precision/recall/F to history
  (train.py:343-347, 396-401) and matplotlib loss/metric PNGs
  (train.py:360-374);
* resume: ``resume=True`` restores params+opt state from
  ``training_output`` (train.py:73-77).

Fixed (documented): the reference's best-checkpoint comparison keeps the
checkpoint when ``running_loss > best_metric`` (train.py:404) — correct
for F-score, inverted for loss; here lower-loss/higher-F wins.  The
reference also hardcodes the COCO loader in ``train()`` (train.py:309)
despite shipping a VOC path; ``dataset_type`` selects either.
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..cfg_parser import load_graph_spec
from ..data.coco import COCODataset
from ..data.loader import padded_batches
from ..data.voc import VOCDataset
from ..models.zoo import get_spec
from ..parallel.mesh import make_mesh, shard_train_step
from ..weights import (export_darknet_weights, init_params,
                       load_darknet_weights)
from .preempt import PreemptSupport
from .step import (EmaTrainState, init_train_state,
                   make_train_step)

__all__ = ["DarknetTrainer"]


def append_history_jsonl(out_dir: str, record: Dict) -> None:
    """Append one epoch record to ``<out_dir>/history.jsonl``.

    Streaming observability beyond the reference's end-of-run matplotlib
    PNGs (train.py:360-374): every epoch lands one JSON line (epoch,
    loss, validator metrics when present, wall seconds) the moment it
    finishes, so dashboards / `tail -f` see progress live and a
    preempted run keeps its history."""
    import json
    record = {k: (None if isinstance(v, float) and np.isnan(v) else v)
              for k, v in record.items()}  # NaN is not valid JSON
    with open(os.path.join(out_dir, "history.jsonl"), "a") as f:
        f.write(json.dumps(record) + "\n")


class _LaggedLoss:
    """Per-epoch loss accounting with the host sync deferred ``lag``
    steps behind dispatch.

    The reference's torch loop implicitly syncs every batch (printing
    ``loss.item()``, /root/reference/train.py:242-267); a literal port
    would call ``float(loss)`` right after each step and block the host
    on the step it *just enqueued* — through the tunnel that serializes
    every dispatch behind a full device round-trip.  Instead the device
    scalar is parked in a small deque and read back only once ``lag``
    newer steps have been enqueued, so the device always has work queued
    ahead and the readback of step *k* overlaps the execution of step
    *k+1*.  Observable behavior is identical one batch later: the
    progress bar, the running-loss aggregate, and the
    ``skip_nonfinite`` counting all see every loss, just with a
    ``lag``-batch delay (``lag=0`` restores the fully synchronous
    loop).  ``finish()`` drains the tail and returns the epoch sum."""

    def __init__(self, trainer, epoch: int, batch_num: int,
                 verbose: bool, lag: int = 1):
        from collections import deque
        self._t = trainer
        self._epoch = epoch
        self._batch_num = batch_num
        self._verbose = verbose
        self._lag = max(0, int(lag))
        self._pending = deque()
        self.running = 0.0

    def push(self, batch_idx: int, device_loss) -> None:
        self._pending.append((batch_idx, device_loss))
        while len(self._pending) > self._lag:
            self._consume()

    def finish(self) -> float:
        while self._pending:
            self._consume()
        return self.running

    def _consume(self) -> None:
        b, dev = self._pending.popleft()
        loss = float(dev)
        if self._t.skip_nonfinite and not np.isfinite(loss):
            # the in-graph guard already kept the state; keep the
            # poisoned loss out of the epoch aggregate too
            self._t.nonfinite_steps += 1
            if self._verbose:
                print(f"\n\tWARNING: non-finite loss at epoch "
                      f"{self._epoch} batch {b} — update skipped "
                      f"({self._t.nonfinite_steps} total)")
        else:
            self.running += loss
        if self._verbose:
            DarknetTrainer.progress_bar(self._epoch, b, self._batch_num,
                                        loss)


class DarknetTrainer(PreemptSupport):
    def __init__(self, cfg_path: str, weights_path: Optional[str] = None,
                 epochs: int = 10, batch_size: int = 16,
                 resolution: int = 416, confidence: float = 0.6,
                 num_classes: int = 80, lr: float = 1e-2,
                 resume: bool = False, out_dir: str = "weights",
                 max_boxes: int = 64, class_filter: Optional[int] = 0,
                 seed: int = 42, mesh=None, spatial: bool = False,
                 compute_dtype=jnp.float32, remat: bool = False,
                 augment: bool = False, optimizer: str = "adam",
                 use_cfg_schedule: bool = False,
                 multiscale: bool = False,
                 multiscale_scales=(352, 416, 480),
                 multiscale_every: int = 10,
                 prewarm: bool = True,
                 ema_decay: Optional[float] = None,
                 donate: bool = True,
                 best_on: str = "auto",
                 tensor_parallel: int = 1,
                 accum_steps: int = 1,
                 skip_nonfinite: bool = False,
                 loss_lag: int = 1,
                 activation_dtype=None,
                 chain_steps: int = 1,
                 cache_dir: Optional[str] = None,
                 host_prep: str = "cv2"):
        assert isinstance(epochs, int) and isinstance(batch_size, int)
        assert resolution % 32 == 0
        # cache_dir / host_prep: letterboxed-canvas memoization + native
        # C++ prep for the real data loader (data/cache.py) — epochs 2+
        # skip the per-image PIL/cv2 decode entirely
        self.cache_dir = cache_dir
        self.host_prep = host_prep
        self.cfg_path = cfg_path
        self.epochs = epochs
        self.batch_size = batch_size
        self.resolution = int(resolution)
        self.confidence = confidence
        self.num_classes = num_classes
        self.out_dir = out_dir
        self.max_boxes = max_boxes
        self.seed = seed
        self.validator = None
        self.history: Dict[str, List[float]] = {}

        self.spec = (load_graph_spec(cfg_path) if os.path.isfile(cfg_path)
                     else get_spec(cfg_path))
        if weights_path:
            params, _ = load_darknet_weights(self.spec, weights_path)
        else:
            params = init_params(self.spec, seed)

        if use_cfg_schedule:
            # honor the cfg [net] hyperparameters the reference ignores
            # (burn-in warmup, step decays, momentum/decay for sgd)
            from .schedule import optimizer_from_net
            self.optimizer = optimizer_from_net(self.spec, base_lr=lr,
                                                optimizer=optimizer)
        elif optimizer == "sgd":
            self.optimizer = optax.sgd(lr, momentum=0.9)
        else:
            self.optimizer = optax.adam(lr)  # reference: Adam (train.py:57)
        # ema_decay: maintain an exponential moving average of the
        # weights in the train step; validation, best-checkpoint metrics
        # and the .weights export then use the EMA weights (the standard
        # deploy artifact — beyond the reference's surface).
        # best_on: "auto" (= f_score with a validator, loss without),
        # "f_score", "loss", or "map" (all-class mAP@0.5; needs the
        # validator's dataset dirs).
        self.ema_decay = ema_decay
        assert best_on in ("auto", "f_score", "loss", "map")
        self.best_on = best_on
        # accum_steps: in-graph gradient accumulation (lax.scan over
        # microbatches) — B/accum_steps peak activation memory, one
        # optimizer update; see make_train_step(accum_steps=...)
        assert batch_size % max(accum_steps, 1) == 0, \
            (batch_size, accum_steps)
        # skip_nonfinite: in-graph guard — a batch producing an inf/NaN
        # loss or gradient leaves the whole train state untouched
        # (step._guard_nonfinite); the epoch loop counts such batches in
        # ``nonfinite_steps`` and keeps them out of the running loss.
        self.skip_nonfinite = skip_nonfinite
        self.nonfinite_steps = 0
        # loss_lag: defer the per-batch loss readback this many steps
        # behind dispatch (see _LaggedLoss) — keeps the device queue
        # non-empty through the tunnel; 0 = reference-style synchronous
        self.loss_lag = max(0, int(loss_lag))
        # chain_steps=k: run k consecutive optimizer steps per device
        # dispatch (train/step.make_chained_step — lax.scan over k
        # stacked batches, one tunnel RPC instead of k).  Semantics are
        # exactly k sequential steps; the epoch loop buffers k loader
        # batches, flushing early (through the plain per-batch program)
        # at scale switches, epoch tails, and preemption.  Measured
        # +23% v5s train throughput at bs=64 (PERFORMANCE.md round-3
        # "chained dispatch").  Composes with the DP/SP/TP mesh: the
        # chained program's leading [k] step axis stays replicated and
        # the batch axis shards as usual (shard_train_step(chain=k);
        # equality pinned in tests/test_train_targets.py + test_parallel_tp.py).
        self.chain_steps = max(1, int(chain_steps))

        self._step_kwargs = dict(
            class_filter=class_filter, compute_dtype=compute_dtype,
            remat=remat, augment=augment, aug_seed=seed,
            input_resolution=self.resolution, ema_decay=ema_decay,
            accum_steps=max(accum_steps, 1),
            skip_nonfinite=skip_nonfinite,
            activation_dtype=activation_dtype)
        self.step_fn = make_train_step(
            self.spec, self.optimizer, resolution=self.resolution,
            **self._step_kwargs)
        # multi-scale training (darknet random=1): a jitted step per
        # resolution, switched every `multiscale_every` batches; the
        # loader stays at the base resolution and the device rescales.
        #
        # Compile economics on the real TPU (axon remote compile service):
        # a FRESH compile of the full yolov3 step takes 3-10 min, so every
        # distinct resolution is a multi-minute stall the first time it is
        # sampled mid-epoch.  Two defenses: (1) the default scale set is
        # the small {352, 416, 480} instead of darknet's 320..608 sweep
        # (10 programs), and (2) ``prewarm``: train() compiles-and-runs
        # one dummy step per scale BEFORE epoch 1, so compiles happen
        # up-front (and land in the persistent JAX compilation cache,
        # ~15-30s on later hits) instead of stalling the epoch loop.
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
        self._step_cache = {}
        self._prewarmed = False

        # mesh: None = auto (DP over all devices when the batch divides
        # evenly), False = force single-device, or an explicit Mesh.
        # tensor_parallel=N adds a 'model' axis of size N to the auto
        # mesh (conv kernels channel-sharded, Adam state ZeRO-sharded —
        # parallel/mesh.param_shardings); spatial must stay off with it
        # (sp×tp conv partitioning miscompiles, see make_mesh).
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
        self._spatial = spatial
        if (self.chain_steps > 1 and self.mesh is not None and spatial
                and "space" in self.mesh.axis_names
                and self.mesh.shape["space"] > 1):
            # fail at init, not at the first chained dispatch mid-epoch
            # (shard_train_step(chain=k) rejects spatial meshes — SPMD
            # BN-stat miscompile, see parallel/mesh.shard_train_step)
            raise ValueError(
                "chain_steps>1 cannot combine with a spatial-sharded "
                "mesh; use a data[*model] mesh or chain_steps=1")
        # donate: the TrainState argument's buffers are updated in place
        # by XLA (no params/opt-state copy per step, halves the state
        # HBM footprint).  The epoch loop immediately rebinds
        # ``self.state`` to the step output, so the invalidated input is
        # never reused; warm_step_cache warms on a copy for the same
        # reason.
        self._donate = donate
        self.state = init_train_state(params, self.optimizer,
                                      ema_decay=ema_decay)
        self._tp = (self.mesh is not None
                    and "model" in self.mesh.axis_names
                    and self.mesh.shape["model"] > 1)
        if self._tp:
            from ..parallel.mesh import shard_params
            self.state = shard_params(self.state, self.mesh)
        if self.mesh is not None:
            self.step_jit = shard_train_step(
                self.step_fn, self.mesh, spatial=spatial, donate=donate,
                state=self.state if self._tp else None)
        else:
            self.step_jit = jax.jit(
                self.step_fn, donate_argnums=(0,) if donate else ())
        self._step_cache[(self.resolution, 1)] = self.step_jit
        if resume:
            self.restore(os.path.join(self.out_dir, "training_output"))
        print("\nTrainer is ready!!\n")
        print(f"devices = {jax.devices()}\n")

    def _get_step(self, resolution: int, chain: int = 1):
        """Jitted train step for one target resolution (cached).

        ``chain>1``: the k-steps-per-dispatch program
        (train/step.make_chained_step) — inputs gain a leading [k]
        axis (replicated on a mesh; batch axis moves to 1)."""
        key = (resolution, chain)
        if key not in self._step_cache:
            fn = make_train_step(self.spec, self.optimizer,
                                 resolution=resolution,
                                 **self._step_kwargs)
            if chain > 1:
                from .step import make_chained_step
                fn = make_chained_step(fn, chain)
            if self.mesh is not None:
                fn = shard_train_step(fn, self.mesh, spatial=self._spatial,
                                      donate=self._donate,
                                      state=self.state if self._tp
                                      else None, chain=chain)
            else:
                fn = jax.jit(
                    fn, donate_argnums=(0,) if self._donate else ())
            self._step_cache[key] = fn
        return self._step_cache[key]

    # ------------------------------------------------------------------
    # checkpointing (orbax pytree + darknet .weights export)
    @property
    def eval_params(self):
        """Weights used for validation / export: EMA when enabled."""
        if isinstance(self.state, EmaTrainState):
            return self.state.ema_params
        return self.state.params

    def save(self, name: str):
        import orbax.checkpoint as ocp
        from ..utils.transfer import parallel_device_get
        path = os.path.abspath(os.path.join(self.out_dir, name))
        ckptr = ocp.PyTreeCheckpointer()
        # parallel_device_get: the tunnel throttles single streams to
        # ~7.5 MB/s — a monolithic device_get of the ~744 MB train
        # state took 95 s PER SAVE; chunked/threaded pulls run ~6x
        # faster (utils/transfer.py)
        host_state = parallel_device_get(self.state)
        ckptr.save(path, host_state, force=True)
        # interop: raw Darknet weights next to the pytree (EMA weights
        # when enabled — the deploy artifact).  eval_params is a view
        # into the state, so reuse the host copy — no second pull.
        params = (host_state.ema_params
                  if isinstance(host_state, EmaTrainState)
                  else host_state.params)
        blob = export_darknet_weights(self.spec, params,
                                      seen=int(self.state.step))
        with open(path + ".weights", "wb") as f:
            f.write(blob)

    def restore(self, path: str):
        if self._tp:
            # restore straight into the TP/ZeRO shardings — the mesh
            # need not match the topology that saved the checkpoint
            # (parallel/checkpoint.restore_sharded; no host-size
            # bottleneck, each device reads only its shard)
            from ..parallel.checkpoint import restore_sharded
            self.state = restore_sharded(path, self.state, self.mesh)
            return
        import orbax.checkpoint as ocp
        from ..utils.transfer import parallel_device_get
        path = os.path.abspath(path)
        ckptr = ocp.PyTreeCheckpointer()
        # chunked/threaded template pull (utils/transfer.py) — the
        # monolithic device_get here cost ~95 s through the tunnel
        template = parallel_device_get(self.state)
        restored = ckptr.restore(path, item=template)
        self.state = jax.device_put(type(self.state)(*restored))

    # ------------------------------------------------------------------
    def get_validator(self, annotation_dir: str, img_dir: str,
                      batch_size: int = 8, bn_mode: str = "running"):
        """Attach the per-epoch validator (reference train.py:232-240).

        Defaults run validation in padded batches of 8 with BN running
        stats — one tunnel dispatch per 8 images instead of per image
        (VERDICT r2 next-4), and 'running' is the correct eval of the
        stats the trainer maintains (identical per-image results at any
        batch size; tests/test_trainer_and_validator.py::
        test_validator_batched_matches_bs1).  Pass batch_size=1,
        bn_mode='batch' for the reference's exact bs-1 batch-stats
        behavior (test.py:46-60)."""
        from ..eval.validator import DarknetValidator
        self._valid_dirs = (annotation_dir, img_dir)  # for best_on="map"
        self._valid_bn_mode = bn_mode
        self.validator = DarknetValidator(annotation_dir, img_dir,
                                          confidence=self.confidence,
                                          resolution=self.resolution,
                                          batch_size=batch_size)

    @staticmethod
    def progress_bar(epoch, batch, batch_num, loss):
        """Reference-style bar (train.py:242-267)."""
        bar_length = 60
        percent = batch / batch_num * 100
        bar = f"Epoch: {epoch:3d} Batch: {batch:3d} "
        bar += f"Loss: {loss:<10.2f} {percent:>6.2f}% "
        filled = int(round(percent) * bar_length / 100)
        bar += "|" + "=" * filled + ">" + " " * (bar_length - filled) + "|"
        end = "\n" if batch == batch_num else ""
        print("\r" + bar, end=end, flush=True)

    @staticmethod
    def epoch_eta(t_start, t_end, remaining_epoch):
        delta = (t_end - t_start) * remaining_epoch
        print("\tETA: {0}:{1}:{2}\n".format(
            int(delta // 3600), int(delta % 3600 // 60),
            int(delta % 60)))

    # ------------------------------------------------------------------
    def _make_dataset(self, annotation_dir, img_dir, dataset_type):
        # uint8=True: the loaders ship RGB uint8 letterbox canvases and
        # the train step normalizes on device — bit-identical numerics,
        # 4x less host->device upload per batch (train/step.py).
        if dataset_type.upper() == "VOC":
            return VOCDataset(annotation_dir, img_dir, self.resolution,
                              uint8=True, cache_dir=self.cache_dir,
                              host_prep=self.host_prep)
        return COCODataset(annotation_dir, img_dir, self.resolution,
                           uint8=True, cache_dir=self.cache_dir,
                           host_prep=self.host_prep)

    def warm_step_cache(self, verbose: bool = True):
        """Compile-and-execute one dummy step per multi-scale resolution.

        Runs each scale's program once on zero tensors (state untouched —
        the updated state is discarded), so all compiles happen before
        epoch 1 instead of stalling the epoch loop at the first sampling
        of a new resolution (3-10 min per fresh compile through the axon
        service).  Idempotent; skipped when only one scale exists and it
        is already jitted."""
        if self._prewarmed:
            return
        for r in sorted(set(self._scales)):
            t0 = time.time()
            step = self._get_step(r)
            # Shape/dtype must match what the epoch loop feeds: the
            # loader always ships BASE-resolution uint8 canvases and the
            # step resizes in-graph to r (input_resolution above) — a
            # (bs, r, r, 3) warm input compiled a program the epoch
            # loop never runs (pre-round-3 bug: non-base scales were
            # never actually prewarmed).
            imgs = jnp.zeros((self.batch_size, self.resolution,
                              self.resolution, 3), jnp.uint8)
            boxes = jnp.zeros((self.batch_size, self.max_boxes, 85),
                              jnp.float32)
            mask = jnp.zeros((self.batch_size, self.max_boxes), bool)
            # donated steps invalidate their state argument — warm on a
            # throwaway copy so self.state stays live
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
                print(f"\twarmed step @ {r}x{r} in "
                      f"{time.time() - t0:.1f}s")
        self._prewarmed = True

    def train(self, annotation_dir: str, img_dir: str,
              dataset_type: str = "COCO", verbose: bool = True):
        os.makedirs(self.out_dir, exist_ok=True)
        restore_sig = self._install_preempt()  # SIGTERM -> 'preempt' tier
        try:
            return self._train(annotation_dir, img_dir, dataset_type,
                               verbose)
        finally:
            restore_sig()

    def _train(self, annotation_dir, img_dir, dataset_type, verbose):
        if self.prewarm and len(self._scales) > 1:
            self.warm_step_cache(verbose=verbose)
        dataset = self._make_dataset(annotation_dir, img_dir, dataset_type)
        # multi-host runs (jax.distributed): each process trains on its
        # disjoint loader shard (padded_batches host_id/num_hosts), so
        # the per-host epoch length is len(dataset)/process_count
        data_num = (len(dataset) if jax.process_count() == 1
                    else len(dataset) // jax.process_count())
        batch_num = max(1, (data_num + self.batch_size - 1)
                        // self.batch_size)
        self.history.setdefault("train_loss", [])
        self.history.setdefault("train_precision", [])
        self.history.setdefault("train_recall", [])
        self.history.setdefault("train_f_score", [])
        best_metric = None
        # mid-epoch preempt resume (resume_preempt): fast-forward to the
        # saved (epoch, batch).  Skipped batches are still drawn from the
        # loader and the multiscale rng still advances, so the data order
        # and resolution schedule stay identical to an uninterrupted run.
        start_epoch, skip = self._resume_position()
        if skip >= batch_num:
            # preempt fired at an epoch's final batch (or the dataset
            # shrank): nothing left in that epoch — continue at the next
            start_epoch, skip = start_epoch + 1, 0

        for epoch in range(start_epoch, self.epochs + 1):
            t_start = time.time()
            n_batches = max(1, batch_num
                            - (skip if epoch == start_epoch else 0))
            acct = _LaggedLoss(self, epoch, batch_num, verbose,
                               lag=self.loss_lag)
            rng = np.random.RandomState(self.seed + epoch)
            cur_res = self.resolution
            # chain_steps buffering: collect k same-resolution batches
            # and dispatch them as ONE chained program (losses come back
            # as a [k] vector, pushed per batch).  Partial buffers (scale
            # switch, epoch tail, preempt) flush through the plain
            # per-batch program — only {k, 1} programs exist per scale.
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
            running_loss = acct.finish()
            t_loop = time.time()

            self.save(f"weight_epoch{epoch}")
            # the loss metric is the PER-BATCH AVERAGE, not the epoch
            # sum: a mid-epoch-resumed (partial) epoch sums fewer
            # batches, and a raw-sum comparison would pin the
            # best-checkpoint tier on the artificially small partial sum
            if self.validator is None:
                metric, higher_better = running_loss / n_batches, False
            else:
                self.validator.validate_model(
                    self.spec, self.eval_params, verbose=verbose,
                    bn_mode=getattr(self, "_valid_bn_mode", "running"))
                self.history["train_precision"].append(
                    self.validator.precision)
                self.history["train_recall"].append(self.validator.recall)
                self.history["train_f_score"].append(self.validator.f_score)
                if self.best_on == "map":
                    # all-class COCO-style mAP@0.5 as the checkpoint
                    # metric (beyond the reference's person-only F-score)
                    from ..eval.validator import validate_map
                    ann, imgs = self._valid_dirs
                    scores = validate_map(
                        ann, imgs, self.spec, self.eval_params,
                        confidence=self.confidence,
                        resolution=self.resolution, verbose=verbose)
                    self.history.setdefault("train_map50", []).append(
                        scores["mAP@0.5"])
                    metric, higher_better = scores["mAP@0.5"], True
                elif self.best_on == "loss":
                    metric, higher_better = running_loss / n_batches, False
                else:
                    metric, higher_better = self.validator.f_score, True
            # NaN metrics (e.g. zero detections early in training) never
            # become or beat the best — the checkpoint tier tracks the
            # first/most-improved *finite* metric
            if not np.isnan(metric):
                improved = (best_metric is None
                            or (metric > best_metric) == higher_better)
                if improved:
                    best_metric = metric
                    self.save("checkpoint")

            self.history["train_loss"].append(running_loss / n_batches)
            # loop_s = the data+step loop alone; wall_s additionally
            # pays the checkpoint tiers (device->host pulls) and any
            # per-epoch validation — scripts/bench_epoch.py reports both
            rec = {"epoch": epoch, "loss": running_loss / n_batches,
                   "wall_s": round(time.time() - t_start, 2),
                   "loop_s": round(t_loop - t_start, 2)}
            if self.validator is not None:
                rec.update(precision=self.validator.precision,
                           recall=self.validator.recall,
                           f_score=self.validator.f_score)
            if self.history.get("train_map50"):
                rec["map50"] = self.history["train_map50"][-1]
            append_history_jsonl(self.out_dir, rec)
            if verbose:
                print(f"\n\tAverage Epoch Loss: {running_loss / data_num}")
                self.epoch_eta(t_start, time.time(), self.epochs - epoch)

        self.save("training_output")
        self._plots()
        if verbose:
            print("Training is finished !!\n")
        return self.history

    def _plots(self):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        epochs = list(range(1, len(self.history["train_loss"]) + 1))
        plt.plot(epochs, self.history["train_loss"], color="red")
        plt.xlabel("epoch number")
        plt.ylabel("loss")
        plt.savefig(os.path.join(self.out_dir, "loss_graph.png"))
        plt.clf()
        if self.validator is not None and self.history["train_precision"]:
            plt.plot(epochs, self.history["train_precision"], color="blue")
            plt.plot(epochs, self.history["train_recall"], color="green")
            plt.plot(epochs, self.history["train_f_score"], color="yellow")
            plt.legend(["precision", "recall", "f_score"])
            plt.xlabel("epoch number")
            plt.ylabel("metrics")
            plt.savefig(os.path.join(self.out_dir, "metric_graph.png"))
            plt.clf()
