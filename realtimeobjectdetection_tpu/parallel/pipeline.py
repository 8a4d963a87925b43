"""Pipeline parallelism (PP) for serving: graph stages on distinct chips.

The fourth parallelism mode next to DP/SP (mesh.py GSPMD shardings) and
TP (mesh.param_shardings): the graph is cut into contiguous
FLOP-balanced ranges, each compiled as its own program and pinned to
its own device with only its slice of the weights resident — Darknet
node ranges via ``model.make_forward(stage_range=...)``
(:class:`PipelinedForward`) and YOLOv5 step-table ranges via
``models.yolov5.make_yolov5_forward(stage_range=...)``
(:class:`PipelinedForwardV5`).  The host chains the
stages — because JAX dispatch is asynchronous, keeping >= n_stages
batches in flight runs stage k for batch i concurrently with stage k-1
for batch i+1, so steady-state throughput is set by the SLOWEST stage,
not the full forward; boundary activations move device-to-device over
ICI on real hardware (this container emulates the topology on CPU
devices — tests/test_pipeline_parallel.py proves bit-equality with the
single-device forward and exercises the pipelined dispatch).

When to use which (scaling-book framing): DP when the batch divides
well and weights fit (gradient/param traffic only); TP when weights or
optimizer state don't fit (channel-sharded, all-gather per layer); PP
when a single chip can't hold even one stage's activations at the
target batch, or to serve with per-stage HBM footprints — at the cost
of n_stages dispatch latency.  The reference has no counterpart (its
parallelism is nn.DataParallel, /root/reference/detect.py:177-183).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..cfg_parser import ConvSpec, GraphSpec
from ..model import _find_ladders, fold_batchnorm, make_forward

__all__ = ["balance_cuts", "balance_cuts_v5", "PipelinedForward",
           "PipelinedForwardV5", "PipelinedTrainStep",
           "PipelinedTrainStepV5"]


def _cuts_from_flops(flops: Sequence[int], n_stages: int,
                     snap=None) -> List[int]:
    """Place ``n_stages - 1`` cuts where cumulative FLOPs cross each
    1/n_stages of the total; ``snap`` optionally moves a cut forward
    (out of an unsplittable region).

    Always returns exactly ``n_stages - 1`` strictly increasing cuts:
    when two thresholds snap to the same position (two ladder-straddling
    cuts in yolov3), the later cut advances to the next legal position
    instead of being dropped (which would crash every PP constructor's
    ``len(cuts) == n_stages - 1`` assert).  Raises ``ValueError`` when
    the graph genuinely has fewer legal positions than requested stages.
    """
    total = sum(flops)

    def place(c: int) -> int:
        while snap is not None:
            c2 = snap(c)
            if c2 == c:
                break
            c = c2
        return c

    cuts, acc, k = [], 0, 1
    for i, f in enumerate(flops):
        acc += f
        if k < n_stages and acc >= total * k / n_stages:
            c = place(i + 1)
            if cuts and c <= cuts[-1]:
                c = place(cuts[-1] + 1)
            if c >= len(flops):
                raise ValueError(
                    f"cannot split {len(flops)} nodes into {n_stages} "
                    f"stages (only {len(cuts)} legal cuts before the "
                    "graph end; reduce n_stages or pass explicit cuts)")
            cuts.append(c)
            k += 1
    return cuts


def balance_cuts(spec: GraphSpec, n_stages: int,
                 resolution: Optional[int] = None,
                 scan_ladders: bool = False) -> List[int]:
    """FLOP-balanced stage boundaries: ``n_stages - 1`` node indices.

    Walks per-node conv FLOPs (the same 2*H*W*K²*Cin*Cout count as
    ``utils.profiling.conv_flops``) and places each cut at the node
    where the cumulative count crosses the next 1/n_stages of the
    total, snapped forward out of any rolled ladder (a ``lax.scan``
    body cannot be split across devices).
    """
    h = w = resolution or spec.net.height
    flops = []
    hw = {}
    cur_h, cur_w = h, w
    for node in spec.nodes:
        if isinstance(node, ConvSpec):
            cur_h = -(-cur_h // node.stride)
            cur_w = -(-cur_w // node.stride)
            flops.append(2 * cur_h * cur_w * node.kernel_size ** 2
                         * node.in_channels * node.out_channels)
        else:
            stride = getattr(node, "stride", 1)
            if type(node).__name__ == "MaxPoolSpec" and stride > 1:
                cur_h //= stride
                cur_w //= stride
            elif type(node).__name__ == "UpsampleSpec":
                cur_h *= stride
                cur_w *= stride
            elif type(node).__name__ == "RouteSpec":
                # resolution follows the (first) source
                cur_h, cur_w = hw.get(node.sources[0], (cur_h, cur_w))
            flops.append(0)
        hw[node.index] = (cur_h, cur_w)
    ladders = _find_ladders(spec) if scan_ladders else {}

    def snap(cut: int) -> int:
        for s, r in ladders.items():
            if s < cut < s + 3 * r:
                return s + 3 * r
        return cut

    return _cuts_from_flops(flops, n_stages, snap=snap)


class _StagedPipeline:
    """Shared stage-chaining: subclasses fill ``devices`` (one per
    stage), ``_fns`` (jitted ``(stage_params, x_or_carry) ->
    (heads, boundary)``), and ``_params`` (per-stage weight slices,
    device-resident)."""

    devices: List
    _fns: List
    _params: List

    @property
    def carry_targets(self):
        """Per-stage placement for boundary transfers: a device, or a
        batch NamedSharding when the stage is data-parallel (PPxDP)."""
        return getattr(self, "_carry_targets", None) or self.devices

    def update_params(self, params) -> None:
        """Hot-swap the per-stage weight slices (serving weight reload).

        ``params`` must be in the layout the pipeline was built with
        (same pytree/shapes — the jitted stage programs are reused, no
        recompile).  The swap is one attribute store; callers that may
        be mid-``__call__`` on another thread must serialize around it
        (DetectionService holds its reload lock)."""
        self._params = self._place(params)

    def __call__(self, x):
        """Full heads-forward for one batch across the stage devices."""
        heads: List[jnp.ndarray] = []
        hs, carry = self._fns[0](self._params[0], x)
        heads.extend(hs)
        for k in range(1, len(self._fns)):
            carry = jax.device_put(carry, self.carry_targets[k])
            hs, carry = self._fns[k](self._params[k], carry)
            heads.extend(hs)
        return heads

    @staticmethod
    def _force(heads):
        """True completion sync: a scalar host readback per head.
        ``jax.block_until_ready`` returns before execution completes on
        the axon TPU backend (CLAUDE.md), so backpressure must come
        from an actual device->host read."""
        import numpy as np
        for h in heads:
            np.asarray(h[(0,) * h.ndim])
        return heads

    def map_stream(self, batches, depth: Optional[int] = None):
        """Yield heads per batch, keeping ``depth`` (default n_stages)
        batches in flight so every stage device stays busy."""
        depth = depth or len(self._fns)
        inflight = []
        for x in batches:
            inflight.append(self(x))
            if len(inflight) >= depth:
                yield self._force(inflight.pop(0))
        for hs in inflight:
            yield self._force(hs)

    def make_detect(self, post_fn):
        """Build ``detect(params_ignored, u8_batch) -> post_fn(heads)``:
        u8->f32/255 normalization jitted on the first stage's device,
        heads gathered onto the last stage's device, ``post_fn``
        (decode+NMS) jitted there.  The shared integration used by
        DetectorV3/V5 and both serving backends."""
        first, last = self.carry_targets[0], self.carry_targets[-1]
        pre = jax.jit(lambda u8: u8.astype(jnp.float32) / 255.0)
        jpost = jax.jit(post_fn)

        def detect(params, x):
            del params  # stage weight slices live on their own devices
            x = pre(jax.device_put(x, first))
            heads = [jax.device_put(h, last) for h in self(x)]
            return jpost(heads)

        return detect


class PipelinedForward(_StagedPipeline):
    """Stage-pipelined heads-forward over explicit devices.

    ``__call__(x)`` returns the same raw heads list as
    ``make_forward(spec, ...)`` — bit-identical, just computed across
    ``n_stages`` devices.  For throughput, dispatch several batches
    before reading any back (``map_stream``), exactly like the detect
    pipeline's depth>1 in-flight batching.
    """

    def __init__(self, spec: GraphSpec, params: Dict,
                 n_stages: Optional[int] = None, devices=None,
                 cuts: Optional[Sequence[int]] = None,
                 bn_mode: str = "fold", compute_dtype=jnp.float32,
                 precision=None, activation_dtype=None, head_dtype=None,
                 scan_ladders: bool = False,
                 resolution: Optional[int] = None,
                 data_parallel: int = 1):
        """``data_parallel=N``: PPxDP composition — each stage's program
        is additionally batch-sharded (GSPMD, no collectives in a
        forward) over its own N-device group, consuming
        ``n_stages * N`` devices total.  The batch must divide N.
        Boundary activations move group-to-group as sharded arrays."""
        assert bn_mode in ("fold", "running"), \
            "PP is a serving path (batch-stats BN trains on DP/SP/TP)"
        devices = list(devices if devices is not None else jax.devices())
        dp = int(data_parallel)
        n_stages = n_stages or (len(devices) // dp)
        assert n_stages >= 1 and n_stages * dp <= len(devices), \
            (n_stages, dp, len(devices))
        self.data_parallel = dp
        if dp > 1:
            import numpy as _np
            from jax.sharding import Mesh, NamedSharding
            from jax.sharding import PartitionSpec as P
            groups = [devices[k * dp:(k + 1) * dp]
                      for k in range(n_stages)]
            meshes = [Mesh(_np.array(g), ("data",)) for g in groups]
            self._repl = [NamedSharding(m, P()) for m in meshes]
            self._batch = [NamedSharding(m, P("data")) for m in meshes]
            self.devices = [g[0] for g in groups]
            self._carry_targets = self._batch
        else:
            self.devices = devices[:n_stages]
            self._carry_targets = None
        if bn_mode == "fold" and any("bn_gamma" in v for v in
                                     params.values()):
            params = fold_batchnorm(spec, params)
        if cuts is None:
            cuts = balance_cuts(spec, n_stages, resolution=resolution,
                                scan_ladders=scan_ladders)
        cuts = list(cuts)
        assert len(cuts) == n_stages - 1, (cuts, n_stages)
        self.spec = spec
        self.cuts = cuts
        bounds = [0] + cuts + [len(spec.nodes)]
        self.ranges: List[Tuple[int, int]] = list(zip(bounds, bounds[1:]))
        kw = dict(bn_mode=bn_mode, compute_dtype=compute_dtype,
                  precision=precision, activation_dtype=activation_dtype,
                  head_dtype=head_dtype, scan_ladders=scan_ladders)
        self._fns = []
        self._params = []
        for k, (lo, hi) in enumerate(self.ranges):
            fn = make_forward(spec, stage_range=(lo, hi), **kw)
            if lo == 0:
                f = lambda p, x, fn=fn: fn(p, x)
            else:
                f = lambda p, c, fn=fn: fn(p, None, c)
            if dp > 1:
                # params replicated within the stage group, everything
                # batch-dim-0 sharded over it (inputs, heads, boundary)
                jfn = jax.jit(f, in_shardings=(self._repl[k],
                                               self._batch[k]),
                              out_shardings=self._batch[k])
            else:
                jfn = jax.jit(f)
            self._fns.append(jfn)

        def _place(full):
            placed = []
            for k, (lo, hi) in enumerate(self.ranges):
                sp = {f"node_{i}": full[f"node_{i}"]
                      for i in range(lo, hi) if f"node_{i}" in full}
                placed.append(jax.device_put(
                    sp, self._repl[k] if dp > 1 else self.devices[k]))
            return placed

        self._place = _place
        self._params = _place(params)


def balance_cuts_v5(cfg, n_stages: int,
                    resolution: int = 640) -> List[int]:
    """FLOP-balanced stage boundaries over the v5 step table
    (models/yolov5._v5_steps / v5_step_flops)."""
    from ..models.yolov5 import v5_step_flops
    return _cuts_from_flops(v5_step_flops(cfg, resolution), n_stages)


# v5 steps whose param needs differ from their name ("mA_B" fused
# up/down+concat steps: upsample+concat own no params, down+concat owns
# the stride-2 conv); every other step reads exactly params[name], and
# "m24.i" reads the nested detect conv params["m24"][str(i)].
_V5_STEP_PARAM_KEYS = {"m11_12": (), "m15_16": (),
                       "m18_19": ("m18",), "m21_22": ("m21",)}


class PipelinedForwardV5(_StagedPipeline):
    """Pipeline-parallel YOLOv5 heads-forward: the step-table dataflow
    (models/yolov5._v5_steps) cut into FLOP-balanced contiguous ranges,
    one jitted program per device holding only its modules' weights.
    Same chaining/bit-exactness contract as :class:`PipelinedForward`;
    params must already be in the layout ``bn_mode`` expects
    (inference ``{"w","b"}`` for "fold" — e.g. via fold_v5_batchnorm —
    or the training layout for "running")."""

    def __init__(self, cfg, params: Dict, n_stages: Optional[int] = None,
                 devices=None, cuts: Optional[Sequence[int]] = None,
                 bn_mode: str = "fold", compute_dtype=jnp.bfloat16,
                 activation_dtype=None, head_dtype=None,
                 resolution: int = 640):
        assert bn_mode in ("fold", "running"), \
            "PP is a serving path (batch-stats BN trains on DP/SP/TP)"
        from ..models.yolov5 import _v5_steps, make_yolov5_forward
        devices = list(devices if devices is not None else jax.devices())
        n_stages = n_stages or len(devices)
        assert 1 <= n_stages <= len(devices), (n_stages, len(devices))
        self.devices = devices[:n_stages]
        steps = _v5_steps()
        if cuts is None:
            cuts = balance_cuts_v5(cfg, n_stages, resolution=resolution)
        cuts = list(cuts)
        assert len(cuts) == n_stages - 1, (cuts, n_stages)
        self.cfg = cfg
        self.cuts = cuts
        bounds = [0] + cuts + [len(steps)]
        self.ranges: List[Tuple[int, int]] = list(zip(bounds, bounds[1:]))
        kw = dict(bn_mode=bn_mode, compute_dtype=compute_dtype,
                  activation_dtype=activation_dtype, head_dtype=head_dtype)
        self._fns = []
        self._params = []
        for k, (lo, hi) in enumerate(self.ranges):
            fn = make_yolov5_forward(cfg, stage_range=(lo, hi), **kw)
            if lo == 0:
                jfn = jax.jit(lambda p, x, fn=fn: fn(p, x))
            else:
                jfn = jax.jit(lambda p, c, fn=fn: fn(p, None, c))
            self._fns.append(jfn)

        def _place(full):
            placed = []
            for k, (lo, hi) in enumerate(self.ranges):
                sp: Dict = {}
                for name, _, _, _ in steps[lo:hi]:
                    if name.startswith("m24."):
                        sub = name.split(".", 1)[1]
                        sp.setdefault("m24", {})[sub] = full["m24"][sub]
                        continue
                    for key in _V5_STEP_PARAM_KEYS.get(name, (name,)):
                        sp[key] = full[key]
                placed.append(jax.device_put(sp, self.devices[k]))
            return placed

        self._place = _place
        self._params = _place(params)


class _GPipeTrain:
    """Shared GPipe engine: family subclasses fill ``devices``,
    ``ranges``, ``n_micro``, ``optimizer``, per-stage ``_fwd``/``_bwd``/
    ``_params``/``_opt``/``_n_heads`` (via ``_build_stage``), and
    ``_loss`` (jitted ``(heads, boxes, mask) -> (loss, g_heads)``).

    Optimizer restriction: state is initialized and applied PER STAGE,
    which is exact for per-parameter transforms (adam, sgd, weight
    decay) but changes semantics for cross-parameter couplings —
    ``optax.clip_by_global_norm`` inside the optimizer would clip by
    each stage's local norm instead of the global one.  Use
    per-parameter optimizers here; for global-norm clipping pass
    ``clip_global_norm=`` instead — the step does the cross-stage
    reduction itself (per-stage squared norms -> one scalar on the last
    device -> broadcast scale, all async device-to-device, matching
    ``optax.chain(clip_by_global_norm(c), opt)`` on one device up to fp
    summation order; tests/test_pipeline_parallel.py)."""

    def _init_shared(self, optimizer, clip_global_norm=None):
        self.optimizer = optimizer
        self.clip_global_norm = (None if clip_global_norm is None
                                 else float(clip_global_norm))
        if self.clip_global_norm is not None:
            c = self.clip_global_norm

            def sqn(g):
                leaves = jax.tree_util.tree_leaves(g)
                return sum(jnp.sum(jnp.square(x)) for x in leaves)

            self._sqnorm = jax.jit(sqn)
            self._gnorm = jax.jit(lambda sqs: jnp.sqrt(sum(sqs)))

            def scale(g, gn):
                # optax.clip_by_global_norm semantics: identity when
                # gn < c, else (t / gn) * c (same div-then-mul order)
                return jax.tree_util.tree_map(
                    lambda t: jnp.where(gn < c, t, (t / gn) * c), g)

            self._clipscale = jax.jit(scale)
        self.step_count = 0
        self._fwd, self._bwd = [], []
        self._params, self._opt = [], []
        self._n_heads = []
        self._acc = jax.jit(lambda a, g: jax.tree_util.tree_map(
            jnp.add, a, g))

        def upd(p, o, g):
            import optax
            updates, o2 = optimizer.update(g, o, p)
            return optax.apply_updates(p, updates), o2

        self._upd = jax.jit(upd)

    def _build_stage(self, f, params_slice, k, n_heads):
        """Register stage ``k``: jitted forward, jitted
        recompute-backward (GPipe activation checkpointing — the
        backward program re-runs the stage forward internally, so only
        stage INPUTS are ever stashed), and the stage's weight slice +
        fresh optimizer state on its own device."""
        self._fwd.append(jax.jit(f))

        def b(p, c, ct, f=f):
            _, vjp = jax.vjp(f, p, c)
            return vjp(ct)  # (g_params, g_carry_in)

        self._bwd.append(jax.jit(b))
        sp = jax.device_put(params_slice, self.devices[k])
        self._params.append(sp)
        self._opt.append(jax.device_put(self.optimizer.init(sp),
                                        self.devices[k]))
        self._n_heads.append(n_heads)

    # ------------------------------------------------------------------
    def step(self, images, boxes, box_mask):
        """One pipelined training step over the full batch; updates the
        per-stage params/opt state in place and returns the summed loss
        (a device scalar on the last stage's device)."""
        S = len(self.ranges)
        images = jnp.asarray(images)
        if images.dtype == jnp.uint8:
            # uint8 loader canvases (data/coco.py uint8 mode): normalize
            # once up front — the stage programs consume 0-1 floats.
            images = images.astype(jnp.float32) / 255.0
        B = images.shape[0]
        assert B % self.n_micro == 0, (B, self.n_micro)
        mb = B // self.n_micro
        last = self.devices[-1]

        # ---- forward sweep (all microbatches; dispatch is async, so
        # stage k of microbatch i overlaps stage k+1 of microbatch i-1)
        stage_inputs = []   # [m][k] carry_in for the recompute-backward
        stage_heads = []    # [m][k] heads emitted by stage k
        for m in range(self.n_micro):
            x = jax.device_put(jnp.asarray(images[m * mb:(m + 1) * mb]),
                               self.devices[0])
            ins, hds = [], []
            carry = x
            for k in range(S):
                ins.append(carry)
                heads_k, out = self._fwd[k](self._params[k], carry)
                hds.append(heads_k)
                if k + 1 < S:
                    carry = jax.device_put(out, self.devices[k + 1])
            stage_inputs.append(ins)
            stage_heads.append(hds)

        # ---- loss + head cotangents per microbatch (last device)
        losses, headgrads = [], []
        for m in range(self.n_micro):
            flat = [jax.device_put(h, last)
                    for hs in stage_heads[m] for h in hs]
            bx = jax.device_put(jnp.asarray(
                boxes[m * mb:(m + 1) * mb]), last)
            bm = jax.device_put(jnp.asarray(
                box_mask[m * mb:(m + 1) * mb]), last)
            loss_m, g_heads = self._loss(flat, bx, bm)
            losses.append(loss_m)
            headgrads.append(g_heads)

        # ---- backward sweep, reverse stage order, grads accumulated
        # per stage on its own device
        g_acc = [None] * S
        for m in range(self.n_micro):
            # split this microbatch's head grads back to their stages
            per_stage, i = [], 0
            for k in range(S):
                n = self._n_heads[k]
                per_stage.append(headgrads[m][i:i + n])
                i += n
            g_carry = {}  # last stage's boundary is empty
            for k in reversed(range(S)):
                ct = ([jax.device_put(g, self.devices[k])
                       for g in per_stage[k]],
                      {kk: jax.device_put(v, self.devices[k])
                       for kk, v in g_carry.items()})
                g_p, g_c = self._bwd[k](self._params[k],
                                        stage_inputs[m][k], ct)
                g_acc[k] = g_p if g_acc[k] is None \
                    else self._acc(g_acc[k], g_p)
                g_carry = g_c if k > 0 else {}

        # ---- cross-stage global-norm clip (all async: per-stage
        # squared norms meet on the last device, the norm scalar rides
        # back to each stage for the scale)
        if self.clip_global_norm is not None:
            sqs = [jax.device_put(self._sqnorm(g_acc[k]), last)
                   for k in range(S)]
            gn = self._gnorm(sqs)
            g_acc = [self._clipscale(
                g_acc[k], jax.device_put(gn, self.devices[k]))
                for k in range(S)]

        # ---- per-stage optimizer update (each on its own device)
        for k in range(S):
            self._params[k], self._opt[k] = self._upd(
                self._params[k], self._opt[k], g_acc[k])
        self.step_count += 1
        total = losses[0]
        for l in losses[1:]:
            total = total + jax.device_put(l, last)
        return total

    def gather_params(self) -> Dict:
        """Assemble the full (host) param dict from the stage slices —
        for eval, export, or checkpointing.  Merges one level deep:
        a nested module dict split across stages (the v5 ``m24`` detect
        heads when cuts separate them) is combined, not clobbered."""
        out: Dict = {}
        for sp in self._params:
            for key, val in jax.device_get(sp).items():
                if (key in out and isinstance(out[key], dict)
                        and isinstance(val, dict)
                        and not any(k in out[key] for k in val)):
                    out[key].update(val)
                else:
                    out[key] = val
        return out

    def save_checkpoint(self, path: str) -> None:
        """orbax checkpoint of the full PP train state: per-stage param
        and optimizer slices (kept as the stage list so restore needs no
        re-slicing) plus the step count."""
        import os
        import orbax.checkpoint as ocp
        from ..utils.transfer import parallel_device_get
        # chunked/threaded pulls: the tunnel throttles single streams
        # (utils/transfer.py — 95 s for a monolithic 744 MB pull)
        state = {"params": [parallel_device_get(p) for p in self._params],
                 "opt": [parallel_device_get(o) for o in self._opt],
                 "step": self.step_count}
        ocp.PyTreeCheckpointer().save(os.path.abspath(path), state,
                                      force=True)

    def restore_checkpoint(self, path: str) -> None:
        """Resume from :meth:`save_checkpoint`; stage count and cuts
        must match (the checkpoint stores per-stage slices).  Each
        stage's slice lands back on its own device."""
        import os
        import orbax.checkpoint as ocp
        from ..utils.transfer import parallel_device_get
        template = {"params": [parallel_device_get(p)
                               for p in self._params],
                    "opt": [parallel_device_get(o) for o in self._opt],
                    "step": self.step_count}
        state = ocp.PyTreeCheckpointer().restore(os.path.abspath(path),
                                                 item=template)
        assert len(state["params"]) == len(self._params), \
            (len(state["params"]), len(self._params), "stage count differs")
        self._params = [jax.device_put(p, d) for p, d in
                        zip(state["params"], self.devices)]
        # orbax may return tuples as lists inside the optax state; keep
        # the original tree structure from the live optimizer state
        self._opt = [
            jax.device_put(jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(o_live),
                jax.tree_util.tree_leaves(o_ckpt)), d)
            for o_ckpt, o_live, d in zip(state["opt"], self._opt,
                                         self.devices)]
        self.step_count = int(state["step"])


class PipelinedTrainStep(_GPipeTrain):
    """GPipe-style pipeline-parallel training for the Darknet families.

    The graph is cut into FLOP-balanced stages (same ``balance_cuts`` as
    serving); each stage holds ONLY its weight slice and its slice of
    the Adam state on its own device, so parameter, optimizer, and
    activation memory all scale ~1/n_stages.  A training step splits the
    batch into ``n_micro`` microbatches, runs all forwards (async
    dispatch overlaps stage k of microbatch i with stage k-1 of i+1),
    computes loss + head cotangents on the last stage's device, then
    runs the backwards in reverse, accumulating per-stage gradients.
    The backward follows GPipe's activation-checkpoint recipe: only
    stage INPUTS are stashed, and each stage's backward is one jitted
    program that recomputes its forward internally
    (``jax.vjp`` inside the jit) — no residual traffic between host and
    stages, bounded memory per microbatch.

    BatchNorm runs in "running" (frozen-stats, trainable affine) mode —
    fine-tune semantics.  Batch-stats BN is mathematically incompatible
    with microbatching (each microbatch would see different statistics;
    the reference's nn.DataParallel has the same per-replica behavior),
    so the DP/SP/TP mesh path (train/step.py) remains the from-scratch
    trainer; PP is the fine-tune / memory-bound option.  Loss is the
    reference's masked sum-MSE (train/loss.py), which is additive over
    batch rows, so microbatch gradient accumulation is exact — the step
    matches a single-device running-BN step bit-for-close (float
    summation order differs; tests/test_pipeline_parallel.py pins
    rtol=1e-5).  No reference counterpart (its parallelism is
    nn.DataParallel, /root/reference/detect.py:177-183).
    """

    def __init__(self, spec: GraphSpec, params: Dict, optimizer,
                 n_stages: Optional[int] = None, devices=None,
                 cuts: Optional[Sequence[int]] = None,
                 resolution: int = 416, n_micro: int = 2,
                 class_filter: Optional[int] = 0,
                 reference_bug_wh_iou: bool = True,
                 parity_swap_xy: bool = False,
                 compute_dtype=jnp.float32, precision=None,
                 scan_ladders: bool = False,
                 clip_global_norm: Optional[float] = None):
        from ..ops.decode import decode_heads
        from ..train.loss import yolo_loss
        from ..train.targets import build_targets

        devices = list(devices if devices is not None else jax.devices())
        n_stages = n_stages or len(devices)
        assert 1 <= n_stages <= len(devices), (n_stages, len(devices))
        self.devices = devices[:n_stages]
        self.n_micro = int(n_micro)
        self.spec = spec
        self.resolution = resolution
        if cuts is None:
            cuts = balance_cuts(spec, n_stages, resolution=resolution,
                                scan_ladders=scan_ladders)
        cuts = list(cuts)
        assert len(cuts) == n_stages - 1, (cuts, n_stages)
        self.cuts = cuts
        bounds = [0] + cuts + [len(spec.nodes)]
        self.ranges = list(zip(bounds, bounds[1:]))
        self._init_shared(optimizer, clip_global_norm)

        from ..cfg_parser import YoloSpec
        kw = dict(bn_mode="running", compute_dtype=compute_dtype,
                  precision=precision, scan_ladders=scan_ladders)
        for k, (lo, hi) in enumerate(self.ranges):
            fn = make_forward(spec, stage_range=(lo, hi), **kw)
            if lo == 0:
                f = lambda p, c, fn=fn: fn(p, c)
            else:
                f = lambda p, c, fn=fn: fn(p, None, c)
            stage_params = {
                f"node_{i}": params[f"node_{i}"]
                for i in range(lo, hi) if f"node_{i}" in params}
            self._build_stage(f, stage_params, k, sum(
                1 for n in spec.nodes[lo:hi] if isinstance(n, YoloSpec)))

        def loss_and_headgrads(heads, boxes, box_mask):
            targets, obj_mask = build_targets(
                spec, boxes, box_mask, resolution,
                class_filter=class_filter,
                reference_bug_wh_iou=reference_bug_wh_iou,
                parity_swap_xy=parity_swap_xy)

            def loss_of(hs):
                pred = decode_heads(hs, spec, resolution, train=True)
                return yolo_loss(pred, targets, obj_mask)

            return jax.value_and_grad(loss_of)(list(heads))

        self._loss = jax.jit(loss_and_headgrads)


class PipelinedTrainStepV5(_GPipeTrain):
    """GPipe pipeline-parallel fine-tuning for the YOLOv5 family.

    Same engine as :class:`PipelinedTrainStep` (per-stage Adam, GPipe
    schedule, recompute backward, frozen-stats BN) over the v5 step
    table.  One semantic difference, inherited from ultralytics: the v5
    loss normalizes by the batch's matched-anchor count (train/v5.py
    yolo_loss_v5), so microbatch accumulation follows ultralytics'
    gradient-accumulation semantics (sum of per-microbatch normalized
    losses) rather than bitwise full-batch equality — the test pins PP
    == a single-device step that accumulates the SAME microbatches.
    ``params`` must be the training layout
    (``init_yolov5_params(batch_norm=True)``); BN stats stay frozen.
    """

    def __init__(self, cfg, params: Dict, optimizer,
                 n_stages: Optional[int] = None, devices=None,
                 cuts: Optional[Sequence[int]] = None,
                 resolution: int = 640, n_micro: int = 2,
                 num_classes: int = 80,
                 compute_dtype=jnp.float32,
                 clip_global_norm: Optional[float] = None):
        from ..models.yolov5 import _v5_steps, make_yolov5_forward
        from ..train.v5 import yolo_loss_v5

        devices = list(devices if devices is not None else jax.devices())
        n_stages = n_stages or len(devices)
        assert 1 <= n_stages <= len(devices), (n_stages, len(devices))
        self.devices = devices[:n_stages]
        self.n_micro = int(n_micro)
        self.cfg = cfg
        self.resolution = resolution
        steps = _v5_steps()
        if cuts is None:
            cuts = balance_cuts_v5(cfg, n_stages, resolution=resolution)
        cuts = list(cuts)
        assert len(cuts) == n_stages - 1, (cuts, n_stages)
        self.cuts = cuts
        bounds = [0] + cuts + [len(steps)]
        self.ranges = list(zip(bounds, bounds[1:]))
        self._init_shared(optimizer, clip_global_norm)

        kw = dict(bn_mode="running", compute_dtype=compute_dtype)
        for k, (lo, hi) in enumerate(self.ranges):
            fn = make_yolov5_forward(cfg, stage_range=(lo, hi), **kw)
            if lo == 0:
                f = lambda p, c, fn=fn: fn(p, c)
            else:
                f = lambda p, c, fn=fn: fn(p, None, c)
            stage_params: Dict = {}
            for name, _, _, _ in steps[lo:hi]:
                if name.startswith("m24."):
                    sub = name.split(".", 1)[1]
                    stage_params.setdefault("m24", {})[sub] = \
                        params["m24"][sub]
                    continue
                for key in _V5_STEP_PARAM_KEYS.get(name, (name,)):
                    stage_params[key] = params[key]
            self._build_stage(f, stage_params, k, sum(
                1 for n, _, _, _ in steps[lo:hi]
                if n.startswith("m24.")))

        def loss_and_headgrads(heads, boxes, box_mask):
            def loss_of(hs):
                total, _ = yolo_loss_v5(list(hs), boxes, box_mask,
                                        num_classes, resolution)
                return total

            return jax.value_and_grad(loss_of)(list(heads))

        self._loss = jax.jit(loss_and_headgrads)
