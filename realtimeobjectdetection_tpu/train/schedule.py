"""Learning-rate schedules from the Darknet ``[net]`` block.

The reference parses the cfg's training hyperparameters (learning_rate,
burn_in, steps, scales, momentum, decay — cfg/yolov3.cfg [net]) but
ignores every one of them, hard-coding Adam lr=1e-2 (train.py:57;
SURVEY §5 "the [net] block carries hyperparameters that the code parses
but ignores").  This module honors them: a Darknet-semantics schedule
(burn-in warmup + step decays) built straight from the GraphSpec's
``net.raw`` dict, usable with any optax optimizer.
"""

from __future__ import annotations

from typing import Dict, Optional

import optax

from ..cfg_parser import GraphSpec

__all__ = ["schedule_from_net", "optimizer_from_net", "cosine_schedule_v5"]


def cosine_schedule_v5(base_lr: float, epochs: int, steps_per_epoch: int,
                       warmup_epochs: float = 3.0, lrf: float = 0.01,
                       warmup_start_frac: float = 0.0):
    """ultralytics one-cycle cosine schedule (train.py ``one_cycle`` +
    3-epoch linear warmup), per optimizer step.

    After warmup the lr follows
    ``lr(e) = base_lr * (lrf + (1 - lrf) * 0.5 * (1 + cos(pi e / E)))``
    with e the fractional epoch; during the first ``warmup_epochs`` it
    ramps linearly from ``warmup_start_frac * base_lr`` to the cosine
    curve.  (ultralytics additionally warms bias params from 0.1 with a
    separate group — one scalar schedule here; deviation documented.)
    Returns an optax-compatible ``schedule(count) -> lr``.
    """
    import jax.numpy as jnp
    warm_steps = max(int(warmup_epochs * steps_per_epoch), 1)

    def schedule(count):
        step = jnp.asarray(count, jnp.float32)
        e = step / steps_per_epoch
        cos = lrf + (1.0 - lrf) * 0.5 * (1.0 + jnp.cos(
            jnp.pi * jnp.minimum(e, float(epochs)) / epochs))
        lr = base_lr * cos
        warm = base_lr * warmup_start_frac + \
            (lr - base_lr * warmup_start_frac) * (step / warm_steps)
        return jnp.where(step < warm_steps, warm, lr)

    return schedule


def schedule_from_net(net_raw: Dict[str, str],
                      base_lr: Optional[float] = None):
    """Darknet policy: lr * (step/burn_in)^4 during burn-in, then step
    decays at ``steps`` by ``scales`` (multiplicative, like darknet)."""
    lr = base_lr if base_lr is not None \
        else float(net_raw.get("learning_rate", 1e-3))
    burn_in = int(net_raw.get("burn_in", 0))
    steps = [int(s) for s in net_raw.get("steps", "").split(",") if s]
    scales = [float(s) for s in net_raw.get("scales", "").split(",") if s]

    def schedule(count):
        import jax.numpy as jnp
        step = jnp.asarray(count, jnp.float32)
        rate = jnp.asarray(lr, jnp.float32)
        if burn_in > 0:
            warm = rate * jnp.power(step / burn_in, 4.0)
            rate = jnp.where(step < burn_in, warm, rate)
        for boundary, scale in zip(steps, scales):
            rate = jnp.where(step >= boundary, rate * scale, rate)
        return rate

    return schedule


def optimizer_from_net(spec: GraphSpec, base_lr: Optional[float] = None,
                       optimizer: str = "sgd"):
    """Build the optimizer the cfg asks for.

    ``sgd``: darknet's momentum+decay semantics (momentum 0.9, weight
    decay 0.0005 from the [net] block); ``adam``: the reference trainer's
    choice with the cfg schedule on top.
    """
    raw = spec.net.raw
    sched = schedule_from_net(raw, base_lr)
    if optimizer == "adam":
        return optax.adam(sched)
    momentum = float(raw.get("momentum", 0.9))
    decay = float(raw.get("decay", 0.0005))

    def _decay_mask(params):
        # darknet decays conv kernels only — BN stats/affine and biases
        # must not shrink (decaying bn_mean/bn_var corrupts inference)
        import jax
        return jax.tree_util.tree_map_with_path(
            lambda path, _: path[-1].key == "w", params)

    return optax.chain(
        optax.add_decayed_weights(decay, mask=_decay_mask),
        optax.sgd(sched, momentum=momentum),
    )
