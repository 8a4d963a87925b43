"""Preemption-safe training: SIGTERM -> checkpoint -> clean exit.

The reference has NO failure handling (SURVEY §5: no elastic recovery,
no signal handling anywhere); on managed TPU fleets preemption is
routine, so the rebuild adds a fourth checkpoint tier next to the
reference's three (weight_epoch<N> / checkpoint / training_output,
/root/reference/train.py:340-341, 403-410, 376-380):

* ``train()`` installs a SIGTERM handler that only flips a flag — no
  work happens in signal context;
* the epoch loop polls the flag at every batch boundary (the step is
  one XLA dispatch, so a boundary is never more than one step away),
  saves ``<out_dir>/preempt`` (full orbax train state + ``.weights``
  interop blob, via the trainer's standard ``save``) plus a
  ``preempt.json`` sidecar (epoch / batch / step for observability),
  and returns the history accumulated so far;
* resume = ``restore(<out_dir>/preempt)`` — the ordinary fine-tune
  path; continuation equality is pinned in
  tests/test_trainer_and_validator.py::test_preempt_checkpoint_resume.

Both trainer families (DarknetTrainer, TrainerV5) mix this in.
"""
from __future__ import annotations

import json
import os

import jax

__all__ = ["PreemptSupport"]


class PreemptSupport:
    """Mixin for trainers exposing ``save(name)``, ``state``, ``out_dir``,
    ``history``."""

    _preempted = False

    def request_preempt(self, *_args) -> None:
        """Ask the running ``train()`` loop to checkpoint and exit at the
        next batch boundary.  Safe to call from a signal handler or any
        thread (it only sets a flag)."""
        self._preempted = True

    def _install_preempt(self):
        """Install the SIGTERM handler; returns a zero-arg restore
        function.  Outside the main thread (e.g. a serving-side
        fine-tune worker) signal registration is impossible — polling
        via :meth:`request_preempt` still works, so this degrades to a
        no-op instead of raising."""
        import signal
        try:
            prev = signal.signal(signal.SIGTERM,
                                 lambda *_: self.request_preempt())
        except ValueError:
            return lambda: None
        return lambda: signal.signal(signal.SIGTERM, prev)

    def resume_preempt(self) -> dict:
        """Restore the ``preempt`` tier AND arm the next ``train()`` call
        to fast-forward to the exact saved position: training continues
        at preempt.json's (epoch, batch) with the same shuffled data
        order (``padded_batches`` is seeded per epoch) and the same
        multi-scale resolution draws, so the preempted + resumed run is
        bit-identical to an uninterrupted one
        (tests/test_trainer_and_validator.py::
        test_preempt_midepoch_resume_exact).  Plain ``restore(preempt)``
        without this re-runs the interrupted epoch from its first batch
        — safe but repeats work.  Returns the sidecar metadata."""
        self.restore(os.path.join(self.out_dir, "preempt"))
        with open(os.path.join(self.out_dir, "preempt.json")) as f:
            meta = json.load(f)
        self._resume_meta = dict(meta)
        return meta

    def _resume_position(self):
        """(start_epoch, batches_to_skip) for the epoch loop; one-shot."""
        meta = getattr(self, "_resume_meta", None)
        self._resume_meta = None
        if meta:
            return int(meta["epoch"]), int(meta["batch"])
        return 1, 0

    def _save_preempt(self, epoch: int, batch: int, verbose: bool):
        self.save("preempt")
        meta = {"epoch": epoch, "batch": batch,
                "step": int(jax.device_get(self.state.step))}
        with open(os.path.join(self.out_dir, "preempt.json"), "w") as f:
            json.dump(meta, f)
        if verbose:
            print(f"\n\tPreempted at epoch {epoch} batch {batch} — "
                  f"state saved to {os.path.join(self.out_dir, 'preempt')}")
        return self.history
