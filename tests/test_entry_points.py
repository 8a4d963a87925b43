"""Driver entry-point fences (__graft_entry__.py, bench.py).

The driver compile-checks ``entry()`` single-chip and executes
``dryrun_multichip`` on virtual CPU devices; bench.py produces the
judged JSON line.  These tests fence the cheap invariants that broke in
practice:

* the shared persistent compile cache must never be enabled on a CPU
  backend — XLA:CPU cache entries are host-specific AOT machine code,
  and entries written by one host crash or hang another (observed: a
  foreign ``jit_step`` entry wedged the 8-device dryrun at a
  collective-permute rendezvous);
* ``entry()`` must return a traceable (jittable) step with matching
  example args.
"""

import jax
import jax.numpy as jnp

import __graft_entry__ as ge


def test_cache_not_enabled_on_cpu(cpu_devices):
    before = jax.config.jax_compilation_cache_dir
    ge._enable_compile_cache_if_tpu()
    assert jax.config.jax_compilation_cache_dir == before
    assert jax.config.jax_compilation_cache_dir != "/root/.cache/jax"


def test_entry_returns_jittable_step(cpu_devices):
    fn, args = ge.entry()
    # eval_shape traces the full program without compiling/executing it —
    # a CPU-cheap proof that the step is jit-compatible on any backend
    out = jax.eval_shape(fn, *args)
    boxes, valid = out
    assert boxes.shape[0] == args[1].shape[0]
    # 7-col device rows (x1 y1 x2 y2 obj cls_conf cls); the reference's
    # 8th column (batch index, detect.py:104-107) is added host-side
    assert boxes.shape[-1] == 7
    assert valid.dtype == jnp.bool_
