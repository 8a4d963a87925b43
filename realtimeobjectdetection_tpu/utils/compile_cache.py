"""Persistent XLA compile cache management.

Fresh compiles of the full nets through the axon tunnel's remote
compile service take 3-10 minutes; the persistent cache brings reruns
down to seconds (PERFORMANCE.md "Compile economics").  The reference
has no analog — torch has no AOT compile step to amortize — but for a
production TPU deployment cold-start time is a first-class property,
so the cache is managed here and pre-seedable via ``rodtpu warmup``.

TPU-ONLY: XLA:CPU cache entries are AOT machine code keyed without the
host's CPU features, so a cache dir shared between hosts poisons CPU
runs (observed: foreign entries SIGILL/hang an 8-device CPU-mesh run at
a collective rendezvous — __graft_entry__.py documents the incident).
TPU entries are keyed on the device and safe to share, and they are the
expensive ones, so the cache is enabled iff the backend is TPU.
"""

from __future__ import annotations

import os
from typing import Optional

__all__ = ["enable_persistent_cache", "default_cache_dir"]


def default_cache_dir() -> str:
    """JAX_COMPILATION_CACHE_DIR if set (jax may have been pre-imported
    before the env var could take effect — honor it explicitly), else
    ``~/.cache/jax``."""
    return (os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or os.path.join(os.path.expanduser("~"), ".cache", "jax"))


def enable_persistent_cache(path: Optional[str] = None,
                            min_compile_secs: float = 1.0) -> bool:
    """Point jax at the persistent compile cache iff the backend is TPU.

    Returns True when enabled.  Safe to call repeatedly and before/after
    other jax work; a CPU/interpret backend leaves the config untouched
    (see module docstring for why).
    """
    try:
        import jax
        if jax.default_backend() != "tpu":
            return False
        path = path or default_cache_dir()
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_secs))
        return True
    except Exception:
        return False
