"""Persistent XLA compilation cache for every jitted path in the package.

The flagship device programs (the v1-7 NN-OMP estimator at the 0.1-degree
grid in particular) cost tens of seconds to compile on the tunneled TPU; a
fresh process — ``cli estimate --engine device``, a user script, the round
driver's bench — must not pay that more than once per machine.  Every jit
factory in the package calls :func:`enable_persistent_cache` before building
its executable, which idempotently points JAX's persistent compilation cache
at a stable on-disk directory.

Resolution order for the directory:

1. already configured (``jax_compilation_cache_dir`` set by the caller,
   e.g. bench.py's ``build/jax_cache``) — left untouched;
2. ``SLAM_PROCESS_TPU_COMPILE_CACHE`` env var;
3. ``~/.cache/slam_process_tpu/jax_cache``.

Set ``SLAM_PROCESS_TPU_NO_COMPILE_CACHE=1`` to disable entirely.
"""

from __future__ import annotations

import os
from typing import Optional

_DONE: Optional[str] = None


def enable_persistent_cache(path: Optional[str] = None) -> Optional[str]:
    """Idempotently configure JAX's persistent compilation cache.

    Returns the cache directory in use (or None when disabled/unavailable).
    Cheap after the first call; safe to call from every jit factory.
    """
    global _DONE
    if _DONE is not None:
        return _DONE or None
    if os.environ.get("SLAM_PROCESS_TPU_NO_COMPILE_CACHE"):
        _DONE = ""
        return None
    try:
        import jax

        current = getattr(jax.config, "jax_compilation_cache_dir", None)
        if current:
            _DONE = str(current)
            return _DONE
        path = (path
                or os.environ.get("SLAM_PROCESS_TPU_COMPILE_CACHE")
                or os.path.join(os.path.expanduser("~"), ".cache",
                                "slam_process_tpu", "jax_cache"))
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(path))
        # Small programs recompile faster than a cache round-trip; only
        # persist compiles that actually hurt.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _DONE = str(path)
        return _DONE
    except Exception:   # pragma: no cover — cache is an optimization only
        _DONE = ""
        return None
