"""Persistent XLA compilation cache for every jitted path in the package.

The flagship device programs (the v1-7 NN-OMP estimator at the 0.1-degree
grid in particular) cost tens of seconds to compile on the tunneled TPU; a
fresh process — ``cli estimate --engine device``, a user script, the round
driver's bench — must not pay that more than once per machine.  Every jit
factory in the package calls :func:`enable_persistent_cache` before building
its executable, which idempotently points JAX's persistent compilation cache
at a stable on-disk directory.

Resolution order for the BASE directory:

1. already configured (``jax_compilation_cache_dir`` set by the caller) —
   left untouched;
2. ``SLAM_PROCESS_TPU_COMPILE_CACHE`` env var;
3. bench.py passes ``build/jax_cache`` explicitly;
4. ``~/.cache/slam_process_tpu/jax_cache``.

The cache directory actually used is ``<base>/<fingerprint>`` where the
fingerprint names the backend and — for the CPU backend — the host CPU
feature set.  The repo's ``build/jax_cache`` persists on a filesystem that
several machines mount across rounds (builder, driver, judge); XLA:CPU
entries embed AOT-compiled host code, and loading one compiled on a CPU
with different features warns "could lead to execution errors such as
SIGILL" (observed in MULTICHIP_r04).  Scoping CPU entries to a CPU-feature
fingerprint makes a foreign-machine entry unloadable by construction; TPU
entries are keyed by chip program, independent of the host CPU, and share
one subdirectory so the chip cache stays warm across hosts.

Set ``SLAM_PROCESS_TPU_NO_COMPILE_CACHE=1`` to disable entirely.
"""

from __future__ import annotations

import hashlib
import os
import platform as _platform
from typing import Optional

_DONE: Optional[str] = None


_PORTABLE_ISA = "AVX2"


def ensure_portable_cpu_isa() -> bool:
    """Cap XLA:CPU codegen at a portable ISA (AVX2) via ``XLA_FLAGS``.

    Must run BEFORE the CPU backend initializes.  Two effects:

    * entries in the persistent compilation cache become loadable on any
      x86-64 host with AVX2 — the repo's cache directory outlives the
      machine that wrote it (builder/driver/judge mount it across
      rounds), and uncapped entries AOT-target the compiling host's full
      feature set (AMX/AVX512), risking SIGILL elsewhere;
    * the ``cpu_aot_loader`` machine-feature mismatch warning disappears
      entirely — uncapped XLA appends tuning pseudo-features
      (``+prefer-no-gather/scatter``) that the host-feature probe never
      reports, so the warning fires even for same-machine cache loads
      (verified empirically: AVX512 cap still warns, AVX2/SSE4_2 do not).

    Returns True when the cap is (already) in effect; False when the
    caller set a different ``xla_cpu_max_isa`` explicitly (respected).
    """
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_cpu_max_isa" in flags:
        # Exact match only — the same predicate machine_fingerprint uses,
        # so "cap in effect" and "portable cache subdir" can never
        # disagree (a lowercase or different cap falls back to the
        # host-feature-hash fingerprint).
        return f"xla_cpu_max_isa={_PORTABLE_ISA}" in flags
    os.environ["XLA_FLAGS"] = (
        f"{flags} --xla_cpu_max_isa={_PORTABLE_ISA}").strip()
    return True


def machine_fingerprint(backend: str) -> str:
    """Cache-subdirectory name scoping entries to where they can run.

    TPU: executables target the chip, not the host — one shared subdir
    keyed by backend + jax version (a jax upgrade invalidates keys anyway).
    CPU with the portable ISA cap (:func:`ensure_portable_cpu_isa`):
    entries run on any x86-64-with-AVX2 host — shared ``isaAVX2`` subdir.
    CPU uncapped: XLA AOT-compiles for the host microarchitecture —
    include the machine arch and a hash of the CPU feature flags.
    """
    import jax

    ver = jax.__version__
    if backend != "cpu":
        return f"{backend}-jax{ver}"
    xf = os.environ.get("XLA_FLAGS", "")
    machine = _platform.machine()
    # The AVX2 cap is an x86 ISA bound; on other architectures (aarch64:
    # SVE/NEON variants) it constrains nothing, so only x86 hosts may
    # share the portable subdir — everything else stays feature-hashed.
    if (machine in ("x86_64", "AMD64")
            and f"xla_cpu_max_isa={_PORTABLE_ISA}" in xf):
        return f"cpu-jax{ver}-{machine}-isa{_PORTABLE_ISA}"
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    h = hashlib.sha256(flags.encode()).hexdigest()[:12]
    return f"cpu-jax{ver}-{_platform.machine()}-{h}"


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
        base = (path
                or os.environ.get("SLAM_PROCESS_TPU_COMPILE_CACHE")
                or os.path.join(os.path.expanduser("~"), ".cache",
                                "slam_process_tpu", "jax_cache"))
        # default_backend() initializes the backend; callers are jit
        # factories about to dispatch, so init is imminent regardless.
        path = os.path.join(base, machine_fingerprint(jax.default_backend()))
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
