"""Ground-truth device timing from jax.profiler xplane traces.

Host wall-clock cannot measure device execution on relay-style PJRT
transports: ``block_until_ready`` can return on the transport's dispatch
acknowledgement long before the device runs the program (measured on the
axon relay: a chained K-iteration 256 MB-read program wall-times the same
at K=2 and K=520 — tools/diag_roofline.py), and a D2H read adds
multi-second transport costs of its own.  The profiler's DEVICE plane,
however, records op/module begin/end ON the TPU, immune to both effects.

``measure_device_time`` runs a callable a few times inside a
``jax.profiler.trace`` window (with one real D2H read at the end so the
executions provably complete inside the window), parses the resulting
``*.xplane.pb`` directly, and returns the per-execution durations of the
``XLA Modules`` events — the authoritative device time of each run.

The xplane proto schema is loaded straight from tensorflow's bundled
``tsl/profiler/protobuf/xplane_pb2.py`` (importing the tensorflow package
itself costs ~10 s and is not needed).

Used by bench.py for every device-side metric since round 3; round 2's
wall-clock "device" numbers were dispatch-ack artifacts (up to 4 orders of
magnitude off — see VERDICT r02 Weak #3/#4 and docs/STATUS.md).
"""

from __future__ import annotations

import importlib.util
import shutil
import sys
import tempfile
from collections import defaultdict
from pathlib import Path
from typing import Callable, Dict, List, NamedTuple, Optional

__all__ = [
    "DeviceTiming",
    "measure_device_time",
    "module_device_times",
    "op_device_times",
]


def _load_xplane_pb2():
    if "slam_xplane_pb2" in sys.modules:
        return sys.modules["slam_xplane_pb2"]
    import numpy as np

    site = Path(np.__file__).resolve().parent.parent
    path = site / "tensorflow" / "tsl" / "profiler" / "protobuf" / "xplane_pb2.py"
    if not path.exists():
        raise FileNotFoundError(
            f"xplane_pb2.py not found at {path}; install tensorflow or "
            "tensorboard-plugin-profile for xplane parsing")
    spec = importlib.util.spec_from_file_location("slam_xplane_pb2", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["slam_xplane_pb2"] = mod
    spec.loader.exec_module(mod)
    return mod


def module_device_times(trace_dir) -> Dict[str, List[float]]:
    """Per-execution device durations of every XLA module in a trace.

    Scans every ``*.xplane.pb`` under ``trace_dir`` for device planes
    (any plane with an ``XLA Modules`` line — '/device:TPU:0' on TPU,
    the TFRT CPU plane under the CPU backend) and returns
    ``{module_name: [duration_seconds, ...]}`` with durations in
    execution order.  Module names look like ``jit_batched(fingerprint)``;
    the fingerprint suffix is stripped.
    """
    xplane_pb2 = _load_xplane_pb2()
    out: Dict[str, List[tuple]] = defaultdict(list)
    for pb in sorted(Path(trace_dir).rglob("*.xplane.pb")):
        space = xplane_pb2.XSpace()
        space.ParseFromString(pb.read_bytes())
        for plane in space.planes:
            ev_meta = {eid: em.name for eid, em in plane.event_metadata.items()}
            for line in plane.lines:
                if line.name != "XLA Modules":
                    continue
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, "?").split("(")[0]
                    t0 = line.timestamp_ns * 1e3 + ev.offset_ps  # ps
                    out[name].append((t0, ev.duration_ps / 1e12))
    return {k: [d for _, d in sorted(v)] for k, v in out.items()}


def op_device_times(trace_dir) -> Dict[str, float]:
    """Total device seconds per XLA OP name across a trace.

    Parses the device planes' ``XLA Ops`` lines (per-op begin/end on the
    TPU) and sums durations by op name.  Op names are HLO instruction
    names (``fusion.123``, ``dot.45``...); callers aggregate further if
    needed.  Used by tools/diag_hot_ops.py for the stage-level
    roofline-bound table.
    """
    xplane_pb2 = _load_xplane_pb2()
    out: Dict[str, float] = defaultdict(float)
    for pb in sorted(Path(trace_dir).rglob("*.xplane.pb")):
        space = xplane_pb2.XSpace()
        space.ParseFromString(pb.read_bytes())
        for plane in space.planes:
            ev_meta = {eid: em.name for eid, em in plane.event_metadata.items()}
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, "?")
                    out[name] += ev.duration_ps / 1e12
    return dict(out)


class DeviceTiming(NamedTuple):
    """Result of measure_device_time."""

    runs: List[float]          # per-execution device seconds, in order
    module: str                # XLA module name the runs belong to
    all_modules: Dict[str, List[float]]  # every module seen in the window

    @property
    def median(self) -> float:
        s = sorted(self.runs)
        return s[len(s) // 2]

    @property
    def total(self) -> float:
        return sum(self.runs)


def measure_device_time(
    call: Callable[[int], object],
    n: int = 3,
    module: Optional[str] = None,
    trace_dir=None,
) -> DeviceTiming:
    """True device seconds per execution of ``call``.

    ``call(i)`` must dispatch the program under measurement and return a
    (small) jax array; after the n calls, one ``jax.device_get`` of the
    last return value forces every dispatched execution to complete inside
    the trace window (programs execute in dispatch order per device).
    Warm/compile ``call`` BEFORE invoking this, or the first run's duration
    will include autotuning noise (compile time itself happens host-side
    and never lands on the device plane).

    ``module`` selects which XLA module's durations to report when the
    callable dispatches more than one distinct program (substring match);
    by default the module with the largest total device time is chosen.

    Returns per-run durations for the chosen module; if the callable
    dispatches that module multiple times per call, every execution is a
    "run" (e.g. a loop over 19 sessions yields 19*n runs — use ``total``
    and divide by n for per-call device seconds).
    """
    import jax

    if jax.default_backend() == "cpu":
        # The CPU backend emits no 'XLA Modules' device plane (only a
        # host thread line), and unlike the relay transport its
        # block_until_ready IS execution-truthful — so wall-clock per
        # call is the honest measurement there.  Lets bench.py's
        # relay-down CPU fallback produce real numbers.
        import time as _time

        import jax.numpy as jnp

        # Queue barrier WITHOUT invoking call() (a donated-buffer callable
        # must be dispatched exactly once per index): programs execute in
        # dispatch order per device, so reading a freshly dispatched
        # trivial program drains everything queued before it.
        jax.device_get(jax.jit(lambda: jnp.zeros((), jnp.int32))())
        runs = []
        for i in range(n):
            t0 = _time.perf_counter()
            jax.device_get(call(i))
            runs.append(_time.perf_counter() - t0)
        return DeviceTiming(runs=runs, module="<cpu-wall>",
                            all_modules={"<cpu-wall>": runs})

    own_dir = trace_dir is None
    d = Path(tempfile.mkdtemp(prefix="slam_devtime_")) if own_dir else Path(trace_dir)
    try:
        with jax.profiler.trace(str(d)):
            out = None
            for i in range(n):
                out = call(i)
            jax.device_get(out)
        mods = module_device_times(d)
    finally:
        if own_dir:
            shutil.rmtree(d, ignore_errors=True)
    if not mods:
        raise RuntimeError(
            f"no 'XLA Modules' device events captured in {n} runs; "
            "is the callable dispatching a jitted program?")
    if module is not None:
        matches = {k: v for k, v in mods.items() if module in k}
        if not matches:
            raise RuntimeError(f"no module matching {module!r}; "
                               f"saw {sorted(mods)}")
        name = max(matches, key=lambda k: sum(matches[k]))
    else:
        name = max(mods, key=lambda k: sum(mods[k]))
    return DeviceTiming(runs=mods[name], module=name, all_modules=dict(mods))
