"""Profiling hooks: jax.profiler traces + per-stage device-time counters.

The reference has no tracing at all (SURVEY.md section 5.1).  Here any
pipeline run can capture an XLA trace viewable in TensorBoard/Perfetto, and
stages report wall/device timings through the same StageCounters channel as
the health counters.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Iterator, Union


@contextlib.contextmanager
def trace(log_dir: Union[str, Path, None]) -> Iterator[None]:
    """Capture a jax.profiler trace into ``log_dir`` (no-op if None)."""
    if log_dir is None:
        yield
        return
    import jax

    log_dir = str(log_dir)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in the device trace (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class StageTimer:
    """Wall-clock stage timer that blocks on device results.

    Usage::

        timer = StageTimer()
        with timer.stage("decode"):
            out = fn(x)
            jax.block_until_ready(out)
        timer.timings  # {"decode": seconds}
    """

    def __init__(self) -> None:
        self.timings: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.timings[name] = self.timings.get(name, 0.0) + (
                time.perf_counter() - t0
            )

    def log(self, logger) -> None:
        parts = " ".join(f"{k}={v * 1e3:.2f}ms" for k, v in self.timings.items())
        logger.info("[timings] %s", parts)
