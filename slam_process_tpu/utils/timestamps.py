"""Session-timestamp extraction from file names.

The reference re-implements this in four scripts
(heatmap_gemini_v1-7.py:77-92, heatmap_gemini_v1-2.py:231-241,
heatmap_gemini_v3.py:53-59, heatmap_gpt_v2.py:259-278); this is the one
shared implementation.  File names look like
``Serial Debug 2026-01-26 164520_filtered.xlsx`` ->  ``2026-01-26 164520``.
"""

from __future__ import annotations

import os
import re
from typing import Optional

_TS_RE = re.compile(r"(\d{4}-\d{2}-\d{2}\s+\d{6})")
_TS_RE2 = re.compile(r"(\d{4}-\d{2}-\d{2})[_\s]+(\d{6})")


def extract_timestamp(path: str) -> Optional[str]:
    """Return ``YYYY-MM-DD HHMMSS`` from a session file name, or None."""
    filename = os.path.basename(str(path))
    m = _TS_RE.search(filename)
    if m:
        return m.group(1)
    m2 = _TS_RE2.search(filename)
    if m2:
        return f"{m2.group(1)} {m2.group(2)}"
    return None


def unwrap_clk_anchors(times, logger=None):
    """Unwrap 30-bit CLK sweep anchors onto a monotone axis, in place.

    ``times`` is an int64 array of per-sweep CLK anchors (-1 = sweep with
    no rows).  Only decreases consistent with a counter wrap (a drop of
    more than half the 2^30 period) unwrap; small decreases are testbed
    counter resets / out-of-order anchors and are left as-is with a
    warning — fabricating a 2^30 offset for them would shift every later
    timestamp by ~1e9 ticks (see Session.sweep_times).
    """
    import numpy as np

    times = np.array(times, dtype=np.int64, copy=True)
    obs = times >= 0
    if obs.sum() > 1:
        t = times[obs]
        d = np.diff(t)
        wrap = (d < 0) & (-d > (1 << 29))
        odd = (d < 0) & ~wrap
        if odd.any() and logger is not None:
            logger.warning(
                "sweep anchors: %d non-wrap CLK decrease(s) between "
                "sweeps (counter reset or out-of-order anchor); "
                "timestamps left unadjusted — velocity fits across "
                "the discontinuity are unreliable", int(odd.sum()))
        wraps = np.cumsum(np.concatenate([[0], wrap]))
        times[obs] = t + (wraps.astype(np.int64) << 30)
    return times


class ClkUnwrapper:
    """Streamed :func:`unwrap_clk_anchors`: ``push`` anchors one at a
    time and get the unwrapped value back immediately.

    The batch helper is prefix-stable (each output depends only on
    earlier anchors), so the pushed sequence equals
    ``unwrap_clk_anchors(all_anchors)`` element-for-element
    (tests/test_change_detection.py) — this is what lets the live
    ``watch --events`` feed stamp events without re-unwrapping the whole
    history per poll.  ``odd`` counts non-wrap decreases (the batch
    helper's warning condition) so callers can surface the same warning.
    """

    def __init__(self) -> None:
        self._last_raw = -1
        self._wraps = 0
        self.odd = 0

    def push(self, raw) -> int:
        raw = int(raw)
        if raw < 0:
            return -1
        if self._last_raw >= 0:
            d = raw - self._last_raw
            if d < 0 and -d > (1 << 29):
                self._wraps += 1
            elif d < 0:
                self.odd += 1
        self._last_raw = raw
        return raw + (self._wraps << 30)
