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
