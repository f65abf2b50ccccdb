"""Hex-token serial-log ingestion.

The raw L0 artifact is a text file of whitespace-separated hex byte tokens
("33 00 FF 74 ..."), possibly with junk tokens (a UTF-8 0xC2 0xAB "guillemet"
BOM-ish marker opens every shipped log).  The reference tokenizes with a
per-token Python regex loop (serial_hex_to_excel_v3.py:18-36) at ~1M tokens
per log; here tokenization is a fully vectorized numpy pass over the raw
bytes (boundary detection + nibble LUT), with an optional C fast path
(slam_process_tpu/runtime) and a strict reference-semantics implementation
kept for equivalence testing.

Accepted tokens (reference regex ``^(?:0x)?[0-9a-fA-F]{2}$``):
  * exactly two hex digits, or
  * ``0x``/``0X`` followed by exactly two hex digits.
Everything else is skipped.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Union

import numpy as np

# --- lookup tables -----------------------------------------------------------
_HEX_LUT = np.full(256, 255, dtype=np.uint8)
for _c in b"0123456789":
    _HEX_LUT[_c] = _c - ord("0")
for _c in b"abcdef":
    _HEX_LUT[_c] = _c - ord("a") + 10
for _c in b"ABCDEF":
    _HEX_LUT[_c] = _c - ord("A") + 10

# str.split() splits on unicode whitespace; at the byte level the ASCII
# whitespace set below is what occurs in real logs (non-ASCII whitespace only
# exists inside multi-byte UTF-8 sequences, which never form valid hex tokens
# either way — equivalence on all shipped logs is asserted in tests).
_WS_LUT = np.zeros(256, dtype=bool)
for _c in b" \t\r\n\x0b\x0c\x1c\x1d\x1e\x1f":
    _WS_LUT[_c] = True

_TOKEN_RE = re.compile(r"^(?:0x)?[0-9a-fA-F]{2}$")


def tokenize_hex(data: bytes) -> np.ndarray:
    """Vectorized hex tokenizer: raw log bytes -> uint8 byte values.

    Token boundaries and validity are resolved with numpy masks; no Python
    per-token loop.  Matches ``tokenize_hex_reference`` on every shipped log
    (verified in tests/test_hexlog.py).
    """
    if len(data) == 0:
        return np.zeros(0, dtype=np.uint8)
    arr = np.frombuffer(data, dtype=np.uint8)
    is_ws = _WS_LUT[arr]
    nonws = ~is_ws

    prev_ws = np.empty_like(is_ws)
    prev_ws[0] = True
    prev_ws[1:] = is_ws[:-1]
    starts = np.nonzero(nonws & prev_ws)[0]

    next_ws = np.empty_like(is_ws)
    next_ws[-1] = True
    next_ws[:-1] = is_ws[1:]
    ends = np.nonzero(nonws & next_ws)[0]

    lengths = ends - starts + 1
    hexval = _HEX_LUT[arr]

    # Case 1: bare two-digit tokens.
    s2 = starts[lengths == 2]
    hi2, lo2 = hexval[s2], hexval[s2 + 1]
    ok2 = (hi2 < 16) & (lo2 < 16)
    pos2, val2 = s2[ok2], (hi2[ok2] << 4) | lo2[ok2]

    # Case 2: 0x-prefixed four-char tokens.
    s4 = starts[lengths == 4]
    if s4.size:
        pref = (arr[s4] == ord("0")) & (
            (arr[s4 + 1] == ord("x")) | (arr[s4 + 1] == ord("X"))
        )
        hi4, lo4 = hexval[s4 + 2], hexval[s4 + 3]
        ok4 = pref & (hi4 < 16) & (lo4 < 16)
        pos4, val4 = s4[ok4], (hi4[ok4] << 4) | lo4[ok4]
    else:
        pos4 = np.zeros(0, dtype=s4.dtype)
        val4 = np.zeros(0, dtype=np.uint8)

    if pos4.size == 0:
        return val2.astype(np.uint8)
    pos = np.concatenate([pos2, pos4])
    val = np.concatenate([val2, val4])
    order = np.argsort(pos, kind="stable")
    return val[order].astype(np.uint8)


def tokenize_hex_reference(data: bytes) -> np.ndarray:
    """Strict reference-semantics tokenizer (slow; for equivalence tests).

    Reproduces serial_hex_to_excel_v3.py:18-36: decode utf-8 with
    errors='ignore', str.split(), per-token regex, ``int(s, 16) & 0xFF``.
    """
    text = data.decode("utf-8", errors="ignore")
    out = []
    for tok in text.split():
        s = tok.strip()
        if not s or not _TOKEN_RE.fullmatch(s):
            continue
        if s.lower().startswith("0x"):
            s = s[2:]
        out.append(int(s, 16) & 0xFF)
    return np.asarray(out, dtype=np.uint8)


def read_hex_log(path: Union[str, Path], engine: str = "auto") -> np.ndarray:
    """Read a serial hex log file into a uint8 byte array.

    engine: "auto" tries the native C tokenizer and falls back to numpy;
    "numpy" / "reference" force a specific implementation.
    """
    data = Path(path).read_bytes()
    if engine == "reference":
        return tokenize_hex_reference(data)
    if engine in ("auto", "native"):
        try:
            from slam_process_tpu.runtime import hexscan  # noqa: PLC0415

            return hexscan.tokenize(data)
        except Exception:
            if engine == "native":
                raise
    return tokenize_hex(data)
