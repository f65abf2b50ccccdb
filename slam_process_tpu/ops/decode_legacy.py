"""Legacy wire-format decoders (generations 1 and 2 of the testbed format).

The dataset and golden artifacts all use the v3 11-byte format, but the
reference keeps the older decoders as capability surface (SURVEY.md §2.1):

  * v1, 5-byte frames (serial_hex_to_excel.py:34-87):
    [UE 01xxxxxx][BS 00xxxxxx, or 11xxxxxx -> sentinel 65]
    [RSS x3 10xxxxxx -> 18-bit (hi<<12)|(mid<<6)|lo].
    There is no flag byte: every byte position is attempted and every
    failed attempt counts one discard.
  * v2, 6-byte frames (serial_hex_to_excel_v2.py:34-99): adds a leading
    FLAG byte 0xCC->1 / 0x33->0; BS valid iff 0xFF or 00xxxxxx.

The >=frame-length minimum start-spacing theorem of ops/decode.py holds for
both layouts (each interior offset's tag class excludes a legal frame
start), so greedy == validity mask here too — proven by the fuzz tests in
tests/test_decode_legacy.py against literal sequential oracles.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class LegacyDecodeResult(NamedTuple):
    frames: np.ndarray   # v1: [F, 3] (ue, bs, rss); v2: [F, 4] (flag, ue, bs, rss)
    valid: int
    discarded: int
    windows: np.ndarray = np.zeros((0, 0), np.int64)  # raw frame bytes
    # (for the legacy exports' 原始16进制值 hex-string columns)


def _shift_eq(top: np.ndarray, d: int, tag: int) -> np.ndarray:
    n = len(top)
    m = max(n - d, 0)
    out = np.zeros(n, dtype=bool)
    out[:m] = top[d : d + m] == tag
    return out


def _visited_mask(n: int, starts: np.ndarray, frame_len: int) -> np.ndarray:
    cov = np.zeros(n + 1, dtype=np.int32)
    if starts.size:
        cov[starts] += 1
        cov[np.minimum(starts + frame_len, n)] -= 1
    return np.cumsum(cov[:n]) == 0


def decode_frames_v1_np(b: np.ndarray) -> LegacyDecodeResult:
    """5-byte format.  BS top-2 of 11 decodes to the 65 sentinel."""
    b = np.asarray(b, dtype=np.uint8)
    n = len(b)
    top = (b >> 6).astype(np.uint8)
    ok = top == 0b01                                   # UE at offset 0
    ok &= _shift_eq(top, 1, 0b00) | _shift_eq(top, 1, 0b11)
    for d in (2, 3, 4):
        ok &= _shift_eq(top, d, 0b10)
    # a frame needs i + 5 <= n AND the reference's guard is i + 4 >= n,
    # i.e. starts only at i <= n - 5.
    if n >= 5:
        ok[n - 4 :] = False
    else:
        ok[:] = False
    starts = np.nonzero(ok)[0]
    w = b[starts[:, None] + np.arange(5)].astype(np.int64) if starts.size else \
        np.zeros((0, 5), np.int64)
    ue = w[:, 0] & 0x3F
    bs = np.where((w[:, 1] >> 6) == 0b11, 65, w[:, 1] & 0x3F)
    rss = (w[:, 2] & 0x3F) | ((w[:, 3] & 0x3F) << 6) | ((w[:, 4] & 0x3F) << 12)
    frames = np.stack([ue, bs, rss], axis=1)
    # discard counter: every visited position that is not a taken start
    # counts one discard (v1 attempts a frame at every byte).
    visited = _visited_mask(n, starts, 5)
    discarded = int(np.count_nonzero(visited & ~ok))
    return LegacyDecodeResult(frames, len(starts), discarded, w)


def decode_frames_v2_np(b: np.ndarray) -> LegacyDecodeResult:
    """6-byte format with FLAG byte; BS valid iff 0xFF or 00xxxxxx."""
    b = np.asarray(b, dtype=np.uint8)
    n = len(b)
    top = (b >> 6).astype(np.uint8)
    ok = (b == 0xCC) | (b == 0x33)
    ok &= _shift_eq(top, 1, 0b01)                      # UE
    bs_ok = np.zeros(n, dtype=bool)                    # BS: 0xFF or 00xxxxxx
    m = max(n - 2, 0)
    bs_ok[:m] = (b[2 : 2 + m] == 0xFF) | (top[2 : 2 + m] == 0b00)
    ok &= bs_ok
    for d in (3, 4, 5):
        ok &= _shift_eq(top, d, 0b10)
    if n >= 6:
        ok[n - 5 :] = False
    else:
        ok[:] = False
    starts = np.nonzero(ok)[0]
    w = b[starts[:, None] + np.arange(6)].astype(np.int64) if starts.size else \
        np.zeros((0, 6), np.int64)
    flag = (w[:, 0] == 0xCC).astype(np.int64)
    ue = w[:, 1] & 0x3F
    bs = w[:, 2] & 0x3F
    rss = (w[:, 3] & 0x3F) | ((w[:, 4] & 0x3F) << 6) | ((w[:, 5] & 0x3F) << 12)
    frames = np.stack([flag, ue, bs, rss], axis=1)
    visited = _visited_mask(n, starts, 6)
    discarded = int(np.count_nonzero(visited & ~ok))
    return LegacyDecodeResult(frames, len(starts), discarded, w)


# Export schemas matching the legacy scripts' Excel layouts exactly
# (serial_hex_to_excel.py:98-110, serial_hex_to_excel_v2.py:103-115).
V1_COLUMNS = ["UE_Beam原始16进制值", "UE_Beam[5:0]十进制",
              "BS_Beam原始16进制值", "BS_Beam[5:0]十进制",
              "RSS0原始16进制值", "RSS1原始16进制值", "RSS2原始16进制值",
              "RSS十进制"]
V2_COLUMNS = ["FLAG", "UE_Beam[5:0]十进制", "BS_Beam[5:0]十进制", "RSS十进制",
              "UE_Beam原始16进制值", "BS_Beam原始16进制值",
              "RSS0原始16进制值", "RSS1原始16进制值", "RSS2原始16进制值"]


def to_hex(v: int) -> str:
    """The legacy scripts' raw-byte formatting (serial_hex_to_excel.py:8)."""
    return f"0x{v:02X}"
