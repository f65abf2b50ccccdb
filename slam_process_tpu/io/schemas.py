"""Canonical frame-table schemas + tolerant readers for legacy artifacts.

Canonical device layout everywhere in the engine:

    frames[F, 5] int32 with columns (FLAG, UE, BS, RSS, CLK)      (decoded)
    filtered[F, 4] int32 with columns (UE, BS, RSS, CLK)          (corrected)

The reference's on-disk schemas drift (SURVEY.md section 2.2): Parsed files
use the Chinese v3 headers (serial_hex_to_excel_v3.py:110-116); _filtered
files come in at least three header/ordering variants
(``UE_Beam,BS_Beam,RSS值,CLK值[,CLK差值]`` and ``UE_Beam,BS_Beam,CLK值,RSS``
with shuffled order).  Renderers in the reference sniff columns heuristically
(heatmap_gpt_v2.py:33-45) or fall back to the first three columns
(heatmap_gemini_v1-7.py:65-69).  Here ONE tolerant reader normalises all of
them to the canonical layout, and writers emit one canonical schema.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Tuple, Union

import numpy as np

from slam_process_tpu.io.xlsx import read_xlsx_table, write_xlsx_table

# v3 Parsed schema (serial_hex_to_excel_v3.py:110-116).
PARSED_COLUMNS: List[str] = [
    "FLAG",
    "UE_Beam[5:0]十进制",
    "BS_Beam[5:0]十进制",
    "RSS十进制",
    "CLK十进制",
]

# Canonical filtered schema (bs_beam_correction.py:16-21).
FILTERED_COLUMNS: List[str] = ["UE_Beam", "BS_Beam", "RSS值", "CLK值"]


def _match_column(names: List[str], *keys: str) -> int:
    """Return the index of the first column whose name contains any key."""
    upper = [str(n).upper() for n in names]
    for key in keys:
        for i, n in enumerate(upper):
            if key.upper() in n:
                return i
    return -1


def read_parsed_table(path: Union[str, Path], sheet: int = 0) -> np.ndarray:
    """Read a stage-1 Parsed xlsx -> frames[F, 5] int64 (flag,ue,bs,rss,clk)."""
    names, data = read_xlsx_table(path, sheet=sheet)
    idx = [
        _match_column(names, "FLAG"),
        _match_column(names, "UE_Beam"),
        _match_column(names, "BS_Beam"),
        _match_column(names, "RSS"),
        _match_column(names, "CLK"),
    ]
    if any(i < 0 for i in idx):
        # First-five-columns fallback, mirroring the renderers' tolerance.
        idx = list(range(5))
    out = data[:, idx]
    return _to_int_rows(out, nan_flag_to_zero=True)


def read_filtered_table(path: Union[str, Path], sheet: int = 0) -> np.ndarray:
    """Read any _filtered xlsx variant -> filtered[F, 4] int64 (ue,bs,rss,clk).

    Handles the schema drift described above: column name matching first
    ("CLK差值" is excluded when picking the CLK column), positional fallback
    last.
    """
    names, data = read_xlsx_table(path, sheet=sheet)
    upper = [str(n).upper() for n in names]
    ue = _match_column(names, "UE_BEAM", "UE")
    bs = _match_column(names, "BS_BEAM", "BS")
    rss = _match_column(names, "RSS值", "RSS", "POWER")
    clk = -1
    for i, n in enumerate(upper):
        if "CLK" in n and "差" not in str(names[i]):
            clk = i
            break
    if min(ue, bs, rss) < 0:
        ue, bs, rss = 0, 1, 2
        clk = 3 if data.shape[1] > 3 else -1
    cols = [ue, bs, rss] + ([clk] if clk >= 0 else [])
    out = data[:, cols]
    if clk < 0:
        out = np.concatenate([out, np.zeros((out.shape[0], 1))], axis=1)
    return _to_int_rows(out)


def _to_int_rows(out: np.ndarray, nan_flag_to_zero: bool = False) -> np.ndarray:
    """Guard against NaN cells in legacy files before the int cast.

    The reference coerces unparseable cells to NaN and then special-cases
    them (NaN FLAG counts as 0, NaN CLK rows are skipped —
    bs_beam_correction.py:35-40, :84-93).  A NaN slipping through np.rint
    -> int64 would silently poison downstream integers, so: NaN FLAG -> 0,
    any other NaN drops the row.
    """
    out = np.asarray(out, dtype=np.float64)
    if nan_flag_to_zero and out.shape[1] >= 1:
        out[np.isnan(out[:, 0]), 0] = 0.0
    good = ~np.isnan(out).any(axis=1)
    return np.rint(out[good]).astype(np.int64)


def write_parsed_table(path: Union[str, Path], frames: np.ndarray) -> Path:
    """Write frames[F, 5] in the v3 Parsed schema (drop-in compatible)."""
    return write_xlsx_table(path, PARSED_COLUMNS, np.asarray(frames), "Parsed")


def write_filtered_table(path: Union[str, Path], filtered: np.ndarray) -> Path:
    """Write filtered[F, 4] in the canonical filtered schema."""
    return write_xlsx_table(path, FILTERED_COLUMNS, np.asarray(filtered), "Sheet1")


def split_frames(frames: np.ndarray) -> Tuple[np.ndarray, ...]:
    """frames[F, 5] -> (flag, ue, bs, rss, clk) column views."""
    f = np.asarray(frames)
    return f[:, 0], f[:, 1], f[:, 2], f[:, 3], f[:, 4]
