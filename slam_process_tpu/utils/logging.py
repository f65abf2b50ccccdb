"""Dual file+console logging and stage health counters.

The reference sets up a per-script file(DEBUG)+stream(INFO) logger
(serial_hex_to_excel_v3.py:134-144, excel_heatmap.py:36-62) and exposes its
de-facto health metrics as logged counters: valid/discarded frame counts,
rows after each cleaning step, per-group baseline/correction counts
(bs_beam_correction.py:108-115,171-177).  Here there is ONE logger factory
and a small counter container every stage emits; counters come from
device-side reductions so the host never walks the data."""

from __future__ import annotations

import dataclasses
import logging
import sys
from pathlib import Path
from typing import Dict, Optional


def get_logger(
    name: str = "slam_process_tpu",
    log_file: Optional[Path] = None,
    console_level: int = logging.INFO,
    file_level: int = logging.DEBUG,
) -> logging.Logger:
    """Create (or fetch) a logger writing to console and optionally a file."""
    logger = logging.getLogger(name)
    logger.setLevel(min(console_level, file_level))
    logger.propagate = False

    have_stream = any(
        isinstance(h, logging.StreamHandler) and not isinstance(h, logging.FileHandler)
        for h in logger.handlers
    )
    if not have_stream:
        sh = logging.StreamHandler(sys.stdout)
        sh.setLevel(console_level)
        sh.setFormatter(logging.Formatter("%(levelname)s %(message)s"))
        logger.addHandler(sh)

    if log_file is not None:
        log_file = Path(log_file)
        have_file = any(
            isinstance(h, logging.FileHandler)
            and Path(getattr(h, "baseFilename", "")) == log_file
            for h in logger.handlers
        )
        if not have_file:
            log_file.parent.mkdir(parents=True, exist_ok=True)
            fh = logging.FileHandler(log_file, mode="w", encoding="utf-8")
            fh.setLevel(file_level)
            fh.setFormatter(
                logging.Formatter("%(asctime)s %(levelname)s %(message)s")
            )
            logger.addHandler(fh)
    return logger


@dataclasses.dataclass
class StageCounters:
    """Health counters a stage reports (parity with the reference's logs)."""

    name: str
    counts: Dict[str, int] = dataclasses.field(default_factory=dict)

    def add(self, key: str, value: int) -> None:
        self.counts[key] = self.counts.get(key, 0) + int(value)

    def set(self, key: str, value: int) -> None:
        self.counts[key] = int(value)

    def log(self, logger: logging.Logger) -> None:
        parts = " ".join(f"{k}={v}" for k, v in self.counts.items())
        logger.info("[%s] %s", self.name, parts)
