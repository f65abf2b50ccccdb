"""cli watch: live-tailing a growing log equals the offline pipeline.

A writer thread appends a REAL reference log's text in arbitrary-sized
pieces (deliberately splitting hex tokens across writes); the watch
loop must tokenize incrementally (text carry at the last whitespace),
feed the streaming session, and produce the exact offline filtered
table."""

import sys
import threading
import time
from pathlib import Path

import numpy as np

LOG = Path("/root/reference/debugDoc/"
           "256-0x16-Serial Debug 2026-01-26 164520.txt")
MAPPING = "/root/reference/beam_angle.xlsx"


import pytest


@pytest.mark.parametrize("engine", ["host", "device"])
def test_watch_matches_offline(tmp_path, engine):
    from slam_process_tpu.pipeline.cli import main
    from slam_process_tpu.pipeline.session import Session

    data = LOG.read_bytes()
    grow = tmp_path / "live.txt"
    grow.write_bytes(b"")

    rng = np.random.default_rng(7)
    cuts = np.sort(rng.integers(1, len(data), 24))
    pieces = np.split(np.frombuffer(data, np.uint8), cuts)

    def writer():
        time.sleep(0.3)     # let the watcher start from an empty file
        with open(grow, "ab") as f:
            for p in pieces:
                f.write(p.tobytes())
                f.flush()
                time.sleep(0.05)

    t = threading.Thread(target=writer)
    t.start()
    argv, sys.argv = sys.argv, [
        "cli", "watch", "--log", str(grow), "--mapping", MAPPING,
        "--outdir", str(tmp_path), "--engine", engine,
        "--poll-interval", "0.05", "--idle-timeout", "2.0"]
    try:
        main()
    finally:
        sys.argv = argv
    t.join()

    off = Session.from_log(LOG)
    off.correct()
    from slam_process_tpu.io.schemas import read_filtered_table

    out = tmp_path / "live_filtered.xlsx"
    assert out.exists(), list(tmp_path.iterdir())
    rows = np.asarray(read_filtered_table(out), dtype=np.int64)
    np.testing.assert_array_equal(
        rows, np.asarray(off.filtered)[:, :rows.shape[1]])
