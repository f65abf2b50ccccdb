"""Per-op breakdown of the dataset per-sweep estimation pass.

Ranks XLA ops by device time inside sweep_paths_dataset (the 7.6k
sweeps/s round-3 metric) so the MFU work targets the real bottleneck
instead of guesses.

Run:  PYTHONPATH=.:$PYTHONPATH python tools/diag_sweep_mfu.py
"""

from __future__ import annotations

import glob
import json
import shutil
import tempfile
from pathlib import Path

DEBUGDOC = Path("/root/reference/debugDoc")


def main() -> None:
    import jax

    from slam_process_tpu.io import read_hex_log
    from slam_process_tpu.ops.decode import decode_frames_np
    from slam_process_tpu.pipeline.session import Session, sweep_paths_dataset
    from slam_process_tpu.utils.device_timing import (
        measure_device_time,
        op_device_times,
    )

    logs = sorted(glob.glob(str(DEBUGDOC / "*.txt")))
    mapping = DEBUGDOC.parent / "beam_angle.xlsx"
    sessions = []
    for p in logs:
        s = Session(Path(p).stem)
        s.frames = decode_frames_np(read_hex_log(p)).frames
        s.correct()
        sessions.append(s)

    res = sweep_paths_dataset(sessions, mapping)   # warm + memo
    n_sweeps = sum(len(v) for _, v in res)

    d = Path(tempfile.mkdtemp(prefix="slam_sweepmfu_"))
    try:
        dt = measure_device_time(
            lambda i: sweep_paths_dataset(sessions, mapping) and None,
            n=2, trace_dir=d)
        dev_s = sum(sum(v) for v in dt.all_modules.values()) / 2
        ops = op_device_times(d)
    finally:
        shutil.rmtree(d, ignore_errors=True)

    top = sorted(ops.items(), key=lambda kv: -kv[1])[:20]
    print(json.dumps({
        "n_sweeps": n_sweeps,
        "device_s_per_pass": round(dev_s, 4),
        "sweeps_per_s_device": round(n_sweeps / dev_s, 1),
        "modules": {k: round(sum(v) / 2, 4)
                    for k, v in dt.all_modules.items()},
    }))
    for name, t in top:
        print(f"{t*1e6/2:10.1f} us  {name}")


if __name__ == "__main__":
    main()
