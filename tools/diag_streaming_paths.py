"""Per-op breakdown of the streaming-with-estimation (collect_paths) mode.

Replays the full 19-log dataset through DeviceStreamingSession with
collect_paths (the online per-sweep estimation + tracking mode bench
reports at ~2.8 M frames/s) and ranks XLA ops by device time, so the
throughput work targets the measured bottleneck — STATUS.md currently
attributes it to the in-step per-sweep einsum scan on hearsay.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/diag_streaming_paths.py
"""

from __future__ import annotations

import glob
import json
import shutil
import tempfile
from pathlib import Path

DEBUGDOC = Path("/root/reference/debugDoc")


def main() -> None:
    from slam_process_tpu.io import read_hex_log
    from slam_process_tpu.parallel.streaming_device import (
        make_paths_spec,
        replay_log_device,
    )
    from slam_process_tpu.utils.device_timing import (
        measure_device_time,
        op_device_times,
    )

    logs = sorted(glob.glob(str(DEBUGDOC / "*.txt")))
    raw = [read_hex_log(p) for p in logs]
    n_frames = 0
    paths_cfg = make_paths_spec(DEBUGDOC.parent / "beam_angle.xlsx")

    # Warm every chunk-shape program outside the trace window.
    for r in raw:
        s = replay_log_device(r, chunk_bytes=1 << 20,
                              collect_paths=paths_cfg)
        s.block_until_ready()
        n_frames += int(s._state.n_frames)

    d = Path(tempfile.mkdtemp(prefix="slam_spaths_"))
    try:
        def one_pass(_i):
            ss = [replay_log_device(r, chunk_bytes=1 << 20,
                                    collect_paths=paths_cfg) for r in raw]
            return ss[-1]._state.n_frames

        dt = measure_device_time(one_pass, n=1, trace_dir=d)
        dev_s = sum(sum(v) for v in dt.all_modules.values())
        ops = op_device_times(d)
    finally:
        shutil.rmtree(d, ignore_errors=True)

    top = sorted(ops.items(), key=lambda kv: -kv[1])[:25]
    print(json.dumps({
        "n_frames": n_frames,
        "device_s_per_pass": round(dev_s, 4),
        "frames_per_s_device": round(n_frames / dev_s, 1),
        "modules": {k: round(sum(v), 4) for k, v in dt.all_modules.items()},
        "top_ops_ms": {k: round(v * 1e3, 3) for k, v in top},
    }, indent=1))


if __name__ == "__main__":
    main()
