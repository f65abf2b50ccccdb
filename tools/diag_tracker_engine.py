"""Adjudicate the tracker engines on the device plane (whole dataset).

Replays every shipped log through DeviceStreamingSession with
collect_paths under ``tracker_engine="pallas"`` and ``"xla"`` (all other
engines at their adjudicated "auto" winners) and reports the device-
plane time of each full pass, plus a parity check between the two
engines' track rings.  This is the dataset-scale companion to the
per-step kernel measurement (105 vs 625 us/step at meff=15) that put
``tracker_engine="auto"`` -> Pallas on TPU.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/diag_tracker_engine.py
"""

from __future__ import annotations

import glob
import json
from pathlib import Path

DEBUGDOC = Path("/root/reference/debugDoc")


def main() -> None:
    import numpy as np

    from slam_process_tpu.io import read_hex_log
    from slam_process_tpu.parallel.streaming_device import (
        make_paths_spec,
        replay_log_device,
    )
    from slam_process_tpu.utils.device_timing import measure_device_time

    logs = sorted(glob.glob(str(DEBUGDOC / "*.txt")))
    raw = [read_hex_log(p) for p in logs]
    n_frames = 0
    paths_cfg = make_paths_spec(DEBUGDOC.parent / "beam_angle.xlsx")

    def one_pass(engine: str):
        out = []
        for r in raw:
            out.append(replay_log_device(r, chunk_bytes=1 << 20,
                                         collect_paths=paths_cfg,
                                         tracker_engine=engine))
        return out

    # Warm both engines' programs outside the trace windows.
    sessions = {eng: one_pass(eng) for eng in ("pallas", "xla")}

    result = {}
    for eng in ("pallas", "xla"):
        dt = measure_device_time(
            lambda _i, e=eng: one_pass(e)[-1]._state.n_frames, n=1)
        result[f"device_s_{eng}"] = round(
            sum(sum(v) for v in dt.all_modules.values()), 4)

    n_frames = sum(int(s.n_frames) for s in sessions["pallas"])
    result["n_frames"] = n_frames
    for eng in ("pallas", "xla"):
        result[f"frames_per_s_{eng}"] = round(
            n_frames / result[f"device_s_{eng}"], 1)

    # Parity: the two engines' online tracks must agree exactly.
    mism = 0
    for sp, sx in zip(sessions["pallas"], sessions["xla"]):
        tp, _, _ = sp.path_tracks()
        tx, _, _ = sx.path_tracks()
        for a, b in zip(tp, tx):
            if not np.array_equal(np.asarray(a), np.asarray(b)):
                mism += 1
    result["track_mismatches"] = mism
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
