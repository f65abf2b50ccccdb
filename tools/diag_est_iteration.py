"""Per-iteration cost table for the NN-OMP estimators (device plane).

VERDICT r04 Weak #6/#Next-7: the estimator's residual gap to roofline is
attributed to OMP's K sequential argmax->update rounds; this tool MEASURES
that attribution instead of asserting it.  It times the production
programs at max_paths = k for a ladder of k on the device plane and fits
the per-iteration slope, reporting it against the HBM bound of one
correlation-surface read per iteration (the minimum traffic an exact
greedy selection must pay: every round scans the full surface for the
global argmax after a rank-K update).

Two programs:
  * session-level vmapped NN-OMP over the 19 full sessions (production
    formulation, models/batch_estimation._batched_nn_omp_fn);
  * the per-sweep dataset pass (pipeline.session.sweep_paths_dataset,
    async-bucketed per-session programs).

Run on the chip: PYTHONPATH=/root/repo python tools/diag_est_iteration.py
"""

from __future__ import annotations

import glob
import json
from pathlib import Path

import numpy as np

cache_dir = Path(__file__).parent.parent / "build" / "jax_cache"

DEBUGDOC = Path("/root/reference/debugDoc")
KS = [1, 2, 5, 10, 15, 20]


def main() -> None:
    import jax

    from slam_process_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache(str(cache_dir))

    from slam_process_tpu.config import DictionaryConfig, OmpConfig
    from slam_process_tpu.io import read_hex_log
    from slam_process_tpu.models.batch_estimation import (
        _batched_nn_omp_fn,
        pack_scenes,
    )
    from slam_process_tpu.models.dictionary import make_dictionary
    from slam_process_tpu.models.registry import build_scene
    from slam_process_tpu.ops.decode import decode_frames_np
    from slam_process_tpu.pipeline.session import Session, sweep_paths_dataset
    from slam_process_tpu.utils.device_timing import measure_device_time

    logs = sorted(glob.glob(str(DEBUGDOC / "*.txt")))
    mapping = DEBUGDOC.parent / "beam_angle.xlsx"
    dict_cfg = DictionaryConfig(grid_res=0.1, beam_width=1.4,
                                grid_kind="linspace")
    mats, dicts, sessions = [], [], []
    for p in logs:
        s = Session(Path(p).stem)
        s.frames = decode_frames_np(read_hex_log(p)).frames
        matrix, ue_ang, bs_ang = build_scene(s, mapping, True)
        mats.append(matrix)
        dicts.append(make_dictionary(ue_ang, bs_ang, dict_cfg))
        s.correct()
        sessions.append(s)
    packed = pack_scenes(mats, dicts)
    n_sessions, ga, gd = (packed.matrices.shape[0],
                          packed.phi_rx.shape[2], packed.phi_tx.shape[2])

    # --- session-level vmapped program at each k ---------------------
    vm_args = jax.device_put((packed.matrices, packed.phi_rx,
                              packed.phi_tx, packed.aoa_grid,
                              packed.aod_grid))
    session_rows = []
    for k in KS:
        fn = _batched_nn_omp_fn(OmpConfig(max_paths=k,
                                          min_power_ratio=0.0003),
                                "ratio", True)
        jax.block_until_ready(fn(*vm_args).power)        # compile + warm
        dt = measure_device_time(lambda i: fn(*vm_args).power, n=3)
        sec = sum(sum(v) for v in dt.all_modules.values()) / 3
        session_rows.append((k, sec))
        print(f"session-vmap k={k:2d}: {sec * 1e3:8.3f} ms", flush=True)

    # --- per-sweep dataset pass at each k ----------------------------
    sweep_rows = []
    n_sweeps = 0
    for k in KS:
        res = sweep_paths_dataset(sessions, mapping, max_paths=k)  # warm
        n_sweeps = sum(len(v) for _, v in res)
        dt = measure_device_time(
            lambda i: sweep_paths_dataset(sessions, mapping, max_paths=k)
            and jax.numpy.zeros(()), n=2)
        sec = sum(sum(v) for v in dt.all_modules.values()) / 2
        sweep_rows.append((k, sec))
        print(f"sweep-dataset k={k:2d}: {sec * 1e3:8.3f} ms", flush=True)

    def slope(rows):
        ks = np.array([r[0] for r in rows], float)
        ts = np.array([r[1] for r in rows], float)
        a = np.polyfit(ks, ts, 1)
        return float(a[0]), float(a[1])   # s/iter, intercept s

    s_slope, s_icept = slope(session_rows)
    w_slope, w_icept = slope(sweep_rows)

    # HBM bound: one [**, Ga, Gd] f32 correlation-surface read per
    # iteration (rank-K update term regenerated in-registers).
    sess_bytes = n_sessions * ga * gd * 4
    sweep_bytes = n_sweeps * ga * gd * 4
    out = {
        "n_sweeps": int(n_sweeps),
        "grid": [int(ga), int(gd)],
        "n_sessions": int(n_sessions),
        "session_rows_ms": [[k, round(t * 1e3, 3)] for k, t in session_rows],
        "session_per_iter_ms": round(s_slope * 1e3, 4),
        "session_intercept_ms": round(s_icept * 1e3, 3),
        "session_surface_MB": round(sess_bytes / 1e6, 1),
        "session_hbm_bound_ms_per_iter": round(sess_bytes / 743e9 * 1e3, 4),
        "session_x_of_hbm_bound": round(
            s_slope / (sess_bytes / 743e9), 2),
        "sweep_rows_ms": [[k, round(t * 1e3, 3)] for k, t in sweep_rows],
        "sweep_per_iter_ms": round(w_slope * 1e3, 4),
        "sweep_intercept_ms": round(w_icept * 1e3, 3),
        "sweep_surface_MB": round(sweep_bytes / 1e6, 1),
        "sweep_hbm_bound_ms_per_iter": round(sweep_bytes / 743e9 * 1e3, 4),
        "sweep_x_of_hbm_bound": round(w_slope / (sweep_bytes / 743e9), 2),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
