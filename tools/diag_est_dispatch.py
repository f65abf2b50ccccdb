"""Adjudicate session-estimation dispatch modes on the DEVICE plane.

Round 2 picked async per-session dispatch over the vmapped one-program
formulation based on WALL numbers ("~4 ms vs ~78 ms") — which round 3's
measurement-model work proved cannot bound device execution on this relay
transport (block_until_ready returns on the dispatch ack).  This tool runs
both modes for the flagship v1-7 whole-session estimation under
utils/device_timing.measure_device_time (xplane DEVICE plane) and prints
the honest comparison; batch_estimation.py's docstrings cite its output.

Run:  python tools/diag_est_dispatch.py
"""

from __future__ import annotations

import glob
import json
import time
from pathlib import Path

import numpy as np

DEBUGDOC = Path("/root/reference/debugDoc")


def main() -> None:
    import jax

    from slam_process_tpu.config import DictionaryConfig, OmpConfig
    from slam_process_tpu.io import read_hex_log
    from slam_process_tpu.models.batch_estimation import (
        _batched_nn_omp_fn,
        pack_scenes,
    )
    from slam_process_tpu.models.dictionary import make_dictionary
    from slam_process_tpu.models.nn_omp import _jitted_nn_omp
    from slam_process_tpu.models.registry import build_scene
    from slam_process_tpu.ops.decode import decode_frames_np
    from slam_process_tpu.pipeline.session import Session
    from slam_process_tpu.utils.device_timing import measure_device_time

    logs = sorted(glob.glob(str(DEBUGDOC / "*.txt")))
    mapping = DEBUGDOC.parent / "beam_angle.xlsx"
    cfg = OmpConfig(max_paths=20, min_power_ratio=0.0003)
    dict_cfg = DictionaryConfig(grid_res=0.1, beam_width=1.4,
                                grid_kind="linspace")
    mats, dicts = [], []
    for p in logs:
        s = Session(Path(p).stem)
        s.frames = decode_frames_np(read_hex_log(p)).frames
        matrix, ue_ang, bs_ang = build_scene(s, mapping, True)
        mats.append(matrix)
        dicts.append(make_dictionary(ue_ang, bs_ang, dict_cfg))
    packed = pack_scenes(mats, dicts)
    n = len(logs)

    # --- async per-session dispatch of one shared executable ---
    single = _jitted_nn_omp(cfg, "ratio", True)
    per_dev = [jax.device_put((packed.phi_rx[i], packed.phi_tx[i],
                               packed.aoa_grid[i], packed.aod_grid[i],
                               packed.matrices[i])) for i in range(n)]
    warm = [single(*a) for a in per_dev]
    jax.block_until_ready([o.power for o in warm])

    t0 = time.perf_counter()
    outs = [single(*a) for a in per_dev]
    jax.block_until_ready([o.power for o in outs])
    async_wall = time.perf_counter() - t0

    # --- vmapped one-program dispatch ---
    bfn = _batched_nn_omp_fn(cfg, "ratio", True)
    batch_dev = jax.device_put((packed.matrices, packed.phi_rx,
                                packed.phi_tx, packed.aoa_grid,
                                packed.aod_grid))
    bwarm = bfn(*batch_dev)
    jax.block_until_ready(bwarm.power)
    t0 = time.perf_counter()
    bout = bfn(*batch_dev)
    jax.block_until_ready(bout.power)
    vmap_wall = time.perf_counter() - t0

    # --- device plane (the authoritative numbers), after all wall reads ---
    jax.device_get(jax.jit(lambda: jax.numpy.zeros(()))())

    dt_async = measure_device_time(
        lambda i: [single(*a) for a in per_dev][-1].power, n=3)
    async_dev = sum(sum(v) for v in dt_async.all_modules.values()) / 3

    dt_vmap = measure_device_time(lambda i: bfn(*batch_dev).power, n=3)
    vmap_dev = sum(sum(v) for v in dt_vmap.all_modules.values()) / 3

    # Parity: identical selections under both dispatch modes.
    a_host = jax.device_get(outs)
    b_host = jax.device_get(bout)
    parity = all(
        np.array_equal(a_host[i].aoa_idx, b_host.aoa_idx[i])
        and np.array_equal(a_host[i].aod_idx, b_host.aod_idx[i])
        for i in range(n))

    print(json.dumps({
        "n_sessions": n,
        "async_device_s": round(async_dev, 4),
        "vmap_device_s": round(vmap_dev, 4),
        "async_wall_s": round(async_wall, 4),
        "vmap_wall_s": round(vmap_wall, 4),
        "async_sessions_per_s_device": round(n / async_dev, 1),
        "vmap_sessions_per_s_device": round(n / vmap_dev, 1),
        "selection_parity": parity,
        "winner_device_plane": ("async" if async_dev < vmap_dev else "vmap"),
    }))

    # ---- per-sweep DATASET dispatch: async-per-session (bucketed padded
    # shapes) vs one outer-vmapped program at the dataset-max shape.
    # sweep_paths_dataset's "~5x faster" claim was wall-based; this is the
    # device-plane adjudication for that choice.
    from slam_process_tpu.pipeline.session import (
        _sweep_bucket,
        _sweep_estimator_dataset_fn,
        _sweep_estimator_fn,
        sweep_paths_dataset,
    )

    sessions = []
    for p in logs:
        s = Session(Path(p).stem)
        s.frames = decode_frames_np(read_hex_log(p)).frames
        s.correct()
        sessions.append(s)
    sweep_paths_dataset(sessions, mapping)   # warm + memoize prep
    dt_ds_async = measure_device_time(
        lambda i: sweep_paths_dataset(sessions, mapping) and None, n=2)
    ds_async_dev = sum(sum(v) for v in dt_ds_async.all_modules.values()) / 2

    # Outer-vmapped one-program: every session padded to the DATASET max
    # sweep bucket so the stacked [N, Smax, U, B] tensor is rectangular.
    preps = [s._sweep_host_prep(mapping) for s in sessions]
    u_max = max(len(p_[2]) for p_ in preps)
    b_max = max(len(p_[3]) for p_ in preps)
    ga_max = max(len(p_[4].aoa_grid) for p_ in preps)
    gd_max = max(len(p_[4].aod_grid) for p_ in preps)
    s_max = max(_sweep_bucket(p_[1]) for p_ in preps)
    est_key = preps[0][5]
    import jax.numpy as jnp

    n_sweeps = sum(p_[1] for p_ in preps)
    out = {
        "per_sweep_n_sweeps": n_sweeps,
        "per_sweep_async_device_s": round(ds_async_dev, 4),
        "per_sweep_async_sweeps_per_s": round(n_sweeps / ds_async_dev, 1),
    }
    # The outer-vmapped one-program alternative multiplies the selection
    # loop's [S, Ga, Gd] surfaces by N sessions (~3.8 GB per scan
    # iteration at the dataset shape) — attempt it guarded, because HBM
    # pressure can make it OOM or pathologically slow.
    try:
        stacked = []
        for s in sessions:
            sub, d, _k, _n = s._sweep_estimation_inputs(
                mapping, pad_to=(s_max, u_max, b_max, ga_max, gd_max))
            stacked.append((sub, d.phi_rx, d.phi_tx, d.aoa_grid,
                            d.aod_grid))
        batch = tuple(jnp.stack([t[i] for t in stacked]) for i in range(5))
        ds_fn = _sweep_estimator_dataset_fn(est_key)
        warm = ds_fn(*batch)
        jax.block_until_ready(warm[1])
        dt_ds_vmap = measure_device_time(lambda i: ds_fn(*batch)[1], n=1)
        ds_vmap_dev = sum(sum(v) for v in dt_ds_vmap.all_modules.values())
        out["per_sweep_outer_vmap_device_s"] = round(ds_vmap_dev, 4)
        out["per_sweep_outer_vmap_sweeps_per_s"] = round(
            n_sweeps / ds_vmap_dev, 1)
        out["per_sweep_winner_device_plane"] = (
            "async_bucketed" if ds_async_dev < ds_vmap_dev else "outer_vmap")
    except Exception as e:   # noqa: BLE001 — report, don't crash the diag
        out["per_sweep_outer_vmap_error"] = f"{type(e).__name__}: {e}"[:200]
        out["per_sweep_winner_device_plane"] = "async_bucketed (vmap infeasible)"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
