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


if __name__ == "__main__":
    main()
