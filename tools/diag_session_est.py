"""Adjudicate the whole-dataset SESSION estimator formulations (device plane).

Round 4 made vmap(nn_omp_jax) the production dataset path (49.5 ms device,
tools/diag_est_dispatch.py) — but its K=20 NNLS refit solves each masked
[20, 20] subproblem with ``jnp.linalg.solve``'s general LU inside BOTH
nested active-set while-loops: hundreds of tiny serialized ops per solve,
a pure dispatch floor next to microseconds of arithmetic.  This tool runs
the candidate formulations under the xplane DEVICE plane on the 19 real
sessions at the flagship v1-7 config and checks selection/coefficient
parity of each against the float64 scipy oracle:

  vmap_lu   vmap(nn_omp_jax)  + LU subproblem solves (round-4 production)
  vmap_gj   vmap(nn_omp_jax)  + Gauss-Jordan fori_loop solves
  gram_gj   vmap(gram-domain) + GJ — correlation chain paid once, not K times

plus the SINGLE-SESSION (unbatched) program under both solvers.

Adjudicated result (TPU v5e, 2026-08-19): vmap_gj 26.9 ms (705.6
sessions/s) vs vmap_lu 49.5 ms vs gram_gj 69.6 ms — GJ+vmap is the
production dataset path.  Single-session REVERSES: LU 4.36 ms vs GJ
14.74 ms — unbatched, GJ's K sequential tiny row updates pay the
serialization floor that only a batch axis amortizes, so
models/nn_omp._jitted_nn_omp pins solver="lu".

Run:  python tools/diag_session_est.py
"""

from __future__ import annotations

import glob
import json
from pathlib import Path

import numpy as np

DEBUGDOC = Path("/root/reference/debugDoc")


def main() -> None:
    import functools

    import jax
    import jax.numpy as jnp

    from slam_process_tpu.config import DictionaryConfig, OmpConfig
    from slam_process_tpu.io import read_hex_log
    from slam_process_tpu.models.batch_estimation import pack_scenes
    from slam_process_tpu.models.dictionary import make_dictionary
    from slam_process_tpu.models.nn_omp import (
        nn_omp_gram_batch_jax,
        nn_omp_jax,
        nn_omp_np,
    )
    from slam_process_tpu.models.registry import build_scene
    from slam_process_tpu.ops.decode import decode_frames_np
    from slam_process_tpu.pipeline.session import Session
    from slam_process_tpu.utils.device_timing import measure_device_time
    from slam_process_tpu.utils.precision import jit_highest

    logs = sorted(glob.glob(str(DEBUGDOC / "*.txt")))
    mapping = DEBUGDOC.parent / "beam_angle.xlsx"
    cfg = OmpConfig(max_paths=20, min_power_ratio=0.0003)
    dict_cfg = DictionaryConfig(grid_res=0.1, beam_width=1.4,
                                grid_kind="linspace")
    mats, dicts, sessions = [], [], []
    for p in logs:
        s = Session(Path(p).stem)
        s.frames = decode_frames_np(read_hex_log(p)).frames
        matrix, ue_ang, bs_ang = build_scene(s, mapping, True)
        mats.append(matrix)
        dicts.append(make_dictionary(ue_ang, bs_ang, dict_cfg))
        sessions.append(s)
    packed = pack_scenes(mats, dicts)
    n = len(logs)
    args = jax.device_put((packed.matrices, packed.phi_rx, packed.phi_tx,
                           packed.aoa_grid, packed.aod_grid))

    def build(form: str, solver: str):
        if form == "vmap":
            est = functools.partial(nn_omp_jax, cfg=cfg, keep_rule="ratio",
                                    stop_nonpositive=True,
                                    nnls_solver=solver)

            def run(m, rx, tx, a, d):
                return jax.vmap(
                    lambda mi, rxi, txi, ai, di: est(rxi, txi, ai, di, mi)
                )(m, rx, tx, a, d)
        else:  # gram-domain, one scene per vmap lane
            est = functools.partial(nn_omp_gram_batch_jax, cfg=cfg,
                                    keep_rule="ratio",
                                    stop_nonpositive=True,
                                    nnls_solver=solver)

            def run(m, rx, tx, a, d):
                out = jax.vmap(
                    lambda mi, rxi, txi, ai, di: est(rxi, txi, ai, di,
                                                     mi[None])
                )(m, rx, tx, a, d)
                return jax.tree.map(lambda x: x[:, 0], out)

        return jit_highest(run)

    # Float64 oracle selections per session.
    oracle = [nn_omp_np(dicts[i], mats[i], cfg, keep_rule="ratio",
                        stop_nonpositive=True) for i in range(n)]

    results = {}
    for name, form, solver in (("vmap_lu", "vmap", "lu"),
                               ("vmap_gj", "vmap", "auto"),
                               ("gram_gj", "gram", "auto")):
        fn = build(form, solver)
        out = fn(*args)
        jax.block_until_ready(out.power)
        t = measure_device_time(lambda i: fn(*args).power, n=3)
        host = jax.device_get(fn(*args))
        sel_ok, coeff_ok = True, True
        for i in range(n):
            o = oracle[i]
            ko = int(o.n_iters)
            kd = int(host.n_iters[i])
            if ko != kd or not (
                np.array_equal(o.aoa_idx[:ko], host.aoa_idx[i][:ko])
                and np.array_equal(o.aod_idx[:ko], host.aod_idx[i][:ko])
            ):
                sel_ok = False
            if not np.allclose(o.power[:ko], host.power[i][:ko],
                               rtol=2e-3, atol=1e-5):
                coeff_ok = False
        results[name] = {
            "device_s": round(t.total / 3, 5),
            "sessions_per_s": round(n / (t.total / 3), 1),
            "selection_parity_vs_f64": sel_ok,
            "coeff_parity_vs_f64": coeff_ok,
        }
        print(json.dumps({name: results[name]}))

    base = results["vmap_lu"]["device_s"]
    for name, r in results.items():
        r["speedup_vs_vmap_lu"] = round(base / r["device_s"], 2)
    print(json.dumps(results, indent=1))

    # Single-session (unbatched) program, both solvers, biggest session.
    big = int(np.argmax([m.size for m in mats]))
    sargs = jax.device_put((packed.phi_rx[big], packed.phi_tx[big],
                            packed.aoa_grid[big], packed.aod_grid[big],
                            packed.matrices[big]))
    for solver in ("lu", "auto"):
        fn = jit_highest(functools.partial(
            nn_omp_jax, cfg=cfg, keep_rule="ratio", stop_nonpositive=True,
            nnls_solver=solver))
        out = fn(*sargs)
        jax.block_until_ready(out.power)
        t = measure_device_time(lambda i: fn(*sargs).power, n=3)
        print(json.dumps({"single_session_solver": solver,
                          "device_s": round(t.total / 3, 5)}))


if __name__ == "__main__":
    main()
