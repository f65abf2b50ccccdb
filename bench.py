"""Benchmark: full-dataset decode+correct+render throughput on one chip.

Runs the fused on-device session pipeline (bytes -> frames -> corrected ->
intensity -> raster) over every serial log in the reference dataset and
prints ONE JSON line:

    {"metric": "frames_per_sec_decode_correct_render", "value": N,
     "unit": "frames/s", "vs_baseline": N, ...}

vs_baseline is measured against BASELINE.json's north-star target of
10,000 frames/s for a full-session decode+render on one TPU chip (the
reference itself publishes no numbers; its pure-Python decode loop measures
~2-4k frames/s on this machine, see "reference_frames_per_sec" in extras).
Also reports the max premultiplied-RGBA pixel delta between the device
raster and the float64 matplotlib-oracle render path (budget 1e-3).
"""

from __future__ import annotations

import glob
import json
import time
from pathlib import Path

import numpy as np

DEBUGDOC = Path("/root/reference/debugDoc")


def _oracle_norm_raster(filtered: np.ndarray) -> np.ndarray:
    """Float64 host oracle for the normalized (pre-colormap) raster.

    The continuous parity surface is the [0,1]-normalized data raster:
    colormap application quantizes to 256 LUT bins, so two renders whose t
    values differ by 1e-7 near a bin edge legitimately differ by a full
    viridis step (~0.01) in RGBA — exactly as two matplotlib runs at
    different float precision would.  Pixel parity is therefore measured on
    t (budget 1e-3) with LUT-bin agreement reported alongside.
    """
    from slam_process_tpu.config import SceneConfig
    from slam_process_tpu.ops.raster import blur_nan_aware_np, shifted_log_norm
    from slam_process_tpu.ops.scene import fill_grid, intensity_grid_np

    cfg = SceneConfig(keep_nan=True, fill_with_min=False)
    grid = intensity_grid_np(filtered[:, 0], filtered[:, 1], filtered[:, 2], cfg=cfg)
    matrix = fill_grid(grid, cfg).T
    return np.asarray(shifted_log_norm(blur_nan_aware_np(matrix, 1.0)))


def main() -> None:
    import jax

    # Persistent compilation cache: the driver re-runs bench each round;
    # warm compiles dominate otherwise.
    try:
        cache_dir = Path(__file__).parent / "build" / "jax_cache"
        cache_dir.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from slam_process_tpu.io import read_hex_log
    from slam_process_tpu.ops.correct import correct_frames_np
    from slam_process_tpu.ops.decode import decode_frames_np
    from slam_process_tpu.pipeline.device import run_session_on_device

    logs = sorted(glob.glob(str(DEBUGDOC / "*.txt")))
    if not logs:
        print(json.dumps({"metric": "frames_per_sec_decode_correct_render",
                          "value": 0, "unit": "frames/s", "vs_baseline": 0,
                          "error": "no logs found"}))
        return

    raw = [read_hex_log(p) for p in logs]

    # Warmup: compile every bucket once; drain the queue before timing.
    warm = [run_session_on_device(r) for r in raw]
    jax.block_until_ready([o.rgba for o in warm])
    del warm

    # Timed: tokenized bytes -> device pipeline -> raster, all logs.
    # No per-log sync within a pass: dispatch everything, block once.  One
    # dataset pass is only ~30-40 ms — relay dispatch jitter swung the r1->r2
    # headline by 23% with zero code change — so the timed region repeats
    # whole-dataset passes until it spans >= 0.5 s, and the spread across
    # 3 such regions is reported (regression detection needs swing < 5%).
    t0 = time.perf_counter()
    outs = [run_session_on_device(r) for r in raw]
    jax.block_until_ready([(o.rgba, o.n_frames) for o in outs])
    one_pass = time.perf_counter() - t0
    n_passes = max(int(np.ceil(0.5 / max(one_pass, 1e-4))), 1)
    pass_times = []
    for _ in range(3):
        for _pass in range(n_passes):
            t0 = time.perf_counter()
            outs = [run_session_on_device(r) for r in raw]
            jax.block_until_ready([(o.rgba, o.n_frames) for o in outs])
            pass_times.append(time.perf_counter() - t0)
    # This section is dispatch-bound (the device finishes the whole dataset
    # in ~85 us — see batched_*): each pass pays ~19 relay dispatches whose
    # host-side stalls are large, one-sided, and additive.  min over many
    # passes is the reproducible sustained rate (stalls can only inflate a
    # blocked pass, never deflate it); the median and spread are reported
    # alongside so the jitter stays visible.
    elapsed = min(pass_times)
    elapsed_median = sorted(pass_times)[len(pass_times) // 2]
    headline_spread = (max(pass_times) - min(pass_times)) / elapsed_median
    # NO D2H reads until every timed section is done: the FIRST read of any
    # device buffer flips the relay transport into a persistent degraded
    # mode (subsequent 40 MB-input program calls: 0.05 ms -> 1196 ms,
    # deterministic; tools/diag_reads.py + tools/diag_bisect.py phase 'a').
    # This ordering discipline — time everything, then read — was the
    # entire round-1 "batched dispatch anomaly".
    import jax.numpy as jnp

    total_frames_dev = jax.jit(lambda *xs: sum(xs))(
        *[o.n_frames for o in outs])   # read in the report phase below

    # Fully end-to-end: file read + host tokenization + device pipeline.
    # Sequential ingest: the native tokenizer runs at ~536 MB/s so thread
    # overlap gains nothing (measured: sequential is the faster e2e).
    # min of 3: the host stages inherit the box's CPU noise.
    e2e_times = []
    for _ in range(3):
        t1 = time.perf_counter()
        outs2 = [run_session_on_device(read_hex_log(p)) for p in logs]
        jax.block_until_ready([o.rgba for o in outs2])
        e2e_times.append(time.perf_counter() - t1)
    e2e_elapsed = min(e2e_times)

    # Pixel parity needs one sequential output; keep it, free the rest.
    import gc

    parity_outs = {idx: outs[idx] for idx in (0, len(logs) - 1)}
    del outs, outs2
    gc.collect()

    # Batched-session config: ONE jitted program over the stacked [S, Nmax]
    # byte batch (the multi-chip layout, here on a single chip).
    #
    # Round-1's "dispatch anomaly" (1.2 s/call) is root-caused as TWO
    # independent relay-transport behaviors (tools/diag_batched.py,
    # tools/diag_reads.py, tools/diag_bisect.py):
    #   1. blocking on a program whose large outputs stay live waits for
    #      their eager host mirroring (~77 MB/s; 93 MB of [S, cap] frame
    #      tensors = 1.2 s) -> the hot loop runs the 'summary' program;
    #   2. the FIRST D2H read of ANY device buffer (even one aggregated
    #      scalar) flips the transport into a persistent degraded mode
    #      where this program costs 1196 ms/call (deterministic; bisect
    #      phase 'a') -> bench performs NO reads until every timed
    #      section is done (see the report phase below).
    # With both fixes the whole-dataset single program measures ~0.1 ms.
    from slam_process_tpu.ops.raster import colormap_lut
    from slam_process_tpu.parallel.batch import batched_session_pipeline, stack_sessions
    from slam_process_tpu.parallel.mesh import make_mesh
    import jax.numpy as jnp

    n_padded = max(len(r) for r in raw)
    n_padded = ((n_padded + (1 << 20) - 1) >> 20) << 20
    batch, lengths = stack_sessions(raw, n_padded)
    mesh = make_mesh((1, 1), ("data", "model"))
    # Static bounds sized to the dataset (58 groups / 93 baselines max).
    bfn = batched_session_pipeline(mesh, n_padded, max_groups=64,
                                   max_baselines_per_group=96,
                                   outputs="summary")
    bfn_full = batched_session_pipeline(mesh, n_padded, max_groups=64,
                                        max_baselines_per_group=96)
    lut_j = jnp.asarray(colormap_lut("viridis"))
    with mesh:
        batch_dev = jax.device_put(batch)
        len_dev = jax.device_put(lengths)
        bout = bfn(batch_dev, len_dev, lut_j)   # compile + warm
        jax.block_until_ready(bout.rgba)
        # Median of 9 (sub-ms measurement; queue spikes are possible).
        times = []
        for _ in range(9):
            t3 = time.perf_counter()
            bout = bfn(batch_dev, len_dev, lut_j)
            jax.block_until_ready((bout.rgba, bout.n_kept, bout.counts))
            times.append(time.perf_counter() - t3)
        batched_s = sorted(times)[len(times) // 2]
        batched_trials = [round(t, 6) for t in times]
        del bout
        # Including the H2D transfer of the padded byte batch.
        times = []
        for _ in range(3):
            t4 = time.perf_counter()
            bout2 = bfn(jax.device_put(batch), jax.device_put(lengths), lut_j)
            jax.block_until_ready((bout2.rgba, bout2.n_kept, bout2.counts))
            times.append(time.perf_counter() - t4)
            del bout2
        batched_h2d_s = sorted(times)[1]

    # Streaming replay config (BASELINE config 5): chunked ingest with
    # alignment carry + sweep-granular correction, host state machine
    # (pure numpy — performs no device reads).
    from slam_process_tpu.parallel.streaming import replay_log

    t2 = time.perf_counter()
    stream_frames = sum(replay_log(r, chunk_bytes=1 << 16).n_frames for r in raw)
    stream_fps = stream_frames / (time.perf_counter() - t2)

    # Device-resident streaming: decode + sweep-close + correct + fold all
    # on device with donated state (parallel/streaming_device.py); the
    # timed region blocks on device completion only.
    from slam_process_tpu.parallel.streaming_device import replay_log_device

    replay_log_device(raw[0], chunk_bytes=1 << 20).block_until_ready()  # warm
    t2 = time.perf_counter()
    dev_sessions = [replay_log_device(r, chunk_bytes=1 << 20) for r in raw]
    for s in dev_sessions:
        s.block_until_ready()
    dev_elapsed = time.perf_counter() - t2
    dev_stream_frames_dev = jax.jit(lambda *xs: sum(xs))(
        *[s._state.n_frames for s in dev_sessions])
    del dev_sessions

    # Emit-mode device streaming (collect_filtered=True): kept rows
    # accumulate in a device-side ring and drain once at read time, so the
    # feed loop stays read-free; timed region blocks on device completion
    # only (the drain is a result-consumption cost, not a streaming cost).
    replay_log_device(raw[0], chunk_bytes=1 << 20,
                      collect_filtered=True).block_until_ready()   # warm
    t2 = time.perf_counter()
    emit_sessions = [replay_log_device(r, chunk_bytes=1 << 20,
                                       collect_filtered=True) for r in raw]
    for s in emit_sessions:
        s.block_until_ready()
    emit_elapsed = time.perf_counter() - t2
    emit_frames_dev = jax.jit(lambda *xs: sum(xs))(
        *[s._state.n_frames for s in emit_sessions])
    del emit_sessions

    # Flagship estimation (the reference's single heaviest compute): v1-7
    # NN-OMP at the 0.1-degree grid (heatmap_gemini_v1-7.py:657-728).  All
    # 19 sessions run as ONE vmapped program on padded scenes
    # (models/batch_estimation.py, exact-parity padding); the timed region
    # blocks on device completion only — results are read (and checked
    # against the float64 host oracle) in the report phase.
    from slam_process_tpu.config import DictionaryConfig, OmpConfig
    from slam_process_tpu.models.batch_estimation import pack_scenes
    from slam_process_tpu.models.dictionary import make_dictionary
    from slam_process_tpu.models.nn_omp import _jitted_nn_omp, nn_omp_np
    from slam_process_tpu.models.registry import build_scene
    from slam_process_tpu.pipeline.session import Session

    mapping = DEBUGDOC.parent / "beam_angle.xlsx"
    est_cfg = OmpConfig(max_paths=20, min_power_ratio=0.0003)
    est_dict_cfg = DictionaryConfig(grid_res=0.1, beam_width=1.4,
                                    grid_kind="linspace")
    est_sessions = []
    est_mats, est_dicts = [], []
    for i, p in enumerate(logs):
        s = Session(Path(p).stem)
        s.frames = decode_frames_np(raw[i]).frames
        matrix, ue_ang, bs_ang = build_scene(s, mapping, True)
        est_mats.append(matrix)
        est_dicts.append(make_dictionary(ue_ang, bs_ang, est_dict_cfg))
        est_sessions.append(s)
    packed = pack_scenes(est_mats, est_dicts)
    single_fn = _jitted_nn_omp(est_cfg, "ratio", True)
    # One compiled executable at the padded shape, dispatched per session
    # (~19x faster than a vmapped [N, ...] program on this chip: the NNLS
    # while_loops run in lockstep under vmap — batch_estimation docstring).
    import jax.numpy as jnp  # noqa: F811

    per_dev = [jax.device_put((packed.phi_rx[i], packed.phi_tx[i],
                               packed.aoa_grid[i], packed.aod_grid[i],
                               packed.matrices[i]))
               for i in range(len(logs))]
    # Per-trial input variants: identical-input repeat calls can hit a
    # relay dedup fast path that reports impossible times (docs/STATUS.md)
    # — every timed call below sees a fresh matrix.
    variants = [[(a[0], a[1], a[2], a[3], a[4] + jnp.float32(t * 1e-6))
                 for a in per_dev] for t in range(5)]
    jax.block_until_ready(variants)
    est_out = [single_fn(*a) for a in per_dev]          # compile + warm
    jax.block_until_ready([o.power for o in est_out])
    times = []
    for trial in variants:
        t7 = time.perf_counter()
        outs_e = [single_fn(*a) for a in trial]
        jax.block_until_ready([o.power for o in outs_e])
        times.append(time.perf_counter() - t7)
        del outs_e
    est_dataset_s = sorted(times)[len(times) // 2]

    # Single biggest session (the flagship per-session latency), varied
    # inputs, warm, block-only.
    big_idx = int(np.argmax([len(r) for r in raw]))
    times = []
    for t in range(5):
        a = variants[t][big_idx]
        t8 = time.perf_counter()
        sout = single_fn(*a)
        jax.block_until_ready(sout.power)
        times.append(time.perf_counter() - t8)
        del sout
    est_single_s = sorted(times)[len(times) // 2]

    # The reference-shaped float64 host path on the same session (scipy
    # NNLS loop — the 0.285 s/session baseline this must beat).
    t9 = time.perf_counter()
    est_host_paths = nn_omp_np(est_dicts[big_idx], est_mats[big_idx],
                               est_cfg, keep_rule="ratio",
                               stop_nonpositive=True)
    est_host_s = time.perf_counter() - t9

    # Full-output program with all outputs held live: measures the relay's
    # eager output mirroring (platform characterization; ~1.2 s by design).
    # Measured BEFORE any section that performs D2H reads (sweep_paths does)
    # so the mirroring number is taken on the non-degraded transport.
    with mesh:
        fout = bfn_full(batch_dev, len_dev, lut_j)
        jax.block_until_ready(fout.rgba)
        t5 = time.perf_counter()
        fout = bfn_full(batch_dev, len_dev, lut_j)
        jax.block_until_ready((fout.rgba, fout.n_kept, fout.counts))
        fullout_mirror_s = time.perf_counter() - t5
        del fout

    # Per-sweep batched estimation at DATASET scale (sweep_paths_dataset):
    # all 19 sessions' sweeps through one shared compiled estimator, Gram-
    # domain NN-OMP.  It reads its results internally, so these are the
    # LAST timed sections; the timed calls include those reads (they are
    # the user-facing e2e ops).
    from slam_process_tpu.pipeline.session import sweep_paths_dataset

    for s in est_sessions:
        s.correct()
    sweep_paths_dataset(est_sessions, mapping)       # compile + warm + memo
    times = []
    for _ in range(3):
        t6 = time.perf_counter()
        ds_results = sweep_paths_dataset(est_sessions, mapping)
        times.append(time.perf_counter() - t6)
    ds_sweep_s = sorted(times)[1]
    ds_n_sweeps = sum(len(v) for _, v in ds_results)
    ds_sweeps_per_sec = ds_n_sweeps / ds_sweep_s

    # Single-session variant (the round-2 metric, for continuity).
    sess = est_sessions[big_idx]
    sess.sweep_paths(mapping)          # compile + warm
    t6 = time.perf_counter()
    sweep_est_paths, sweep_valid = sess.sweep_paths(mapping)
    sweep_est_s = time.perf_counter() - t6
    sweep_per_sec = len(sweep_valid) / sweep_est_s

    # ------------------------------------------------------------------
    # Report phase: every timed section is done — D2H reads are safe now.
    # ------------------------------------------------------------------
    total_frames = int(total_frames_dev)
    fps = total_frames / elapsed
    e2e_fps = total_frames / e2e_elapsed
    batched_fps = total_frames / batched_s
    batched_h2d_fps = total_frames / batched_h2d_s
    dev_stream_frames = int(dev_stream_frames_dev)
    assert dev_stream_frames == total_frames, (dev_stream_frames, total_frames)
    dev_stream_fps = dev_stream_frames / dev_elapsed
    assert int(emit_frames_dev) == total_frames
    emit_stream_fps = total_frames / emit_elapsed

    # Pixel parity: device normalized raster vs float64 host oracle, plus
    # colormap LUT-bin agreement.
    t_deltas, bin_flips = [], 0
    for idx in (0, len(logs) - 1):
        frames = decode_frames_np(raw[idx]).frames
        filtered = correct_frames_np(frames).filtered
        oracle_t = _oracle_norm_raster(filtered)
        ours_t = np.asarray(parity_outs[idx].norm_t, dtype=np.float64)
        both = np.isfinite(oracle_t) & np.isfinite(ours_t)
        t_deltas.append(float(np.max(np.abs(ours_t[both] - oracle_t[both]))))
        bin_flips += int(
            (np.clip((ours_t[both] * 256).astype(int), 0, 255)
             != np.clip((oracle_t[both] * 256).astype(int), 0, 255)).sum()
        )
    max_pixel_delta = max(t_deltas)

    # Flagship estimation parity: one batched pytree read, then the biggest
    # session's selection sequence must match the float64 host oracle.
    est_host_out = jax.device_get(est_out)[big_idx]
    n_it = int(est_host_paths.n_iters)
    est_parity_ok = bool(
        int(est_host_out.n_iters) == n_it
        and np.array_equal(est_host_out.aoa_idx[:n_it],
                           est_host_paths.aoa_idx[:n_it])
        and np.array_equal(est_host_out.aod_idx[:n_it],
                           est_host_paths.aod_idx[:n_it])
        and np.allclose(est_host_out.power[:n_it],
                        est_host_paths.power[:n_it], rtol=2e-3, atol=1e-5)
    )

    # Reference pipeline throughput on this host (tokenize + parse measured
    # on the smallest log; the iterrows correct stage measured on a 4000-row
    # subsample — it dominates, reference has no published numbers).
    ref_fps = _reference_pipeline_fps(raw[0])

    result = {
        "metric": "frames_per_sec_decode_correct_render",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / 10_000.0, 3),
        "e2e_frames_per_sec_with_host_tokenize": round(e2e_fps, 1),
        "total_frames": total_frames,
        "n_logs": len(logs),
        "elapsed_s": round(elapsed, 4),
        "batched_resident_frames_per_sec": round(batched_fps, 1),
        "batched_with_h2d_frames_per_sec": round(batched_h2d_fps, 1),
        "batched_device_seconds_full_dataset": round(batched_s, 6),
        "batched_trials_s": batched_trials,
        "batched_fullout_mirror_s": round(fullout_mirror_s, 4),
        "headline_median_pass_s": round(elapsed_median, 4),
        "headline_pass_spread": round(headline_spread, 4),
        "headline_passes_timed": 3 * n_passes,
        "streaming_frames_per_sec": round(stream_fps, 1),
        "streaming_device_frames_per_sec": round(dev_stream_fps, 1),
        "streaming_device_emit_frames_per_sec": round(emit_stream_fps, 1),
        "estimate_sessions_per_sec": round(len(logs) / est_dataset_s, 1),
        "estimate_dataset_seconds": round(est_dataset_s, 6),
        "estimate_single_session_seconds": round(est_single_s, 6),
        "estimate_host_session_seconds": round(est_host_s, 4),
        "estimate_speedup_vs_host": round(
            est_host_s / (est_dataset_s / len(logs)), 1),
        "estimate_parity_ok": est_parity_ok,
        "sweep_estimation_sweeps_per_sec": round(ds_sweeps_per_sec, 1),
        "sweep_estimation_n_sweeps": ds_n_sweeps,
        "sweep_estimation_single_session_sweeps_per_sec": round(sweep_per_sec, 1),
        "max_pixel_delta_norm_raster": max_pixel_delta,
        "lut_bin_flips": bin_flips,
        "reference_frames_per_sec": round(ref_fps, 1),
        "speedup_vs_reference": round(fps / max(ref_fps, 1e-9), 1),
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


def _reference_pipeline_fps(b: np.ndarray) -> float:
    """Measured throughput of the reference's compute path on this host:
    regex tokenizer (serial_hex_to_excel_v3.py:18-36) + per-byte parse loop
    (:41-103) + iterrows correction (bs_beam_correction.py:140-178, measured
    on a 4000-row subsample).  Composes the per-stage rates harmonically."""
    import time as _time

    from slam_process_tpu.io.hexlog import tokenize_hex_reference

    # Stage 1a: tokenize (regex loop).  Reconstruct approximate raw text.
    text = b" ".join(b"%02X" % v for v in b.tolist()[:200_000])
    t0 = _time.perf_counter()
    toks = tokenize_hex_reference(text)
    tok_rate_bytes = len(toks) / (_time.perf_counter() - t0)

    # Stage 1b: parse loop.
    t0 = _time.perf_counter()
    rows = _reference_decode_loop(b)
    parse_rate = len(rows) / (_time.perf_counter() - t0)

    # Stage 2: iterrows correction on a subsample.
    import pandas as pd

    frames = np.asarray(rows[:4000], dtype=np.int64)
    df = pd.DataFrame(frames, columns=["FLAG", "UE", "BS", "RSS", "CLK"])
    CYCLE, TOL, MOD = 61_000, 500, 64
    t0 = _time.perf_counter()
    gid = ((df["UE"].shift(1) > df["UE"]) | df["UE"].shift(1).isna()).cumsum() - 1
    for _g, grp in df.groupby(gid):
        prev_flag = grp["FLAG"].shift(1)
        prev_rss = grp["RSS"].shift(1)
        mask = (grp["FLAG"] == 1) & (prev_flag == 0) & (grp["RSS"] == prev_rss)
        baselines = [
            (int(grp.loc[i - 1, "CLK"]), int(grp.loc[i, "BS"]))
            for i in grp.index[mask]
        ]
        for _i, row in grp.iterrows():
            if row["FLAG"] == 1 or not baselines:
                continue
            clk = int(row["CLK"])
            for clk_b, bs_b in baselines:
                d = clk - clk_b
                k = int(round(d / CYCLE))
                if abs(d - k * CYCLE) <= TOL:
                    _ = (bs_b + k) % MOD
    correct_rate = len(df) / (_time.perf_counter() - t0)

    # frames/s for tokenize: 11 bytes/frame.
    tok_rate = tok_rate_bytes / 11.0
    return 1.0 / (1.0 / tok_rate + 1.0 / parse_rate + 1.0 / correct_rate)


def _reference_decode_loop(b: np.ndarray):
    """A faithful reimplementation of the reference's per-byte Python decode
    loop (serial_hex_to_excel_v3.py:41-103), used only to report the
    baseline's achievable throughput on this host."""
    rows = []
    i, n = 0, len(b)
    bl = b.tolist()
    while i < n:
        flag = bl[i]
        if flag not in (0xCC, 0x33):
            i += 1
            continue
        if i + 11 > n:
            break
        ue, bs = bl[i + 1], bl[i + 2]
        if (ue >> 6) != 0 or (bs >> 6) != 3:
            i += 1
            continue
        clk_bytes = bl[i + 3 : i + 8]
        if any((c >> 6) != 1 for c in clk_bytes):
            i += 1
            continue
        rss_bytes = bl[i + 8 : i + 11]
        if any((r >> 6) != 2 for r in rss_bytes):
            i += 1
            continue
        clk = 0
        for k, c in enumerate(clk_bytes):
            clk |= (c & 0x3F) << (6 * k)
        rss = (rss_bytes[0] & 0x3F) | ((rss_bytes[1] & 0x3F) << 6) | ((rss_bytes[2] & 0x3F) << 12)
        rows.append((1 if flag == 0xCC else 0, ue & 0x3F, bs & 0x3F, rss, clk))
        i += 11
    return rows


if __name__ == "__main__":
    main()
