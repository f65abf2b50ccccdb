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
    # No per-log sync: dispatch everything, block once at the end.  The
    # whole dataset takes tens of ms, so take the median of 3 repeats.
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [run_session_on_device(r) for r in raw]
        jax.block_until_ready([(o.rgba, o.n_frames) for o in outs])
        times.append(time.perf_counter() - t0)
    elapsed = sorted(times)[1]
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
    t1 = time.perf_counter()
    outs2 = [run_session_on_device(read_hex_log(p)) for p in logs]
    jax.block_until_ready([o.rgba for o in outs2])
    e2e_elapsed = time.perf_counter() - t1

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

    # S-sweep batched estimation (Session.sweep_paths): vmapped NN-OMP over
    # the per-sweep [S, 64, 64] tensors of the biggest log.  sweep_paths
    # reads its results internally, so this is the LAST timed section; the
    # timed call includes those reads (it is the user-facing e2e op).
    from slam_process_tpu.pipeline.session import Session

    big_idx = int(np.argmax([len(r) for r in raw]))
    sess = Session("bench")
    sess.frames = decode_frames_np(raw[big_idx]).frames
    sess.correct()
    mapping = DEBUGDOC.parent / "beam_angle.xlsx"
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
        "streaming_frames_per_sec": round(stream_fps, 1),
        "streaming_device_frames_per_sec": round(dev_stream_fps, 1),
        "sweep_estimation_sweeps_per_sec": round(sweep_per_sec, 1),
        "sweep_estimation_n_sweeps": len(sweep_valid),
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
