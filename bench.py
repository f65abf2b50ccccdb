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

MEASUREMENT MODEL (round 3): every device-side number is TRUE DEVICE TIME
from the jax.profiler xplane DEVICE plane (utils/device_timing.py).  Host
wall-clock cannot bound device execution on this relay transport —
block_until_ready returns on the dispatch acknowledgement (a chained
K-iteration 256 MB-read program wall-times the same at K=2 and K=520;
tools/diag_roofline.py) — which is how round 2 reported throughputs above
the chip's HBM roofline.  Wall-clock numbers are still reported as
``*_wall_s`` extras (they are the user-visible dispatch latencies), but
every ``*_device_*`` key and the headline come from the device plane.
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


_FALLBACK_REASON = None   # set when the default backend cannot initialize


def main() -> None:
    import jax

    from slam_process_tpu.utils.transport import probe_default_backend

    # A down relay hangs backend registration forever; probe in a
    # subprocess and fall back to a valid CPU JSON line instead.
    global _FALLBACK_REASON
    if not probe_default_backend():
        print("bench: default backend unavailable (relay down?); "
              "falling back to CPU", flush=True)
        jax.config.update("jax_platforms", "cpu")
        _FALLBACK_REASON = ("default backend failed to initialize "
                            "(accelerator transport down); CPU numbers — "
                            "NOT comparable to TPU rounds")

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
    from slam_process_tpu.pipeline.device import run_session_on_device as _run_dev
    from slam_process_tpu.utils.device_timing import measure_device_time

    # Dataset-tight corrector bounds (58 groups / 93 baselines max across
    # the 19 logs): the corrector's [F, Bmax] score planes scale with the
    # static bounds, and the generous 256/256 default wastes ~2.7x plane
    # traffic here.  Matches the batched config below.
    def run_session_on_device(r):
        return _run_dev(r, max_groups=64, max_baselines_per_group=96)

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

    # ------------------------------------------------------------------
    # Phase 1: WALL timings (dispatch latency extras).  No D2H reads here:
    # the FIRST read of any device buffer flips the relay transport into a
    # persistent degraded mode (tools/diag_reads.py, diag_bisect.py), so
    # every wall number is taken before the first trace window below.
    # ------------------------------------------------------------------
    t0 = time.perf_counter()
    outs = [run_session_on_device(r) for r in raw]
    jax.block_until_ready([(o.rgba, o.n_frames) for o in outs])
    headline_wall_s = time.perf_counter() - t0

    import jax.numpy as jnp

    total_frames_dev = jax.jit(lambda *xs: sum(xs))(
        *[o.n_frames for o in outs])   # read in the report phase below

    # Fully end-to-end, host-tokenize config: file read + native AVX-512
    # hexscan (runtime/hexscan.c, ~3.9 GB/s on this core) + H2D of the
    # token bytes + device pipeline.  Single host core (nproc=1): thread
    # overlap is not available, sequential ingest is the honest number.
    t1 = time.perf_counter()
    outs2 = [run_session_on_device(read_hex_log(p)) for p in logs]
    jax.block_until_ready([o.rgba for o in outs2])
    e2e_wall_s = time.perf_counter() - t1

    # Fully end-to-end, device-tokenize config: file read + stride-3 text
    # prep + H2D of the RAW TEXT + fused tokenize+decode+correct+render
    # program (ops/tokenize.py).  3x the H2D bytes buys zero host tokenize
    # time — which path wins depends on the transport's H2D rate (~550
    # MB/s on this relay; PCIe-class hosts favor the text path).
    from slam_process_tpu.pipeline.device import run_session_from_text

    def text_pass():
        return [run_session_from_text(open(p, "rb").read(), max_groups=64,
                                      max_baselines_per_group=96,
                                      check=False) for p in logs]

    outs3 = text_pass()   # warm: compile every text bucket
    jax.block_until_ready([o.out.rgba for o in outs3])
    # Aggregate the stride-proof flags on device; read in Phase 2.
    tokenize_regular_dev = jax.jit(lambda *xs: sum(xs))(
        *[o.tokenize_regular.astype("int32") for o in outs3])
    t1 = time.perf_counter()
    outs3 = text_pass()
    jax.block_until_ready([o.out.rgba for o in outs3])
    e2e_devtok_wall_s = time.perf_counter() - t1
    del outs3

    # Pixel parity needs one sequential output; keep it, free the rest.
    import gc

    parity_outs = {idx: outs[idx] for idx in (0, len(logs) - 1)}
    # Tiny per-session scalars for the Phase-2 overflow guard (keeping
    # them alive does not pin the big sibling outputs — separate buffers).
    overflow_flags = [o.correct_overflow for o in outs]
    del outs, outs2
    gc.collect()

    # Batched-session config: ONE jitted program over the stacked [S, Nmax]
    # byte batch (the multi-chip layout, here on a single chip).
    from slam_process_tpu.ops.raster import colormap_lut
    from slam_process_tpu.parallel.batch import batched_session_pipeline, stack_sessions
    from slam_process_tpu.parallel.mesh import make_mesh

    n_padded = max(len(r) for r in raw)
    n_padded = ((n_padded + (1 << 20) - 1) >> 20) << 20
    batch, lengths = stack_sessions(raw, n_padded)
    mesh = make_mesh((1, 1), ("data", "model"))
    # Static bounds sized to the dataset (58 groups / 93 baselines max).
    bfn = batched_session_pipeline(mesh, n_padded, max_groups=64,
                                   max_baselines_per_group=96,
                                   outputs="summary")
    lut_j = jnp.asarray(colormap_lut("viridis"))
    with mesh:
        batch_dev = jax.device_put(batch)
        len_dev = jax.device_put(lengths)
        bout = bfn(batch_dev, len_dev, lut_j)   # compile + warm
        jax.block_until_ready(bout.rgba)
        t3 = time.perf_counter()
        bout = bfn(batch_dev, len_dev, lut_j)
        jax.block_until_ready((bout.rgba, bout.n_kept, bout.counts))
        batched_wall_s = time.perf_counter() - t3
        del bout

    # Streaming replay config (BASELINE config 5): chunked ingest with
    # alignment carry + sweep-granular correction, host state machine
    # (pure numpy — a genuine wall measurement, no device work).
    from slam_process_tpu.parallel.streaming import replay_log

    t2 = time.perf_counter()
    stream_frames = sum(replay_log(r, chunk_bytes=1 << 16).n_frames for r in raw)
    stream_fps = stream_frames / (time.perf_counter() - t2)

    # Device streaming warm (compile both variants before their windows).
    from slam_process_tpu.parallel.streaming_device import replay_log_device

    replay_log_device(raw[0], chunk_bytes=1 << 20).block_until_ready()
    replay_log_device(raw[0], chunk_bytes=1 << 20,
                      collect_filtered=True).block_until_ready()
    # Online estimation + tracking inside the stream (collect_paths).
    from slam_process_tpu.parallel.streaming_device import make_paths_spec

    paths_cfg = make_paths_spec(DEBUGDOC.parent / "beam_angle.xlsx")
    replay_log_device(raw[0], chunk_bytes=1 << 20,
                      collect_paths=paths_cfg).block_until_ready()

    # Flagship estimation (the reference's single heaviest compute): v1-7
    # NN-OMP at the 0.1-degree grid (heatmap_gemini_v1-7.py:657-728).
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
    # Async per-session dispatch (adjudication baseline) AND the vmapped
    # one-program path — the device-plane WINNER (26.9 ms with the
    # Gauss-Jordan NNLS solve vs 83 ms async; tools/diag_est_dispatch.py,
    # tools/diag_session_est.py) and the production formulation.
    from slam_process_tpu.models.batch_estimation import (
        _batched_nn_omp_fn,
        nn_omp_sessions_sharded,
    )

    per_dev = [jax.device_put((packed.phi_rx[i], packed.phi_tx[i],
                               packed.aoa_grid[i], packed.aod_grid[i],
                               packed.matrices[i]))
               for i in range(len(logs))]
    est_out = [single_fn(*a) for a in per_dev]          # compile + warm
    jax.block_until_ready([o.power for o in est_out])
    vm_fn = _batched_nn_omp_fn(est_cfg, "ratio", True)
    vm_args = jax.device_put((packed.matrices, packed.phi_rx,
                              packed.phi_tx, packed.aoa_grid,
                              packed.aod_grid))
    vm_warm = vm_fn(*vm_args)
    jax.block_until_ready(vm_warm.power)
    del vm_warm
    # Sharded formulation on this chip's (1, 1) mesh: same program XLA
    # compiles for the multi-chip layout (virtual-mesh parity tested).
    sh_warm = nn_omp_sessions_sharded(packed, est_cfg, mesh)
    jax.block_until_ready(sh_warm.power)
    del sh_warm
    t8 = time.perf_counter()
    outs_e = vm_fn(*vm_args)
    jax.block_until_ready(outs_e.power)
    est_wall_s = time.perf_counter() - t8
    del outs_e

    # The reference-shaped float64 host path on the biggest session (scipy
    # NNLS loop — the 0.285 s/session baseline this must beat).
    big_idx = int(np.argmax([len(r) for r in raw]))
    host_times = []
    for _ in range(3):   # min of 3: the host path inherits box CPU noise
        t9 = time.perf_counter()
        est_host_paths = nn_omp_np(est_dicts[big_idx], est_mats[big_idx],
                                   est_cfg, keep_rule="ratio",
                                   stop_nonpositive=True)
        host_times.append(time.perf_counter() - t9)
    est_host_s = min(host_times)

    # ------------------------------------------------------------------
    # Phase 2: DEVICE-plane timings (the authoritative numbers).  Each
    # window performs one D2H read to close it, so these run after every
    # wall section.  Device-plane durations are immune to the transport.
    #
    # One real D2H read BEFORE the first window: block_until_ready only
    # acks dispatch on this transport, so Phase 1's queued device work
    # must be forced to complete (a read synchronizes) or it would execute
    # inside the first trace window and inflate its totals.  The fence is
    # a FRESH trivial program dispatched after everything above — programs
    # execute in dispatch order, so its completion implies the backlog's
    # (reading an earlier value would only fence up to its own producer).
    # ------------------------------------------------------------------
    jax.device_get(jax.jit(lambda: jnp.zeros(()))())
    total_frames = int(total_frames_dev)

    # Headline: per-session pipeline over the whole dataset (19 dispatches
    # of per-bucket executables).  3 passes; report per-pass device total.
    def pass_all(_i):
        outs = [run_session_on_device(r) for r in raw]
        return outs[-1].n_kept

    dt_head = measure_device_time(pass_all, n=3)
    headline_runs = len(dt_head.runs)
    headline_device_s = sum(sum(v) for v in dt_head.all_modules.values()) / 3

    # The tight 64/96 corrector bounds are only valid while the dataset
    # fits them: one aggregated read of the Phase-1 overflow flags guards
    # the whole run's numbers (reads are safe in this phase).
    any_overflow = bool(jax.device_get(jax.jit(
        lambda *xs: sum(x.astype("int32") for x in xs))(*overflow_flags)))
    if any_overflow:
        raise RuntimeError(
            "corrector capacity bounds (64 groups / 96 baselines) exceeded "
            "by the dataset; bench numbers would be invalid")

    # Fused text pipeline (device tokenize): device seconds per pass, and
    # the stride-proof audit (all 19 logs must take the device path).
    datas_text = [open(p, "rb").read() for p in logs]

    def text_pass_mem(_i):
        outs = [run_session_from_text(d, max_groups=64,
                                      max_baselines_per_group=96,
                                      check=False) for d in datas_text]
        return outs[-1].out.n_kept

    dt_text = measure_device_time(text_pass_mem, n=3)
    text_device_s = sum(sum(v) for v in dt_text.all_modules.values()) / 3
    tokenize_all_regular = int(jax.device_get(tokenize_regular_dev)) == len(logs)
    del datas_text

    # Batched one-program whole dataset.
    with mesh:
        dt_batched = measure_device_time(
            lambda i: bfn(batch_dev, len_dev, lut_j).n_kept, n=3,
            module="batched")
    batched_device_s = dt_batched.median

    # Grouped batched (the same multi-chip layout, per-bucket programs —
    # no uniform-padding waste).  Device seconds = sum over the per-bucket
    # programs of one pass.
    from slam_process_tpu.parallel.batch import run_dataset_batched_grouped

    with mesh:
        warm_g = run_dataset_batched_grouped(mesh, raw, max_groups=64,
                                             max_baselines_per_group=96)
        jax.block_until_ready([o.n_kept for _, o in warm_g])
        jax.device_get(jax.jit(lambda: jnp.zeros(()))())   # fence
        dt_grouped = measure_device_time(
            lambda i: run_dataset_batched_grouped(
                mesh, raw, max_groups=64,
                max_baselines_per_group=96)[-1][1].n_kept, n=3)
    grouped_device_s = sum(
        sum(v) for v in dt_grouped.all_modules.values()) / 3

    # Device-resident streaming (no-emit and emit modes): total device
    # seconds across the full dataset replay (many step dispatches).
    def stream_all(_i):
        ss = [replay_log_device(r, chunk_bytes=1 << 20) for r in raw]
        return ss[-1]._state.n_frames

    dt_stream = measure_device_time(stream_all, n=1)
    stream_device_s = sum(sum(v) for v in dt_stream.all_modules.values())

    def stream_emit_all(_i):
        ss = [replay_log_device(r, chunk_bytes=1 << 20,
                                collect_filtered=True) for r in raw]
        return ss[-1]._state.n_frames

    dt_emit = measure_device_time(stream_emit_all, n=1)
    emit_device_s = sum(sum(v) for v in dt_emit.all_modules.values())

    # Multi-stream vmapped ingest (the §5.8 many-concurrent-feeds shape):
    # the 19 logs round-robined over 8 live streams, every step ONE
    # vmapped program over the [S, ...] state (single chip here; on a
    # mesh the S axis shards over 'data' with no cross-chip traffic).
    # Per-stream parity vs independent sessions is tests/
    # test_multidevice.py's job — this measures aggregate throughput.
    from slam_process_tpu.parallel.streaming_device import (
        MultiStreamingSession,
    )

    n_ms_streams = 8
    ms_feeds = [
        np.concatenate(
            [r for j, r in enumerate(raw) if j % n_ms_streams == i]
            or [np.zeros(0, np.uint8)])
        for i in range(n_ms_streams)
    ]

    def multistream_all(_i):
        ms = MultiStreamingSession(n_ms_streams, chunk_bytes=1 << 20)
        ms.feed(ms_feeds)
        ms.finalize()
        return ms, ms._state.n_frames

    ms_warm, _ = multistream_all(0)                   # warm/compile
    multistream_frames = int(ms_warm.results()[0].sum())
    assert multistream_frames == total_frames, "multistream lost frames"
    dt_ms_fn = lambda i: multistream_all(i)[1]
    dt_ms = measure_device_time(dt_ms_fn, n=1)
    multistream_device_s = sum(sum(v) for v in dt_ms.all_modules.values())

    # Streaming with ONLINE per-sweep estimation + tracking: the offline
    # flagship produced in-stream as sweeps close (exact-parity tested
    # against Session.sweep_paths/path_tracks on every log).
    def stream_paths_all(_i):
        ss = [replay_log_device(r, chunk_bytes=1 << 20,
                                collect_paths=paths_cfg) for r in raw]
        return ss[-1]._state.n_frames

    dt_spaths = measure_device_time(stream_paths_all, n=1)
    spaths_device_s = sum(sum(v) for v in dt_spaths.all_modules.values())

    # Flagship estimation, three formulations on the device plane:
    # vmapped one-program (production), async per-session (baseline),
    # mesh-sharded (the multi-chip program, here at (1, 1)).
    dt_vm = measure_device_time(lambda i: vm_fn(*vm_args).power, n=3)
    est_vm_device_s = sum(sum(v) for v in dt_vm.all_modules.values()) / 3

    with mesh:
        dt_sh = measure_device_time(
            lambda i: nn_omp_sessions_sharded(packed, est_cfg, mesh).power,
            n=3)
    est_sh_device_s = sum(sum(v) for v in dt_sh.all_modules.values()) / 3

    def est_all(_i):
        outs_e = [single_fn(*a) for a in per_dev]
        return outs_e[-1].power

    dt_est = measure_device_time(est_all, n=3)
    est_device_s = sum(sum(v) for v in dt_est.all_modules.values()) / 3
    # The big session's own executions (dispatch order preserved per pass),
    # so the host-vs-device speedup compares the SAME session on both
    # sides; median-across-sessions would understate the denominator.
    n_per_pass = len(dt_est.runs) // 3
    est_single_fallback = n_per_pass != len(logs)
    if est_single_fallback:   # trace dropped/added an event: say so loudly
        import sys
        print(f"WARNING: estimator trace had {len(dt_est.runs)} runs, "
              f"expected {3 * len(logs)}; single-session device time "
              "falls back to the cross-session median", file=sys.stderr)
    big_runs = (sorted(dt_est.runs)
                if est_single_fallback
                else sorted(dt_est.runs[big_idx::n_per_pass]))
    est_single_device_s = big_runs[len(big_runs) // 2]

    # ------------------------------------------------------------------
    # Phase 3: per-sweep estimation (reads results internally) + report.
    # ------------------------------------------------------------------
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

    # Device-plane seconds for the same section (the wall number above
    # includes host prep, 19 dispatches, and the stacked read).
    dt_sweep = measure_device_time(
        lambda i: sweep_paths_dataset(est_sessions, mapping)
        and jnp.zeros(()), n=2)
    ds_sweep_device_s = sum(
        sum(v) for v in dt_sweep.all_modules.values()) / 2

    fps = total_frames / headline_device_s
    e2e_fps = total_frames / e2e_wall_s

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
        "measurement": "device-plane (xplane) seconds; *_wall_s = dispatch wall",
        "total_frames": total_frames,
        "n_logs": len(logs),
        "headline_device_seconds_per_pass": round(headline_device_s, 4),
        "headline_device_runs": headline_runs,
        "headline_wall_s": round(headline_wall_s, 4),
        "e2e_frames_per_sec_with_host_tokenize": round(e2e_fps, 1),
        "e2e_frames_per_sec_device_tokenize": round(
            total_frames / e2e_devtok_wall_s, 1),
        "e2e_wall_s_device_tokenize": round(e2e_devtok_wall_s, 4),
        "e2e_frames_per_sec": round(
            total_frames / min(e2e_wall_s, e2e_devtok_wall_s), 1),
        "text_pipeline_device_seconds_per_pass": round(text_device_s, 4),
        "text_pipeline_device_frames_per_sec": round(
            total_frames / text_device_s, 1),
        "tokenize_all_regular": tokenize_all_regular,
        "batched_device_seconds_full_dataset": round(batched_device_s, 4),
        "batched_device_frames_per_sec": round(
            total_frames / batched_device_s, 1),
        "batched_device_trials_s": [round(t, 4) for t in dt_batched.runs],
        "batched_grouped_device_seconds_full_dataset": round(
            grouped_device_s, 4),
        "batched_grouped_device_frames_per_sec": round(
            total_frames / grouped_device_s, 1),
        "batched_wall_s": round(batched_wall_s, 4),
        "streaming_frames_per_sec": round(stream_fps, 1),
        "streaming_device_seconds_full_dataset": round(stream_device_s, 4),
        "streaming_device_frames_per_sec": round(
            total_frames / stream_device_s, 1),
        "streaming_device_emit_seconds_full_dataset": round(emit_device_s, 4),
        "streaming_device_emit_frames_per_sec": round(
            total_frames / emit_device_s, 1),
        "streaming_with_estimation_seconds_full_dataset": round(
            spaths_device_s, 4),
        "streaming_with_estimation_frames_per_sec": round(
            total_frames / spaths_device_s, 1),
        "multistream_n_streams": n_ms_streams,
        "multistream_frames": multistream_frames,
        "multistream_device_seconds_full_dataset": round(
            multistream_device_s, 4),
        "multistream_device_frames_per_sec": round(
            multistream_frames / multistream_device_s, 1),
        "estimate_device_seconds_dataset": round(est_vm_device_s, 4),
        "estimate_sessions_per_sec_device": round(
            len(logs) / est_vm_device_s, 1),
        "estimate_sharded_device_seconds_dataset": round(
            est_sh_device_s, 4),
        "estimate_sharded_sessions_per_sec_device": round(
            len(logs) / est_sh_device_s, 1),
        "estimate_async_device_seconds_dataset": round(est_device_s, 4),
        "estimate_async_sessions_per_sec_device": round(
            len(logs) / est_device_s, 1),
        "estimate_single_session_device_seconds": round(
            est_single_device_s, 5),
        "estimate_single_session_is_fallback_median": est_single_fallback,
        "estimate_wall_s_dataset": round(est_wall_s, 4),
        "estimate_host_session_seconds": round(est_host_s, 4),
        "estimate_speedup_vs_host": round(
            est_host_s / est_single_device_s, 1),
        "estimate_parity_ok": est_parity_ok,
        "sweep_estimation_sweeps_per_sec": round(ds_sweeps_per_sec, 1),
        "sweep_estimation_device_seconds": round(ds_sweep_device_s, 4),
        "sweep_estimation_sweeps_per_sec_device": round(
            ds_n_sweeps / ds_sweep_device_s, 1),
        "sweep_estimation_n_sweeps": ds_n_sweeps,
        "max_pixel_delta_norm_raster": max_pixel_delta,
        "lut_bin_flips": bin_flips,
        "reference_frames_per_sec": round(ref_fps, 1),
        "speedup_vs_reference": round(fps / max(ref_fps, 1e-9), 1),
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }
    if _FALLBACK_REASON is not None:
        result["backend_fallback"] = _FALLBACK_REASON
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
