"""Benchmark: full-dataset decode+correct+render throughput on one chip.

Runs the fused on-device session pipeline (bytes -> frames -> corrected ->
intensity -> raster) over every serial log in the reference dataset and
prints a JSON result line:

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

SURVIVABILITY MODEL (round 5 — after BENCH_r04 rc=124/empty): the driver
captures whatever this process printed before its timeout and parses the
LAST valid JSON line, so bench must keep a valid result line on stdout at
all times and never block forever.  Four layers:

1. **Data-plane probe**: before touching the default backend, a subprocess
   runs a real jitted dispatch + D2H read under a timeout
   (utils/transport.probe_device_dispatch).  Round 4 proved registration
   alone is not enough — the relay's control plane can come up with a dead
   data plane, and the first dispatch then blocks in ``tcp_recvmsg``
   forever.  On probe failure, bench restarts itself on the CPU backend
   and says so in the JSON ("backend_fallback").
2. **Incremental emission**: the result line is (re)printed after EVERY
   completed lane, each line a superset of the previous — the last line on
   stdout is always the most complete valid result at that moment.
3. **Wall-clock budget** (env ``BENCH_BUDGET_S``, default 600): once
   exceeded, remaining lanes are skipped and the final line carries
   ``"truncated": true`` plus the skipped-lane list.
4. **Stall watchdog** (env ``BENCH_STALL_S``, default 240): a daemon
   thread that aborts — printing the last result dict with
   ``"watchdog_abort": true`` and hard-exiting 0 so the driver's capture
   ends with a valid line — when either (a) no lane progress has been
   signalled for STALL_S **and** the process burned almost no CPU over
   that window (a data-plane hang blocks in ``recvfrom`` at ~0% CPU —
   the judge's round-4 repro measured 11 s CPU over 17 min — whereas a
   long XLA compile burns ~100%, so compiles are not mistaken for
   hangs), or (b) total wall time exceeds ``BENCH_BUDGET_S`` plus a
   grace period (env ``BENCH_HARD_GRACE_S``, default 180) — the ceiling
   that guarantees bench never outlives the driver timeout silently,
   even if a lane spins.

Per-lane one-line markers go to stderr so a timed-out capture's tail
localizes any stall.  All package INFO logging is routed to stderr too;
stdout carries only JSON result lines.
"""

from __future__ import annotations

import glob
import json
import logging
import os
import sys
import threading
import time
from pathlib import Path

import numpy as np

DEBUGDOC = Path("/root/reference/debugDoc")

BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "600"))
STALL_S = float(os.environ.get("BENCH_STALL_S", "240"))
PROBE_S = float(os.environ.get("BENCH_PROBE_S", "180"))
HARD_GRACE_S = float(os.environ.get("BENCH_HARD_GRACE_S", "180"))


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


class Reporter:
    """Keeps the result dict and re-prints it as a JSON line after every
    lane, so the driver's tail always ends in the most complete valid
    result.  Also hosts the stall watchdog."""

    def __init__(self) -> None:
        self.t0 = time.perf_counter()
        self.result = {
            "metric": "frames_per_sec_decode_correct_render",
            "value": 0.0,
            "unit": "frames/s",
            "vs_baseline": 0.0,
            "stage": "init",
        }
        self.lane_seconds: dict = {}
        self.skipped: list = []
        self.errors: dict = {}
        self._lock = threading.Lock()
        self._last_beat = time.perf_counter()
        t = threading.Thread(target=self._watchdog, daemon=True,
                             name="bench-watchdog")
        t.start()

    def elapsed(self) -> float:
        return time.perf_counter() - self.t0

    def beat(self) -> None:
        self._last_beat = time.perf_counter()

    def over_budget(self) -> bool:
        return self.elapsed() > BUDGET_S

    def note(self, msg: str) -> None:
        print(f"bench: [t={self.elapsed():7.1f}s] {msg}", file=sys.stderr,
              flush=True)
        self.beat()

    def emit(self, stage: str) -> None:
        with self._lock:
            self.result["stage"] = stage
            self.result["elapsed_wall_s"] = round(self.elapsed(), 1)
            if self.lane_seconds:
                self.result["lane_seconds"] = {
                    k: round(v, 2) for k, v in self.lane_seconds.items()}
            if self.skipped:
                self.result["truncated"] = True
                self.result["skipped_lanes"] = list(self.skipped)
            if self.errors:
                self.result["lane_errors"] = dict(self.errors)
            print(json.dumps(self.result), flush=True)

    def beat_cpu(self) -> float:
        """Process CPU seconds (all threads, user+system)."""
        t = os.times()
        return t.user + t.system

    def _watchdog(self) -> None:
        cpu_at_beat = self.beat_cpu()
        beat_seen = self._last_beat
        while True:
            time.sleep(5.0)
            if self._last_beat != beat_seen:
                beat_seen = self._last_beat
                cpu_at_beat = self.beat_cpu()
            stalled = time.perf_counter() - self._last_beat
            cpu_burned = self.beat_cpu() - cpu_at_beat
            # A data-plane hang blocks in a syscall at ~0% CPU; a long XLA
            # compile burns ~100%.  Only the former is a stall.
            hang = stalled > STALL_S and cpu_burned < 0.05 * stalled
            hard_cap = self.elapsed() > BUDGET_S + HARD_GRACE_S
            if hang or hard_cap:
                why = ("hang" if hang else "hard-cap")
                with self._lock:
                    self.result["watchdog_abort"] = why
                    self.result["watchdog_stalled_s"] = round(stalled, 1)
                    self.result["watchdog_cpu_burned_s"] = round(cpu_burned, 1)
                    self.result["elapsed_wall_s"] = round(self.elapsed(), 1)
                    print(json.dumps(self.result), flush=True)
                print(f"bench: WATCHDOG ({why}) — stalled {stalled:.0f}s, "
                      f"cpu burned {cpu_burned:.1f}s, elapsed "
                      f"{self.elapsed():.0f}s; emitting last result and "
                      "exiting", file=sys.stderr, flush=True)
                sys.stderr.flush()
                sys.stdout.flush()
                os._exit(0)


class Bench:
    """The lane runner.  Lanes execute in order; each is budget-gated,
    exception-isolated, and followed by a fresh result emission."""

    def __init__(self, rep: Reporter) -> None:
        self.rep = rep
        self.r = rep.result

    # ------------------------------------------------------------------
    # Lane 0: backend selection + dataset load + host frame count.
    # ------------------------------------------------------------------
    def lane_setup(self) -> None:
        import jax

        from slam_process_tpu.utils.transport import probe_device_dispatch

        from slam_process_tpu.utils.cache import ensure_portable_cpu_isa

        def probe_with_beats() -> bool:
            # The probe blocks the main thread at ~0% CPU for up to
            # PROBE_S; run it in a thread and beat while waiting so the
            # stall watchdog cannot mistake a long (but bounded) probe
            # for a data-plane hang when PROBE_S >= BENCH_STALL_S.
            result = {}
            th = threading.Thread(
                target=lambda: result.update(
                    ok=probe_device_dispatch(timeout_s=PROBE_S)),
                daemon=True)
            th.start()
            while th.is_alive():
                th.join(5.0)
                self.rep.beat()
            return bool(result.get("ok"))

        if os.environ.get("BENCH_FORCE_CPU"):
            ensure_portable_cpu_isa()
            jax.config.update("jax_platforms", "cpu")
            self.r["backend_fallback"] = "BENCH_FORCE_CPU=1 (manual override)"
        elif not probe_with_beats():
            self.rep.note("default backend failed the DISPATCH probe "
                          "(relay control or data plane down); CPU fallback")
            ensure_portable_cpu_isa()
            jax.config.update("jax_platforms", "cpu")
            self.r["backend_fallback"] = (
                "default backend failed a real-dispatch probe (accelerator "
                "transport down); CPU numbers — NOT comparable to TPU rounds")

        # Persistent compilation cache, fingerprint-scoped per backend and
        # (for CPU) host CPU features — a foreign machine's XLA:CPU AOT
        # entries must never load here (MULTICHIP_r04 SIGILL-risk warning).
        from slam_process_tpu.utils.cache import enable_persistent_cache

        cache_base = Path(__file__).parent / "build" / "jax_cache"
        enable_persistent_cache(str(cache_base))

        from slam_process_tpu.io import read_hex_log
        from slam_process_tpu.ops.decode import decode_frames_np
        from slam_process_tpu.pipeline.device import run_session_on_device as _run

        self.logs = sorted(glob.glob(str(DEBUGDOC / "*.txt")))
        if not self.logs:
            raise RuntimeError("no logs found under " + str(DEBUGDOC))
        self.raw = [read_hex_log(p) for p in self.logs]
        # Host-side decode once: frames reused by the estimator-prep and
        # parity lanes, and the count anchors the provisional headline.
        self.host_frames = {}
        total = 0
        for i in range(len(self.raw)):
            self.host_frames[i] = decode_frames_np(self.raw[i]).frames
            total += len(self.host_frames[i])
            self.rep.beat()
        self.total_frames = total
        self.r["total_frames"] = total
        self.r["n_logs"] = len(self.logs)
        self.r["backend"] = jax.default_backend()

        # Dataset-tight corrector bounds (58 groups / 93 baselines max
        # across the 19 logs): the corrector's [F, Bmax] score planes scale
        # with the static bounds, and the generous 256/256 default wastes
        # ~2.7x plane traffic here.  Matches the batched config below.
        self.run_session_on_device = (
            lambda r: _run(r, max_groups=64, max_baselines_per_group=96))

        from slam_process_tpu.parallel.mesh import make_mesh

        self.mesh = make_mesh((1, 1), ("data", "model"))
        # The biggest session (used by the single-session device-vs-host
        # comparison lanes, which run in either order).
        self.big_idx = int(np.argmax([len(r) for r in self.raw]))

    # ------------------------------------------------------------------
    # Lane 1: warmup — compile every per-session bucket once.
    # ------------------------------------------------------------------
    def lane_warmup(self) -> None:
        import jax

        warm = []
        for i, r in enumerate(self.raw):
            warm.append(self.run_session_on_device(r))
            self.rep.beat()
        jax.block_until_ready([o.rgba for o in warm])
        del warm
        self.r["device"] = str(jax.devices()[0])

    # ------------------------------------------------------------------
    # Phase 1 — WALL lanes (dispatch latency extras).  No D2H reads here:
    # the FIRST read of any device buffer flips the relay transport into a
    # persistent degraded mode (tools/diag_reads.py, diag_bisect.py), so
    # every wall number is taken before the first device read below.
    # ------------------------------------------------------------------
    def lane_wall_headline(self) -> None:
        import jax

        t0 = time.perf_counter()
        outs = [self.run_session_on_device(r) for r in self.raw]
        jax.block_until_ready([(o.rgba, o.n_frames) for o in outs])
        self.headline_wall_s = time.perf_counter() - t0
        self.r["headline_wall_s"] = round(self.headline_wall_s, 4)
        # Provisional headline until the device plane is measured: wall on
        # this relay can under-count (dispatch-ack), so it is clearly
        # flagged and superseded by lane_dev_headline.
        self.r["value"] = round(self.total_frames / self.headline_wall_s, 1)
        self.r["vs_baseline"] = round(self.r["value"] / 10_000.0, 3)
        self.r["provisional_wall_based"] = True
        # Keep two sessions for pixel parity; keep tiny per-session scalars
        # for the overflow guard (separate buffers — does not pin siblings).
        self.parity_outs = {i: outs[i] for i in (0, len(self.logs) - 1)}
        self.overflow_flags = [o.correct_overflow for o in outs]

    def lane_wall_e2e(self) -> None:
        import jax

        from slam_process_tpu.io import read_hex_log

        # Fully end-to-end, host-tokenize config: file read + native
        # AVX-512 hexscan (runtime/hexscan.c, ~3.9 GB/s on this core) +
        # H2D of the token bytes + device pipeline.  Single host core
        # (nproc=1): sequential ingest is the honest number.
        t1 = time.perf_counter()
        outs2 = [self.run_session_on_device(read_hex_log(p)) for p in self.logs]
        jax.block_until_ready([o.rgba for o in outs2])
        self.e2e_wall_s = time.perf_counter() - t1
        del outs2
        self.r["e2e_frames_per_sec_with_host_tokenize"] = round(
            self.total_frames / self.e2e_wall_s, 1)

    def lane_wall_e2e_devtok(self) -> None:
        import jax

        # Fully end-to-end, device-tokenize config: file read + stride-3
        # text prep + H2D of the RAW TEXT + fused tokenize+decode+correct+
        # render program (ops/tokenize.py).  3x the H2D bytes buys zero
        # host tokenize time — which path wins depends on the transport's
        # H2D rate (~550 MB/s on this relay).
        from slam_process_tpu.pipeline.device import run_session_from_text

        self.run_session_from_text = run_session_from_text

        def text_pass():
            return [run_session_from_text(open(p, "rb").read(), max_groups=64,
                                          max_baselines_per_group=96,
                                          check=False) for p in self.logs]

        import jax.numpy as jnp

        outs3 = text_pass()   # warm: compile every text bucket
        jax.block_until_ready([o.out.rgba for o in outs3])
        # Aggregate the stride-proof flags on device; read in Phase 2.
        self.tokenize_regular_dev = jax.jit(lambda *xs: sum(xs))(
            *[o.tokenize_regular.astype("int32") for o in outs3])
        t1 = time.perf_counter()
        outs3 = text_pass()
        jax.block_until_ready([o.out.rgba for o in outs3])
        e2e_devtok_wall_s = time.perf_counter() - t1
        del outs3
        self.r["e2e_frames_per_sec_device_tokenize"] = round(
            self.total_frames / e2e_devtok_wall_s, 1)
        self.r["e2e_wall_s_device_tokenize"] = round(e2e_devtok_wall_s, 4)
        self.r["e2e_frames_per_sec"] = round(
            self.total_frames / min(self.e2e_wall_s, e2e_devtok_wall_s), 1)

    # The probe subprocess runs _batched_probe_main() below — the SAME
    # _build_batched construction the lane uses, so the probe's verdict is
    # always about the byte-identical executable (a hand-copied config
    # string would silently drift).  Why a probe at all: today's relay
    # reproducibly refuses to load the ~49 MB vmapped jit_batched
    # executable (three independent runs hung at exactly this lane, 0%
    # CPU, while every other program loaded fine) — a sacrificial
    # subprocess under a deadline converts that into a clean fallback.
    _BATCHED_PROBE = "import bench; bench._batched_probe_main()"

    def lane_wall_batched(self) -> None:
        import gc
        import subprocess

        import jax

        # Poll + beat while the probe runs: the wait itself is a 0%-CPU
        # block in the MAIN process and must not trip the stall watchdog
        # (the probe is deadline-bounded, so beating through it is safe).
        proc = subprocess.Popen([sys.executable, "-c", self._BATCHED_PROBE],
                                stdout=subprocess.PIPE,
                                stderr=subprocess.DEVNULL, text=True,
                                cwd=Path(__file__).parent)
        # Healthy loads of this program take <= 40 s; the refusal mode is
        # an INDEFINITE hang, so a short deadline loses nothing and leaves
        # room for the scan-form fallback compile within the hard cap.
        deadline = time.perf_counter() + 150
        ok = False

        def reap():
            # The hung child can be unreapable for a while even after
            # SIGKILL; never let the reap itself abort the lane.
            proc.kill()
            try:
                proc.wait(timeout=10)
            except Exception:
                pass

        try:
            while time.perf_counter() < deadline:
                self.rep.beat()
                try:
                    out, _ = proc.communicate(timeout=5)
                    ok = proc.returncode == 0 and "batched-ok" in out
                    break
                except subprocess.TimeoutExpired:
                    continue
            else:
                reap()
        except OSError:
            reap()
        self.rep.beat()
        session_axis = "vmap"
        if not ok:
            # The relay load-hangs on the large code-heavy vmapped
            # executable (49 MB at S=19; 27 MB loads fine).  Fall back to
            # the bit-exact lax.map form, whose code is single-session
            # sized — sequential per-session execution, same outputs
            # (tests/test_multidevice.py::test_scan_sessions_bitwise_
            # equals_vmap), honestly labeled in the result.
            session_axis = "scan"
            self.rep.note("jit_batched probe failed; falling back to the "
                          "session_axis='scan' small-executable form")
        self.r["batched_session_axis"] = session_axis

        gc.collect()
        # Batched-session config: ONE jitted program over the stacked
        # [S, Nmax] byte batch (the multi-chip layout, on a single chip).
        self.bfn, self.batch_np, self.len_np, self.lut_j = _build_batched(
            self.mesh, self.raw, session_axis)
        with self.mesh:
            self.batch_dev = jax.device_put(self.batch_np)
            self.len_dev = jax.device_put(self.len_np)
            bout = self.bfn(self.batch_dev, self.len_dev, self.lut_j)  # warm
            jax.block_until_ready(bout.rgba)
            t3 = time.perf_counter()
            bout = self.bfn(self.batch_dev, self.len_dev, self.lut_j)
            jax.block_until_ready((bout.rgba, bout.n_kept, bout.counts))
            self.r["batched_wall_s"] = round(time.perf_counter() - t3, 4)
            del bout

    def lane_wall_streaming_host(self) -> None:
        # Streaming replay config (BASELINE config 5): chunked ingest with
        # alignment carry + sweep-granular correction, host state machine
        # (pure numpy — a genuine wall measurement, no device work).
        from slam_process_tpu.parallel.streaming import replay_log

        t2 = time.perf_counter()
        frames = sum(replay_log(r, chunk_bytes=1 << 16).n_frames
                     for r in self.raw)
        self.r["streaming_frames_per_sec"] = round(
            frames / (time.perf_counter() - t2), 1)

    def lane_warm_streaming_device(self) -> None:
        import jax

        # Device streaming warm (compile all variants before their windows).
        from slam_process_tpu.parallel.streaming_device import (
            make_paths_spec,
            replay_log_device,
        )

        self.replay_log_device = replay_log_device
        replay_log_device(self.raw[0], chunk_bytes=1 << 20).block_until_ready()
        self.rep.beat()
        if jax.default_backend() == "cpu":
            # The emit and collect_paths measurement lanes are CPU_SKIP'd;
            # warming their programs would be pure wasted XLA:CPU compile.
            return
        replay_log_device(self.raw[0], chunk_bytes=1 << 20,
                          collect_filtered=True).block_until_ready()
        self.rep.beat()
        # Online estimation + tracking inside the stream (collect_paths).
        self.paths_cfg = make_paths_spec(DEBUGDOC.parent / "beam_angle.xlsx")
        replay_log_device(self.raw[0], chunk_bytes=1 << 20,
                          collect_paths=self.paths_cfg).block_until_ready()

    def lane_est_prep(self) -> None:
        import jax

        # Flagship estimation (the reference's single heaviest compute):
        # v1-7 NN-OMP at the 0.1-degree grid (heatmap_gemini_v1-7.py:657-728).
        from slam_process_tpu.config import DictionaryConfig, OmpConfig
        from slam_process_tpu.models.batch_estimation import (
            _batched_nn_omp_fn,
            nn_omp_sessions_sharded,
            pack_scenes,
        )
        from slam_process_tpu.models.dictionary import make_dictionary
        from slam_process_tpu.models.nn_omp import _jitted_nn_omp
        from slam_process_tpu.models.registry import build_scene
        from slam_process_tpu.pipeline.session import Session

        self.mapping = DEBUGDOC.parent / "beam_angle.xlsx"
        self.est_cfg = OmpConfig(max_paths=20, min_power_ratio=0.0003)
        dict_cfg = DictionaryConfig(grid_res=0.1, beam_width=1.4,
                                    grid_kind="linspace")
        self.est_sessions, self.est_mats, self.est_dicts = [], [], []
        for i, p in enumerate(self.logs):
            s = Session(Path(p).stem)
            s.frames = self.host_frames[i]
            matrix, ue_ang, bs_ang = build_scene(s, self.mapping, True)
            self.est_mats.append(matrix)
            self.est_dicts.append(make_dictionary(ue_ang, bs_ang, dict_cfg))
            self.est_sessions.append(s)
            self.rep.beat()
        self.packed = pack_scenes(self.est_mats, self.est_dicts)
        self.single_fn = _jitted_nn_omp(self.est_cfg, "ratio", True)
        self.nn_omp_sessions_sharded = nn_omp_sessions_sharded

        # Async per-session dispatch (adjudication baseline) AND the
        # vmapped one-program path — the device-plane WINNER (26.9 ms with
        # the Gauss-Jordan NNLS solve vs 83 ms async; tools/
        # diag_est_dispatch.py) and the production formulation.
        self.per_dev = [jax.device_put((self.packed.phi_rx[i],
                                        self.packed.phi_tx[i],
                                        self.packed.aoa_grid[i],
                                        self.packed.aod_grid[i],
                                        self.packed.matrices[i]))
                        for i in range(len(self.logs))]
        self.est_out = [self.single_fn(*a) for a in self.per_dev]  # warm
        jax.block_until_ready([o.power for o in self.est_out])
        self.rep.beat()
        self.vm_fn = _batched_nn_omp_fn(self.est_cfg, "ratio", True)
        self.vm_args = jax.device_put((self.packed.matrices, self.packed.phi_rx,
                                       self.packed.phi_tx, self.packed.aoa_grid,
                                       self.packed.aod_grid))
        vm_warm = self.vm_fn(*self.vm_args)
        jax.block_until_ready(vm_warm.power)
        del vm_warm
        self.rep.beat()
        # Sharded formulation on this chip's (1, 1) mesh: same program XLA
        # compiles for the multi-chip layout (virtual-mesh parity tested).
        sh_warm = nn_omp_sessions_sharded(self.packed, self.est_cfg, self.mesh)
        jax.block_until_ready(sh_warm.power)
        del sh_warm

    def lane_wall_est(self) -> None:
        # Runs after dev_headline's first D2H read: this wall is measured
        # in the transport's degraded post-read mode (informational only).
        import jax

        t8 = time.perf_counter()
        outs_e = self.vm_fn(*self.vm_args)
        jax.block_until_ready(outs_e.power)
        self.r["estimate_wall_s_dataset"] = round(time.perf_counter() - t8, 4)
        del outs_e

    def lane_host_est(self) -> None:
        from slam_process_tpu.models.nn_omp import nn_omp_np

        # The reference-shaped float64 host path on the biggest session
        # (scipy NNLS loop — the 0.285 s/session baseline this must beat).
        host_times = []
        for _ in range(3):   # min of 3: the host path inherits CPU noise
            t9 = time.perf_counter()
            self.est_host_paths = nn_omp_np(
                self.est_dicts[self.big_idx], self.est_mats[self.big_idx],
                self.est_cfg, keep_rule="ratio", stop_nonpositive=True)
            host_times.append(time.perf_counter() - t9)
            self.rep.beat()
        self.est_host_s = min(host_times)
        self.r["estimate_host_session_seconds"] = round(self.est_host_s, 4)
        if hasattr(self, "est_single_device_s"):
            self.r["estimate_speedup_vs_host"] = round(
                self.est_host_s / self.est_single_device_s, 1)

    # ------------------------------------------------------------------
    # Phase 2 — DEVICE-plane lanes (the authoritative numbers).  Each
    # window performs one D2H read to close it, so these run after every
    # wall section.  Device-plane durations are immune to the transport.
    # ------------------------------------------------------------------
    def lane_dev_headline(self) -> None:
        import jax
        import jax.numpy as jnp

        from slam_process_tpu.utils.device_timing import measure_device_time

        self.measure_device_time = measure_device_time
        # One real D2H read BEFORE the first window: block_until_ready only
        # acks dispatch on this transport, so Phase 1's queued device work
        # must be forced to complete (a read synchronizes).  The fence is a
        # FRESH trivial program dispatched after everything above —
        # programs execute in dispatch order, so its completion implies the
        # backlog's.
        jax.device_get(jax.jit(lambda: jnp.zeros(()))())
        self.rep.beat()

        # Headline: per-session pipeline over the whole dataset (19
        # dispatches of per-bucket executables).  3 passes; per-pass total.
        def pass_all(_i):
            outs = [self.run_session_on_device(r) for r in self.raw]
            return outs[-1].n_kept

        dt_head = measure_device_time(pass_all, n=3)
        headline_device_s = sum(
            sum(v) for v in dt_head.all_modules.values()) / 3
        fps = self.total_frames / headline_device_s
        self.r["value"] = round(fps, 1)
        self.r["vs_baseline"] = round(fps / 10_000.0, 3)
        self.r.pop("provisional_wall_based", None)
        self.r["measurement"] = ("device-plane (xplane) seconds; "
                                 "*_wall_s = dispatch wall")
        self.r["headline_device_seconds_per_pass"] = round(headline_device_s, 4)
        self.r["headline_device_runs"] = len(dt_head.runs)

        # The tight 64/96 corrector bounds are only valid while the dataset
        # fits them: one aggregated read of the Phase-1 overflow flags
        # guards the whole run's numbers (reads are safe in this phase).
        if hasattr(self, "overflow_flags"):
            any_overflow = bool(jax.device_get(jax.jit(
                lambda *xs: sum(x.astype("int32") for x in xs))(
                    *self.overflow_flags)))
            if any_overflow:
                # Invalidate the published headline BEFORE raising: lane
                # isolation records the error but keeps emitting, and an
                # invalid number must never survive as the result value.
                self.r["value"] = 0.0
                self.r["vs_baseline"] = 0.0
                self.r["error"] = ("corrector capacity bounds (64 groups / "
                                   "96 baselines) exceeded by the dataset; "
                                   "headline invalidated")
                raise RuntimeError(self.r["error"])
        else:
            self.r["overflow_guard"] = "not-checked (wall_headline skipped)"

    def lane_dev_text(self) -> None:
        import jax

        # Fused text pipeline (device tokenize): device seconds per pass,
        # and the stride-proof audit (all 19 logs take the device path).
        datas_text = [open(p, "rb").read() for p in self.logs]

        def text_pass_mem(_i):
            outs = [self.run_session_from_text(d, max_groups=64,
                                               max_baselines_per_group=96,
                                               check=False) for d in datas_text]
            return outs[-1].out.n_kept

        dt_text = self.measure_device_time(text_pass_mem, n=3)
        text_device_s = sum(sum(v) for v in dt_text.all_modules.values()) / 3
        self.r["text_pipeline_device_seconds_per_pass"] = round(text_device_s, 4)
        self.r["text_pipeline_device_frames_per_sec"] = round(
            self.total_frames / text_device_s, 1)
        self.r["tokenize_all_regular"] = (
            int(jax.device_get(self.tokenize_regular_dev)) == len(self.logs))

    def lane_dev_batched(self) -> None:
        if not hasattr(self, "bfn"):
            raise RuntimeError("skipped: batched program unavailable "
                               "(wall_batched probe failed)")
        with self.mesh:
            dt_batched = self.measure_device_time(
                lambda i: self.bfn(self.batch_dev, self.len_dev,
                                   self.lut_j).n_kept, n=3, module="batched")
        self.r["batched_device_seconds_full_dataset"] = round(
            dt_batched.median, 4)
        self.r["batched_device_frames_per_sec"] = round(
            self.total_frames / dt_batched.median, 1)
        self.r["batched_device_trials_s"] = [
            round(t, 4) for t in dt_batched.runs]

    def lane_dev_grouped(self) -> None:
        import jax
        import jax.numpy as jnp

        # Grouped batched (the same multi-chip layout, per-bucket programs
        # — no uniform-padding waste).  Device seconds = sum over the
        # per-bucket programs of one pass.
        from slam_process_tpu.parallel.batch import run_dataset_batched_grouped

        with self.mesh:
            warm_g = run_dataset_batched_grouped(self.mesh, self.raw,
                                                 max_groups=64,
                                                 max_baselines_per_group=96)
            jax.block_until_ready([o.n_kept for _, o in warm_g])
            jax.device_get(jax.jit(lambda: jnp.zeros(()))())   # fence
            self.rep.beat()
            dt_grouped = self.measure_device_time(
                lambda i: run_dataset_batched_grouped(
                    self.mesh, self.raw, max_groups=64,
                    max_baselines_per_group=96)[-1][1].n_kept, n=3)
        grouped_device_s = sum(
            sum(v) for v in dt_grouped.all_modules.values()) / 3
        self.r["batched_grouped_device_seconds_full_dataset"] = round(
            grouped_device_s, 4)
        self.r["batched_grouped_device_frames_per_sec"] = round(
            self.total_frames / grouped_device_s, 1)

    def lane_dev_multistream(self) -> None:
        # Multi-stream vmapped ingest (the §5.8 many-concurrent-feeds
        # shape): the 19 logs round-robined over 8 live streams, every step
        # ONE vmapped program over the [S, ...] state (single chip here; on
        # a mesh the S axis shards over 'data' with no cross-chip traffic).
        # Per-stream parity vs independent sessions is tests/
        # test_multidevice.py's job — this measures aggregate throughput.
        from slam_process_tpu.parallel.streaming_device import (
            MultiStreamingSession,
        )

        n_ms_streams = 8
        ms_feeds = [
            np.concatenate(
                [r for j, r in enumerate(self.raw) if j % n_ms_streams == i]
                or [np.zeros(0, np.uint8)])
            for i in range(n_ms_streams)
        ]

        def multistream_all(_i):
            ms = MultiStreamingSession(n_ms_streams, chunk_bytes=1 << 20)
            ms.feed(ms_feeds)
            ms.finalize()
            return ms, ms._state.n_frames

        ms_warm, _ = multistream_all(0)                   # warm/compile
        self.rep.beat()
        multistream_frames = int(ms_warm.results()[0].sum())
        assert multistream_frames == self.total_frames, \
            "multistream lost frames"
        dt_ms = self.measure_device_time(lambda i: multistream_all(i)[1], n=1)
        ms_device_s = sum(sum(v) for v in dt_ms.all_modules.values())
        self.r["multistream_n_streams"] = n_ms_streams
        self.r["multistream_frames"] = multistream_frames
        self.r["multistream_device_seconds_full_dataset"] = round(
            ms_device_s, 4)
        self.r["multistream_device_frames_per_sec"] = round(
            multistream_frames / ms_device_s, 1)

    def lane_dev_streaming(self) -> None:
        # Device-resident streaming (no-emit and emit modes): total device
        # seconds across the full dataset replay (many step dispatches).
        def stream_all(_i):
            ss = [self.replay_log_device(r, chunk_bytes=1 << 20)
                  for r in self.raw]
            return ss[-1]._state.n_frames

        dt_stream = self.measure_device_time(stream_all, n=1)
        stream_device_s = sum(sum(v) for v in dt_stream.all_modules.values())
        self.r["streaming_device_seconds_full_dataset"] = round(
            stream_device_s, 4)
        self.r["streaming_device_frames_per_sec"] = round(
            self.total_frames / stream_device_s, 1)

    def lane_dev_streaming_emit(self) -> None:
        def stream_emit_all(_i):
            ss = [self.replay_log_device(r, chunk_bytes=1 << 20,
                                         collect_filtered=True)
                  for r in self.raw]
            return ss[-1]._state.n_frames

        dt_emit = self.measure_device_time(stream_emit_all, n=1)
        emit_device_s = sum(sum(v) for v in dt_emit.all_modules.values())
        self.r["streaming_device_emit_seconds_full_dataset"] = round(
            emit_device_s, 4)
        self.r["streaming_device_emit_frames_per_sec"] = round(
            self.total_frames / emit_device_s, 1)

    def lane_dev_streaming_paths(self) -> None:
        # Streaming with ONLINE per-sweep estimation + tracking: the
        # offline flagship produced in-stream as sweeps close (exact-parity
        # tested against Session.sweep_paths/path_tracks on every log).
        def stream_paths_all(_i):
            ss = [self.replay_log_device(r, chunk_bytes=1 << 20,
                                         collect_paths=self.paths_cfg)
                  for r in self.raw]
            return ss[-1]._state.n_frames

        dt_spaths = self.measure_device_time(stream_paths_all, n=1)
        spaths_device_s = sum(sum(v) for v in dt_spaths.all_modules.values())
        self.r["streaming_with_estimation_seconds_full_dataset"] = round(
            spaths_device_s, 4)
        self.r["streaming_with_estimation_frames_per_sec"] = round(
            self.total_frames / spaths_device_s, 1)

    def lane_dev_estimate(self) -> None:
        # Flagship estimation, three formulations on the device plane:
        # vmapped one-program (production), async per-session (baseline),
        # mesh-sharded (the multi-chip program, here at (1, 1)).
        dt_vm = self.measure_device_time(
            lambda i: self.vm_fn(*self.vm_args).power, n=3)
        est_vm_device_s = sum(sum(v) for v in dt_vm.all_modules.values()) / 3
        self.r["estimate_device_seconds_dataset"] = round(est_vm_device_s, 4)
        self.r["estimate_sessions_per_sec_device"] = round(
            len(self.logs) / est_vm_device_s, 1)

        with self.mesh:
            dt_sh = self.measure_device_time(
                lambda i: self.nn_omp_sessions_sharded(
                    self.packed, self.est_cfg, self.mesh).power, n=3)
        est_sh_device_s = sum(sum(v) for v in dt_sh.all_modules.values()) / 3
        self.r["estimate_sharded_device_seconds_dataset"] = round(
            est_sh_device_s, 4)
        self.r["estimate_sharded_sessions_per_sec_device"] = round(
            len(self.logs) / est_sh_device_s, 1)

    def lane_dev_estimate_async(self) -> None:
        def est_all(_i):
            outs_e = [self.single_fn(*a) for a in self.per_dev]
            return outs_e[-1].power

        dt_est = self.measure_device_time(est_all, n=3)
        est_device_s = sum(sum(v) for v in dt_est.all_modules.values()) / 3
        self.r["estimate_async_device_seconds_dataset"] = round(est_device_s, 4)
        self.r["estimate_async_sessions_per_sec_device"] = round(
            len(self.logs) / est_device_s, 1)
        # The big session's own executions (dispatch order preserved per
        # pass), so the host-vs-device speedup compares the SAME session on
        # both sides; median-across-sessions would understate it.
        n_per_pass = len(dt_est.runs) // 3
        fallback = n_per_pass != len(self.logs)
        if fallback:   # trace dropped/added an event: say so loudly
            self.rep.note(f"WARNING: estimator trace had {len(dt_est.runs)} "
                          f"runs, expected {3 * len(self.logs)}; single-"
                          "session device time falls back to the median")
        big_runs = (sorted(dt_est.runs) if fallback
                    else sorted(dt_est.runs[self.big_idx::n_per_pass]))
        self.est_single_device_s = big_runs[len(big_runs) // 2]
        self.r["estimate_single_session_device_seconds"] = round(
            self.est_single_device_s, 5)
        self.r["estimate_single_session_is_fallback_median"] = fallback
        if hasattr(self, "est_host_s"):
            self.r["estimate_speedup_vs_host"] = round(
                self.est_host_s / self.est_single_device_s, 1)

    # ------------------------------------------------------------------
    # Phase 3 — per-sweep estimation (reads internally), parity, reference.
    # ------------------------------------------------------------------
    def lane_sweep_est(self) -> None:
        import jax.numpy as jnp

        from slam_process_tpu.pipeline.session import sweep_paths_dataset

        for s in self.est_sessions:
            s.correct()
        sweep_paths_dataset(self.est_sessions, self.mapping)   # warm + memo
        self.rep.beat()
        times = []
        for _ in range(3):
            t6 = time.perf_counter()
            ds_results = sweep_paths_dataset(self.est_sessions, self.mapping)
            times.append(time.perf_counter() - t6)
            self.rep.beat()
        ds_sweep_s = sorted(times)[1]
        ds_n_sweeps = sum(len(v) for _, v in ds_results)
        self.r["sweep_estimation_sweeps_per_sec"] = round(
            ds_n_sweeps / ds_sweep_s, 1)
        self.r["sweep_estimation_n_sweeps"] = ds_n_sweeps

        # Device-plane seconds for the same section (the wall number above
        # includes host prep, 19 dispatches, and the stacked read).
        dt_sweep = self.measure_device_time(
            lambda i: sweep_paths_dataset(self.est_sessions, self.mapping)
            and jnp.zeros(()), n=2)
        ds_sweep_device_s = sum(
            sum(v) for v in dt_sweep.all_modules.values()) / 2
        self.r["sweep_estimation_device_seconds"] = round(ds_sweep_device_s, 4)
        self.r["sweep_estimation_sweeps_per_sec_device"] = round(
            ds_n_sweeps / ds_sweep_device_s, 1)

    def lane_parity(self) -> None:
        from slam_process_tpu.ops.correct import correct_frames_np

        # Pixel parity: device normalized raster vs float64 host oracle,
        # plus colormap LUT-bin agreement.
        t_deltas, bin_flips = [], 0
        for idx in (0, len(self.logs) - 1):
            filtered = correct_frames_np(self.host_frames[idx]).filtered
            oracle_t = _oracle_norm_raster(filtered)
            ours_t = np.asarray(self.parity_outs[idx].norm_t, dtype=np.float64)
            both = np.isfinite(oracle_t) & np.isfinite(ours_t)
            t_deltas.append(float(np.max(np.abs(ours_t[both] - oracle_t[both]))))
            bin_flips += int(
                (np.clip((ours_t[both] * 256).astype(int), 0, 255)
                 != np.clip((oracle_t[both] * 256).astype(int), 0, 255)).sum())
            self.rep.beat()
        self.r["max_pixel_delta_norm_raster"] = max(t_deltas)
        self.r["lut_bin_flips"] = bin_flips

    def lane_est_parity(self) -> None:
        import jax

        # Flagship estimation parity: one batched pytree read, then the
        # biggest session's selection sequence must match the float64 host
        # oracle.
        est_host_out = jax.device_get(self.est_out)[self.big_idx]
        n_it = int(self.est_host_paths.n_iters)
        self.r["estimate_parity_ok"] = bool(
            int(est_host_out.n_iters) == n_it
            and np.array_equal(est_host_out.aoa_idx[:n_it],
                               self.est_host_paths.aoa_idx[:n_it])
            and np.array_equal(est_host_out.aod_idx[:n_it],
                               self.est_host_paths.aod_idx[:n_it])
            and np.allclose(est_host_out.power[:n_it],
                            self.est_host_paths.power[:n_it],
                            rtol=2e-3, atol=1e-5))

    def lane_reference(self) -> None:
        # Reference pipeline throughput on this host (tokenize + parse
        # measured on the smallest log; the iterrows correct stage measured
        # on a 4000-row subsample — it dominates; the reference publishes
        # no numbers of its own).
        ref_fps = _reference_pipeline_fps(self.raw[0])
        self.r["reference_frames_per_sec"] = round(ref_fps, 1)
        if not self.r.get("provisional_wall_based"):
            self.r["speedup_vs_reference"] = round(
                self.r["value"] / max(ref_fps, 1e-9), 1)

    # Lane order is risk-ranked: the relay data plane can hang MID-RUN on
    # this transport (observed live: probe + warmup + wall lanes all green,
    # then the batched lane's ~630 MB device_put blocked in recvfrom at 0%
    # CPU until the watchdog fired).  The headline, estimator, and parity
    # lanes therefore run as early as the no-reads-before-walls rule
    # allows; the giant-transfer batched lanes run LAST so a hang there
    # costs only the batched extras.  Wall extras measured after
    # dev_headline's first D2H read (wall_est) run in the transport's
    # degraded post-read mode — informational only, like all *_wall_s.
    LANES = [
        ("setup", lane_setup),
        ("warmup", lane_warmup),
        ("wall_headline", lane_wall_headline),
        ("wall_e2e", lane_wall_e2e),
        ("wall_e2e_devtok", lane_wall_e2e_devtok),
        ("dev_headline", lane_dev_headline),
        ("dev_text", lane_dev_text),
        ("est_prep", lane_est_prep),
        ("dev_estimate", lane_dev_estimate),
        ("dev_estimate_async", lane_dev_estimate_async),
        ("wall_est", lane_wall_est),
        ("host_est", lane_host_est),
        ("parity", lane_parity),
        ("est_parity", lane_est_parity),
        ("reference", lane_reference),
        ("sweep_est", lane_sweep_est),
        ("wall_streaming_host", lane_wall_streaming_host),
        ("warm_streaming_device", lane_warm_streaming_device),
        ("dev_multistream", lane_dev_multistream),
        ("dev_streaming", lane_dev_streaming),
        ("dev_streaming_emit", lane_dev_streaming_emit),
        ("dev_streaming_paths", lane_dev_streaming_paths),
        # dev_grouped (per-bucket programs — the production multi-chip
        # layout) before wall_batched: the observed relay hang is specific
        # to the single giant uniformly-padded jit_batched program.
        ("dev_grouped", lane_dev_grouped),
        ("wall_batched", lane_wall_batched),
        ("dev_batched", lane_dev_batched),
    ]

    # Lanes that later lanes cannot run without; an error or budget-skip
    # here aborts the rest (recorded, never raised out of run()).
    REQUIRED = {"setup", "warmup"}

    # The giant uniformly-padded batch program is compile-hostile on the
    # CPU fallback backend (a single >33M-element fused program; >240 s of
    # XLA:CPU compile measured) and only exists to exercise the multi-chip
    # layout — skip it and its dependents when the relay is down.  The
    # heavy streaming variants are skipped there too (dev_streaming_paths
    # alone is ~300 s of CPU for a number that is meaningless off-chip;
    # dev_streaming stays as the representative streaming lane), keeping
    # the whole fallback capture under ~10 minutes.
    CPU_SKIP = {"wall_batched", "dev_batched", "dev_grouped",
                "dev_multistream", "dev_streaming_emit",
                "dev_streaming_paths"}

    def run(self) -> None:
        aborted = False
        for name, fn in self.LANES:
            # Skip the compile-hostile lanes on ANY CPU backend — the
            # relay-down fallback, a forced run, or a host whose default
            # backend is natively CPU (no accelerator plugin).
            if (name in self.CPU_SKIP
                    and (self.r.get("backend_fallback") is not None
                         or self.r.get("backend") == "cpu")):
                self.r.setdefault("skipped_cpu_fallback", []).append(name)
                continue
            if aborted or self.rep.over_budget():
                self.rep.skipped.append(name)
                continue
            self.rep.note(f"lane={name} start")
            t0 = time.perf_counter()
            try:
                fn(self)
                self.rep.lane_seconds[name] = time.perf_counter() - t0
                self.rep.note(f"lane={name} done in "
                              f"{self.rep.lane_seconds[name]:.1f}s")
            except Exception as e:   # noqa: BLE001 — lane isolation
                self.rep.lane_seconds[name] = time.perf_counter() - t0
                self.rep.errors[name] = f"{type(e).__name__}: {e}"[:300]
                self.rep.note(f"lane={name} FAILED: {e!r}")
                if name in self.REQUIRED:
                    aborted = True
            self.rep.emit(name)
        self.rep.emit("final")


def _build_batched(mesh, raw, session_axis: str):
    """ONE construction of the batched program + its inputs, shared by
    lane_wall_batched and the sacrificial probe subprocess — so the probe's
    load verdict is always about the byte-identical executable (config
    drift between two copies would silently invalidate it)."""
    import jax.numpy as jnp

    from slam_process_tpu.ops.raster import colormap_lut
    from slam_process_tpu.parallel.batch import (
        batched_session_pipeline,
        stack_sessions,
    )

    n_padded = max(len(r) for r in raw)
    n_padded = ((n_padded + (1 << 20) - 1) >> 20) << 20
    batch, lengths = stack_sessions(raw, n_padded)
    bfn = batched_session_pipeline(mesh, n_padded, max_groups=64,
                                   max_baselines_per_group=96,
                                   outputs="summary",
                                   session_axis=session_axis)
    return bfn, batch, lengths, jnp.asarray(colormap_lut("viridis"))


def _batched_probe_main() -> None:
    """Subprocess entry: load + run the vmapped batched program once."""
    import glob as _glob

    import jax
    import jax.numpy as jnp

    from slam_process_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache(str(Path(__file__).parent / "build" / "jax_cache"))
    from slam_process_tpu.io import read_hex_log
    from slam_process_tpu.parallel.mesh import make_mesh

    raw = [read_hex_log(p)
           for p in sorted(_glob.glob(str(DEBUGDOC / "*.txt")))]
    mesh = make_mesh((1, 1), ("data", "model"))
    bfn, batch, lengths, lut = _build_batched(mesh, raw, "vmap")
    with mesh:
        out = bfn(jax.device_put(batch), jax.device_put(lengths), lut)
        print("batched-ok", int(jax.device_get(jnp.sum(out.n_kept))),
              flush=True)


def main() -> None:
    # Package INFO logging must not land on stdout between JSON emissions:
    # stdout carries only result lines, everything else goes to stderr.
    logging.basicConfig(stream=sys.stderr, level=logging.INFO)
    rep = Reporter()
    rep.emit("init")   # a valid (zero-value) line exists from second one
    Bench(rep).run()


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
