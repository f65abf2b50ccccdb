"""Session orchestration: one capture session as staged tensors.

Replaces the reference's file-chained scripts (stage artifacts in .xlsx on
disk between every step) with an in-memory staged pipeline that can still
import/export every legacy artifact.  Stage artifacts can be cached as npz
(fast, lossless) with optional xlsx export for drop-in compatibility —
mirroring the reference's use of xlsx files as durable stage checkpoints
(SURVEY.md section 5.4) without paying openpyxl costs.
"""

from __future__ import annotations

import functools
import time
from pathlib import Path
from typing import Optional, Union

import numpy as np

from slam_process_tpu.config import PipelineConfig, RenderConfig, SceneConfig
from slam_process_tpu.io import read_hex_log
from slam_process_tpu.io.angles import load_angle_lut
from slam_process_tpu.io.schemas import (
    read_filtered_table,
    read_parsed_table,
    write_filtered_table,
    write_parsed_table,
)
from slam_process_tpu.ops.correct import correct_frames_np
from slam_process_tpu.ops.decode import decode_frames_np
from slam_process_tpu.ops.scene import intensity_grid_np
from slam_process_tpu.render.heatmap import RenderedHeatmap, render_intensity, save_heatmap
from slam_process_tpu.utils import StageCounters, extract_timestamp, get_logger


def _sweep_specs():
    from jax.sharding import PartitionSpec as P

    return (
        P("data", None, None),   # sweep tensor: sweeps over 'data'
        P(None, "model"),        # phi_rx: dictionary grid over 'model'
        P(None, None),           # phi_tx
        P("model"),              # aoa grid
        P(None),                 # aod grid
    )


class _LazySpecs:
    def __iter__(self):
        return iter(_sweep_specs())


_SWEEP_SPECS = _LazySpecs()

import functools as _functools


@_functools.lru_cache(maxsize=32)
def _sweep_intensity_fn(max_sweeps: int):
    """Jitted per-sweep intensity assembly, cached per sweep count."""
    import functools

    import jax

    from slam_process_tpu.ops.scene import intensity_per_sweep_jax

    from slam_process_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    return jax.jit(functools.partial(intensity_per_sweep_jax,
                                     max_sweeps=max_sweeps))


@_functools.lru_cache(maxsize=1)
def _stack_results_fn():
    """Jitted cross-session result stacker (one compiled entry per shape).

    Sessions' sweep axes are bucketed (see ``_sweep_bucket``), so leaves
    arrive as [S_i, ...] with differing S_i; each pads to the common max
    along axis 0 (padded sweeps carry valid=False) before stacking, so the
    host still reads ONE stacked pytree (each leaf read pays a relay round
    trip — per-session reads would cost leaves x n_sessions trips)."""
    import jax
    import jax.numpy as jnp

    def stack(ts):
        s_max = max(t[1].shape[0] for t in ts)

        def pad_stack(*xs):
            return jnp.stack([
                jnp.pad(x, ((0, s_max - x.shape[0]),)
                        + ((0, 0),) * (x.ndim - 1)) for x in xs])

        return jax.tree.map(pad_stack, *ts)

    return jax.jit(stack)


def _sweep_bucket(n: int, quantum: int = 8) -> int:
    """Round a session's sweep count up to a bucket.

    Padding every session to the DATASET max (58 sweeps here) makes the
    estimator run 2.8x more sweep lanes than exist (1,102 padded vs 392
    real); bucketing to multiples of 8 cuts the padded total to 480 for a
    handful of compiled shapes (persistent-cached)."""
    return max(quantum, ((n + quantum - 1) // quantum) * quantum)


from slam_process_tpu.models.sweep_estimation import (  # noqa: E402
    sweep_estimator_body as _sweep_estimator_body,
    sweep_estimator_setup as _sweep_estimator_setup,
)


@_functools.lru_cache(maxsize=16)
def _sweep_estimator_dataset_fn(est_key):
    """ONE compiled program for the whole dataset: the per-session sweep
    estimator vmapped over the session axis (padded common shapes).  The
    outer vmap carries the dictionary per lane, so the correlation einsums
    stay true batched GEMMs; dispatch count drops from n_sessions to 1."""
    import jax

    from slam_process_tpu.utils.cache import enable_persistent_cache
    from slam_process_tpu.utils.precision import jit_highest

    enable_persistent_cache()
    return jit_highest(jax.vmap(_sweep_estimator_body(est_key)))


@_functools.lru_cache(maxsize=16)
def _sweep_estimator_fn(est_key, mesh):
    """Compiled per-sweep estimator, shared across Session instances.

    ``est_key`` = (name, frozen config, keep_rule, stop_nonpositive);
    ``mesh`` (hashable) selects the sharded variant.  Without this cache a
    fresh closure per call would force a re-trace + re-compile every time.
    """
    from slam_process_tpu.utils.cache import enable_persistent_cache
    from slam_process_tpu.utils.precision import jit_highest

    enable_persistent_cache()
    run_all = _sweep_estimator_body(est_key)

    if mesh is None:
        return jit_highest(run_all)
    from jax.sharding import NamedSharding

    return jit_highest(run_all, in_shardings=tuple(
        NamedSharding(mesh, s) for s in _sweep_specs()))


class Session:
    """One serial-debug capture session, staged decode -> correct -> scene."""

    def __init__(self, name: str = "session", config: Optional[PipelineConfig] = None):
        self.name = name
        self.config = config or PipelineConfig()
        self.logger = get_logger(f"slam_process_tpu.{name}")
        self.frames: Optional[np.ndarray] = None       # [F, 5]
        self._filtered: Optional[np.ndarray] = None    # [K, 4]
        self._filtered_gen = 0
        self._sweep_prep_memo: dict = {}
        self.corrected_bs: Optional[np.ndarray] = None  # [F] per-row corrected
        self.counters: list[StageCounters] = []
        self.timings: dict[str, float] = {}

    @property
    def filtered(self) -> Optional[np.ndarray]:
        return self._filtered

    @filtered.setter
    def filtered(self, value: Optional[np.ndarray]) -> None:
        # Every rebind bumps the generation and drops the sweep-estimation
        # memo — memo entries key on the generation (a monotone counter, so
        # a recycled array id can never alias a stale entry, and no pin
        # list is needed to keep ids live).
        self._filtered = value
        self._filtered_gen += 1
        self._sweep_prep_memo = {}

    # -- construction -------------------------------------------------------

    @classmethod
    def from_log(cls, path: Union[str, Path], config: Optional[PipelineConfig] = None,
                 engine: str = "host") -> "Session":
        """Load + decode a raw log.

        engine="host": numpy decode (float64-exact oracle path).
        engine="device": the fused jitted TPU pipeline (decode+correct+scene
        in one program; results pulled back only for export).
        """
        s = cls(name=extract_timestamp(str(path)) or Path(path).stem, config=config)
        t0 = time.perf_counter()
        raw = read_hex_log(path)
        if engine == "device":
            import jax

            from slam_process_tpu.pipeline.device import run_session_on_device

            out = run_session_on_device(raw)
            # One batched pytree transfer for everything the host consumes
            # (per-leaf reads pay a round trip each on the relay transport).
            n_frames_h, overflow_h, frames_h, valid_h, corrected_h, keep_h = (
                jax.device_get((out.n_frames, out.correct_overflow,
                                out.frames, out.frame_valid,
                                out.corrected_bs, out.keep)))
            if bool(overflow_h):
                # Fall through to the host path on the already-tokenized
                # bytes (no second file read).
                s.logger.warning(
                    "device corrector capacity exceeded; falling back to host"
                )
            else:
                n = int(n_frames_h)
                # Masked-row layout -> packed tables (order-preserving).
                valid_h = valid_h.astype(bool)
                s.frames = frames_h[valid_h].astype(np.int64)
                corrected = corrected_h[valid_h].astype(np.int64)
                keep = keep_h[valid_h]
                assert len(s.frames) == n
                s.corrected_bs = corrected
                s.filtered = np.stack(
                    [s.frames[keep, 1], corrected[keep], s.frames[keep, 3],
                     s.frames[keep, 4]], axis=1,
                )
                s.timings["device_pipeline"] = time.perf_counter() - t0
                c = StageCounters("decode+correct(device)",
                                  {"bytes": len(raw), "valid": n,
                                   "corrected": int(keep.sum())})
                s.counters.append(c)
                c.log(s.logger)
                return s
        res = decode_frames_np(raw, s.config.decode)
        s.timings["decode"] = time.perf_counter() - t0
        s.frames = res.frames
        c = StageCounters("decode", {"bytes": len(raw), "valid": res.valid,
                                     "discarded": res.discarded})
        s.counters.append(c)
        c.log(s.logger)
        return s

    @classmethod
    def from_parsed_xlsx(cls, path: Union[str, Path],
                         config: Optional[PipelineConfig] = None) -> "Session":
        s = cls(name=extract_timestamp(str(path)) or Path(path).stem, config=config)
        s.frames = read_parsed_table(path)
        return s

    @classmethod
    def from_filtered_xlsx(cls, path: Union[str, Path],
                           config: Optional[PipelineConfig] = None) -> "Session":
        s = cls(name=extract_timestamp(str(path)) or Path(path).stem, config=config)
        s.filtered = read_filtered_table(path)
        return s

    # -- stages --------------------------------------------------------------

    def correct(self) -> np.ndarray:
        if self.frames is None:
            raise ValueError("no decoded frames; load a log or Parsed xlsx first")
        t0 = time.perf_counter()
        res = correct_frames_np(self.frames, self.config.correct)
        self.timings["correct"] = time.perf_counter() - t0
        self.filtered = res.filtered   # setter bumps the memo generation
        self.corrected_bs = res.corrected_bs
        c = StageCounters(
            "correct",
            {"groups": res.n_groups, "baselines": res.n_baselines,
             "corrected": int(res.keep.sum()), "rows": len(self.frames)},
        )
        self.counters.append(c)
        c.log(self.logger)
        return self.filtered

    def intensity(self, scene_cfg: Optional[SceneConfig] = None,
                  source: str = "filtered"):
        """Build the intensity grid from filtered (default) or parsed frames."""
        cfg = scene_cfg or self.config.scene
        t0 = time.perf_counter()
        if source == "filtered":
            if self.filtered is None:
                self.correct()
            ue, bs, rss = (self.filtered[:, i] for i in range(3))
            grid = intensity_grid_np(ue, bs, rss, cfg=cfg)
        elif source == "parsed":
            if self.frames is None:
                raise ValueError("no decoded frames")
            grid = intensity_grid_np(
                self.frames[:, 1], self.frames[:, 2], self.frames[:, 3],
                flag=self.frames[:, 0], cfg=cfg,
            )
        else:
            raise ValueError(f"unknown source {source!r}")
        self.timings["scene"] = time.perf_counter() - t0
        return grid

    def sweep_intensity(self, max_sweeps: Optional[int] = None):
        """Per-sweep intensity tensor [S, 64, 64] (+ counts), on device.

        The SURVEY design keeps sweeps as a leading tensor axis so renders
        and estimators can vmap across them (e.g. feed the [S, 64, 64]
        result to ops.pallas_raster.pallas_rasterize_batch).
        """
        import jax.numpy as jnp

        from slam_process_tpu.ops.correct import detect_groups_np

        if self.filtered is None:
            self.correct()
        gid = detect_groups_np(self.filtered[:, 0])
        s = max_sweeps or int(gid.max()) + 1
        mean, counts = _sweep_intensity_fn(s)(
            jnp.asarray(self.filtered[:, 0], jnp.int32),
            jnp.asarray(self.filtered[:, 1], jnp.int32),
            # Integer dtype: the filtered table's RSS is an 18-bit wire
            # integer, and an i32 operand lets engine="auto" pick the
            # Pallas sweep-sums kernel on TPU.
            jnp.asarray(self.filtered[:, 2], jnp.int32),
            jnp.asarray(gid, jnp.int32),
            jnp.ones(len(self.filtered), dtype=bool),
        )
        return np.asarray(mean), np.asarray(counts)

    def sweep_times(self, max_sweeps: Optional[int] = None) -> np.ndarray:
        """Per-sweep CLK timestamps (first kept frame's CLK per sweep).

        The reference aggregates CLK "for future ToA use" without using it;
        here it anchors the per-sweep path tracks (sweep_paths) on the
        testbed's 30-bit clock axis.  Sweeps with no rows get -1.

        The counter is a WRAPPING 30-bit value; per-sweep anchors are
        unwrapped onto a monotone axis so downstream velocity fits
        (models/tracking.track_velocities) never see a 2^30-tick
        discontinuity.  Only decreases CONSISTENT with a wrap (drop of
        more than half a period, 2^29 ticks) unwrap; a small decrease is
        a testbed counter reset or an out-of-order anchor — unwrapping it
        would shift every later timestamp by ~1e9 ticks, so those are
        left as-is and warned about instead.
        """
        from slam_process_tpu.ops.correct import detect_groups_np

        if self.filtered is None:
            self.correct()
        gid = detect_groups_np(self.filtered[:, 0])
        s = max_sweeps or int(gid.max()) + 1
        times = np.full(s, -1, dtype=np.int64)
        # First occurrence per group id (filtered rows are in stream order).
        first = np.unique(gid, return_index=True)
        times[first[0][first[0] < s]] = self.filtered[first[1][first[0] < s], 3]
        from slam_process_tpu.utils.timestamps import unwrap_clk_anchors

        return unwrap_clk_anchors(times, self.logger)

    def _sweep_host_prep(
        self,
        angle_file: Union[str, Path],
        estimator: str = "nn_omp",
        max_sweeps: Optional[int] = None,
        **overrides,
    ):
        """Host-only prep for per-sweep estimation: sweep ids, compact
        beam-id lists, the session dictionary, and the estimator cache key.
        No device work — the dataset path uses this to size the common
        padded shape before building anything on device.  Memoized per
        (angle_file, estimator, overrides): the host pivot + dictionary cost
        ~15 ms/session and dominate repeated dataset-scale calls otherwise."""
        from slam_process_tpu.ops.correct import detect_groups_np
        from slam_process_tpu.ops.scene import intensity_grid_np

        if self.filtered is None:
            self.correct()
        memo_key = (str(angle_file), estimator, max_sweeps,
                    tuple(sorted(overrides.items())), self._filtered_gen)
        cache = self._sweep_prep_memo
        if memo_key in cache:
            return cache[memo_key]
        gid = detect_groups_np(self.filtered[:, 0])
        n_sweeps = max_sweeps or int(gid.max()) + 1
        lut = load_angle_lut(angle_file)
        if "beam_ids" in overrides:
            # Explicit beam set (e.g. to match a streaming session that
            # fixed its beams up front, or to compare sessions on one
            # dictionary).  Used verbatim: the ids select the compact
            # submatrix AND span the dictionary grid.
            ue_ids = np.asarray(overrides["beam_ids"][0], dtype=np.int64)
            bs_ids = np.asarray(overrides["beam_ids"][1], dtype=np.int64)
        else:
            # Session-level compact submatrix: shared static shape across
            # sweeps (masks from the host pivot — no device reads).
            grid = intensity_grid_np(self.filtered[:, 0], self.filtered[:, 1],
                                     self.filtered[:, 2], cfg=SceneConfig())
            row_mask = np.asarray(grid.row_mask) & np.isfinite(lut)
            col_mask = np.asarray(grid.col_mask) & np.isfinite(lut)
            ue_ids = np.nonzero(row_mask)[0]
            bs_ids = np.nonzero(col_mask)[0]
        ue_ang = lut[ue_ids]
        bs_ang = lut[bs_ids]

        d, est_key = _sweep_estimator_setup(estimator, ue_ang, bs_ang,
                                            **overrides)
        result = (gid, n_sweeps, ue_ids, bs_ids, d, est_key)
        cache[memo_key] = result
        return result

    def _sweep_estimation_inputs(
        self,
        angle_file: Union[str, Path],
        estimator: str = "nn_omp",
        max_sweeps: Optional[int] = None,
        pad_to=None,   # optional (Smax, Umax, Bmax, Ga, Gd) common shape
        **overrides,
    ):
        """Per-session prep for per-sweep estimation.

        Returns (sub, dictionary, est_key, n_sweeps): ``sub`` is the
        device-resident [S, U, B] per-sweep compact tensor (NaN where
        unobserved) and ``dictionary`` the session's beam dictionary.  With
        ``pad_to`` given, every axis is padded to the common shape — NaN for
        measurement cells (gathered with mode='fill'), zero phi
        rows/columns, edge-padded grids — the exactness argument of
        models/batch_estimation.py, letting many sessions share one
        compiled estimator.
        """
        import jax.numpy as jnp

        from slam_process_tpu.models.dictionary import BeamDictionary

        gid, n_sweeps, ue_ids, bs_ids, d, est_key = self._sweep_host_prep(
            angle_file, estimator, max_sweeps, **overrides)

        # Memoize the built device inputs: sub + dictionary are static per
        # (session, config, pad shape), so repeat calls skip the H2D
        # transfers, eager gathers, and intensity dispatch entirely.
        memo_key = ("inputs", str(angle_file), estimator, max_sweeps, pad_to,
                    tuple(sorted(overrides.items())), self._filtered_gen)
        cache = self._sweep_prep_memo
        if memo_key in cache:
            return cache[memo_key]

        s_alloc = pad_to[0] if pad_to is not None else n_sweeps
        rows = len(self.filtered)
        keep = np.ones(rows, dtype=bool)
        ue_col = self.filtered[:, 0]
        bs_col = self.filtered[:, 1]
        rss_col = self.filtered[:, 2]
        if pad_to is not None:
            # Bucket the row count so many sessions share one compiled
            # intensity program (padded rows carry keep=False).
            bucket = 1 << max(int(np.ceil(np.log2(max(rows, 1)))), 10)
            pad_r = bucket - rows
            ue_col = np.pad(ue_col, (0, pad_r))
            bs_col = np.pad(bs_col, (0, pad_r))
            rss_col = np.pad(rss_col, (0, pad_r))
            gid = np.pad(gid, (0, pad_r))
            keep = np.pad(keep, (0, pad_r))
            # Pad the gather index lists with an out-of-range id: take with
            # mode='fill' turns those into NaN measurement cells.
            _, u_max, b_max, ga_max, gd_max = pad_to
            ue_idx = np.pad(ue_ids, (0, u_max - len(ue_ids)),
                            constant_values=1 << 20)
            bs_idx = np.pad(bs_ids, (0, b_max - len(bs_ids)),
                            constant_values=1 << 20)
            ga, gd = len(d.aoa_grid), len(d.aod_grid)
            d = BeamDictionary(
                aoa_grid=np.pad(d.aoa_grid, (0, ga_max - ga), mode="edge"),
                aod_grid=np.pad(d.aod_grid, (0, gd_max - gd), mode="edge"),
                phi_rx=np.pad(d.phi_rx,
                              ((0, u_max - len(ue_ids)), (0, ga_max - ga))),
                phi_tx=np.pad(d.phi_tx,
                              ((0, b_max - len(bs_ids)), (0, gd_max - gd))),
            )
        else:
            ue_idx, bs_idx = ue_ids, bs_ids

        # Device-resident per-sweep grids: no [S, 64, 64] host round trip
        # (D2H reads are expensive on the relay transport — docs/STATUS.md);
        # only the [S, K] results and the validity vector cross back.
        mean_d, _ = _sweep_intensity_fn(s_alloc)(
            jnp.asarray(ue_col, jnp.int32),
            jnp.asarray(bs_col, jnp.int32),
            jnp.asarray(rss_col, jnp.int32),   # integer RSS -> Pallas-able
            jnp.asarray(gid, jnp.int32),
            jnp.asarray(keep),
        )
        sub = jnp.take(
            jnp.take(mean_d, jnp.asarray(ue_idx), axis=1,
                     mode="fill", fill_value=jnp.nan),
            jnp.asarray(bs_idx), axis=2, mode="fill", fill_value=jnp.nan)
        # Device-resident dictionary (H2D once per memo entry).
        d = BeamDictionary(
            aoa_grid=jnp.asarray(d.aoa_grid, jnp.float32),
            aod_grid=jnp.asarray(d.aod_grid, jnp.float32),
            phi_rx=jnp.asarray(d.phi_rx, jnp.float32),
            phi_tx=jnp.asarray(d.phi_tx, jnp.float32),
        )
        result = (sub.astype(jnp.float32), d, est_key, n_sweeps)
        cache[memo_key] = result
        return result

    def sweep_paths(
        self,
        angle_file: Union[str, Path],
        estimator: str = "nn_omp",
        max_sweeps: Optional[int] = None,
        mesh=None,
        **overrides,
    ):
        """Per-sweep multipath estimation, vmapped on device over sweeps.

        Goes beyond the reference (which estimates only on the session
        aggregate): the [S, 64, 64] per-sweep tensor from
        ``sweep_intensity`` feeds a vmapped jitted estimator, giving a
        time-resolved path track per sweep.  With ``mesh`` given, sweeps
        shard over the 'data' axis and the dictionary-grid axis over
        'model' (the dryrun_multichip layout as a real feature).

        Returns (paths, sweep_valid): ``paths`` is an OmpPaths/SmSicPaths
        of [S, K] arrays; ``sweep_valid[s]`` is False for sweeps with no
        observed cell in the session's compact submatrix.
        """
        import jax
        import jax.numpy as jnp

        sub, d, est_key, n_sweeps = self._sweep_estimation_inputs(
            angle_file, estimator, max_sweeps, **overrides)

        if mesh is not None:
            # The sweep axis shards over 'data': pad to a multiple of the
            # data-axis size (padded sweeps are all-NaN -> dropped below).
            dp = mesh.shape["data"]
            pad = (-n_sweeps) % dp
            if pad:
                sub = jnp.pad(sub, ((0, pad), (0, 0), (0, 0)),
                              constant_values=jnp.nan)
        args = (sub.astype(jnp.float32),
                jnp.asarray(d.phi_rx, jnp.float32),
                jnp.asarray(d.phi_tx, jnp.float32),
                jnp.asarray(d.aoa_grid, jnp.float32),
                jnp.asarray(d.aod_grid, jnp.float32))
        fn = _sweep_estimator_fn(est_key, mesh)
        if mesh is not None:
            from jax.sharding import NamedSharding

            with mesh:
                out, valid_d = fn(*(jax.device_put(a, NamedSharding(mesh, s_))
                                    for a, s_ in zip(args, _SWEEP_SPECS)))
                jax.block_until_ready(valid_d)
        else:
            out, valid_d = fn(*args)
        out_h, valid_h = jax.device_get((out, valid_d))  # one transfer
        paths = type(out_h)(*(np.asarray(x)[:n_sweeps] for x in out_h))
        sweep_valid = np.asarray(valid_h)[:n_sweeps]
        return paths, sweep_valid

    def path_tracks(
        self,
        angle_file: Union[str, Path],
        estimator: str = "nn_omp",
        max_tracks: int = 8,
        gate_deg: float = 10.0,
        engine: str = "host",
        **overrides,
    ):
        """CLK-anchored multipath tracks — the ToA axis the reference left
        unused (heatmap_gemini_v2.py:35-38 aggregates CLK "for future ToA
        use" and never uses it).

        Runs ``sweep_paths`` (time-resolved per-sweep estimation, on
        device), anchors each sweep on its first kept frame's CLK
        (``sweep_times``), then associates paths across sweeps into tracks
        with per-track angular-velocity fits (deg per CLK tick).

        ``engine`` selects the association implementation: "host"
        (default — the [S<=64, K<=3] problem is microseconds) or "device"
        (the jitted ``lax.scan`` formulation, bit-identical by test).

        Returns (tracks, times, (vel_aoa, vel_aod, vel_ok)).
        """
        from slam_process_tpu.models.tracking import (
            track_paths_jax,
            track_paths_np,
            track_velocities,
        )

        paths, sweep_valid = self.sweep_paths(
            angle_file, estimator=estimator, **overrides)
        times = self.sweep_times(len(sweep_valid))
        power = paths.power if hasattr(paths, "power") else paths.metric
        valid = (np.asarray(paths.valid, bool)
                 & sweep_valid[:, None] & (times >= 0)[:, None])
        if engine == "device":
            import jax

            tracks_d = jax.jit(
                functools.partial(track_paths_jax, max_tracks=max_tracks,
                                  gate_deg=gate_deg)
            )(paths.aoa, paths.aod, power, valid)
            from slam_process_tpu.models.tracking import Tracks

            tracks = Tracks(*jax.device_get(tracks_d))
        elif engine == "host":
            tracks = track_paths_np(paths.aoa, paths.aod, power, valid,
                                    max_tracks=max_tracks, gate_deg=gate_deg)
        else:
            raise ValueError(f"unknown engine {engine!r}")
        vel = track_velocities(tracks, times)
        return tracks, times, vel

    def scene_changes(
        self,
        angle_file: Union[str, Path],
        min_persist: int = 3,
        min_gone: int = 3,
        jump_deg: float = 5.0,
        **track_kwargs,
    ):
        """Scene change events from the CLK-anchored tracks
        (``models/change_detection.py``): path births/deaths, angular
        jumps, LoS handovers, each stamped with its sweep's CLK time.

        Returns (events [N, 7] float64 — see ``scene_change_events`` —
        tracks, times).  Beyond-reference: the reference never uses its
        CLK column (heatmap_gemini_v2.py:35-38).
        """
        from slam_process_tpu.models.change_detection import (
            detect_scene_changes_np,
            scene_change_events,
        )

        tracks, times, _vel = self.path_tracks(angle_file, **track_kwargs)
        changes = detect_scene_changes_np(
            tracks, min_persist=min_persist, min_gone=min_gone,
            jump_deg=jump_deg)
        return scene_change_events(changes, tracks, times), tracks, times

    def render_heatmap(
        self,
        angle_file: Union[str, Path],
        output_path: Optional[Union[str, Path]] = None,
        scene_cfg: Optional[SceneConfig] = None,
        render_cfg: Optional[RenderConfig] = None,
        source: str = "filtered",
        title: Optional[str] = None,
        axes_rect=None,
    ) -> RenderedHeatmap:
        scene_cfg = scene_cfg or SceneConfig(keep_nan=True, fill_with_min=False)
        render_cfg = render_cfg or self.config.render
        lut = load_angle_lut(angle_file)
        grid = self.intensity(scene_cfg, source=source)
        t0 = time.perf_counter()
        rendered = render_intensity(grid, lut, scene_cfg, render_cfg)
        self.timings["render"] = time.perf_counter() - t0
        if output_path is not None:
            save_heatmap(rendered, output_path,
                         title=title or f"BS-UE 波束对平均RSSI热力图 ({self.name})",
                         render_cfg=render_cfg, axes_rect=axes_rect)
            self.logger.info("heatmap saved: %s", output_path)
        return rendered

    # -- export --------------------------------------------------------------

    def export_parsed(self, path: Union[str, Path]) -> Path:
        return write_parsed_table(path, self.frames)

    def export_filtered(self, path: Union[str, Path]) -> Path:
        if self.filtered is None:
            self.correct()
        return write_filtered_table(path, self.filtered)

    def export_corrected(self, path: Union[str, Path]) -> Path:
        """process_excel-style export: the 5 Parsed columns plus a
        Corrected_BS_Beam column for every row (bs_beam_correction.py:
        119-138 overwrites its input file with this layout)."""
        from slam_process_tpu.io.schemas import PARSED_COLUMNS
        from slam_process_tpu.io.xlsx import write_xlsx_table

        if self.corrected_bs is None:
            self.correct()
        table = np.concatenate(
            [self.frames, self.corrected_bs[:, None]], axis=1
        )
        return write_xlsx_table(
            path, PARSED_COLUMNS + ["Corrected_BS_Beam"], table
        )

    def save_npz(self, path: Union[str, Path]) -> Path:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        arrays = {}
        if self.frames is not None:
            arrays["frames"] = self.frames
        if self.filtered is not None:
            arrays["filtered"] = self.filtered
        np.savez_compressed(path, **arrays)
        return path

    @classmethod
    def load_npz(cls, path: Union[str, Path]) -> "Session":
        s = cls(name=Path(path).stem)
        with np.load(path) as z:
            if "frames" in z:
                s.frames = z["frames"]
            if "filtered" in z:
                s.filtered = z["filtered"]
        return s


def sweep_paths_dataset(
    sessions,
    angle_file: Union[str, Path],
    estimator: str = "nn_omp",
    mesh=None,
    **overrides,
):
    """Per-sweep estimation for MANY sessions through ONE compiled program.

    Every session's per-sweep tensor, dictionary, and row table is padded
    to the dataset-common shape (NaN measurement fills, zero phi
    rows/columns — the exactness argument of models/batch_estimation.py),
    so all sessions share a single compiled estimator executable and a
    handful of compiled intensity programs (row counts are bucketed).  The
    per-session programs dispatch asynchronously and block once, then ALL
    results cross device->host as one transfer.

    Dispatch adjudication (tools/diag_est_dispatch.py, DEVICE plane, TPU
    v5e, 392 sweeps): async-bucketed 10.9 ms vs outer-vmapped one-program
    44.3 ms — unlike the SESSION-level estimator (where the vmapped form
    won and is production), each session here is ALREADY a batched
    [S, Ga, Gd] program; the outer session vmap adds no parallelism,
    multiplies the selection loop's residual surfaces by N, and pads
    every session to the dataset-max sweep count.

    Returns a list of (paths, sweep_valid) per session, equal to each
    session's ``Session.sweep_paths`` output.
    """
    import jax

    preps = [s._sweep_host_prep(angle_file, estimator, **overrides)
             for s in sessions]
    u_max = max(len(p[2]) for p in preps)
    b_max = max(len(p[3]) for p in preps)
    # Dictionary-grid axes pad to LANE-TILE multiples (128): the selection
    # loop's [S, Ga, Gd] surfaces otherwise carry ~14% tile padding the
    # VPU re-touches on every pass, and any flattening becomes a
    # re-tiling copy.  Padded atoms are zero phi columns + edge-repeated
    # angles — inert by the models/batch_estimation exactness argument
    # (same mechanism as the dataset-max padding itself).
    ga_max = -(-max(len(p[4].aoa_grid) for p in preps) // 128) * 128
    gd_max = -(-max(len(p[4].aod_grid) for p in preps) // 128) * 128

    import jax.numpy as jnp

    est_key = preps[0][5]
    per_session = []
    sweep_counts = []
    for s, prep in zip(sessions, preps):
        # Sweep axis bucketed per session (not dataset-max padded); the
        # dictionary/measurement axes stay dataset-common so every bucket
        # shape reuses one traced estimator per S.
        pad_to = (_sweep_bucket(prep[1]), u_max, b_max, ga_max, gd_max)
        sub, d, key_i, n_sweeps = s._sweep_estimation_inputs(
            angle_file, estimator, pad_to=pad_to, **overrides)
        assert key_i == est_key
        per_session.append((sub, d.phi_rx, d.phi_tx, d.aoa_grid, d.aod_grid))
        sweep_counts.append(n_sweeps)

    if mesh is not None:
        # Sharded variant: one dispatch per session with the sweep axis
        # over 'data' and the dictionary grid over 'model'.
        from jax.sharding import NamedSharding

        fn = _sweep_estimator_fn(est_key, mesh)
        outs = []
        with mesh:
            for args in per_session:
                outs.append(fn(*(jax.device_put(a, NamedSharding(mesh, sp))
                                 for a, sp in zip(args, _SWEEP_SPECS))))
        stacked = _stack_results_fn()(outs)
    else:
        # One async dispatch per session of ONE shared compiled executable
        # (see the docstring's dispatch-adjudication note for why the
        # outer session vmap is not used here).
        fn = _sweep_estimator_fn(est_key, None)
        stacked = _stack_results_fn()([fn(*args) for args in per_session])

    # One host transfer of ~8 stacked buffers (each leaf read pays a relay
    # round trip, so per-session reads would cost 8 x n_sessions trips).
    host_paths, host_valid = jax.device_get(stacked)
    paths_t = type(host_paths)
    results = []
    for i, n_sweeps in enumerate(sweep_counts):
        paths = paths_t(*(np.asarray(x)[i][:n_sweeps] for x in host_paths))
        results.append((paths, np.asarray(host_valid)[i][:n_sweeps]))
    return results
