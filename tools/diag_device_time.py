"""Ground-truth device execution time of the flagship programs via xplane.

Host wall timing cannot measure device time on the axon relay:
block_until_ready returns before execution, and any D2H read adds
multi-second transport costs (see tools/diag_roofline.py).  The profiler's
device plane, however, records op durations ON the TPU, immune to both.

This tool captures a jax.profiler trace of (a) the x1 whole-dataset batched
pipeline and (b) the x4-stacked variant, then parses the xplane.pb directly
(proto loaded from tensorflow's tsl without initializing tensorflow) and
reports per-executable device durations: the sum of XLA op events on the
TPU device plane, grouped by executable (run_id), for the steady-state
(non-first) executions.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/diag_device_time.py

FINDINGS (2026-08-16, TPU v5 lite):
  x1 dataset (40 MB, 1,072,720 frames): 1.17 s device time per execution
  x4 dataset (159 MB):                  6.71 s device time per execution
  -> TRUE whole-dataset throughput ~917k frames/s (92x the 10k/s north
     star) -- NOT the 13.8G frames/s round 2 claimed from wall timing.
  Per-op breakdown: >85% of device time is kCustom GATHER fusions --
  data-dependent gathers run ~10 ns/element on TPU (serialized):
    %fusion.1  u8[39.8M] gather of bytes by position       404 ms
    %fusion.9  s32[3.6M] gather of frame starts            348 ms
    + a dozen 20-50 ms per-frame-field gathers.
  The decode/correct path is gather-bound, not HBM-bound: the calibrated
  read bound for 40 MB is 54 us, so the program sits ~20,000x above its
  input-read roofline.  The optimization target is eliminating
  data-dependent gathers (static-shift formulations / Pallas kernels),
  not bandwidth.
"""

import glob
import importlib.util
import sys
import time
from collections import defaultdict
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

cache_dir = Path(__file__).parent.parent / "build" / "jax_cache"
jax.config.update("jax_compilation_cache_dir", str(cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from slam_process_tpu.io import read_hex_log
from slam_process_tpu.ops.raster import colormap_lut
from slam_process_tpu.parallel.batch import batched_session_pipeline, stack_sessions
from slam_process_tpu.parallel.mesh import make_mesh

OUT = Path(__file__).parent.parent / "build" / "traces"


def load_xplane_pb2():
    """Load xplane_pb2 straight from its file: importing the tensorflow
    package costs ~10 s and spams logs; the proto module itself only needs
    google.protobuf."""
    site = Path(np.__file__).parent.parent
    path = site / "tensorflow" / "tsl" / "profiler" / "protobuf" / "xplane_pb2.py"
    spec = importlib.util.spec_from_file_location("xplane_pb2", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["xplane_pb2"] = mod
    spec.loader.exec_module(mod)
    return mod


def device_durations(trace_dir: Path):
    """Per-(executable, run) device-time from every TPU plane in the trace.

    Returns {program_name: [run_duration_seconds, ...]} where each run
    duration is last_event_end - first_event_start over that run_id's ops
    (wall extent on the device plane, so gaps count; parallel cores of one
    run merge by run_id).
    """
    xplane_pb2 = load_xplane_pb2()
    runs = defaultdict(lambda: [None, None, None])  # run -> [t0, t1, name]
    for pb in sorted(trace_dir.rglob("*.xplane.pb")):
        space = xplane_pb2.XSpace()
        space.ParseFromString(pb.read_bytes())
        for plane in space.planes:
            if "TPU" not in plane.name and "/device" not in plane.name.lower():
                continue
            stats_meta = {sid: sm.name for sid, sm in plane.stat_metadata.items()}
            ev_meta = {eid: em.name for eid, em in plane.event_metadata.items()}
            for line in plane.lines:
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, "?")
                    run_id = None
                    program = None
                    for st in ev.stats:
                        sname = stats_meta.get(st.metadata_id, "")
                        if sname in ("run_id", "group_id"):
                            run_id = st.int64_value or st.uint64_value
                        elif sname in ("hlo_module", "program_id", "tf_op"):
                            pass
                    # XLA module-level events are named after the module on
                    # line "XLA Modules"; op events carry the module via
                    # their line name.
                    key = (line.name, run_id)
                    t0 = line.timestamp_ns + ev.offset_ps / 1e3
                    t1 = t0 + ev.duration_ps / 1e3
                    r = runs[key]
                    r[0] = t0 if r[0] is None else min(r[0], t0)
                    r[1] = t1 if r[1] is None else max(r[1], t1)
                    r[2] = name
    return runs


def capture(tag, fn_call, n=3):
    d = OUT / tag
    with jax.profiler.trace(str(d)):
        for i in range(n):
            out = fn_call(i)
        # force completion inside the window: a real D2H read
        jax.device_get(out)
    return d


def main():
    t0 = time.perf_counter()
    jax.device_get(jnp.zeros(()))
    print(f"first-read penalty absorbed: {time.perf_counter()-t0:.1f} s")

    logs = sorted(glob.glob("/root/reference/debugDoc/*.txt"))
    raw = [read_hex_log(p) for p in logs]
    n_padded = max(len(r) for r in raw)
    n_padded = ((n_padded + (1 << 20) - 1) >> 20) << 20
    lut = jnp.asarray(colormap_lut("viridis"))
    mesh = make_mesh((1, 1), ("data", "model"))

    for mult in (1, 4):
        sessions = raw * mult
        batch, lengths = stack_sessions(sessions, n_padded)
        fn = batched_session_pipeline(mesh, n_padded, max_groups=64,
                                      max_baselines_per_group=96,
                                      outputs="summary")
        with mesh:
            bd = jax.device_put(batch)
            ld = jax.device_put(lengths)
            warm = fn(bd, ld, lut)
            jax.device_get(warm.n_kept)  # compile + ensure executed

            def call(i):
                out = fn(bd, ld, lut)
                return out.n_kept

            d = capture(f"pipeline_x{mult}", call, n=3)
        frames = 1072720 * mult
        print(f"== x{mult} ({batch.nbytes/1e6:.0f} MB input, {frames:,} frames) ==")
        runs = device_durations(d)
        for (lname, rid), (a, b, name) in sorted(runs.items(),
                                                 key=lambda kv: kv[1][0] or 0):
            if a is None:
                continue
            dur_us = (b - a) / 1e3
            if dur_us < 1:
                continue
            print(f"  line={lname!r:30s} run={rid} dur={dur_us:10.1f} us "
                  f"({frames/(dur_us/1e6)/1e6:,.0f} M frames/s) [{name}]")


if __name__ == "__main__":
    main()
