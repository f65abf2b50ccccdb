"""Bisect which bench phase puts the transport into the 1.2 s/call mode.

Usage: diag_bisect.py <phases>  where phases is a subset string of:
  w = sequential warmup (19 compiled buckets, full outputs)
  s = sequential timed loops (3x19 dispatches, full outputs live)
  e = e2e loop (19 more dispatches)
  p = parity_outs held live (keep 2 full outputs alive)
then the summary batched loop is timed.
"""

import glob
import sys
import time
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
from slam_process_tpu.pipeline.device import run_session_on_device

phases = sys.argv[1] if len(sys.argv) > 1 else "wsep"
print("phases:", phases)

logs = sorted(glob.glob("/root/reference/debugDoc/*.txt"))
raw = [read_hex_log(p) for p in logs]

parity_outs = {}
if "w" in phases:
    warm = [run_session_on_device(r) for r in raw]
    jax.block_until_ready([o.rgba for o in warm])
    del warm
if "s" in phases:
    for _ in range(3):
        outs = [run_session_on_device(r) for r in raw]
        jax.block_until_ready([(o.rgba, o.n_frames) for o in outs])
    if "r" in phases:
        total = int(sum(int(o.n_frames) for o in outs))
        print("scalar reads done, total:", total)
    if "a" in phases:
        total = int(jax.jit(lambda *xs: sum(xs))(*[o.n_frames for o in outs]))
        print("ONE aggregated read done, total:", total)
    if "p" in phases:
        parity_outs = {i: outs[i] for i in (0, len(logs) - 1)}
    del outs
if "e" in phases:
    outs2 = [run_session_on_device(read_hex_log(p)) for p in logs]
    jax.block_until_ready([o.rgba for o in outs2])
    del outs2
import gc

gc.collect()

n_padded = max(len(r) for r in raw)
n_padded = ((n_padded + (1 << 20) - 1) >> 20) << 20
batch, lengths = stack_sessions(raw, n_padded)
mesh = make_mesh((1, 1), ("data", "model"))
bfn = batched_session_pipeline(mesh, n_padded, max_groups=64,
                               max_baselines_per_group=96, outputs="summary")
lut_j = jnp.asarray(colormap_lut("viridis"))
with mesh:
    batch_dev = jax.device_put(batch)
    len_dev = jax.device_put(lengths)
    bout = bfn(batch_dev, len_dev, lut_j)
    jax.block_until_ready(bout.rgba)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        bout = bfn(batch_dev, len_dev, lut_j)
        jax.block_until_ready((bout.rgba, bout.n_kept, bout.counts))
        ts.append(time.perf_counter() - t0)
    print("summary batched trials:",
          ", ".join(f"{t*1e3:.2f} ms" for t in ts))
    print("parity_outs live:", len(parity_outs))
