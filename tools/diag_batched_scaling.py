"""Validate the one-program dataset time is real compute: scale sessions.

If the ~80 us whole-dataset measurement reflects actual device work, time
must grow ~linearly when the same logs are stacked 2x / 4x.  Also reports
implied HBM traffic at 820 GB/s (TPU v5e) for a sanity roofline.
"""

import glob
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

logs = sorted(glob.glob("/root/reference/debugDoc/*.txt"))
raw = [read_hex_log(p) for p in logs]
n_padded = max(len(r) for r in raw)
n_padded = ((n_padded + (1 << 20) - 1) >> 20) << 20
lut_j = jnp.asarray(colormap_lut("viridis"))
mesh = make_mesh((1, 1), ("data", "model"))

for mult in (1, 2, 4):
    sessions = raw * mult
    batch, lengths = stack_sessions(sessions, n_padded)
    fn = batched_session_pipeline(mesh, n_padded, max_groups=64,
                                  max_baselines_per_group=96,
                                  outputs="summary")
    with mesh:
        bd = jax.device_put(batch)
        ld = jax.device_put(lengths)
        out = fn(bd, ld, lut_j)
        jax.block_until_ready(out.rgba)
        ts = []
        for _ in range(9):
            t0 = time.perf_counter()
            out = fn(bd, ld, lut_j)
            jax.block_until_ready((out.rgba, out.n_kept, out.counts))
            ts.append(time.perf_counter() - t0)
    med = sorted(ts)[4]
    frames = 1072720 * mult
    print(f"x{mult}: S={len(sessions)} batch={batch.nbytes/1e6:.0f} MB  "
          f"median {med*1e6:7.1f} us  -> {frames/med/1e9:.2f} Gf/s  "
          f"(traffic budget at 820 GB/s: {med*820e9/1e6:.0f} MB)")


# ROUND-2 RESULTS (TPU "v5 lite" via axon relay):
#   x1: S=19  batch 40 MB   median  65.1 us  (dispatch-latency floor)
#   x2: S=38  batch 80 MB   median  54.8 us
#   x4: S=76  batch 159 MB  median 122.0 us  -> 35 G frames/s, outputs exact
# Roofline check: a varying-input full-read reduction over 256 MB measures
# ~170 us => ~1.56 TB/s effective HBM bandwidth on this device (v6e-class,
# despite the "v5 lite" label).  At that bandwidth the x4 time equals the
# input-read bound (159 MB / 1.56 TB/s = 102 us): the whole-dataset program
# is input-read-bound, i.e. XLA fuses the decode->correct->scene chain
# without materializing the frame tensors in HBM.  x4 output n_frames was
# verified exact (4 x 1,072,720).
# Dedup check: identical-input repeat calls vs alternating two buffers
# (one inert padding byte flipped) measure the same (~100 us median), so
# the resident measurement reflects real execution, not result caching.
