"""Capture a jax.profiler xplane trace of the flagship programs on TPU.

Produces TensorBoard-compatible traces under build/traces/ for (a) the
one-program whole-dataset batched pipeline and (b) one streaming step —
the ground-truth evidence behind the roofline claims in docs/STATUS.md.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_pipeline.py
"""

import glob
import time
from pathlib import Path

import jax
import jax.numpy as jnp

cache_dir = Path(__file__).parent.parent / "build" / "jax_cache"
jax.config.update("jax_compilation_cache_dir", str(cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from slam_process_tpu.io import read_hex_log
from slam_process_tpu.ops.raster import colormap_lut
from slam_process_tpu.parallel.batch import batched_session_pipeline, stack_sessions
from slam_process_tpu.parallel.mesh import make_mesh
from slam_process_tpu.parallel.streaming_device import DeviceStreamingSession

out_dir = Path(__file__).parent.parent / "build" / "traces"

logs = sorted(glob.glob("/root/reference/debugDoc/*.txt"))
raw = [read_hex_log(p) for p in logs]
n_padded = max(len(r) for r in raw)
n_padded = ((n_padded + (1 << 20) - 1) >> 20) << 20
batch, lengths = stack_sessions(raw, n_padded)
mesh = make_mesh((1, 1), ("data", "model"))
fn = batched_session_pipeline(mesh, n_padded, max_groups=64,
                              max_baselines_per_group=96, outputs="summary")
lut = jnp.asarray(colormap_lut("viridis"))
with mesh:
    bd, ld = jax.device_put(batch), jax.device_put(lengths)
    o = fn(bd, ld, lut)
    jax.block_until_ready(o.rgba)
    with jax.profiler.trace(str(out_dir / "batched")):
        for _ in range(5):
            o = fn(bd, ld, lut)
        jax.block_until_ready((o.rgba, o.n_kept))
print("batched trace:", *map(str, (out_dir / "batched").rglob("*.xplane.pb")))

s = DeviceStreamingSession(chunk_bytes=1 << 20)
s.feed(raw[0])
s.block_until_ready()
import numpy as np

piece = np.zeros(1 << 20, dtype=np.uint8)
piece[: min(len(raw[1]), 1 << 20)] = raw[1][: 1 << 20]
pj = jax.device_put(piece)
with jax.profiler.trace(str(out_dir / "stream_step")):
    st = s._step(s._state, pj, jnp.int32(len(piece)))
    jax.block_until_ready(st.n_frames)
s._state = st
print("stream trace:", *map(str, (out_dir / "stream_step").rglob("*.xplane.pb")))
print("OK")
