"""Bench-style device streaming replay with phase accounting (healthy proc)."""

import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

cache_dir = Path(__file__).parent.parent / "build" / "jax_cache"
jax.config.update("jax_compilation_cache_dir", str(cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import glob

from slam_process_tpu.io import read_hex_log
from slam_process_tpu.parallel.streaming_device import replay_log_device

logs = sorted(glob.glob(str(Path("/root/reference/debugDoc") / "*.txt")))
raw = [read_hex_log(p) for p in logs]
total = sum(len(r) for r in raw)
print(f"{len(raw)} logs, {total/1e6:.1f} MB")

t0 = time.perf_counter()
replay_log_device(raw[0], chunk_bytes=1 << 20).block_until_ready()
print(f"warm: {time.perf_counter()-t0:.1f} s")

for trial in range(3):
    t0 = time.perf_counter()
    ss = [replay_log_device(r, chunk_bytes=1 << 20) for r in raw]
    t1 = time.perf_counter()
    for s in ss:
        s.block_until_ready()
    t2 = time.perf_counter()
    frames = sum(s.n_frames for s in ss)
    t3 = time.perf_counter()
    del ss
    print(f"trial {trial}: dispatch {1e3*(t1-t0):.1f} ms, block "
          f"{1e3*(t2-t1):.1f} ms, scalar-reads {1e3*(t3-t2):.1f} ms "
          f"-> {frames/(t3-t0)/1e6:.2f} Mf/s")
