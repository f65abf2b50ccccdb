"""Per-step latency breakdown for the device streaming session on TPU.

Bench r2 first cut: 734k f/s (slower than the 1.2M f/s host machine).
Questions: per-step dispatch cost? donation effects? live-state mirroring
(the relay eagerly mirrors live execution outputs)? H2D chunk cost?
"""

import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

cache_dir = Path(__file__).parent.parent / "build" / "jax_cache"
jax.config.update("jax_compilation_cache_dir", str(cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from slam_process_tpu.io import read_hex_log
from slam_process_tpu.parallel.streaming_device import (
    DeviceStreamingSession,
    replay_log_device,
)

DEBUGDOC = Path("/root/reference/debugDoc")
import glob

logs = sorted(glob.glob(str(DEBUGDOC / "*.txt")))
raw = [read_hex_log(p) for p in logs]
total_bytes = sum(len(r) for r in raw)
print(f"{len(raw)} logs, {total_bytes/1e6:.1f} MB")

# Warm compile.
replay_log_device(raw[0], chunk_bytes=1 << 20).block_until_ready()

# (a) full dataset replay, one session per log (bench r2 configuration)
t0 = time.perf_counter()
ss = [replay_log_device(r, chunk_bytes=1 << 20) for r in raw]
for s in ss:
    s.block_until_ready()
frames = sum(s.n_frames for s in ss)
dt = time.perf_counter() - t0
n_steps = sum(-(-len(r) // ((1 << 20) - 10)) + 1 for r in raw)
print(f"a) replay_all: {dt*1e3:.1f} ms, {frames} frames, "
      f"{frames/dt/1e6:.2f} Mf/s, ~{n_steps} dispatches "
      f"-> {dt/n_steps*1e3:.1f} ms/step")

# (b) same but block only at the very end (no per-session sync)
t0 = time.perf_counter()
ss = [replay_log_device(r, chunk_bytes=1 << 20) for r in raw]
for s in ss:
    s.block_until_ready()
frames = sum(s.n_frames for s in ss)
dt = time.perf_counter() - t0
print(f"b) repeat     : {dt*1e3:.1f} ms, {frames/dt/1e6:.2f} Mf/s")

# (c) per-step latency on one big session: feed the same 1 MiB window
s = DeviceStreamingSession(chunk_bytes=1 << 20)
big = raw[int(np.argmax([len(r) for r in raw]))]
s.feed(big)
s.block_until_ready()
piece = np.zeros(1 << 20, dtype=np.uint8)
piece[: len(big) % (1 << 20)] = big[: len(big) % (1 << 20)]
pj = jnp.asarray(piece)
jax.block_until_ready(pj)
for label, n in (("c) step sync each", 10),):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        s._state = s._step(s._state, jnp.asarray(piece), jnp.int32(len(piece)))
        jax.block_until_ready(s._state.n_frames)
        ts.append(time.perf_counter() - t0)
    print(f"{label}: median {sorted(ts)[n//2]*1e3:.2f} ms  "
          + ", ".join(f"{t*1e3:.1f}" for t in ts))

# (d) step without per-step sync (pipelined), 20 steps then block
ts0 = time.perf_counter()
for _ in range(20):
    s._state = s._step(s._state, jnp.asarray(piece), jnp.int32(len(piece)))
jax.block_until_ready(s._state.n_frames)
dt = time.perf_counter() - ts0
print(f"d) 20 async steps: {dt*1e3:.1f} ms -> {dt/20*1e3:.2f} ms/step "
      f"({20*(1<<20)/11/dt/1e6:.1f} Mf/s potential)")

# (e) H2D cost of the chunk alone
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    x = jnp.asarray(piece)
    jax.block_until_ready(x)
    ts.append(time.perf_counter() - t0)
print(f"e) 1MiB H2D: median {sorted(ts)[2]*1e3:.2f} ms")

# (f) device-resident chunk: no H2D in the loop
ts0 = time.perf_counter()
for _ in range(20):
    s._state = s._step(s._state, pj, jnp.int32(len(piece)))
    pj = jnp.asarray(piece)  # replace donated-safe? pj not donated (arg 1)
jax.block_until_ready(s._state.n_frames)
dt = time.perf_counter() - ts0
print(f"f) 20 steps resident chunk: {dt/20*1e3:.2f} ms/step")
