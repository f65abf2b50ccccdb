"""Isolate the 27 ms/step cost: donation? transport? real compute?"""

import functools
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

cache_dir = Path(__file__).parent.parent / "build" / "jax_cache"
jax.config.update("jax_compilation_cache_dir", str(cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from slam_process_tpu.config import PipelineConfig
from slam_process_tpu.io import read_hex_log
from slam_process_tpu.parallel import streaming_device as sd

C = 1 << 20
GCAP = 4096
cfg = PipelineConfig()
cap = sd.frame_capacity(C, cfg.decode)

raw = read_hex_log(sorted(Path("/root/reference/debugDoc").glob("*.txt"),
                          key=lambda p: p.stat().st_size)[-1])
piece = np.zeros(C, dtype=np.uint8)
piece[: min(len(raw), C)] = raw[:C]


def fresh_state():
    return sd.DeviceStreamState(
        carry_frames=jnp.zeros((GCAP, 5), jnp.int32),
        carry_count=jnp.int32(0),
        sums=jnp.zeros((64, 64), jnp.float32),
        counts=jnp.zeros((64, 64), jnp.float32),
        n_frames=jnp.int32(0),
        n_kept=jnp.int32(0),
        n_groups=jnp.int32(0),
        overflow=jnp.bool_(False),
    )


body = functools.partial(sd._step_body, cap=cap, group_capacity=GCAP,
                         max_groups=64, max_baselines_per_group=96,
                         cfg=cfg, decoder="xla", emit_rows=False)

pj = jax.device_put(piece)
nb = jnp.int32(C)


def bench(label, fn, state, n=10, sync_each=False):
    st = state
    # warm
    st2 = fn(st, pj, nb)
    jax.block_until_ready(st2.n_frames)
    st = fresh_state() if sync_each == "donate" else st2
    ts = []
    t0 = time.perf_counter()
    for _ in range(n):
        st = fn(st, pj, nb)
    jax.block_until_ready(st.n_frames)
    dt = (time.perf_counter() - t0) / n
    print(f"{label}: {dt*1e3:.2f} ms/step")
    return st


# (1) donated step (production config)
step_don = jax.jit(body, donate_argnums=0)
bench("1) donated   ", step_don, fresh_state(), sync_each="donate")

# (2) no donation
step_plain = jax.jit(body)
bench("2) no-donate ", step_plain, fresh_state())

# (3) pure device: scan 20 steps inside one program
def scan20(state, chunk, n):
    def one(st, _):
        return body(st, chunk, n), None
    out, _ = jax.lax.scan(one, state, None, length=20)
    return out

scan_j = jax.jit(scan20)
st = scan_j(fresh_state(), pj, nb)
jax.block_until_ready(st.n_frames)
t0 = time.perf_counter()
st = scan_j(fresh_state(), pj, nb)
jax.block_until_ready(st.n_frames)
dt = time.perf_counter() - t0
print(f"3) scan-20 in-program: {dt/20*1e3:.2f} ms/step (whole {dt*1e3:.1f} ms)")

# (4) H2D variants
for label, f in (("jnp.asarray", lambda: jnp.asarray(piece)),
                 ("device_put ", lambda: jax.device_put(piece))):
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        x = f()
        jax.block_until_ready(x)
        ts.append(time.perf_counter() - t0)
    print(f"4) H2D 1MiB {label}: {sorted(ts)[2]*1e3:.2f} ms")

# (5) decode-only step on the same chunk (is decode the slow part?)
from slam_process_tpu.ops.decode import decode_frames_jax

dec = jax.jit(lambda b: decode_frames_jax(b, capacity=cap)[1])
o = dec(pj); jax.block_until_ready(o)
t0 = time.perf_counter()
for _ in range(10):
    o = dec(pj)
jax.block_until_ready(o)
print(f"5) decode-only: {(time.perf_counter()-t0)/10*1e3:.2f} ms/step")

# (6) correct-only on a resident [T,5] frame tensor
from slam_process_tpu.ops.correct import correct_frames_jax

T = GCAP + cap
frames = jnp.zeros((T, 5), jnp.int32)
corr = jax.jit(lambda f: correct_frames_jax(f, jnp.int32(T), 64, 96)[1])
o = corr(frames); jax.block_until_ready(o)
t0 = time.perf_counter()
for _ in range(10):
    o = corr(frames)
jax.block_until_ready(o)
print(f"6) correct-only: {(time.perf_counter()-t0)/10*1e3:.2f} ms/step")
