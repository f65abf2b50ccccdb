"""Characterize D2H read strategies on the relay transport."""

import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

cache_dir = Path(__file__).parent.parent / "build" / "jax_cache"
jax.config.update("jax_compilation_cache_dir", str(cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# 19 independent scalars from 19 independent executions (like sessions).
f = jax.jit(lambda x: (jnp.sum(x), x * 2.0))
outs = []
for i in range(19):
    s, big = f(jnp.ones((256, 256)) * i)
    outs.append((s, big))
jax.block_until_ready([o[0] for o in outs])

t0 = time.perf_counter()
vals = [int(o[0]) for o in outs]
print(f"i) 19 per-scalar int(): {(time.perf_counter()-t0)*1e3:.1f} ms")

# same again (state after first reads)
t0 = time.perf_counter()
vals = [int(o[0]) for o in outs]
print(f"i2) repeat            : {(time.perf_counter()-t0)*1e3:.1f} ms")

# ii) device-side stack + single read
g = jax.jit(lambda *xs: jnp.stack(xs))
t0 = time.perf_counter()
stacked = g(*[o[0] for o in outs])
host = np.asarray(stacked)
print(f"ii) stack+one read    : {(time.perf_counter()-t0)*1e3:.1f} ms")

# iii) jax.device_get of the scalar list
t0 = time.perf_counter()
host = jax.device_get([o[0] for o in outs])
print(f"iii) device_get(list) : {(time.perf_counter()-t0)*1e3:.1f} ms")

# iv) np.asarray of one small [64,64] grid
h = jax.jit(lambda x: x @ x)
m = h(jnp.ones((64, 64)))
jax.block_until_ready(m)
t0 = time.perf_counter()
_ = np.asarray(m)
print(f"iv) one [64,64] read  : {(time.perf_counter()-t0)*1e3:.1f} ms")

# v) dispatch health after reads
t0 = time.perf_counter()
for _ in range(10):
    s, big = f(jnp.ones((256, 256)))
jax.block_until_ready(s)
print(f"v) 10 dispatches after: {(time.perf_counter()-t0)*1e3:.1f} ms")
