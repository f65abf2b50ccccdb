"""Re-measure fused Pallas raster vs XLA at the round-2 shapes.

Round-1 measured the Pallas kernel losing at a single 64x64 raster; the
predicted crossover was the larger batched workload (sweeps as a leading
axis, or the 100x100 RBF grids).  Timed clean (no D2H reads before the
timing; block-only sync).
"""

import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

cache_dir = Path(__file__).parent.parent / "build" / "jax_cache"
jax.config.update("jax_compilation_cache_dir", str(cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from slam_process_tpu.ops.pallas_raster import pallas_rasterize_batch
from slam_process_tpu.ops.raster import (
    apply_colormap_float,
    blur_nan_aware_jax,
    colormap_lut,
    linear_norm,
    shifted_log_norm,
)

lut = jnp.asarray(colormap_lut("viridis"))
rng = np.random.default_rng(0)


def xla_batch(mats, lut, use_log=True):
    def one(m):
        b = blur_nan_aware_jax(m, 1.0)
        t = shifted_log_norm(b) if use_log else linear_norm(b)
        return apply_colormap_float(t, lut), t
    return jax.vmap(one)(mats)


xla_j = jax.jit(xla_batch)

for (s, h, w) in [(32, 64, 64), (256, 64, 64), (32, 100, 100),
                  (256, 100, 100), (1024, 100, 100)]:
    mats = rng.uniform(1.0, 4e6, size=(s, h, w)).astype(np.float32)
    mats[rng.random((s, h, w)) < 0.3] = np.nan
    md = jax.device_put(mats)

    o = xla_j(md, lut); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(10):
        o = xla_j(md, lut)
    jax.block_until_ready(o)
    xla_t = (time.perf_counter() - t0) / 10

    try:
        o = pallas_rasterize_batch(md, lut); jax.block_until_ready(o)
        t0 = time.perf_counter()
        for _ in range(10):
            o = pallas_rasterize_batch(md, lut)
        jax.block_until_ready(o)
        pl_t = (time.perf_counter() - t0) / 10
        note = ""
    except Exception as e:
        pl_t, note = float("nan"), f"  PALLAS ERR: {type(e).__name__}: {e}"
    print(f"[{s:5d},{h},{w}] xla {xla_t*1e6:9.1f} us   pallas "
          f"{pl_t*1e6:9.1f} us   ratio {pl_t/xla_t:6.2f}{note}"[:200])
