"""Run both Pallas kernels NON-interpreted on the real TPU and assert
equality with the host oracles (the reproducible form of the 'validated on
device' claim; CI runs the same checks in interpret mode on CPU).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/validate_pallas_on_device.py
"""

from pathlib import Path

import numpy as np

import jax

cache_dir = Path(__file__).parent.parent / "build" / "jax_cache"
jax.config.update("jax_compilation_cache_dir", str(cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.default_backend() != "cpu", "run this on the TPU"

from slam_process_tpu.io import read_hex_log
from slam_process_tpu.ops.decode import decode_frames_np, frame_capacity
from slam_process_tpu.ops.pallas_decode import decode_frames_pallas
from slam_process_tpu.ops.pallas_raster import pallas_rasterize_batch
from slam_process_tpu.ops.raster import (
    apply_colormap_float,
    blur_nan_aware_jax,
    colormap_lut,
    shifted_log_norm,
)

raw = read_hex_log(
    "/root/reference/debugDoc/256-0x16-Serial Debug 2026-01-26 164520.txt")
ref = decode_frames_np(raw)
frames, count = decode_frames_pallas(raw, frame_capacity(len(raw)),
                                     rows_per_chunk=512, interpret=False)
assert int(count) == ref.valid, (int(count), ref.valid)
np.testing.assert_array_equal(np.asarray(frames)[: ref.valid], ref.frames)
print(f"pallas decode on {jax.devices()[0].platform}: "
      f"{ref.valid} frames byte-exact")

rng = np.random.default_rng(0)
mats = rng.uniform(1.0, 4e6, size=(16, 64, 64)).astype(np.float32)
mats[rng.random(mats.shape) < 0.3] = np.nan
import jax.numpy as jnp
lut = jnp.asarray(colormap_lut("viridis"))
rgba_p, t_p = pallas_rasterize_batch(mats, lut, interpret=False)


def xla_one(m):
    b = blur_nan_aware_jax(m, 1.0)
    t = shifted_log_norm(b)
    return apply_colormap_float(t, lut), t


rgba_x, t_x = jax.jit(jax.vmap(xla_one))(mats)
both = np.isfinite(np.asarray(t_x)) & np.isfinite(np.asarray(t_p))
d = np.max(np.abs(np.asarray(t_p)[both] - np.asarray(t_x)[both]))
# Both paths are f32; the shifted-log norm amplifies ulp-level conv
# differences for cells near the global min, so compare against the
# BASELINE pixel budget (1e-3).  Measured 2.4e-4 on TPU v5e (round 2,
# after forcing the XLA conv to precision=HIGHEST — the bf16 default
# diverged by 0.076).
assert d < 1e-3, d
print(f"pallas raster on {jax.devices()[0].platform}: max |dt| = {d:.2e}")
print("OK")
