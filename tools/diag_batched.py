"""Diagnose the batched-dispatch anomaly (VERDICT round-1 weak #3).

The one-program whole-dataset executable measured ~1.197 s/call inside
bench but ~0.1 ms in a fresh process.  Hypotheses to discriminate:

  H1  outputs: the batched program returns ~200 MB of [S, cap] tensors
      (frames/keep/corrected_bs); the relay transport may fetch outputs
      eagerly, so per-call time ~ output bytes / tunnel bandwidth.
  H2  inputs: per-call re-commit of the 70 MB byte batch.
  H3  dispatch path: fixed per-call overhead unrelated to sizes.

Experiments: (a) full output pytree; (b) same program returning only the
small outputs (rgba/mean/counts/scalars); (c) small outputs + donated
inputs; (d) sequential per-session dispatch for cross-check.
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

DEBUGDOC = Path("/root/reference/debugDoc")
logs = sorted(glob.glob(str(DEBUGDOC / "*.txt")))
raw = [read_hex_log(p) for p in logs]
n_padded = max(len(r) for r in raw)
n_padded = ((n_padded + (1 << 20) - 1) >> 20) << 20
batch, lengths = stack_sessions(raw, n_padded)
total_frames = None
print(f"batch {batch.shape} = {batch.nbytes/1e6:.1f} MB padded bytes")

mesh = make_mesh((1, 1), ("data", "model"))
lut_j = jnp.asarray(colormap_lut("viridis"))

bfn = batched_session_pipeline(mesh, n_padded, max_groups=64,
                               max_baselines_per_group=96)


def timeit(label, fn, n=3):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{label}: {sorted(ts)[len(ts)//2]*1e3:.2f} ms  (trials: "
          + ", ".join(f"{t*1e3:.1f}" for t in ts) + ")")
    return out


with mesh:
    batch_dev = jax.device_put(batch)
    len_dev = jax.device_put(lengths)
    out = bfn(batch_dev, len_dev, lut_j)
    jax.block_until_ready(out.rgba)
    total_frames = int(jnp.sum(out.n_frames))
    print("total frames:", total_frames)
    out_bytes = sum(np.dtype(x.dtype).itemsize * int(np.prod(x.shape))
                    for x in jax.tree.leaves(out))
    print(f"full output pytree: {out_bytes/1e6:.1f} MB")

    # (a) full outputs
    timeit("a) full outputs      ", lambda: bfn(batch_dev, len_dev, lut_j), 5)

    # (b) small outputs only
    def small_body(b, n, l):
        o = bfn(b, n, l)
        return o.rgba, o.mean_grid, o.counts, o.n_frames, o.n_kept
    small = jax.jit(small_body)
    o = small(batch_dev, len_dev, lut_j); jax.block_until_ready(o)
    timeit("b) small outputs     ", lambda: small(batch_dev, len_dev, lut_j), 5)

    # (c) small outputs, fresh committed inputs each call (H2D included)
    timeit("c) small + H2D       ",
           lambda: small(jax.device_put(batch), jax.device_put(lengths), lut_j), 3)

    # (d) sequential per-session dispatch cross-check
    from slam_process_tpu.pipeline.device import run_session_on_device
    warm = [run_session_on_device(r) for r in raw]
    jax.block_until_ready([o.rgba for o in warm])
    del warm
    def seq():
        outs = [run_session_on_device(r) for r in raw]
        return [(o.rgba, o.n_frames) for o in outs]
    timeit("d) sequential dispatch", seq, 3)

    # (e) the big-output program but blocking only on rgba (does blocking
    # on a small leaf change anything? -> eager output fetch test)
    def call_block_rgba():
        o = bfn(batch_dev, len_dev, lut_j)
        return o.rgba
    timeit("e) full, block rgba  ", call_block_rgba, 3)

    # (f) pure dispatch overhead: trivial program on the big input
    triv = jax.jit(lambda b: (b[:, 0], b.shape[1]))
    o = triv(batch_dev); jax.block_until_ready(o)
    timeit("f) trivial on 70MB in", lambda: triv(batch_dev), 5)

    # (g) medium program: decode only (no correct/scene), small outputs
    from slam_process_tpu.ops.decode import decode_frames_jax, frame_capacity
    cap = frame_capacity(n_padded)
    dec = jax.jit(lambda b: jax.vmap(
        lambda x: decode_frames_jax(x, capacity=cap)[1])(b))
    o = dec(batch_dev); jax.block_until_ready(o)
    timeit("g) decode-only counts", lambda: dec(batch_dev), 5)
