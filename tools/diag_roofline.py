"""Calibrate true HBM read bandwidth + the pipeline's true device time.

Round-2 claimed the whole-dataset program was "input-read-bound at ~1.56 TB/s
effective HBM bandwidth", but the device self-reports as "TPU v5 lite" (v5e,
819 GB/s HBM spec) -- the measurement and the spec could not both be right
(VERDICT r02, Weak #3).  This tool settles it.

Finding (2026-08-16, this chip): **wall-timing `block_until_ready` does NOT
bound device execution on the axon relay.**  A chained program with K
iterations of a full 256 MB read takes the SAME wall time at K=2 and K=520
under block_until_ready (zero slope; Part 1 reproduces the absurd >5 TB/s
"reads" round 2 trusted).  Only a D2H `device_get` of a value data-dependent
on the work actually synchronizes.  Everything round 2 timed with
block-and-no-read (the 65-122 us "whole dataset" numbers, the 1.56 TB/s
"effective bandwidth") measured dispatch+ack, not execution.

The trustworthy method (Part 2):
  * K iterations INSIDE one program (lax.fori_loop), each iteration's input
    data-dependent on the previous iteration's output -- XLA cannot hoist
    the body, and the relay sees one opaque program;
  * synchronize with device_get of the final chained scalar;
  * difference two K values so per-call overhead (dispatch, relay ack,
    degraded-read mode) cancels:  per_iter = (t(K_hi)-t(K_lo))/(K_hi-K_lo);
  * keep the big buffer device-resident across timed calls (vary only the
    chained seed scalar) so no H2D lands inside the timed region.

Calibrated results on this chip (TPU v5 lite, median of 4):
  chained 256 MB xor-sum read:  ~361 us/iter  -> ~743 GB/s true read
                                   (91% of the 819 GB/s v5e spec -- sane)
  whole-dataset pipeline: measured by tools/diag_device_time.py instead
  (xplane device plane) -- 1.17 s per x1 execution, gather-fusion-bound.
"""

import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

cache_dir = Path(__file__).parent.parent / "build" / "jax_cache"
jax.config.update("jax_compilation_cache_dir", str(cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

dev = jax.devices()[0]
print(f"device: {dev.device_kind} (platform {dev.platform})")
print("spec HBM BW: v5e=819 GB/s, v6e=1640 GB/s, v4=1228 GB/s")

V5E_SPEC_GBS = 819.0

# Absorb the relay's first-read penalty (observed: tens of seconds for the
# FIRST D2H read of the process) before anything is timed.
t0 = time.perf_counter()
jax.device_get(jnp.zeros(()))
print(f"first-read penalty absorbed: {time.perf_counter()-t0:.1f} s")


def chained_read_program(K):
    """K chained full reads of x: iteration i xors x with a key derived from
    the running sum, so no iteration can be hoisted, cached, or elided."""

    def body(i, s):
        key = (s & jnp.int32(0xFF)).astype(jnp.uint8)
        return (s + jnp.sum((xr[0] ^ key).astype(jnp.int32))) & jnp.int32(0x7FFFFFFF)

    def run(x, s0):
        xr[0] = x
        return jax.lax.fori_loop(0, K, body, s0)

    xr = [None]
    return jax.jit(run)


# ---------------------------------------------------------------------------
print()
print("== PART 1: why naive timing lies on this relay ==")
base = np.random.randint(0, 255, size=256 << 20, dtype=np.uint8)
x = jax.device_put(base)
for K in (2, 64):
    f = chained_read_program(K)
    jax.block_until_ready(f(x, jnp.int32(0)))  # warm
    t0 = time.perf_counter()
    out = f(x, jnp.int32(1))
    jax.block_until_ready(out)
    t_block = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = jax.device_get(f(x, jnp.int32(2)))
    t_read = time.perf_counter() - t0
    gbs = K * (256 << 20) / t_block / 1e9
    print(f"  K={K:3d}: block_until_ready {t_block*1e6:9.1f} us "
          f"('{gbs:,.0f} GB/s' -- impossible)   device_get {t_read*1e6:9.1f} us")
print("  -> block_until_ready returns before execution; only a D2H read syncs.")

# ---------------------------------------------------------------------------
print()
print("== PART 2: chained timing, device_get-synced, K-slope ==")


def slope(f_lo, f_hi, k_lo, k_hi, args_of, reps=4):
    ts = []
    for rep in range(reps):
        t = {}
        for name, f in (("lo", f_lo), ("hi", f_hi)):
            a = args_of(100 + 2 * rep + (name == "hi"))
            t0 = time.perf_counter()
            jax.device_get(f(*a))
            t[name] = time.perf_counter() - t0
        ts.append((t["hi"] - t["lo"]) / (k_hi - k_lo))
    ts.sort()
    return ts[len(ts) // 2], ts


print("-- read control: 256 MB xor-sum per iteration --")
KLO, KHI = 8, 520
flo, fhi = chained_read_program(KLO), chained_read_program(KHI)
jax.device_get(flo(x, jnp.int32(0)))  # warm
jax.device_get(fhi(x, jnp.int32(0)))
per_iter, all_slopes = slope(flo, fhi, KLO, KHI, lambda s: (x, jnp.int32(s)))
bw = (256 << 20) / per_iter / 1e9
print(f"  per-iteration {per_iter*1e6:8.1f} us -> {bw:6.1f} GB/s true read "
      f"({100*bw/V5E_SPEC_GBS:.0f}% of v5e spec)")
print(f"  (slopes us: {[f'{s*1e6:.0f}' for s in all_slopes]})")
del x


# ---------------------------------------------------------------------------
# The pipeline's own true device time is measured by tools/diag_device_time.py
# (xplane device-plane trace parsing): chained K-slope variants of the full
# pipeline crash the relay's TPU worker at K>=34 (long-program watchdog), and
# the trace is the cleaner instrument anyway.  Findings live in that tool's
# docstring: x1 dataset = 1.17 s device time, gather-fusion-bound (~917k
# frames/s true), i.e. ~20,000x above the 54 us input-read bound measured
# here -- the program is NOT input-read-bound as round 2 claimed.
print()
print("pipeline device time: run tools/diag_device_time.py (xplane-based)")
