"""Sequence-scaling demonstration: device streaming over an unbounded log.

The reference slurps whole files; deployment streams are arbitrarily long
(SURVEY §5.7).  This generates a synthetic multi-hundred-MB 11-byte-format
stream in bounded host memory and replays it through the device-resident
streaming session, reporting throughput per 64 MiB segment — flat
throughput (no growth in per-byte cost, no host accumulation) is the
scaling claim.  The device state stays O(group_capacity) regardless of
stream length.

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
    python tools/bench_streaming_scale.py [total_mb]
"""

import sys
import time
from pathlib import Path

import numpy as np

import jax

cache_dir = Path(__file__).parent.parent / "build" / "jax_cache"
jax.config.update("jax_compilation_cache_dir", str(cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from slam_process_tpu.parallel.streaming_device import DeviceStreamingSession

TOTAL_MB = int(sys.argv[1]) if len(sys.argv) > 1 else 256
SEGMENT = 64 << 20


FRAMES_PER_BEAM = 32   # realistic dwell: ~2048-frame sweeps (real logs:
                       # 18k-100k frames over ~29-58 sweeps)


def synth_segment(rng, n_bytes: int, clk0: int, prev_rss: int):
    """Vectorized synthetic stream: valid frames with realistic CLK dwell
    and sweep length, deterministic baseline markers."""
    n_frames = n_bytes // 11
    clk = clk0 + np.cumsum(rng.integers(60_800, 61_200, n_frames))
    ue = (np.arange(n_frames) // FRAMES_PER_BEAM) % 64
    rss = rng.integers(1, 1 << 18, n_frames)
    flag = (ue == 1) & (np.arange(len(ue)) % FRAMES_PER_BEAM == 0)
    rss = np.where(flag, np.roll(rss, 1), rss)  # baseline repeats prev RSS
    bs = np.where(flag, (7 + clk // 61_000) % 64, 0x3F)

    frames = np.empty((n_frames, 11), dtype=np.uint8)
    frames[:, 0] = np.where(flag, 0xCC, 0x33)
    frames[:, 1] = ue
    frames[:, 2] = 0xC0 | (bs & 0x3F)
    for k in range(5):
        frames[:, 3 + k] = 0x40 | ((clk >> (6 * k)) & 0x3F)
    for k in range(3):
        frames[:, 8 + k] = 0x80 | ((rss >> (6 * k)) & 0x3F)
    return frames.reshape(-1), int(clk[-1]), int(rss[-1])


def main():
    rng = np.random.default_rng(0)
    s = DeviceStreamingSession(chunk_bytes=1 << 22, group_capacity=8192,
                               max_groups=512)
    # Warm compile on one small segment.
    seg, clk, prev = synth_segment(rng, 1 << 20, 1_000_000, 500)
    s.feed(seg)
    s.block_until_ready()

    total = 0
    t_all = time.perf_counter()
    while total < TOTAL_MB << 20:
        t0 = time.perf_counter()
        seg, clk, prev = synth_segment(rng, SEGMENT, clk, prev)
        gen_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        s.feed(seg)
        s.block_until_ready()
        dt = time.perf_counter() - t0
        total += len(seg)
        print(f"{total >> 20:5d} MiB: {len(seg)/11/dt/1e6:7.1f} M frames/s "
              f"(segment feed {dt*1e3:6.1f} ms; host synth {gen_s*1e3:.0f} ms)")
    s.finalize()
    wall = time.perf_counter() - t_all
    n = s.n_frames
    print(f"total: {n} frames, {total/1e6:.0f} MB, overflow={s.overflow}, "
          f"kept={s.n_kept}, groups={s.n_groups}")
    print(f"device-feed throughput excludes host synthesis; "
          f"wall incl. synthesis: {n/wall/1e6:.1f} M frames/s")


if __name__ == "__main__":
    main()
