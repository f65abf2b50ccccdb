"""e2e ingest strategies, re-measured in clean transport mode (no reads)."""

import concurrent.futures as cf
import glob
import time
from pathlib import Path

import jax

cache_dir = Path(__file__).parent.parent / "build" / "jax_cache"
jax.config.update("jax_compilation_cache_dir", str(cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from slam_process_tpu.io import read_hex_log
from slam_process_tpu.pipeline.device import run_session_on_device

logs = sorted(glob.glob("/root/reference/debugDoc/*.txt"))

# warm compiles
warm = [run_session_on_device(read_hex_log(p)) for p in logs]
jax.block_until_ready([o.rgba for o in warm])
del warm

for trial in range(2):
    t0 = time.perf_counter()
    outs = [run_session_on_device(read_hex_log(p)) for p in logs]
    jax.block_until_ready([o.rgba for o in outs])
    seq = time.perf_counter() - t0
    del outs

    t0 = time.perf_counter()
    with cf.ThreadPoolExecutor(max_workers=4) as ex:
        raws = ex.map(read_hex_log, logs)
        outs = [run_session_on_device(r) for r in raws]
    jax.block_until_ready([o.rgba for o in outs])
    thr = time.perf_counter() - t0
    del outs

    # Fully prefetch all tokenized bytes first, then dispatch (bounds the
    # pure-dispatch share).
    t0 = time.perf_counter()
    with cf.ThreadPoolExecutor(max_workers=8) as ex:
        raws = list(ex.map(read_hex_log, logs))
    mid = time.perf_counter() - t0
    outs = [run_session_on_device(r) for r in raws]
    jax.block_until_ready([o.rgba for o in outs])
    pre = time.perf_counter() - t0
    del outs

    print(f"trial {trial}: sequential {seq*1e3:.0f} ms, overlapped(4) "
          f"{thr*1e3:.0f} ms, prefetch-all {pre*1e3:.0f} ms "
          f"(tokenize share {mid*1e3:.0f} ms)")
print("frames: 1072720")
