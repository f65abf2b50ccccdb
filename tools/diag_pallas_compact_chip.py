"""On-chip adjudication of the Pallas carry-compaction kernel.

ops/pallas_compact.py landed while the relay was down: it is
interpret-validated (bit-exact) and wired behind ``compact_engine=``, but
"auto" keeps resolving to the XLA nonzero+gather formulation until the
kernel (a) compiles on real Mosaic and (b) measurably wins at the
production shape.  This tool settles both on the device plane:

  1. compile + bit-exact parity at the streaming step's production shape
     (the ``-m tpu`` sentinel's check, standalone);
  2. device-plane timing of kernel vs XLA formulation at that shape
     (the XLA path measured ~0.7 ms per 1 MiB step / ~18 ms per dataset
     replay in round 4's collect_paths profile);
  3. a printed verdict: flip ``compact_engine="auto"`` to pick the kernel
     on TPU (parallel/streaming_device.py marks the exact spot) only if
     the kernel wins.

Run:  PYTHONPATH=/root/.axon_site:/root/repo python tools/diag_pallas_compact_chip.py
"""

import json
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

cache_dir = Path(__file__).parent.parent / "build" / "jax_cache"
jax.config.update("jax_compilation_cache_dir", str(cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.default_backend() != "cpu", "run this on the TPU"

from slam_process_tpu.ops.pallas_compact import BLOCK_F, compact_rows_pallas
from slam_process_tpu.utils.device_timing import measure_device_time


def xla_compact(rows, mask, capacity):
    t = rows.shape[0]
    src = jnp.nonzero(mask, size=capacity, fill_value=t)[0]
    rows_pad = jnp.concatenate([rows, jnp.zeros((1, 5), jnp.int32)])
    return rows_pad[src]


def main() -> None:
    rng = np.random.default_rng(7)
    # Production shape: gcap(4096) + 1 MiB-chunk rows, padded to BLOCK_F.
    t_raw = 4096 + (1 << 20) // 11 + 1
    t = ((t_raw + BLOCK_F - 1) // BLOCK_F) * BLOCK_F
    cap = 4096
    rows = rng.integers(0, 1 << 30, (t, 5)).astype(np.int32)
    mask = np.zeros(t, bool)
    mask[-6000:] = rng.random(6000) < 0.6       # open-sweep-like tail

    rows_d, mask_d = jnp.asarray(rows), jnp.asarray(mask)

    # 1. compile + parity (non-interpreted)
    out = np.asarray(compact_rows_pallas(rows_d, mask_d, capacity=cap,
                                         interpret=False))
    ref = rows[mask][:cap]
    ref_pad = np.zeros((cap, 5), np.int32)
    ref_pad[: len(ref)] = ref
    np.testing.assert_array_equal(out, ref_pad)
    print("parity: OK (bit-exact at the production shape)")

    # 2. device-plane timing, kernel vs XLA formulation
    pal = jax.jit(lambda r, m: compact_rows_pallas(r, m, capacity=cap,
                                                   interpret=False))
    xla = jax.jit(lambda r, m: xla_compact(r, m, cap))
    jax.block_until_ready(pal(rows_d, mask_d))
    jax.block_until_ready(xla(rows_d, mask_d))
    t_pal = measure_device_time(lambda i: pal(rows_d, mask_d), n=7).median
    t_xla = measure_device_time(lambda i: xla(rows_d, mask_d), n=7).median

    verdict = {
        "shape": [int(t), 5],
        "capacity": cap,
        "pallas_us": round(t_pal * 1e6, 1),
        "xla_us": round(t_xla * 1e6, 1),
        "speedup_pallas_over_xla": round(t_xla / t_pal, 2),
        "kernel_wins": bool(t_pal < t_xla),
    }
    print(json.dumps(verdict))
    if verdict["kernel_wins"]:
        print("-> flip 'auto' to the Pallas kernel on TPU: see the "
              "compact_engine comment in parallel/streaming_device.py, "
              "then re-run bench.py (streaming modes) and the -m tpu lane")
    else:
        print("-> XLA stays production; record these numbers in "
              "ops/pallas_compact.py's docstring and docs/STATUS.md "
              "(the honest-no-win path)")


if __name__ == "__main__":
    main()
