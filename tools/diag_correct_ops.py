"""Per-op device-time breakdown of correct_rows_jax at the biggest-log
shape (tight bounds), to locate the residual 10x-of-roofline cost.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/diag_correct_ops.py
"""

from __future__ import annotations

import functools
import tempfile

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from slam_process_tpu.io import read_hex_log
    from slam_process_tpu.ops.correct import correct_rows_jax
    from slam_process_tpu.ops.decode import decode_rows_jax
    from slam_process_tpu.utils.device_timing import op_device_times

    logs = sorted(__import__("glob").glob("/root/reference/debugDoc/*.txt"))
    big = max(logs, key=lambda p: len(open(p, "rb").read()))
    raw = read_hex_log(big)
    arr = jnp.asarray(np.frombuffer(raw, np.uint8))
    rows, valid, _ = jax.jit(decode_rows_jax)(arr)
    f_pad = ((rows.shape[0] + 1023) // 1024) * 1024
    rows_p = jnp.pad(rows, ((0, f_pad - rows.shape[0]), (0, 0)))
    valid_p = jnp.pad(valid, (0, f_pad - valid.shape[0]))

    fn = jax.jit(functools.partial(correct_rows_jax, max_groups=64,
                                   max_baselines_per_group=96))
    out = fn(rows_p, valid_p)
    jax.block_until_ready(out[0])

    d = tempfile.mkdtemp(prefix="corr_ops_")
    with jax.profiler.trace(d):
        for _ in range(3):
            out = fn(rows_p, valid_p)
        jax.device_get(out[0])
    ops = op_device_times(d)
    total = sum(ops.values())
    print(f"total op device time (3 runs): {total * 1e3:.3f} ms")
    for name, t in sorted(ops.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{t / 3 * 1e6:9.1f} us  {name}")


if __name__ == "__main__":
    main()
