"""Pallas row-compaction kernel == nonzero+gather, exactly.

ops/pallas_compact.py (the streaming carry compaction) must reproduce
``rows[mask][:capacity]`` zero-padded — pure integer data movement, so
any difference is a kernel bug.  Interpret mode runs here (CPU lane);
the real-chip run lives in tests/test_on_tpu.py.
"""

import numpy as np
import pytest

from slam_process_tpu.ops.pallas_compact import compact_rows_pallas


@pytest.mark.parametrize("seed,f,cap,dens", [
    (0, 2048, 512, 0.2),
    (1, 4096, 4096, 0.6),
    (2, 1024, 256, 0.9),      # overflow: masked count > capacity
    (3, 1024, 1024, 0.0),     # nothing masked
    (4, 8192, 512, 0.9),      # multi-block overflow: later blocks start
                              # past capacity (store-window clamp path)
])
def test_interpret_matches_gather(seed, f, cap, dens):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    rows = rng.integers(0, 1 << 30, (f, 5)).astype(np.int32)
    rows[:, 0] = rng.integers(0, 2, f)          # realistic field ranges
    mask = rng.random(f) < dens
    out = np.asarray(compact_rows_pallas(
        jnp.asarray(rows), jnp.asarray(mask), capacity=cap, interpret=True))
    ref = rows[mask][:cap]
    ref_pad = np.zeros((cap, 5), np.int32)
    ref_pad[:len(ref)] = ref
    np.testing.assert_array_equal(out, ref_pad)
