"""Device-plane adjudication of the corrector formulations (round 4).

Measures, at the real biggest-log session shape, the full
``correct_rows_jax`` chain under (a) the shipped capacity bounds
(max_groups=256, bmax=256) and (b) dataset-calibrated tight bounds
(max_groups=64, bmax=128 — dataset maxima are 58 groups / 93 baselines,
overflow falls back to host), plus the isolated sel+verdict segment as
XLA vs the fused Pallas kernel (ops/pallas_correct.py) in the new
residue/bf16 form.  All numbers from the xplane DEVICE plane.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/diag_correct_variants.py
"""

from __future__ import annotations

import functools
import json

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from slam_process_tpu.io import read_hex_log
    from slam_process_tpu.ops.correct import baseline_plane_verdicts, correct_rows_jax
    from slam_process_tpu.ops.decode import decode_rows_jax
    from slam_process_tpu.ops.pallas_correct import G_PAD, correct_planes_pallas
    from slam_process_tpu.utils.device_timing import measure_device_time

    logs = sorted(__import__("glob").glob("/root/reference/debugDoc/*.txt"))
    big = max(logs, key=lambda p: len(open(p, "rb").read()))
    raw = read_hex_log(big)
    arr = jnp.asarray(np.frombuffer(raw, np.uint8))
    rows, valid, count = jax.jit(decode_rows_jax)(arr)
    jax.block_until_ready(rows)
    f_pad = ((rows.shape[0] + 1023) // 1024) * 1024
    rows_p = jnp.pad(rows, ((0, f_pad - rows.shape[0]), (0, 0)))
    valid_p = jnp.pad(valid, (0, f_pad - valid.shape[0]))
    print(f"log={big.split('/')[-1]} rows={rows.shape[0]} f_pad={f_pad} "
          f"frames={int(count)}")

    results = {}

    def dev_ms(name, fn, *args):
        f = jax.jit(fn)
        out = f(*args)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        dt = measure_device_time(lambda i: jax.tree.leaves(f(*args))[0], n=5)
        results[name] = dt.median * 1e3
        print(f"{name:36s} {dt.median * 1e3:8.3f} ms", flush=True)
        return out

    for g, b, tag in [(256, 256, "shipped_256x256"), (64, 128, "tight_64x128"),
                      (128, 96, "mid_128x96")]:
        fn = functools.partial(correct_rows_jax, max_groups=g,
                               max_baselines_per_group=b)
        cbs, keep, ovf = dev_ms(f"correct_rows_xla_{tag}", fn, rows_p, valid_p)
        assert not bool(ovf), (g, b)
        if tag == "shipped_256x256":
            ref_cbs, ref_keep = np.asarray(cbs), np.asarray(keep)
        else:
            np.testing.assert_array_equal(np.asarray(cbs), ref_cbs)
            np.testing.assert_array_equal(np.asarray(keep), ref_keep)

    # Isolated sel+verdict segment: XLA vs Pallas at the same table shape.
    rng = np.random.default_rng(0)
    for bmax in (96, 128):
        w = ((3 * bmax + 1 + 127) // 128) * 128
        gid = jnp.asarray(np.sort(rng.integers(0, 60, f_pad)).astype(np.int32))
        clk = jnp.asarray(rng.integers(0, 1 << 30, f_pad).astype(np.int32))
        tbl = jnp.asarray(
            rng.integers(0, 240, (G_PAD, w)).astype(np.float32))

        def xla_seg(gid, clk, tbl, bmax=bmax):
            onehot = (gid[:, None] == jnp.arange(G_PAD)[None, :]
                      ).astype(jnp.bfloat16)
            sel = jnp.dot(onehot, tbl.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
            return baseline_plane_verdicts(sel, clk, bmax=bmax,
                                           cycle=61000, tol=500)

        ox = dev_ms(f"segment_xla_b{bmax}", xla_seg, gid, clk, tbl)
        op = dev_ms(
            f"segment_pallas_b{bmax}",
            functools.partial(correct_planes_pallas, bmax=bmax, cycle=61000,
                              tol=500),
            gid, clk, tbl)
        for a, b_ in zip(jax.tree.leaves(ox), jax.tree.leaves(op)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

    print(json.dumps(results))


if __name__ == "__main__":
    main()
