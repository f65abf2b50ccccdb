"""Stage-level roofline table: XLA device time vs the transfer/compute bound.

Round 3 shipped three Pallas kernels, all losing to XLA at shipped shapes.
The architecture rule ("hand-schedule only what the compiler demonstrably
does not") then predicts XLA is near the hardware bound on the hot stages —
this tool MEASURES that, so "XLA is the production path" is a calibrated
conclusion, not a default.

For every hot pipeline stage, run the isolated jitted program at the
shipped shape under measure_device_time, compute the stage's minimal HBM
traffic (inputs + outputs that MUST move, ignoring fusible intermediates)
and its MXU FLOPs, and report device time as a multiple of the roofline
bound  t_bound = max(bytes / BW, flops / PEAK)  using the calibrated
sustained bandwidth from tools/diag_roofline.py (743 GB/s, 91% of the
819 GB/s spec) and the chip's published bf16 peak derated for the
precision actually used.

Run:  PYTHONPATH=. python tools/diag_hot_ops.py
"""

from __future__ import annotations

import json

import numpy as np

BW = 743e9          # sustained HBM B/s, calibrated (diag_roofline.py)
PEAK_BF16 = 197e12  # v5e MXU peak FLOP/s
PEAK_F32H = PEAK_BF16 / 6.0   # precision=highest ~ 6-pass bf16 composition


def main() -> None:
    import jax
    import jax.numpy as jnp

    from slam_process_tpu.io import read_hex_log
    from slam_process_tpu.ops.correct import correct_rows_jax
    from slam_process_tpu.ops.decode import decode_rows_jax
    from slam_process_tpu.ops.raster import blur_nan_aware_jax, colormap_lut
    from slam_process_tpu.ops.scene import intensity_sums_jax
    from slam_process_tpu.ops.tokenize import (
        prepare_text,
        stride3_offset,
        text_bucket,
        tokenize_stride3_jax,
    )
    from slam_process_tpu.utils.device_timing import measure_device_time

    logs = sorted((__import__("glob").glob)(
        "/root/reference/debugDoc/*.txt"))
    big = max(logs, key=lambda p: len(open(p, "rb").read()))
    data = open(big, "rb").read()
    raw = read_hex_log(big)

    results = []

    def stage(name, fn, args, bytes_moved, flops, peak):
        f = jax.jit(fn)
        out = f(*args)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        dt = measure_device_time(
            lambda i: jax.tree.leaves(f(*args))[0], n=5)
        t = dt.median
        bound = max(bytes_moved / BW, flops / peak if peak else 0.0)
        results.append({
            "stage": name,
            "device_us": round(t * 1e6, 1),
            "bound_us": round(bound * 1e6, 1),
            "x_of_bound": round(t / bound, 2) if bound else None,
            "mbytes_min": round(bytes_moved / 1e6, 2),
            "gflops": round(flops / 1e9, 3),
        })

    # 1. Device tokenize (text -> token bytes), biggest log.
    p = stride3_offset(data)
    text, n_text = prepare_text(data, p, text_bucket(len(data) - p))
    text_d = jax.device_put(text)
    m = len(text)
    stage("tokenize_stride3", tokenize_stride3_jax,
          (text_d, jnp.int32(n_text)),
          bytes_moved=m + m // 3,
          flops=2 * (m // 384) * 384 * 128 * 2,   # two [*,384]x[384,128]
          peak=PEAK_BF16)

    # 2. Decode (bytes -> masked rows), biggest log.
    c = len(raw)
    raw_d = jax.device_put(raw)
    r = -(-c // 11)
    stage("decode_rows", lambda b: decode_rows_jax(b, n_valid=c)[0],
          (raw_d,),
          bytes_moved=c + r * (5 * 4 + 1),
          flops=0, peak=None)

    # 3. Correct (rows -> corrected + keep), biggest log's rows.
    rows_np, valid_np, _ = jax.jit(
        lambda b: decode_rows_jax(b, n_valid=c))(raw_d)
    rows_d = jax.device_put(rows_np)
    valid_d = jax.device_put(valid_np)
    t_rows = rows_np.shape[0]
    # Plane traffic: the [t, Bmax] one-hot score planes are the real
    # movement (two f32 planes at Bmax=96).
    stage("correct_rows",
          lambda rr, vv: correct_rows_jax(rr, vv, max_groups=64,
                                          max_baselines_per_group=96)[0],
          (rows_d, valid_d),
          bytes_moved=t_rows * 20 + t_rows * 5 + 2 * t_rows * 96 * 4,
          flops=0, peak=None)

    # 4. Intensity one-hot einsum (rows -> 64x64 sums+counts).
    corrected, keep, _ = jax.jit(
        lambda rr, vv: correct_rows_jax(rr, vv, max_groups=64,
                                        max_baselines_per_group=96))(
        rows_d, valid_d)
    stage("intensity_sums",
          lambda u, bsc, rs, k, f: intensity_sums_jax(u, bsc, rs, k, f),
          (rows_d[:, 1], corrected, rows_d[:, 3].astype(jnp.float32),
           keep, rows_d[:, 0]),
          bytes_moved=t_rows * (4 + 4 + 4 + 1 + 4) + 2 * 64 * 64 * 4
          + 2 * t_rows * 64 * 4,   # the two one-hot operands do move
          flops=2 * t_rows * 64 * 64 * 2,
          peak=PEAK_F32H)

    # 5. Blur (separable K@X@K^T at [64, 64]) — latency-bound, listed for
    # completeness.
    g = jnp.asarray(np.random.default_rng(0).random((64, 64)),
                    jnp.float32)
    stage("blur_nan_aware", lambda x: blur_nan_aware_jax(x, 1.0), (g,),
          bytes_moved=2 * 64 * 64 * 4,
          flops=4 * 64 * 64 * 64 * 2, peak=PEAK_F32H)

    # 6. LUT raster ([64, 64] norm + 256-entry LUT lookup).
    from slam_process_tpu.ops.raster import apply_colormap_float, shifted_log_norm

    lut = jnp.asarray(colormap_lut("viridis"))
    stage("raster_lut",
          lambda x, l: apply_colormap_float(shifted_log_norm(x), l),
          (g, lut),
          bytes_moved=64 * 64 * 4 + 64 * 64 * 16,
          flops=0, peak=None)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
