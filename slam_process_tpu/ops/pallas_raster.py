"""Fused Pallas raster kernel: blur + shifted-log norm + colormap in VMEM.

The XLA pipeline in ops/raster.py lowers to several HBM round trips when
vmapped across many sweeps (pad -> two convs -> reductions -> norm -> LUT
gather).  This kernel keeps one sweep's 64x64 tile resident in VMEM and
does the whole raster in a single pass per grid step:

  grid = (S,)   one program per sweep
  in:  matrix [S, 64, 64] f32 (NaN = empty cell), lut [256, 4] f32
  out: rgba   [S, 64, 64, 4] f32, norm_t [S, 64, 64] f32

Blur is the NaN-aware normalized convolution (excel_heatmap.py:322-354
semantics: replicate padding, mask-weighted kernel) unrolled as K*K
shifted multiply-adds over a padded VMEM scratch — pure VPU work.  The
colormap lookup is expressed as a one-hot [4096, 256] x [256, 4] matmul so
it runs on the MXU instead of a serializing gather.

Tested against the XLA reference in interpret mode and on-device
(tests/test_pallas_raster.py).

PRODUCTION NOTE (measured on TPU v5e, 2026-08-16): at this op size
(64x64 tiles) XLA's own fusion is dramatically faster — 0.3 us/sweep for
the jitted ops/raster.py path vs 310 us/sweep for this kernel (the one-hot
LUT contraction at HIGHEST precision dominates).  The engine therefore
ships the XLA path as the default raster; this kernel is kept as a
correctness-validated reference for the fused-VMEM pattern.

ROUND-2 RE-MEASUREMENT at the predicted crossover shapes
(tools/diag_pallas_raster.py, TPU v5e, clean transport, block-only sync):
the crossover does not materialize.  Batched over sweeps this kernel
closes most of the gap but still loses ~2x (vmapped XLA vs this kernel,
whole-batch wall time: [32,64,64] 58 us vs 122 us; [256,64,64] 47 us vs
91 us — both are dispatch-latency-bound, XLA fuses the batch into one
loop), and at the 100x100 RBF-grid raster Mosaic rejects the lane-
misaligned (non-128-multiple) W dimension (remote_compile HTTP 500), so
this kernel would additionally need lane padding there while XLA handles
it natively at ~39 us.  Verdict unchanged: XLA is the production raster
at every shipped shape.
"""

from __future__ import annotations

import functools

import numpy as np

from slam_process_tpu.ops.raster import gaussian_kernel_np


def _raster_kernel(mat_ref, lut_ref, rgba_ref, t_ref, pad_ref, pmask_ref,
                   *, kernel: np.ndarray, h: int, w: int, use_log: bool):
    import jax.numpy as jnp

    kh, kw = kernel.shape
    ph, pw = kh // 2, kw // 2

    mat = mat_ref[0]
    finite = ~jnp.isnan(mat)
    filled = jnp.where(finite, mat, 0.0)
    maskf = finite.astype(jnp.float32)

    # Replicate-pad into VMEM scratch with static slice copies (Mosaic has
    # no general gather): interior first, then edge rows, then full-height
    # edge columns (which also fills the corners).
    for ref, val in ((pad_ref, filled * maskf), (pmask_ref, maskf)):
        ref[ph : ph + h, pw : pw + w] = val
        for r in range(ph):
            ref[r, pw : pw + w] = val[0]
            ref[ph + h + r, pw : pw + w] = val[h - 1]
        col_l = ref[:, pw]
        col_r = ref[:, pw + w - 1]
        for c in range(pw):
            ref[:, c] = col_l
            ref[:, pw + w + c] = col_r

    num = jnp.zeros((h, w), dtype=jnp.float32)
    den = jnp.zeros((h, w), dtype=jnp.float32)
    for dy in range(kh):
        for dx in range(kw):
            wgt = float(kernel[dy, dx])
            num += wgt * pad_ref[dy : dy + h, dx : dx + w]
            den += wgt * pmask_ref[dy : dy + h, dx : dx + w]
    blurred = jnp.where(den > 1e-12, num / jnp.maximum(den, 1e-30), jnp.nan)

    bfin = ~jnp.isnan(blurred)
    big = jnp.where(bfin, blurred, jnp.inf)
    small = jnp.where(bfin, blurred, -jnp.inf)
    mn = jnp.min(big)
    mx = jnp.max(small)
    if use_log:
        shifted = blurred - mn + 1e-6
        log_lo = jnp.log(jnp.float32(1e-6))
        log_hi = jnp.log(jnp.maximum(mx - mn + 1e-6, 1e-30))
        t = (jnp.log(jnp.maximum(shifted, 1e-30)) - log_lo) / jnp.maximum(
            log_hi - log_lo, 1e-30
        )
    else:
        t = (blurred - mn) / jnp.maximum(mx - mn, 1e-30)
    t = jnp.clip(t, 0.0, 1.0)
    t_ref[0] = jnp.where(bfin, t, jnp.nan)

    # Colormap as a one-hot contraction (no flattening reshape — Mosaic has
    # no general shape cast): one-hot [h, w, n] built with broadcasted iota,
    # contracted with the LUT on the trailing axis.
    import jax

    n_lut = lut_ref.shape[0]
    x = jnp.where(bfin, t, 0.0)
    idx = jnp.clip((x * n_lut).astype(jnp.int32), 0, n_lut - 1)
    lut_ids = jax.lax.broadcasted_iota(jnp.int32, (h, w, n_lut), 2)
    onehot = (idx[:, :, None] == lut_ids).astype(jnp.float32)
    rgba = jax.lax.dot_general(
        onehot, lut_ref[...],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # MXU bf16 would round the LUT
    )
    # Cast BEFORE adding the minor dim: Mosaic only supports non-no-op
    # minor-dim insertion for 32-bit types (bool is packed).
    rgba_ref[0] = rgba * bfin.astype(jnp.float32)[:, :, None]


@functools.lru_cache(maxsize=8)
def _build(s: int, h: int, w: int, sigma: float, use_log: bool,
           interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = gaussian_kernel_np(sigma).astype(np.float32)
    kh, kw = kernel.shape
    body = functools.partial(_raster_kernel, kernel=kernel, h=h, w=w,
                             use_log=use_log)

    fn = pl.pallas_call(
        body,
        grid=(s,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((256, 4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, h, w, 4), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((s, h, w, 4), jnp.float32),
            jax.ShapeDtypeStruct((s, h, w), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((h + kh - 1, w + kw - 1), jnp.float32),
            pltpu.VMEM((h + kh - 1, w + kw - 1), jnp.float32),
        ],
        interpret=interpret,
    )
    from slam_process_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    return jax.jit(fn)


def pallas_rasterize_batch(matrices, lut, blur_sigma: float = 1.0,
                           use_log: bool = True, interpret: bool = False):
    """[S, H, W] intensity batch -> (rgba [S, H, W, 4], norm_t [S, H, W])."""
    import jax.numpy as jnp

    matrices = jnp.asarray(matrices, dtype=jnp.float32)
    s, h, w = matrices.shape
    fn = _build(s, h, w, float(blur_sigma), bool(use_log), bool(interpret))
    rgba, t = fn(matrices, jnp.asarray(lut, dtype=jnp.float32))
    return rgba, t
