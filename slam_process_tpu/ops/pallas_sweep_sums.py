"""Pallas kernel for per-sweep intensity (sums, counts) accumulation.

``ops/scene.intensity_per_sweep_sums_jax``'s XLA formulation is a
``lax.scan`` over sweep lanes whose body einsum re-reads the materialized
[F, 64] UE/BS one-hots from HBM every iteration — per-op profiling of the
streaming collect_paths mode (tools/diag_streaming_paths.py) measured
that scan at ~290 ms of the 394 ms dataset pass (~8.6 ms per 1 MiB chunk
step: 65 iterations x ~50 MB of one-hot re-reads).  The same scan also
dominates the offline per-sweep estimation pass.

This kernel computes the whole [S, U, B] accumulation in ONE pass over
the rows: per 512-row block it builds the flattened (sweep x UE) one-hot
[R, S*64] directly IN VMEM (never materialized to HBM), multiplies on
the MXU against a [R, 256] right operand packing the BS one-hot times
the RSS value's three 8-bit limbs and a ones channel, and accumulates
into a VMEM-resident [S*64, 256] f32 output across sequential grid
steps.  HBM traffic is just the row streams (~16 B/row); compute is a
single bf16 MXU contraction (~F * S*64 * 256 MACs).

Exactness: RSS is an integer < 2^18 (18-bit wire field), so its 8-bit
limbs are bf16-exact (bf16 holds integers up to 2^8), every product is
one exact bf16 value times a {0, 1} one-hot, and the f32 accumulation
of per-cell limb partial sums stays exact far beyond the dataset's cell
counts (the recombination 65536*hi + 256*mid + lo is exact while cell
sums < 2^24 — the same bound the f32 scan formulation carries).  The kernel therefore returns bit-identical
(sums, counts) to the scan (asserted in tests/test_pallas_sweep_sums.py
and on chip in tests/test_on_tpu.py).

Reference semantics: the per-sweep pivot mean feeding
heatmap_gemini_v1-7.py:108-160's estimator, sweep-resolved (SURVEY
beyond-reference per-sweep estimation axis).
"""

from __future__ import annotations

import functools

__all__ = ["sweep_sums_pallas"]

BLOCK_F = 1024   # 1-D i32 inputs carry XLA's T(1024) layout; smaller
                 # blocks fail Mosaic's operand-layout verification

LOCAL_WINDOW = 512   # block-local one-hot width (8 sweeps x 64 beams):
                     # kept-row p streams are nondecreasing (gid is a
                     # boundary cumsum), so a 1024-row block spans few
                     # sweeps; the narrow window cuts the kernel 2.7x
                     # on chip (496 vs 1353 us at [104448]/width 4224 —
                     # the one-hot builds bound it now, not the MXU
                     # contraction; 28.5 -> 10.3 ms over the dataset
                     # collect_paths replay).  Blocks that DO span more
                     # sweeps raise the kernel's spill flag and the
                     # wrapper re-runs the exact full-width kernel.


def _kernel(p_ref, bs_ref, val_ref, out_ref, *, width: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    p = p_ref[:]                          # [R] i32, -1 for dropped rows
    bs = bs_ref[:]                        # [R] i32 in [0, 64)
    val = val_ref[:]                      # [R] i32 RSS < 2^18

    # Flattened (sweep, UE) one-hot, generated in VMEM: a dropped row's
    # p = -1 matches no column, so masking needs no extra operand.
    # All minor-dim insertions ([R] -> [R, 1]) happen on 32-bit values and
    # the bf16 casts are 2-D elementwise — Mosaic rejects non-no-op minor
    # dim insertion on 16-bit types.
    p_iota = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
    oh_p = jnp.where(p[:, None] == p_iota, jnp.float32(1), jnp.float32(0)
                     ).astype(jnp.bfloat16)                   # [R, W]
    b_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 64), 1)
    oh_b = jnp.where(bs[:, None] == b_iota, jnp.float32(1), jnp.float32(0))

    # Three 8-bit limbs: bf16 holds integers exactly only up to 2^8, so
    # 9-bit limbs would round (caught by the parity test); products of a
    # {0, 1} one-hot and an 8-bit limb are exact in f32 and stay exact
    # through the 2-D f32 -> bf16 cast.
    hi = (val >> 16).astype(jnp.float32)                      # < 4
    mid = ((val >> 8) & 255).astype(jnp.float32)              # < 256: exact
    lo = (val & 255).astype(jnp.float32)
    y = jnp.concatenate(
        [oh_b * hi[:, None], oh_b * mid[:, None], oh_b * lo[:, None],
         oh_b], axis=1).astype(jnp.bfloat16)                  # [R, 256]

    out_ref[:] += jax.lax.dot_general(
        oh_p, y, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                   # [W, 256]


def _kernel_local(p_ref, bs_ref, val_ref, out_ref, spill_ref, *,
                  width: int, wl: int):
    """Block-local variant: one-hot only over a ``wl``-column window
    anchored at the block's min kept p (64-aligned), accumulated into
    the full-width VMEM output at a dynamic sublane offset.  Exact for
    any block whose kept p span fits the window; otherwise sets the
    spill flag (the wrapper falls back to the full-width kernel)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)
        spill_ref[:] = jnp.zeros_like(spill_ref)

    p = p_ref[:]                          # [R] i32, -1 for dropped rows
    bs = bs_ref[:]                        # [R] i32 in [0, 64)
    val = val_ref[:]                      # [R] i32 RSS < 2^18

    kept = p >= 0
    big = jnp.int32(1 << 30)
    pmin = jnp.min(jnp.where(kept, p, big))
    # 64-aligned window base (sweep-aligned => 8-sublane aligned for the
    # f32 out tile); clamp so the window stays inside [0, width).
    base = jnp.minimum((pmin // 64) * 64, jnp.int32(width - wl))
    base = jnp.maximum(base, jnp.int32(0))
    local = p - base                      # dropped rows go negative
    spill = jnp.any(kept & (local >= wl))
    spill_ref[:] = spill_ref[:] | (
        jnp.zeros((8, 128), jnp.int32) + spill.astype(jnp.int32))

    l_iota = jax.lax.broadcasted_iota(jnp.int32, (1, wl), 1)
    oh_p = jnp.where(local[:, None] == l_iota, jnp.float32(1),
                     jnp.float32(0)).astype(jnp.bfloat16)       # [R, wl]
    b_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 64), 1)
    oh_b = jnp.where(bs[:, None] == b_iota, jnp.float32(1), jnp.float32(0))
    hi = (val >> 16).astype(jnp.float32)
    mid = ((val >> 8) & 255).astype(jnp.float32)
    lo = (val & 255).astype(jnp.float32)
    y = jnp.concatenate(
        [oh_b * hi[:, None], oh_b * mid[:, None], oh_b * lo[:, None],
         oh_b], axis=1).astype(jnp.bfloat16)                    # [R, 256]

    acc = jax.lax.dot_general(
        oh_p, y, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                     # [wl, 256]
    # base is 64-aligned by construction (sweep-aligned window, and the
    # clamp operands width - wl / 0 are 128- and 64-multiples); Mosaic
    # needs the alignment stated to allow the dynamic sublane offset.
    idx = (pl.ds(pl.multiple_of(base, 64), wl), slice(None))
    out_ref[idx] = out_ref[idx] + acc


def _call_local(p, bs, val, *, width: int, interpret: bool, block_f: int,
                wl: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    f = p.shape[0]
    assert f % block_f == 0, f
    kernel = functools.partial(_kernel_local, width=width, wl=wl)
    return pl.pallas_call(
        kernel,
        grid=(f // block_f,),
        in_specs=[
            pl.BlockSpec((block_f,), lambda i: (i,)),
            pl.BlockSpec((block_f,), lambda i: (i,)),
            pl.BlockSpec((block_f,), lambda i: (i,)),
        ],
        out_specs=[
            pl.BlockSpec((width, 256), lambda i: (0, 0)),
            pl.BlockSpec((8, 128), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((width, 256), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.int32),
        ],
        interpret=interpret,
    )(p, bs, val)


def _call_auto(p, bs, val, *, width: int, interpret: bool, block_f: int,
               wl: int):
    """Narrow kernel first; exact full-width fallback iff any block's
    kept p span exceeded the local window (lax.cond executes only the
    taken branch, so the wide contraction costs nothing on the sorted
    streams every production caller feeds)."""
    import jax

    out, spill = _call_local(p, bs, val, width=width, interpret=interpret,
                             block_f=block_f, wl=wl)
    return jax.lax.cond(
        spill[0, 0] > 0,
        lambda: _call(p, bs, val, width=width, interpret=interpret,
                      block_f=block_f),
        lambda: out)


@functools.lru_cache(maxsize=32)
def _build(width: int, interpret: bool, block_f: int):
    import jax

    from slam_process_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    if width > LOCAL_WINDOW:
        return jax.jit(functools.partial(
            _call_auto, width=width, interpret=interpret, block_f=block_f,
            wl=LOCAL_WINDOW))
    return jax.jit(functools.partial(
        _call, width=width, interpret=interpret, block_f=block_f))


def _call(p, bs, val, *, width: int, interpret: bool, block_f: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    f = p.shape[0]
    assert f % block_f == 0, f
    kernel = functools.partial(_kernel, width=width)
    return pl.pallas_call(
        kernel,
        grid=(f // block_f,),
        in_specs=[
            pl.BlockSpec((block_f,), lambda i: (i,)),
            pl.BlockSpec((block_f,), lambda i: (i,)),
            pl.BlockSpec((block_f,), lambda i: (i,)),
        ],
        out_specs=pl.BlockSpec((width, 256), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((width, 256), jnp.float32),
        interpret=interpret,
    )(p, bs, val)


def sweep_sums_pallas(p, bs, val, *, max_sweeps: int, n_beams: int = 64,
                      interpret: bool = False, block_f: int = BLOCK_F):
    """Per-sweep (sums, counts) [S, U, B] from flattened row streams.

    p: [F] i32 = gid * n_beams + ue for counted rows, -1 for dropped
    ones (validity, bounds, and padding all fold into p); bs: [F] i32 in
    [0, n_beams); val: [F] i32 RSS (integer < 2^18).  F must be a
    ``block_f`` multiple (callers pad with p = -1).  Returns
    (sums [S, U, B] f32, counts [S, U, B] f32) — exact integer values,
    bit-identical to the scan formulation.
    """
    import jax.numpy as jnp

    assert n_beams == 64, "one-hot right operand is laid out for 64 beams"
    width = ((max_sweeps * n_beams + 127) // 128) * 128
    out = _build(width, interpret, block_f)(p, bs, val)
    out = out[: max_sweeps * n_beams]
    hi = out[:, :64].reshape(max_sweeps, n_beams, 64)
    mid = out[:, 64:128].reshape(max_sweeps, n_beams, 64)
    lo = out[:, 128:192].reshape(max_sweeps, n_beams, 64)
    counts = out[:, 192:].reshape(max_sweeps, n_beams, 64)
    return hi * 65536.0 + mid * 256.0 + lo, counts
