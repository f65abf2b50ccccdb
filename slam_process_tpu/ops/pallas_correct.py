"""Fused Pallas kernel for the corrector's baseline-plane chain.

``ops/correct.correct_rows_jax`` computes, for every frame row, the best
CLK-residual baseline in its sweep group via an exact one-hot MXU matmul
and a [F, Bmax] score-plane reduction.  Under XLA that chain materializes
the [F, W] selection matmul output and two [F, Bmax] plane intermediates
in HBM (the matmul output cannot fuse into its consumers), ~4 ms of the
25 ms whole-dataset pass.  This kernel fuses the whole chain per row
block: the one-hot selection runs on the MXU into VMEM, the residual /
acceptance / score planes live in registers/VMEM only, and just the
per-row verdicts (has, k_best, bs_best) are written back — one byte-read
of the inputs, no plane round trips.

Numerics are IDENTICAL to the XLA formulation (same 8-bit-limb
residue-form selection — one exact bf16 product per output, f32
accumulate — same unique-score tiebreak); equality is asserted by tests
in interpret mode and on the real chip (`-m tpu` lane).

Packed-table layout (residue form, built by correct_rows_jax, padded to
the kernel's lane width): cols [0:B) r_hi8, [B:2B) r_lo8, [2B:3B) e,
col 3B n, rest zero, where r_b = clk_b mod cycle and
e_b = (bs_b - clk_b // cycle) mod 64 (see
ops/correct.baseline_plane_verdicts for the algebra).  Group axis padded
to 128 so the one-hot contraction is a full-tile MXU op.

Reference semantics: bs_beam_correction.py:64-76 (min |d - k*61000| over
the group's baselines, <=500 tolerance, first-baseline tiebreak).
"""

from __future__ import annotations

import functools

__all__ = ["correct_planes_pallas"]

BLOCK_F = 1024
G_PAD = 128


def _kernel(gid_ref, clk_ref, tbl_ref, has_ref, kbest_ref, bsbest_ref, *,
            bmax: int, cycle: int, tol: int):
    import jax
    import jax.numpy as jnp

    from slam_process_tpu.ops.correct import baseline_plane_verdicts

    gid = gid_ref[:]                     # [B_F] i32
    clk = clk_ref[:]                     # [B_F] i32
    tbl = tbl_ref[:]                     # [G_PAD, W] f32

    # broadcasted_iota: Mosaic requires >=2-D iota on TPU.
    g_iota = jax.lax.broadcasted_iota(jnp.int32, (1, G_PAD), 1)
    onehot = (gid[:, None] == g_iota).astype(jnp.bfloat16)  # [B_F, G_PAD]
    # Residue-form table values all fit 8 bits, so a SINGLE bf16 MXU pass
    # with f32 accumulation is exact (one product per output element) —
    # no HIGHEST 6-pass decomposition (the round-3 kernel's loss cause).
    sel = jax.lax.dot(onehot, tbl.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)   # [B_F, W]

    # The SAME traced ops as the production XLA chain (shared helper in
    # ops/correct.py): the two formulations cannot drift.
    has, k_best, bs_best = baseline_plane_verdicts(
        sel, clk, bmax=bmax, cycle=cycle, tol=tol)
    has_ref[:] = has
    kbest_ref[:] = k_best
    bsbest_ref[:] = bs_best


@functools.lru_cache(maxsize=8)
def _build(bmax: int, cycle: int, tol: int, interpret: bool, block_f: int):
    """Lazy jit builder (jax imports deferred; persistent compile cache
    enabled like every other jit factory in the package)."""
    import jax

    from slam_process_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    return jax.jit(functools.partial(
        _call, bmax=bmax, cycle=cycle, tol=tol, interpret=interpret,
        block_f=block_f))


def correct_planes_pallas(gid, clk, packed, *, bmax: int, cycle: int,
                          tol: int, interpret: bool = False,
                          block_f: int = BLOCK_F):
    """Per-row best-baseline verdicts, fused in VMEM.

    gid/clk: [F] i32 (F padded to a ``block_f`` multiple by the caller);
    packed: [G_PAD, W] f32 table (W a 128-multiple >= 3*bmax+1).
    Returns (has [F] bool, k_best [F] i32, bs_best [F] i32).
    (``block_f`` is exposed for tests: interpret mode traces the kernel
    body at full unroll, which is slow at the production block size.)
    """
    return _build(bmax, cycle, tol, interpret, block_f)(gid, clk, packed)


def _call(gid, clk, packed, *, bmax: int, cycle: int, tol: int,
          interpret: bool, block_f: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    f = gid.shape[0]
    assert f % block_f == 0, f
    assert packed.shape[0] == G_PAD and packed.shape[1] % 128 == 0

    grid = (f // block_f,)
    kernel = functools.partial(_kernel, bmax=bmax, cycle=cycle, tol=tol)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_f,), lambda i: (i,)),
            pl.BlockSpec((block_f,), lambda i: (i,)),
            pl.BlockSpec(packed.shape, lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_f,), lambda i: (i,)),
            pl.BlockSpec((block_f,), lambda i: (i,)),
            pl.BlockSpec((block_f,), lambda i: (i,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((f,), jnp.bool_),
            jax.ShapeDtypeStruct((f,), jnp.int32),
            jax.ShapeDtypeStruct((f,), jnp.int32),
        ],
        interpret=interpret,
    )(gid, clk, packed)
