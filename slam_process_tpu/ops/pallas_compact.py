"""Pallas kernel for masked-row compaction (stream-order row gather).

The streaming step's carry compaction — "pack the open sweep's valid
rows into a dense [gcap] buffer" — was a ``jnp.nonzero(mask, size)``
plus a row gather, measured at ~0.7 ms per 1 MiB chunk step (~18 ms
over the dataset in every streaming mode): TPU nonzero lowers to a
cumsum/scatter chain and the gather serializes per element.

This kernel compacts in ONE pass over the rows with only MXU work:
per 1024-row block it computes in-block ranks with a triangular-ones
matmul (rank[i] = sum_{g<i} mask[g], exact in f32), builds the
block-LOCAL [1024, 1024] destination one-hot in VMEM (a block's rows
land in the contiguous window [base, base+1024) of the output, where
``base`` is the running count carried in SMEM across the sequential
grid), and accumulates one-hot^T @ payload-limbs into the output at
dynamic row offset ``base``.  Payload fields are split into four 8-bit
limbs so every product is an exact bf16 value times a {0, 1} one-hot
(the ops/correct.py / ops/pallas_sweep_sums.py exactness argument);
rows are recombined to int32 outside the kernel.

Rows whose rank >= capacity are dropped (their one-hot row falls past
the window only when base >= capacity; the caller's capacity invariant
and overflow flag are unchanged from the nonzero formulation, which
also kept only the first ``capacity`` masked rows).

Reference semantics: the open-sweep carry of the device streaming state
machine (parallel/streaming_device.py) — a pure data-movement op with
no reference counterpart (the reference is offline).
"""

from __future__ import annotations

import functools

__all__ = ["compact_rows_pallas"]

BLOCK_F = 1024
N_LIMBS = 4          # 4 x 8-bit limbs cover int32 fields < 2^32


def _kernel(m_ref, f0_ref, f1_ref, f2_ref, f3_ref, f4_ref, out_ref,
            base_ref):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)
        base_ref[0] = 0

    m = m_ref[:]                                  # [R] i32 {0, 1}
    r = m.shape[0]

    # In-block exclusive ranks via a strictly-lower-triangular ones
    # matmul: rank[i] = sum_{g < i} m[g] < R, exact in f32.
    row_i = jax.lax.broadcasted_iota(jnp.int32, (r, r), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (r, r), 1)
    tri = jnp.where(col_i < row_i, jnp.float32(1), jnp.float32(0))
    mf = jnp.where(m[:, None] > 0, jnp.float32(1), jnp.float32(0))  # [R,1]
    rank = jax.lax.dot_general(
        tri.astype(jnp.bfloat16), mf.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32)[:, 0]  # [R]

    # Block-local destination one-hot [R, R]: this block's masked rows
    # occupy output rows [base, base + count_block) — always inside a
    # window of R rows starting at base.
    d_iota = jax.lax.broadcasted_iota(jnp.int32, (1, r), 1)
    oh = jnp.where((rank[:, None] == d_iota) & (m[:, None] > 0),
                   jnp.float32(1), jnp.float32(0)).astype(jnp.bfloat16)

    # Payload: five int32 fields as four 8-bit limbs each ([R, 20],
    # padded to 24 lanes of zeros for the matmul).
    fields = [f0_ref[:], f1_ref[:], f2_ref[:], f3_ref[:], f4_ref[:]]
    limbs = jnp.concatenate(
        [((f[:, None] >> (8 * k)) & 255).astype(jnp.float32)
         for f in fields for k in range(N_LIMBS)]
        + [jnp.zeros((r, 4), jnp.float32)], axis=1).astype(jnp.bfloat16)

    # Clamp the store window so it stays inside the [capacity + R] output
    # even when earlier blocks already produced >= capacity rows: a
    # clamped block writes into [cap, cap + R), which the caller slices
    # off (those rows' global ranks are >= capacity, so dropping them is
    # the nonzero-formulation semantics; relying on Mosaic's
    # out-of-bounds dynamic-store behavior instead would be undefined).
    # The SMEM running count stays exact.
    base = jnp.minimum(base_ref[0], out_ref.shape[0] - r)
    blk = jax.lax.dot_general(
        oh, limbs, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)       # [R, 24]
    out_ref[pl.ds(base, r), :] += blk
    base_ref[0] = base_ref[0] + jnp.sum(m)


@functools.lru_cache(maxsize=8)
def _build(capacity: int, interpret: bool, block_f: int):
    import jax

    from slam_process_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    return jax.jit(functools.partial(
        _call, capacity=capacity, interpret=interpret, block_f=block_f))


def _call(m, f0, f1, f2, f3, f4, *, capacity: int, interpret: bool,
          block_f: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f = m.shape[0]
    assert f % block_f == 0, f
    spec = pl.BlockSpec((block_f,), lambda i: (i,))
    out = pl.pallas_call(
        _kernel,
        grid=(f // block_f,),
        in_specs=[spec] * 6,
        out_specs=pl.BlockSpec((capacity + block_f, 24), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((capacity + block_f, 24),
                                       jnp.float32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(m, f0, f1, f2, f3, f4)
    return out[:capacity]


def compact_rows_pallas(rows5, mask, *, capacity: int,
                        interpret: bool = False, block_f: int = BLOCK_F):
    """Compact ``rows5[mask]`` (stream order) into a dense [capacity, 5].

    rows5: [F, 5] int32; mask: [F] bool.  F must be a ``block_f``
    multiple.  Rows past the first ``capacity`` masked ones are dropped
    (callers bound the masked count and flag overflow separately);
    missing tail rows are zero — identical to the nonzero+gather
    formulation with ``fill_value`` pointing at a zeros row.
    """
    import jax.numpy as jnp

    mi = mask.astype(jnp.int32)
    fs = [rows5[:, i].astype(jnp.int32) for i in range(5)]
    cols = _build(capacity, interpret, block_f)(mi, *fs).astype(jnp.int32)
    # Recombine limbs: field j lives in columns [4j, 4j+4).
    packed = jnp.stack(
        [(cols[:, 4 * j] | (cols[:, 4 * j + 1] << 8)
          | (cols[:, 4 * j + 2] << 16) | (cols[:, 4 * j + 3] << 24))
         for j in range(5)], axis=1)
    return packed
