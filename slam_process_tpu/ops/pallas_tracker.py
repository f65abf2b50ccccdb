"""Pallas kernel for the streaming tracker's per-step sweep block.

The online-tracking slice of the device streaming step advances the
greedy global-NN tracker (models/tracking.make_track_sweep_step) over
the sweeps a window just closed.  As an XLA ``while_loop`` that is ~30
serialized sub-tile ops per sweep (argmin over a [T, K] cost, five
one-element scatters, four ring writes), measured at ~15 ms over a
dataset replay (tools/diag_streaming_paths.py) — pure dispatch floor,
zero bandwidth or FLOP content: T=8 tracks x K=3 paths is 24 floats.

This kernel runs the WHOLE per-step tracker scan in one launch: a
sequential grid over the s1 sweep lanes (one [1, K] path row in, one
[1, T] output row per field out), with the tracker carry persistent in
VMEM/SMEM scratch across grid steps — the same
sequential-grid-plus-running-scratch structure as
ops/pallas_compact.py.  Lanes >= the closed-sweep count run with an
all-invalid path mask, which is a provable carry no-op (gating can
never pass, nothing is leftover to create) — the padding argument of
models/tracking.make_track_sweep_step.

Exactness argument (same contract as models/tracking.track_paths_jax):
within one sweep the cost matrix is STATIC — a matched track is masked
out by ``assigned`` in the same iteration that moves its position, so
its updated position never re-enters the cost — and the argmin
tie-break (first flat index in row-major order) is reproduced by
``min(where(cost == min(cost), flat_index, TK))``.  All cost arithmetic
is f32, identical ops in identical order; new-track creation ranks are
exact small-integer f32 sums.

Reference semantics: beyond-reference capability (the reference never
uses its CLK axis — heatmap_gemini_v2.py:35-38 aggregates it "for
future ToA use" and stops); the behavioral spec is models/tracking.
"""

from __future__ import annotations

import functools

__all__ = ["track_block_pallas"]


def _kernel(meff_ref, count_in_ref, pos_in_ref, created_in_ref,
            aoa_ref, aod_ref, pow_ref, val_ref,
            oa_ref, od_ref, op_ref, oo_ref,
            npos_ref, ncreated_ref, ncount_ref,
            pos_a_ref, pos_d_ref, created_ref, count_ref,
            *, gate2: float, k_n: int, s1: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    t_n = pos_in_ref.shape[0]
    big = jnp.float32(jnp.inf)
    gate2 = jnp.float32(gate2)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        pos_a_ref[:] = pos_in_ref[:, 0:1]
        pos_d_ref[:] = pos_in_ref[:, 1:2]
        created_ref[:] = created_in_ref[:]
        count_ref[0] = count_in_ref[0]

    t_iota = jax.lax.broadcasted_iota(jnp.int32, (t_n, 1), 0)    # [T, 1]
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (1, k_n), 1)    # [1, K]
    flat = jax.lax.broadcasted_iota(jnp.int32, (t_n, k_n), 0) * k_n \
        + jax.lax.broadcasted_iota(jnp.int32, (t_n, k_n), 1)     # [T, K]

    pos_a = pos_a_ref[:]                                         # [T, 1]
    pos_d = pos_d_ref[:]
    created = created_ref[:] > 0                                 # [T, 1]
    count = count_ref[0]

    p_aoa = aoa_ref[pl.ds(i, 1), :]                              # [1, K]
    p_aod = aod_ref[pl.ds(i, 1), :]
    p_pow = pow_ref[pl.ds(i, 1), :]
    live = i < jnp.minimum(meff_ref[0], s1)
    p_val = (val_ref[pl.ds(i, 1), :] > 0) & live                 # [1, K]

    # Static within the sweep: matched tracks are masked out in the same
    # iteration their position moves (see module docstring).
    da = pos_a - p_aoa                                           # [T, K]
    dd = pos_d - p_aod
    cost = da * da + dd * dd

    assigned = jnp.zeros((t_n, 1), bool)
    used = jnp.zeros((1, k_n), bool)
    obs = jnp.zeros((t_n, 1), bool)
    opow = jnp.zeros((t_n, 1), jnp.float32)

    for _ in range(k_n):
        m = (created & ~assigned) & (p_val & ~used)              # [T, K]
        c = jnp.where(m, cost, big)
        mn = jnp.min(c)
        idx = jnp.min(jnp.where(c == mn, flat, t_n * k_n))
        ok = mn <= gate2
        t_oh = (t_iota == idx // k_n) & ok                       # [T, 1]
        k_oh = (k_iota == idx % k_n) & ok                        # [1, K]
        assigned = assigned | t_oh
        used = used | k_oh
        obs = obs | t_oh
        sel_a = jnp.sum(jnp.where(k_oh, p_aoa, 0.0))
        sel_d = jnp.sum(jnp.where(k_oh, p_aod, 0.0))
        sel_p = jnp.sum(jnp.where(k_oh, p_pow, 0.0))
        pos_a = jnp.where(t_oh, sel_a, pos_a)
        pos_d = jnp.where(t_oh, sel_d, pos_d)
        opow = jnp.where(t_oh, sel_p, opow)

    # New tracks for leftover valid paths, in path (= rank) order: the
    # exclusive prefix count of leftover lanes is exact small-integer
    # f32 (row-reduce of a strictly-lower-triangular masked broadcast).
    leftover = p_val & ~used                                     # [1, K]
    lo_f = jnp.where(leftover, jnp.float32(1), jnp.float32(0))
    before = jax.lax.broadcasted_iota(jnp.int32, (k_n, k_n), 0) \
        < jax.lax.broadcasted_iota(jnp.int32, (k_n, k_n), 1)
    rank = jnp.sum(jnp.where(before, lo_f.reshape(k_n, 1), 0.0),
                   axis=0, keepdims=True).astype(jnp.int32)      # [1, K]
    slot = count + rank                                          # [1, K]
    create = leftover & (slot < t_n)
    oh = create & (slot == t_iota)                               # [T, K]
    any_t = jnp.sum(jnp.where(oh, 1, 0), axis=1, keepdims=True) > 0
    new_a = jnp.sum(jnp.where(oh, p_aoa, 0.0), axis=1, keepdims=True)
    new_d = jnp.sum(jnp.where(oh, p_aod, 0.0), axis=1, keepdims=True)
    new_p = jnp.sum(jnp.where(oh, p_pow, 0.0), axis=1, keepdims=True)
    pos_a = jnp.where(any_t, new_a, pos_a)
    pos_d = jnp.where(any_t, new_d, pos_d)
    opow = jnp.where(any_t, new_p, opow)
    created = created | any_t
    obs = obs | any_t
    count = count + jnp.sum(jnp.where(create, 1, 0))

    pos_a_ref[:] = pos_a
    pos_d_ref[:] = pos_d
    created_ref[:] = jnp.where(created, 1, 0)
    count_ref[0] = count

    # Output row i: positions AFTER the update (coasting hold).  The
    # [T, 1] -> [1, T] turn is a sum against a [T, T] one-hot (no
    # sub-tile transpose op).
    eye = (jax.lax.broadcasted_iota(jnp.int32, (t_n, t_n), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (t_n, t_n), 1))
    as_row = lambda col: jnp.sum(jnp.where(eye, col, 0.0), axis=0,
                                 keepdims=True)
    oa_ref[pl.ds(i, 1), :] = as_row(pos_a)
    od_ref[pl.ds(i, 1), :] = as_row(pos_d)
    op_ref[pl.ds(i, 1), :] = as_row(opow)
    oo_ref[pl.ds(i, 1), :] = jnp.sum(
        jnp.where(eye & obs, 1, 0), axis=0, keepdims=True)

    @pl.when(i == s1 - 1)
    def _final():
        npos_ref[:] = jnp.concatenate([pos_a, pos_d], axis=1)
        ncreated_ref[:] = jnp.where(created, 1, 0)
        ncount_ref[0] = count


@functools.lru_cache(maxsize=16)
def _build(s1: int, k_n: int, t_n: int, gate_deg: float, interpret: bool):
    import jax

    from slam_process_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    return jax.jit(functools.partial(
        _call, s1=s1, k_n=k_n, t_n=t_n, gate_deg=gate_deg,
        interpret=interpret))


def _call(aoa, aod, pw, val, meff, pos, created, count, *, s1, k_n, t_n,
          gate_deg, interpret):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32
    i32 = jnp.int32
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    whole = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0))
    row_in = whole(s1, k_n)
    row_out = whole(s1, t_n)
    gate2 = float(gate_deg) * float(gate_deg)
    outs = pl.pallas_call(
        functools.partial(_kernel, gate2=gate2, k_n=k_n, s1=s1),
        grid=(s1,),
        in_specs=[smem, smem, whole(t_n, 2), whole(t_n, 1),
                  row_in, row_in, row_in, row_in],
        out_specs=(row_out, row_out, row_out, row_out,
                   whole(t_n, 2), whole(t_n, 1), smem),
        out_shape=(
            jax.ShapeDtypeStruct((s1, t_n), f32),
            jax.ShapeDtypeStruct((s1, t_n), f32),
            jax.ShapeDtypeStruct((s1, t_n), f32),
            jax.ShapeDtypeStruct((s1, t_n), i32),
            jax.ShapeDtypeStruct((t_n, 2), f32),
            jax.ShapeDtypeStruct((t_n, 1), i32),
            jax.ShapeDtypeStruct((1,), i32),
        ),
        scratch_shapes=[
            pltpu.VMEM((t_n, 1), f32),
            pltpu.VMEM((t_n, 1), f32),
            pltpu.VMEM((t_n, 1), i32),
            pltpu.SMEM((1,), i32),
        ],
        interpret=interpret,
    )(
        jnp.asarray(meff, i32).reshape(1),
        jnp.asarray(count, i32).reshape(1),
        jnp.asarray(pos, f32),
        jnp.asarray(created, i32).reshape(t_n, 1),
        jnp.asarray(aoa, f32),
        jnp.asarray(aod, f32),
        jnp.asarray(pw, f32),
        jnp.asarray(val, i32).reshape(s1, k_n),
    )
    oa, od, op, oo, npos, ncreated, ncount = outs
    return (oa, od, op, oo > 0, npos, ncreated[:, 0] > 0, ncount[0])


def track_block_pallas(aoa_l, aod_l, pow_l, val_l, m_eff, pos, created,
                       count, *, gate_deg: float, interpret: bool = False):
    """Advance the tracker over one step's closed-sweep block.

    Inputs: per-sweep path lanes ``aoa_l/aod_l/pow_l/val_l`` [s1, K]
    (lanes >= ``m_eff`` are ignored), the closed-sweep count ``m_eff``
    (traced i32), and the tracker carry (``pos`` [T, 2] f32, ``created``
    [T] bool, ``count`` i32).  Returns ``(col_aoa, col_aod, col_pow,
    col_obs, new_pos, new_created, new_count)`` where the ``col_*``
    arrays are [s1, T] per-sweep output columns — bit-identical per
    lane to ``track_sweep_step_np`` for lanes < m_eff (later lanes
    hold the coasting positions with zero power/observed — junk the
    streaming ring overwrites / never reads past m_eff).
    """
    s1, k_n = aoa_l.shape
    t_n = pos.shape[0]
    return _build(int(s1), int(k_n), int(t_n), float(gate_deg),
                  bool(interpret))(
        aoa_l, aod_l, pow_l, val_l, m_eff, pos, created, count)
