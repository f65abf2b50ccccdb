"""Fused corrector-plane Pallas kernel == the XLA formulation, exactly.

The kernel (ops/pallas_correct.py) must reproduce correct_rows_jax's
baseline-selection arithmetic bit-for-bit: same exact-f32 one-hot
selection, same residual math, same unique-score first-min tiebreak.
Interpret mode runs here (CPU lane); the real-chip run lives in
tests/test_on_tpu.py.
"""

import numpy as np
import pytest

from slam_process_tpu.ops.pallas_correct import G_PAD, correct_planes_pallas

BMAX, CYCLE, TOL = 96, 61_000, 500
BLOCK = 256   # interpret mode traces the kernel at full unroll — keep small


def _pack(tbl_clk, tbl_bs, n_cap):
    """Residue-form table (ops/pallas_correct.py layout): r = clk mod
    CYCLE as two 8-bit limbs, e = (bs - clk//CYCLE) mod 64, count."""
    r = tbl_clk % CYCLE
    e = (tbl_bs - tbl_clk // CYCLE) % 64
    w = ((3 * BMAX + 1 + 127) // 128) * 128
    packed = np.zeros((G_PAD, w), np.float32)
    packed[:, :BMAX] = r >> 8
    packed[:, BMAX:2 * BMAX] = r & 0xFF
    packed[:, 2 * BMAX:3 * BMAX] = e
    packed[:, 3 * BMAX] = n_cap
    return packed


def _oracle(gid, clk, tbl_clk, tbl_bs, n_cap):
    """Full-CLK reference semantics; returns the kernel's residue-form
    invariants (has, q_f + k_frac, e) so that
    (bs_best + k_best) mod 64 == reference (bs_b + k) mod 64 —
    the identity tested end-to-end in test_correct.py."""
    rc = tbl_clk[gid].astype(np.int64)
    rbs = tbl_bs[gid]
    rn = n_cap[gid]
    d = clk[:, None].astype(np.int64) - rc
    k = np.floor_divide(d + CYCLE // 2, CYCLE)
    resid = np.abs(d - k * CYCLE)
    cols = np.arange(BMAX)
    accept = (resid <= TOL) & (cols[None, :] < rn[:, None])
    score = np.where(accept, resid * (BMAX + 1) + cols, 2**30 + cols)
    best = score.min(axis=1)
    pick = score == best[:, None]
    q_b = tbl_clk[gid].astype(np.int64) // CYCLE
    k_frac = k - (clk.astype(np.int64)[:, None] // CYCLE) + q_b
    e = (rbs - q_b) % 64
    has = best < 2**30
    # k_best/bs_best are unspecified where has == False (every consumer
    # gates on has) — mask them so comparisons cover only the contract.
    return (has,
            np.where(has, clk.astype(np.int64) // CYCLE
                     + np.where(pick, k_frac, 0).sum(axis=1), 0),
            np.where(has, np.where(pick, e, 0).sum(axis=1), 0))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_interpret_matches_oracle(seed):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    f = BLOCK * 2
    gid = np.sort(rng.integers(0, 64, f)).astype(np.int32)
    clk = rng.integers(0, 1 << 30, f).astype(np.int32)
    tbl_clk = rng.integers(0, 1 << 30, (G_PAD, BMAX)).astype(np.int32)
    # Plant near-boundary residuals IN row 3's own group: exact TOL and
    # TOL+1 offsets around its clk, so the acceptance edge (resid <= tol)
    # is exercised deterministically, not by random luck.
    g3 = int(gid[3])
    n_cap_min4 = 4
    tbl_clk[g3, :4] = (clk[3] - np.array(
        [TOL, TOL + 1, -TOL, -(TOL + 1)])) & ((1 << 30) - 1)
    tbl_bs = rng.integers(0, 64, (G_PAD, BMAX)).astype(np.int32)
    n_cap = rng.integers(0, BMAX + 1, G_PAD).astype(np.int32)
    n_cap[g3] = max(n_cap[g3], n_cap_min4)   # planted cells must be live

    has, kb, bb = correct_planes_pallas(
        jnp.asarray(gid), jnp.asarray(clk), jnp.asarray(_pack(tbl_clk, tbl_bs, n_cap)),
        bmax=BMAX, cycle=CYCLE, tol=TOL, interpret=True, block_f=BLOCK)
    ref_has, ref_k, ref_bs = _oracle(gid, clk, tbl_clk, tbl_bs, n_cap)
    np.testing.assert_array_equal(np.asarray(has), ref_has)
    np.testing.assert_array_equal(np.where(ref_has, np.asarray(kb), 0), ref_k)
    np.testing.assert_array_equal(np.where(ref_has, np.asarray(bb), 0), ref_bs)
    assert ref_has.any() and not ref_has.all()
    assert ref_has[3], "the planted exact-TOL baseline must be accepted"
