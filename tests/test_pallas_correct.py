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
    w = ((3 * BMAX + 2 + 127) // 128) * 128
    packed = np.zeros((G_PAD, w), np.float32)
    packed[:, :BMAX] = tbl_clk >> 15
    packed[:, BMAX:2 * BMAX] = tbl_clk & 0x7FFF
    packed[:, 2 * BMAX:3 * BMAX] = tbl_bs
    packed[:, 3 * BMAX] = n_cap >> 15
    packed[:, 3 * BMAX + 1] = n_cap & 0x7FFF
    return packed


def _oracle(gid, clk, tbl_clk, tbl_bs, n_cap):
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
    return (best < 2**30, np.where(pick, k, 0).sum(axis=1),
            np.where(pick, rbs, 0).sum(axis=1))


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
    np.testing.assert_array_equal(np.asarray(kb), ref_k)
    np.testing.assert_array_equal(np.asarray(bb), ref_bs)
    assert ref_has.any() and not ref_has.all()
    assert ref_has[3], "the planted exact-TOL baseline must be accepted"
