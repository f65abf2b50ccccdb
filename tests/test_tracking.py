"""CLK-anchored path tracking (models/tracking.py) — the ToA axis.

The reference aggregates CLK "for future ToA use" and never uses it
(heatmap_gemini_v2.py:35-38); tracking is a beyond-reference capability,
so the oracle is synthetic truth: hand-built association scenarios, a
host==device equivalence fuzz, and an end-to-end drifting-LoS session
whose recovered angular velocity must match the injected drift.
"""

import numpy as np
import pytest

from slam_process_tpu.models.tracking import (
    track_paths_jax,
    track_paths_np,
    track_velocities,
)
from tests.conftest import BEAM_ANGLE


def test_single_path_single_track():
    s, k = 5, 3
    aoa = np.zeros((s, k), np.float32)
    aod = np.zeros((s, k), np.float32)
    power = np.zeros((s, k), np.float32)
    valid = np.zeros((s, k), bool)
    aoa[:, 0] = [0.0, 1.0, 2.0, 3.0, 4.0]
    aod[:, 0] = 10.0
    power[:, 0] = 7.0
    valid[:, 0] = True
    tr = track_paths_np(aoa, aod, power, valid, max_tracks=4, gate_deg=5.0)
    assert tr.n_tracks == 1
    assert tr.observed[0].all()
    np.testing.assert_array_equal(tr.pos_aoa[0], aoa[:, 0])
    np.testing.assert_array_equal(tr.power[0], np.full(s, 7.0, np.float32))


def test_two_crossing_paths_stay_separate_tracks():
    """Two paths crossing in AoA but far in AoD must not swap tracks:
    greedy NN in the 2D angle space keeps each with its own trajectory."""
    s = 7
    aoa_a = np.linspace(-10, 10, s)           # ascending
    aoa_b = np.linspace(10, -10, s)           # descending (crosses at s=3)
    aoa = np.stack([aoa_a, aoa_b], axis=1).astype(np.float32)
    aod = np.stack([np.full(s, -20.0), np.full(s, 20.0)], axis=1)
    power = np.ones((s, 2), np.float32)
    valid = np.ones((s, 2), bool)
    tr = track_paths_np(aoa, aod, power, valid, max_tracks=4, gate_deg=8.0)
    assert tr.n_tracks == 2
    np.testing.assert_allclose(tr.pos_aoa[0], aoa_a, atol=1e-6)
    np.testing.assert_allclose(tr.pos_aod[0], -20.0)
    np.testing.assert_allclose(tr.pos_aoa[1], aoa_b, atol=1e-6)
    np.testing.assert_allclose(tr.pos_aod[1], 20.0)


def test_gate_opens_new_track_and_coasting():
    """A jump beyond the gate opens a NEW track; the old one coasts
    (position held, no observation)."""
    s = 6
    aoa = np.zeros((s, 1), np.float32)
    aoa[3:, 0] = 40.0                      # jump at sweep 3
    aod = np.zeros((s, 1), np.float32)
    power = np.ones((s, 1), np.float32)
    valid = np.ones((s, 1), bool)
    tr = track_paths_np(aoa, aod, power, valid, max_tracks=4, gate_deg=5.0)
    assert tr.n_tracks == 2
    assert tr.observed[0, :3].all() and not tr.observed[0, 3:].any()
    assert not tr.observed[1, :3].any() and tr.observed[1, 3:].all()
    # Track 0 coasts at its last observed position.
    np.testing.assert_array_equal(tr.pos_aoa[0, 3:], np.zeros(3, np.float32))


def test_missed_detection_then_reacquire():
    """An invalid sweep leaves the track coasting; it re-associates when
    the path reappears within the gate."""
    s = 5
    aoa = np.array([[0.0], [1.0], [0.0], [2.0], [3.0]], np.float32)
    aod = np.zeros((s, 1), np.float32)
    power = np.ones((s, 1), np.float32)
    valid = np.ones((s, 1), bool)
    valid[2, 0] = False
    tr = track_paths_np(aoa, aod, power, valid, max_tracks=4, gate_deg=5.0)
    assert tr.n_tracks == 1
    np.testing.assert_array_equal(
        tr.observed[0], [True, True, False, True, True])
    assert tr.pos_aoa[0, 2] == 1.0         # coasting at sweep 2


def test_track_capacity_bound():
    """More simultaneous paths than track slots: extras are dropped, the
    track count never exceeds max_tracks."""
    s, k = 3, 6
    rng = np.random.default_rng(0)
    aoa = (rng.uniform(-40, 40, (s, k)) + np.arange(k) * 100).astype(np.float32)
    aod = rng.uniform(-40, 40, (s, k)).astype(np.float32)
    power = np.ones((s, k), np.float32)
    valid = np.ones((s, k), bool)
    tr = track_paths_np(aoa, aod, power, valid, max_tracks=4, gate_deg=5.0)
    assert tr.n_tracks == 4
    assert tr.created.sum() == 4


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_jax_matches_np_fuzz(seed):
    """Random paths (random validity, jumps, clusters): the jitted scan
    must equal the host oracle exactly — same f32 costs, same tie order."""
    import jax

    rng = np.random.default_rng(seed)
    s, k, t = int(rng.integers(3, 12)), int(rng.integers(1, 5)), 6
    # Cluster half the paths so association is non-trivial.
    aoa = rng.uniform(-45, 45, (s, k)).astype(np.float32)
    aod = rng.uniform(-45, 45, (s, k)).astype(np.float32)
    drift = np.cumsum(rng.normal(0, 2, s)).astype(np.float32)
    aoa[:, 0] = drift
    aod[:, 0] = -drift
    power = rng.uniform(0, 1, (s, k)).astype(np.float32)
    valid = rng.random((s, k)) < 0.8
    ref = track_paths_np(aoa, aod, power, valid, max_tracks=t, gate_deg=7.0)
    fn = jax.jit(lambda a, d, p, v: track_paths_jax(
        a, d, p, v, max_tracks=t, gate_deg=7.0))
    got = jax.device_get(fn(aoa, aod, power, valid))
    np.testing.assert_array_equal(np.asarray(got.observed), ref.observed)
    np.testing.assert_array_equal(np.asarray(got.created), ref.created)
    assert int(got.n_tracks) == ref.n_tracks
    np.testing.assert_array_equal(np.asarray(got.pos_aoa), ref.pos_aoa)
    np.testing.assert_array_equal(np.asarray(got.pos_aod), ref.pos_aod)
    np.testing.assert_array_equal(np.asarray(got.power), ref.power)


def test_velocity_least_squares_matches_polyfit():
    s = 9
    times = 1000 + np.arange(s, dtype=np.int64) * 61_000
    truth_slope = 3.5e-5
    aoa = (truth_slope * times + 2.0).astype(np.float32)
    tr = track_paths_np(aoa[:, None], np.zeros((s, 1), np.float32),
                        np.ones((s, 1), np.float32), np.ones((s, 1), bool))
    va, vd, ok = track_velocities(tr, times)
    assert ok[0]
    coef = np.polyfit(times.astype(float), tr.pos_aoa[0].astype(float), 1)
    np.testing.assert_allclose(va[0], coef[0], rtol=1e-6)
    np.testing.assert_allclose(va[0], truth_slope, rtol=1e-3)
    assert vd[0] == 0.0
    # Missing-sweep times are excluded from the fit.
    times2 = times.copy()
    times2[4] = -1
    va2, _, ok2 = track_velocities(tr, times2)
    assert ok2[0]
    m = times2 >= 0
    coef2 = np.polyfit(times2[m].astype(float), tr.pos_aoa[0][m], 1)
    np.testing.assert_allclose(va2[0], coef2[0], rtol=1e-6)


def test_velocity_degenerate_tracks():
    tr = track_paths_np(np.zeros((3, 1), np.float32),
                        np.zeros((3, 1), np.float32),
                        np.ones((3, 1), np.float32),
                        np.array([[True], [False], [False]]))
    va, vd, ok = track_velocities(tr, np.array([5, 6, 7]))
    assert not ok[0] and va[0] == 0.0      # single observation


def _drifting_los_session(n_sweeps=8, n_beams=16, drift_per_sweep=0.5):
    """Synthetic filtered table: per sweep, a separable Gaussian RSS bump
    over a [n_beams x n_beams] beam grid whose center drifts linearly in
    the BS (AoD) axis by ``drift_per_sweep`` beams per sweep."""
    from slam_process_tpu.io.angles import load_angle_lut
    from slam_process_tpu.pipeline.session import Session

    lut = load_angle_lut(BEAM_ANGLE)
    sigma = 1.4 / 2.355
    rows = []
    times = []
    for s in range(n_sweeps):
        u_c = lut[6]
        b_c = lut[4] + drift_per_sweep * s * 1.4
        clk = 10_000 + s * 200_000
        times.append(clk)
        for u in range(n_beams):
            for b in range(n_beams):
                g = np.exp(-((lut[u] - u_c) ** 2) / (2 * sigma**2)) * np.exp(
                    -((lut[b] - b_c) ** 2) / (2 * sigma**2))
                rss = int(round(1e6 * g)) + 10
                rows.append([u, b, rss, clk])
    sess = Session("synthetic_drift")
    sess.filtered = np.asarray(rows, dtype=np.int64)
    return sess, np.asarray(times), lut


def test_end_to_end_drifting_los_velocity():
    """Full ToA pipeline on synthetic truth: per-sweep NN-OMP estimation
    -> CLK anchoring -> association -> velocity fit recovers the injected
    AoD drift rate; AoA stays flat."""
    drift_deg_per_sweep = 0.5 * 1.4
    clk_per_sweep = 200_000.0
    sess, times, lut = _drifting_los_session()

    tracks, got_times, (va, vd, ok) = sess.path_tracks(
        BEAM_ANGLE, estimator="nn_omp", max_paths=1, gate_deg=10.0)
    np.testing.assert_array_equal(got_times, times)
    assert tracks.n_tracks == 1
    assert tracks.observed[0].all()
    assert ok[0]
    truth = drift_deg_per_sweep / clk_per_sweep
    np.testing.assert_allclose(vd[0], truth, rtol=0.15)
    assert abs(va[0]) < 0.1 * truth
    # Device association path agrees with the host association.
    tracks_d, _, (va_d, vd_d, ok_d) = sess.path_tracks(
        BEAM_ANGLE, estimator="nn_omp", max_paths=1, gate_deg=10.0,
        engine="device")
    np.testing.assert_array_equal(np.asarray(tracks_d.observed),
                                  tracks.observed)
    np.testing.assert_allclose(vd_d[0], vd[0], rtol=1e-6)


def test_clk_wrap_unwrapped_velocity():
    """A 30-bit CLK wrap mid-session must not corrupt the velocity fit:
    Session.sweep_times unwraps the counter onto a monotone axis."""
    drift_deg_per_sweep = 0.5 * 1.4
    clk_per_sweep = 200_000.0
    sess, times, _ = _drifting_los_session()
    # Re-base the true time axis so the 30-bit counter wraps between
    # sweeps 4 and 5, then store what the hardware would report (mod 2^30):
    # the raw anchors drop by ~2^30 at sweep 5.
    wrapped = sess.filtered.copy()
    shift = (1 << 30) - int(times[5]) + 7
    wrapped[:, 3] = (wrapped[:, 3] + shift) & ((1 << 30) - 1)
    sess.filtered = wrapped
    got_times = sess.sweep_times()
    assert np.all(np.diff(got_times[got_times >= 0]) > 0), "not monotone"
    _, _, (va, vd, ok) = sess.path_tracks(BEAM_ANGLE, max_paths=1,
                                          gate_deg=10.0)
    assert ok[0]
    # The unwrapped axis is shifted but uniform, so the slope survives.
    truth = drift_deg_per_sweep / clk_per_sweep
    np.testing.assert_allclose(vd[0], truth, rtol=0.15)


def test_cli_tracks(tmp_path):
    """cli estimate --tracks writes the track table + trajectory figure."""
    from slam_process_tpu.io.xlsx import read_xlsx_table, write_xlsx_table
    from slam_process_tpu.pipeline.cli import main

    sess, _, _ = _drifting_los_session(n_sweeps=4)
    inp = tmp_path / "synthetic_filtered.xlsx"
    write_xlsx_table(inp, ["UE_Beam", "BS_Beam", "RSS值", "CLK值"],
                     sess.filtered)
    main(["estimate", "--input", str(inp), "--mapping", str(BEAM_ANGLE),
          "--tracks", "--max-paths", "1",
          "--output", str(tmp_path / "out.xlsx")])
    hdr, rows = read_xlsx_table(tmp_path / "out.xlsx")
    assert hdr[0] == "Track" and len(rows) == 4
    assert (tmp_path / "out.png").exists()
