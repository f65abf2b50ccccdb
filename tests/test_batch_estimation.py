"""Whole-dataset batched NN-OMP == per-session device engine.

models/batch_estimation.py pads N sessions to a common static shape and
vmaps the jitted estimator; the padding argument (zero phi rows/columns)
claims exact selection/coefficient parity — these tests check it against
both the per-session device engine and the float64 host oracle on real
sessions plus adversarial synthetic shapes.
"""

import numpy as np
import pytest

from slam_process_tpu.config import DictionaryConfig, OmpConfig


@pytest.fixture(scope="module")
def two_sessions():
    from slam_process_tpu.pipeline.session import Session
    from tests.conftest import FILTERED_2026_02_06, SMALL_FILTERED

    return [Session.from_filtered_xlsx(SMALL_FILTERED),
            Session.from_filtered_xlsx(FILTERED_2026_02_06)]


def test_batched_matches_per_session_device(two_sessions):
    """estimate_sessions == run_nn_omp(engine='device') per session."""
    from slam_process_tpu.models.batch_estimation import estimate_sessions
    from slam_process_tpu.models.dictionary import make_dictionary
    from slam_process_tpu.models.nn_omp import run_nn_omp
    from slam_process_tpu.models.registry import build_scene
    from tests.conftest import BEAM_ANGLE

    cfg = OmpConfig(max_paths=20, min_power_ratio=0.0003)
    dict_cfg = DictionaryConfig(grid_res=0.1, beam_width=1.4,
                                grid_kind="linspace")

    batched = estimate_sessions(two_sessions, BEAM_ANGLE, flavor="v1-7")
    for s, got in zip(two_sessions, batched):
        matrix, ue_ang, bs_ang = build_scene(s, BEAM_ANGLE, True)
        d = make_dictionary(ue_ang, bs_ang, dict_cfg)
        ref = run_nn_omp(d, matrix, cfg, keep_rule="ratio",
                         stop_nonpositive=True, engine="device")
        assert int(got.n_iters) == int(ref.n_iters)
        n = int(ref.n_iters)
        np.testing.assert_array_equal(got.aoa_idx[:n], ref.aoa_idx[:n])
        np.testing.assert_array_equal(got.aod_idx[:n], ref.aod_idx[:n])
        np.testing.assert_allclose(got.power[:n], ref.power[:n],
                                   rtol=2e-4, atol=1e-5)
        np.testing.assert_array_equal(got.valid, ref.valid)


def test_batched_matches_host_oracle_synthetic():
    """Padded batch == float64 oracle on sessions of very different sizes
    (exercises heavy padding on every axis)."""
    from slam_process_tpu.models.batch_estimation import (
        nn_omp_sessions_device,
        pack_scenes,
    )
    from slam_process_tpu.models.dictionary import make_dictionary
    from slam_process_tpu.models.nn_omp import nn_omp_np

    rng = np.random.default_rng(5)
    cfg = OmpConfig(max_paths=4)
    mats, dicts = [], []
    for (u, b, span) in [(6, 9, 20.0), (16, 4, 55.0), (10, 10, 8.0)]:
        ue_ang = np.sort(rng.uniform(-span, span, u))
        bs_ang = np.sort(rng.uniform(-span, span, b))
        d = make_dictionary(ue_ang, bs_ang,
                            DictionaryConfig(grid_res=0.5, beam_width=1.4,
                                             grid_kind="linspace"))
        # A few planted atoms + noise, all positive.
        m = rng.random((u, b)) * 0.1
        for _ in range(3):
            i, j = rng.integers(u), rng.integers(b)
            m += 2.0 * np.outer(d.phi_rx[:, rng.integers(len(d.aoa_grid))],
                                d.phi_tx[:, rng.integers(len(d.aod_grid))])
        mats.append(m)
        dicts.append(d)

    packed = pack_scenes(mats, dicts)
    import jax

    out = jax.device_get(nn_omp_sessions_device(packed, cfg, "ratio", True))
    for i, (m, d) in enumerate(zip(mats, dicts)):
        ref = nn_omp_np(d, m, cfg, keep_rule="ratio", stop_nonpositive=True)
        n = int(ref.n_iters)
        assert int(out[i].n_iters) == n, f"session {i}"
        np.testing.assert_array_equal(out[i].aoa_idx[:n], ref.aoa_idx[:n])
        np.testing.assert_array_equal(out[i].aod_idx[:n], ref.aod_idx[:n])
        np.testing.assert_allclose(out[i].power[:n], ref.power[:n],
                                   rtol=1e-3, atol=1e-5)


def test_vmapped_batch_matches_dispatch(two_sessions):
    """The vmapped [N, ...] formulation (kept for in-program fan-out like
    the per-sweep dataset path) returns the same paths as the dispatch
    path on identical packed inputs."""
    import jax
    import jax.numpy as jnp

    from slam_process_tpu.models.batch_estimation import (
        _batched_nn_omp_fn,
        nn_omp_sessions_device,
        pack_scenes,
    )
    from slam_process_tpu.models.dictionary import make_dictionary
    from slam_process_tpu.models.registry import build_scene
    from tests.conftest import BEAM_ANGLE

    cfg = OmpConfig(max_paths=8, min_power_ratio=0.0003)
    dict_cfg = DictionaryConfig(grid_res=0.3, beam_width=1.4,
                                grid_kind="linspace")
    mats, dicts = [], []
    for s in two_sessions:
        matrix, ue_ang, bs_ang = build_scene(s, BEAM_ANGLE, True)
        mats.append(matrix)
        dicts.append(make_dictionary(ue_ang, bs_ang, dict_cfg))
    packed = pack_scenes(mats, dicts)

    disp = jax.device_get(nn_omp_sessions_device(packed, cfg, "ratio", True))
    args = (jnp.asarray(packed.matrices), jnp.asarray(packed.phi_rx),
            jnp.asarray(packed.phi_tx), jnp.asarray(packed.aoa_grid),
            jnp.asarray(packed.aod_grid))
    vm = jax.device_get(_batched_nn_omp_fn(cfg, "ratio", True)(*args))
    # The gram-domain comparator form (kept for device-plane adjudication,
    # tools/diag_session_est.py) must select identically too.
    gram = jax.device_get(_batched_nn_omp_fn(cfg, "ratio", True,
                                             form="gram")(*args))
    for i in range(len(mats)):
        n = int(disp[i].n_iters)
        for got in (vm, gram):
            assert int(got.n_iters[i]) == n
            np.testing.assert_array_equal(got.aoa_idx[i][:n],
                                          disp[i].aoa_idx[:n])
            np.testing.assert_array_equal(got.aod_idx[i][:n],
                                          disp[i].aod_idx[:n])
            np.testing.assert_allclose(got.power[i][:n], disp[i].power[:n],
                                       rtol=1e-4, atol=1e-6)
