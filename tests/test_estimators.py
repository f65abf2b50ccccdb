"""Extended estimator families vs reference-module oracles."""

import importlib.util

import numpy as np
import pytest

from slam_process_tpu.config import DictionaryConfig, SmSicConfig
from slam_process_tpu.models.dictionary import make_dictionary
from slam_process_tpu.ops.scene import compact_grid, fill_grid, intensity_grid_np
from slam_process_tpu.config import SceneConfig


def _load_reference(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def scene_plain_091211(filtered_golden_020606, angle_lut64):
    ue, bs, rss = (filtered_golden_020606[:, i] for i in range(3))
    grid = intensity_grid_np(ue, bs, rss, cfg=SceneConfig())
    filled = fill_grid(grid, SceneConfig())
    return compact_grid(grid, filled, angle_lut64)


def test_sm_sic_matches_reference(scene_plain_091211):
    from slam_process_tpu.models.sm_sic import sm_sic_np

    matrix, ue_ang, bs_ang, _, _ = scene_plain_091211
    ref = _load_reference("ref_v3", "/root/reference/heatmap_gemini_v3.py")
    est = ref.SpatialMaskingEstimator(beam_width_deg=10.0)
    est.construct_dictionary(ue_ang.astype(np.float64),
                             bs_ang.astype(np.float64), grid_res=0.5)
    ref_paths = est.estimate_paths_sm_sic(matrix.astype(np.float64),
                                          max_paths=3,
                                          proximity_mask_radius=2.0,
                                          cross_mask_width=5.0)

    cfg = SmSicConfig(max_paths=3, beam_width=10.0, grid_res=0.5)
    d = make_dictionary(ue_ang, bs_ang,
                        DictionaryConfig(grid_res=0.5, beam_width=10.0,
                                         grid_kind="arange_inclusive"))
    ours = sm_sic_np(d, matrix, cfg)
    kept = np.nonzero(ours.valid)[0]
    assert len(kept) == len(ref_paths)
    np.testing.assert_allclose(ours.aoa[kept], ref_paths["aoa"].values, atol=1e-9)
    np.testing.assert_allclose(ours.aod[kept], ref_paths["aod"].values, atol=1e-9)
    np.testing.assert_allclose(ours.metric[kept], ref_paths["metric"].values,
                               rtol=1e-9)
    assert list(np.where(ours.is_los[kept], "LoS", "NLoS")) == \
        list(ref_paths["type"].values)


def test_sm_sic_jax_matches_np(scene_plain_091211):
    import jax
    import jax.numpy as jnp

    from slam_process_tpu.models.sm_sic import sm_sic_jax, sm_sic_np

    matrix, ue_ang, bs_ang, _, _ = scene_plain_091211
    cfg = SmSicConfig(max_paths=3, beam_width=10.0, grid_res=0.5)
    d = make_dictionary(ue_ang, bs_ang,
                        DictionaryConfig(grid_res=0.5, beam_width=10.0,
                                         grid_kind="arange_inclusive"))
    ref = sm_sic_np(d, matrix, cfg)
    fn = jax.jit(lambda *a: sm_sic_jax(*a, cfg=cfg))
    ours = fn(jnp.asarray(d.phi_rx, jnp.float32), jnp.asarray(d.phi_tx, jnp.float32),
              jnp.asarray(d.aoa_grid, jnp.float32), jnp.asarray(d.aod_grid, jnp.float32),
              jnp.asarray(matrix, jnp.float32))
    np.testing.assert_array_equal(np.asarray(ours.valid), ref.valid)
    kept = ref.valid
    np.testing.assert_allclose(np.asarray(ours.aoa)[kept], ref.aoa[kept], atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours.aod)[kept], ref.aod[kept], atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours.metric)[kept], ref.metric[kept],
                               rtol=1e-4)


def test_run_estimator_sm_sic_end_to_end(tmp_path, angle_lut64):
    from slam_process_tpu.models import run_estimator
    from slam_process_tpu.pipeline.session import Session
    from tests.conftest import BEAM_ANGLE, FILTERED_2026_02_06

    s = Session.from_filtered_xlsx(FILTERED_2026_02_06)
    df = run_estimator("sm_sic", s, BEAM_ANGLE, tmp_path / "smsic.png")
    assert (tmp_path / "smsic.png").stat().st_size > 10_000
    assert (df["type"] == "LoS").sum() == 1
