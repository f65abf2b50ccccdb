"""Registry integrity: every estimator family registers and runs.

Guards against silent registry degradation (a broken extended module used
to vanish via ``except ImportError: pass``; registry now fails loudly) and
asserts each of the 13 names produces a paths DataFrame on a real session.
"""

import numpy as np
import pandas as pd
import pytest

EXPECTED = {
    "nn_omp",
    "nn_omp_v1",
    "nn_omp_v13",
    "nn_omp_v14",
    "nn_omp_v15",
    "nn_omp_v16",
    "sm_sic",
    "svd",
    "fusion",
    "peak_picking",
    "lasso_refine",
    "omp_dense",
    "geometric",
}


def test_registry_contains_all_13_estimators():
    from slam_process_tpu.models import registry

    assert set(registry._REGISTRY) == EXPECTED


def test_register_extended_raises_on_broken_module(monkeypatch):
    import importlib

    from slam_process_tpu.models import registry

    real_import = importlib.import_module

    def broken(name, *a, **k):
        if name.endswith(".fusion"):
            raise RuntimeError("synthetic breakage")
        return real_import(name, *a, **k)

    monkeypatch.setattr(importlib, "import_module", broken)
    with pytest.raises(ImportError, match="fusion"):
        registry._register_extended()


@pytest.fixture(scope="module")
def session():
    from slam_process_tpu.pipeline.session import Session
    from tests.conftest import FILTERED_2026_02_06

    return Session.from_filtered_xlsx(FILTERED_2026_02_06)


@pytest.mark.parametrize("name", sorted(EXPECTED))
def test_every_estimator_runs(name, session):
    from slam_process_tpu.models import run_estimator
    from tests.conftest import BEAM_ANGLE

    df = run_estimator(name, session, BEAM_ANGLE, None)
    assert isinstance(df, pd.DataFrame)
    assert len(df) >= 1
    # Every family reports angle columns within the scanned sector.
    for col in df.columns:
        if col.lower() in ("aoa", "aod"):
            vals = np.asarray(df[col], dtype=float)
            assert np.all(np.isfinite(vals))
            assert np.all((vals >= -90.0) & (vals <= 90.0))
