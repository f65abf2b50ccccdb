"""Pallas fused raster kernel vs the XLA reference pipeline."""

import numpy as np
import pytest

from slam_process_tpu.ops.raster import (
    apply_colormap_float,
    blur_nan_aware_np,
    colormap_lut,
    linear_norm,
    shifted_log_norm,
)


def _reference(mats, use_log):
    lut = colormap_lut("viridis")
    rgbas, ts = [], []
    for m in mats:
        b = blur_nan_aware_np(m.astype(np.float64), 1.0)
        t = shifted_log_norm(b) if use_log else linear_norm(b)
        rgbas.append(apply_colormap_float(t, lut))
        ts.append(t)
    return np.stack(rgbas), np.stack(ts)


@pytest.mark.parametrize("use_log", [True, False])
def test_pallas_raster_interpret(use_log):
    from slam_process_tpu.ops.pallas_raster import pallas_rasterize_batch

    rng = np.random.default_rng(30)
    mats = rng.normal(size=(3, 64, 64)).astype(np.float32) * 20 - 70
    mats[rng.random(mats.shape) < 0.05] = np.nan

    rgba, t = pallas_rasterize_batch(mats, colormap_lut("viridis"),
                                     blur_sigma=1.0, use_log=use_log,
                                     interpret=True)
    ref_rgba, ref_t = _reference(mats, use_log)

    t = np.asarray(t)
    both = np.isfinite(t) & np.isfinite(ref_t)
    assert (np.isfinite(t) == np.isfinite(ref_t)).all()
    np.testing.assert_allclose(t[both], ref_t[both], atol=2e-5)
    # Colors: identical LUT bin except float-boundary flips.
    ours_bins = np.clip((np.nan_to_num(t) * 256).astype(int), 0, 255)
    ref_bins = np.clip((np.nan_to_num(ref_t) * 256).astype(int), 0, 255)
    assert (ours_bins != ref_bins).mean() < 0.01
    d = np.abs(np.asarray(rgba) - ref_rgba)
    assert np.quantile(d, 0.99) < 1e-5


def test_pallas_raster_all_nan_row_safe():
    from slam_process_tpu.ops.pallas_raster import pallas_rasterize_batch

    mats = np.full((1, 64, 64), np.nan, dtype=np.float32)
    mats[0, 10:20, 10:20] = 5.0
    rgba, t = pallas_rasterize_batch(mats, colormap_lut("viridis"),
                                     interpret=True)
    t = np.asarray(t)
    assert np.isnan(t[0, 0, 0])
    assert np.isfinite(t[0, 12, 12])
    assert np.asarray(rgba)[0, 0, 0, 3] == 0.0  # transparent
