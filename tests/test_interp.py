"""Direct numerical-equivalence tests for ops/interp.py against scipy.

Backs the parity claims in docs/COMPONENTS.md:

  * ``rbf_linear_fit``/``rbf_linear_eval``/``rbf_interpolate_grid`` vs
    ``scipy.interpolate.Rbf(function='linear', smooth=s)`` at the
    reference's shapes (heatmap_gemini_v1-7.py:546-564: a 64x64 angle mesh
    of centers evaluated on a 100x100 query grid, smooth=0.1);
  * ``bicubic_spline_resample`` vs ``RectBivariateSpline(kx=3, ky=3, s=0)``
    (heatmap_gemini_v2.py:81-85: 64-point angle axes upsampled to a dense
    grid).
"""

import numpy as np
import pytest

scipy_interp = pytest.importorskip("scipy.interpolate")


def _angle_axes(rng):
    """Irregular strictly-increasing angle axes like beam_angle.xlsx."""
    ue = np.sort(rng.uniform(-43.6, 45.0, size=64))
    bs = np.sort(rng.uniform(-43.6, 45.0, size=64))
    return ue, bs


@pytest.mark.parametrize("smooth", [0.0, 0.1])
def test_rbf_linear_fit_eval_vs_scipy_small(smooth):
    rng = np.random.default_rng(0)
    pts = rng.uniform(-45.0, 45.0, size=(200, 2))
    vals = rng.normal(size=200)
    q = rng.uniform(-45.0, 45.0, size=(333, 2))

    from slam_process_tpu.ops.interp import rbf_linear_eval, rbf_linear_fit

    nodes = rbf_linear_fit(pts, vals, smooth)
    ours = rbf_linear_eval(pts, nodes, q)

    rbf = scipy_interp.Rbf(pts[:, 0], pts[:, 1], vals,
                           function="linear", smooth=smooth)
    ref = rbf(q[:, 0], q[:, 1])
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-9, atol=1e-9)


def test_rbf_thin_plate_vs_scipy():
    """thin_plate kernel (heatmap_gemini_v1-3.py:441's compare figure)."""
    rng = np.random.default_rng(3)
    pts = rng.uniform(-45.0, 45.0, size=(200, 2))
    vals = rng.normal(size=200)
    q = rng.uniform(-45.0, 45.0, size=(333, 2))

    from slam_process_tpu.ops.interp import rbf_linear_eval, rbf_linear_fit

    nodes = rbf_linear_fit(pts, vals, 0.0, kernel="thin_plate")
    ours = rbf_linear_eval(pts, nodes, q, kernel="thin_plate")

    rbf = scipy_interp.Rbf(pts[:, 0], pts[:, 1], vals, function="thin_plate")
    ref = rbf(q[:, 0], q[:, 1])
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-7, atol=1e-7)


def test_rbf_thin_plate_grid_vs_scipy():
    """Compare-figure shape: 16x16 centers -> 150x150 grid, thin plate."""
    rng = np.random.default_rng(4)
    ue = np.sort(rng.uniform(-44.0, 45.0, size=16))
    bs = np.sort(rng.uniform(-44.0, 45.0, size=16))
    rss = rng.uniform(8.0, 12.0, size=(16, 16))

    from slam_process_tpu.ops.interp import rbf_interpolate_grid

    grid_x = np.linspace(bs.min(), bs.max(), 150)
    grid_y = np.linspace(ue.min(), ue.max(), 150)
    ours = np.asarray(rbf_interpolate_grid(bs, ue, rss, grid_x, grid_y,
                                           kernel="thin_plate"))

    bs_mesh, ue_mesh = np.meshgrid(bs, ue)
    rbf = scipy_interp.Rbf(bs_mesh.flatten(), ue_mesh.flatten(), rss.flatten(),
                           function="thin_plate")
    gx, gy = np.meshgrid(grid_x, grid_y)
    ref = rbf(gx, gy)
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_rbf_interpolate_grid_vs_scipy_reference_shape():
    """Full reference shape: 64x64 centers -> 100x100 grid, smooth=0.1."""
    rng = np.random.default_rng(1)
    ue, bs = _angle_axes(rng)
    rss = rng.uniform(8.0, 12.0, size=(64, 64))   # ln(RSS)-scale values

    from slam_process_tpu.ops.interp import rbf_interpolate_grid

    grid_x = np.linspace(bs.min(), bs.max(), 100)
    grid_y = np.linspace(ue.min(), ue.max(), 100)
    ours = np.asarray(rbf_interpolate_grid(bs, ue, rss, grid_x, grid_y,
                                           smooth=0.1))

    bs_mesh, ue_mesh = np.meshgrid(bs, ue)
    rbf = scipy_interp.Rbf(bs_mesh.flatten(), ue_mesh.flatten(), rss.flatten(),
                           function="linear", smooth=0.1)
    gx, gy = np.meshgrid(grid_x, grid_y)
    ref = rbf(gx, gy)
    # 4096x4096 f64 solve: agreement is limited by the kernel matrix's
    # conditioning, not the formulation.
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


def test_bicubic_spline_resample_vs_rectbivariatespline():
    rng = np.random.default_rng(2)
    ue, bs = _angle_axes(rng)
    raw = rng.uniform(0.0, 1.0, size=(64, 64))

    from slam_process_tpu.ops.interp import bicubic_spline_resample

    grid_ue = np.linspace(ue.min(), ue.max(), 300)
    grid_bs = np.linspace(bs.min(), bs.max(), 300)
    ours = np.asarray(bicubic_spline_resample(raw, bs, ue, grid_bs, grid_ue))

    spl = scipy_interp.RectBivariateSpline(ue, bs, raw)
    ref = spl(grid_ue, grid_bs)
    np.testing.assert_allclose(ours, ref, rtol=1e-8, atol=1e-10)


def test_bicubic_spline_interp_matrix_reproduces_samples():
    """The interpolation matrix must be exact at the sample points."""
    rng = np.random.default_rng(3)
    x = np.sort(rng.uniform(-45, 45, size=64))
    from slam_process_tpu.ops.interp import cubic_spline_interp_matrix

    W = cubic_spline_interp_matrix(x, x)
    np.testing.assert_allclose(W, np.eye(64), atol=1e-9)
