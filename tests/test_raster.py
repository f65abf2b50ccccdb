"""Raster pipeline tests vs matplotlib/reference-algorithm oracles."""

import math

import numpy as np
import pytest

from slam_process_tpu.ops.raster import (
    apply_colormap,
    blur_nan_aware_jax,
    blur_nan_aware_np,
    colormap_lut,
    gaussian_kernel_np,
    linear_norm,
    rasterize,
    shifted_log_norm,
)


def literal_blur_oracle(data, sigma):
    """The reference's O(H*W*kh*kw) loop, written independently for tests."""
    if sigma <= 0:
        return data
    k = gaussian_kernel_np(sigma)
    kh, kw = k.shape
    ph, pw = kh // 2, kw // 2
    mask = np.isfinite(data).astype(np.float64)
    filled = np.nan_to_num(data, nan=0.0)
    pdata = np.pad(filled, ((ph, ph), (pw, pw)), mode="edge")
    pmask = np.pad(mask, ((ph, ph), (pw, pw)), mode="edge")
    H, W = data.shape
    out = np.zeros_like(filled)
    for i in range(H):
        for j in range(W):
            region = pdata[i : i + kh, j : j + kw]
            rmask = pmask[i : i + kh, j : j + kw]
            w = k * rmask
            n = w.sum()
            out[i, j] = (region * w).sum() / n if n > 1e-12 else np.nan
    return out


def test_kernel_size_and_normalization():
    k = gaussian_kernel_np(1.0)
    assert k.shape == (7, 7)  # ceil(6*1)=6 -> 7
    assert k.sum() == pytest.approx(1.0)
    assert gaussian_kernel_np(0.4).shape == (3, 3)
    assert gaussian_kernel_np(0.0).shape == (1, 1)


@pytest.mark.parametrize("sigma", [0.5, 1.0, 2.0])
def test_blur_matches_literal_loop(sigma):
    rng = np.random.default_rng(11)
    data = rng.normal(size=(20, 17)) * 50 - 80
    data[rng.random((20, 17)) < 0.15] = np.nan
    ours = blur_nan_aware_np(data, sigma)
    oracle = literal_blur_oracle(data, sigma)
    np.testing.assert_allclose(
        np.nan_to_num(ours, nan=-1e9), np.nan_to_num(oracle, nan=-1e9), atol=1e-10
    )


def test_blur_jax_matches_np():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(12)
    data = rng.normal(size=(64, 64)) * 30 - 90
    data[rng.random((64, 64)) < 0.1] = np.nan
    ours = np.asarray(jax.jit(lambda x: blur_nan_aware_jax(x, 1.0))(
        jnp.asarray(data, dtype=jnp.float32)))
    ref = blur_nan_aware_np(data, 1.0)
    np.testing.assert_allclose(
        np.nan_to_num(ours, nan=-1e9), np.nan_to_num(ref, nan=-1e9),
        rtol=2e-5, atol=2e-4,
    )


def test_shifted_lognorm_matches_matplotlib():
    from matplotlib.colors import LogNorm

    rng = np.random.default_rng(13)
    mat = rng.normal(size=(40, 40)) * 25 - 70  # negative RSSI-like values
    mat[rng.random((40, 40)) < 0.08] = np.nan

    # Reference path (excel_heatmap.py:394-404).
    finite = np.isfinite(mat)
    mn = np.nanmin(mat[finite])
    shifted = mat - mn + 1e-6
    norm = LogNorm(vmin=np.nanmin(shifted[finite]), vmax=np.nanmax(shifted[finite]))
    oracle = np.ma.filled(norm(np.ma.masked_invalid(shifted)), np.nan)
    oracle = np.clip(oracle, 0.0, 1.0)

    ours = shifted_log_norm(mat)
    np.testing.assert_allclose(
        np.nan_to_num(ours, nan=-1), np.nan_to_num(oracle, nan=-1), atol=1e-9
    )


def test_colormap_matches_matplotlib():
    import matplotlib

    cmap = matplotlib.colormaps["viridis"].copy()
    cmap.set_bad((1, 1, 1, 0))
    rng = np.random.default_rng(14)
    t = rng.random((30, 30))
    t[0, 0] = 0.0
    t[0, 1] = 1.0
    t[1, 0] = np.nan

    oracle = cmap(np.ma.masked_invalid(t))  # float RGBA
    ours = apply_colormap(t, colormap_lut("viridis")).astype(np.float64) / 255.0
    # NaN cell: ours is (0,0,0,0); oracle bad color (1,1,1,0) — compare
    # premultiplied-by-alpha form, which is what compositing shows.
    oa = oracle * oracle[..., 3:4]
    ua = ours * ours[..., 3:4]
    assert np.max(np.abs(oa - ua)) <= (0.5 / 255.0) + 1e-7


def test_full_raster_pipeline_matches_matplotlib():
    import matplotlib
    from matplotlib.colors import LogNorm

    rng = np.random.default_rng(15)
    mat = rng.normal(size=(64, 64)) * 20 - 75
    mat[rng.random((64, 64)) < 0.05] = np.nan

    rgba, blurred = rasterize(mat, blur_sigma=1.0, use_log=True, as_u8=False)

    # Oracle: the reference's generate_heatmap data path.
    m = literal_blur_oracle(mat, 1.0)
    finite = np.isfinite(m)
    mn = np.nanmin(m[finite])
    shifted = m - mn + 1e-6
    norm = LogNorm(vmin=np.nanmin(shifted[finite]), vmax=np.nanmax(shifted[finite]))
    cmap = matplotlib.colormaps["viridis"].copy()
    cmap.set_bad((1, 1, 1, 0))
    oracle = cmap(norm(np.ma.masked_invalid(shifted)))

    oa = oracle * oracle[..., 3:4]
    ua = np.asarray(rgba) * np.asarray(rgba)[..., 3:4]
    assert np.max(np.abs(oa - ua)) <= 1e-3  # the BASELINE.json pixel budget


def test_raster_jax_matches_np():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(16)
    mat = rng.normal(size=(64, 64)) * 20 - 75
    mat[rng.random((64, 64)) < 0.05] = np.nan

    rgba_np, _ = rasterize(mat, blur_sigma=1.0, use_log=True)
    fn = jax.jit(lambda x: rasterize(x, blur_sigma=1.0, use_log=True)[0])
    rgba_jax = np.asarray(fn(jnp.asarray(mat, dtype=jnp.float32)))
    diff = np.abs(rgba_np.astype(int) - rgba_jax.astype(int))
    assert np.quantile(diff, 0.999) <= 1  # f32 vs f64: at most off-by-one u8
    assert diff.max() <= 3


def test_linear_norm_path():
    mat = np.array([[0.0, 5.0], [10.0, np.nan]])
    t = linear_norm(mat)
    np.testing.assert_allclose(t[:2, :2].ravel()[:3], [0.0, 0.5, 1.0])
    assert np.isnan(t[1, 1])
