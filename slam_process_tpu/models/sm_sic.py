"""SM-SIC: spatial-masking successive interference cancellation.

Reference: heatmap_gemini_v3.py:98-214.  One matched-filter correlation
``Phi_RX^T @ RSS @ Phi_TX`` over an inclusive-arange grid, then up to
max_paths peak extractions; after the LoS peak a circular proximity mask
plus a *cross* mask (the sidelobe ridges along both angle axes) is applied,
NLoS peaks get a small circular mask; stop when a peak falls below
stop_ratio x the LoS metric.  The loop is a fixed-trip ``lax.scan`` with a
running multiplicative mask — entirely on device (the correlation matmul is
the only heavy op).

Reference driver params (v3.py:310-320): beam_width 10 deg, grid 0.5 deg,
max_paths 3, proximity 2 deg, cross width 5 deg.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from slam_process_tpu.config import DictionaryConfig, SmSicConfig
from slam_process_tpu.models.dictionary import make_dictionary
from slam_process_tpu.models.registry import build_scene, register


class SmSicPaths(NamedTuple):
    aoa: np.ndarray      # [K]
    aod: np.ndarray
    metric: np.ndarray   # correlation peak value
    valid: np.ndarray    # [K] bool
    is_los: np.ndarray   # [K] bool (slot 0 when valid)


def sm_sic_np(dictionary, rss_matrix: np.ndarray, cfg: SmSicConfig) -> SmSicPaths:
    """Float64 host oracle with reference-exact control flow."""
    corr = dictionary.phi_rx.T @ rss_matrix.astype(np.float64) @ dictionary.phi_tx
    aoa_g, aod_g = dictionary.aoa_grid, dictionary.aod_grid
    AOA, AOD = np.meshgrid(aoa_g, aod_g, indexing="ij")
    mask = np.ones_like(corr)

    K = cfg.max_paths
    aoa = np.zeros(K)
    aod = np.zeros(K)
    metric = np.zeros(K)
    valid = np.zeros(K, dtype=bool)
    los_metric = None
    for k in range(K):
        masked = corr * mask
        idx = np.unravel_index(np.argmax(masked), masked.shape)
        peak = masked[idx]
        a, d = aoa_g[idx[0]], aod_g[idx[1]]
        if k > 0 and los_metric is not None and peak < cfg.stop_ratio * los_metric:
            break
        aoa[k], aod[k], metric[k], valid[k] = a, d, peak, True
        if k == 0:
            los_metric = peak
            dist_sq = (AOA - a) ** 2 + (AOD - d) ** 2
            mask *= dist_sq > cfg.proximity_mask_radius**2
            mask *= np.abs(AOD - d) > (cfg.cross_mask_width / 2)
            mask *= np.abs(AOA - a) > (cfg.cross_mask_width / 2)
        else:
            dist_sq = (AOA - a) ** 2 + (AOD - d) ** 2
            mask *= dist_sq > cfg.nlos_mask_radius**2
    is_los = np.zeros(K, dtype=bool)
    if valid[0]:
        is_los[0] = True
    return SmSicPaths(aoa, aod, metric, valid, is_los)


def sm_sic_jax(phi_rx, phi_tx, aoa_grid, aod_grid, rss_matrix,
               cfg: SmSicConfig) -> SmSicPaths:
    """Jittable SM-SIC (fixed-trip scan over peak extractions)."""
    import jax
    import jax.numpy as jnp

    corr = jnp.einsum(
        "ug,ub,bh->gh", phi_rx, rss_matrix, phi_tx,
        preferred_element_type=jnp.float32, precision="highest",
    )
    Ga, Gd = corr.shape
    AOA = aoa_grid[:, None] * jnp.ones((1, Gd), corr.dtype)
    AOD = jnp.ones((Ga, 1), corr.dtype) * aod_grid[None, :]

    def body(carry, k):
        mask, los_metric, stopped = carry
        masked = corr * mask
        flat = jnp.argmax(masked)
        i, j = flat // Gd, flat % Gd
        peak = masked[i, j]
        a, d = aoa_grid[i], aod_grid[j]

        stop_now = stopped | ((k > 0) & (peak < cfg.stop_ratio * los_metric))
        is_first = k == 0

        dist_sq = (AOA - a) ** 2 + (AOD - d) ** 2
        los_mask = (
            (dist_sq > cfg.proximity_mask_radius**2)
            & (jnp.abs(AOD - d) > cfg.cross_mask_width / 2)
            & (jnp.abs(AOA - a) > cfg.cross_mask_width / 2)
        )
        nlos_mask = dist_sq > cfg.nlos_mask_radius**2
        new_mask = jnp.where(is_first, los_mask, nlos_mask).astype(corr.dtype)
        mask_out = jnp.where(stop_now, mask, mask * new_mask)
        los_out = jnp.where(is_first & ~stop_now, peak, los_metric)
        out = (a, d, peak, ~stop_now, is_first & ~stop_now)
        return (mask_out, los_out, stop_now), out

    init = (jnp.ones_like(corr), jnp.float32(0.0), jnp.bool_(False))
    _, (aoa, aod, metric, valid, is_los) = jax.lax.scan(
        body, init, jnp.arange(cfg.max_paths)
    )
    return SmSicPaths(aoa, aod, metric, valid, is_los)


@register("sm_sic")
def _run_sm_sic(session, angle_file, output_path=None, **overrides):
    import pandas as pd

    from slam_process_tpu.models.classifiers import (
        ClassifiedPaths,
        LOS,
        NLOS,
        NOISE,
    )
    from slam_process_tpu.render.estimation import estimation_plot

    cfg = SmSicConfig(
        max_paths=overrides.get("max_paths", 3),
        beam_width=overrides.get("beam_width", 10.0),
        grid_res=overrides.get("grid_res", 0.5),
        proximity_mask_radius=overrides.get("proximity_mask_radius", 2.0),
        cross_mask_width=overrides.get("cross_mask_width", 5.0),
    )
    matrix, ue_ang, bs_ang = build_scene(session, angle_file, log_transform=False)
    d = make_dictionary(
        ue_ang, bs_ang,
        DictionaryConfig(grid_res=cfg.grid_res, beam_width=cfg.beam_width,
                         grid_kind="arange_inclusive"),
    )
    if overrides.get("engine") == "device":
        import functools

        import jax
        import jax.numpy as jnp

        from slam_process_tpu.utils.cache import enable_persistent_cache
        enable_persistent_cache()
        from slam_process_tpu.utils.precision import jit_highest

        fn = jit_highest(functools.partial(sm_sic_jax, cfg=cfg))
        out = fn(jnp.asarray(d.phi_rx, jnp.float32),
                 jnp.asarray(d.phi_tx, jnp.float32),
                 jnp.asarray(d.aoa_grid, jnp.float32),
                 jnp.asarray(d.aod_grid, jnp.float32),
                 jnp.asarray(matrix, jnp.float32))
        paths = jax.device_get(out)   # one batched pytree transfer
    else:
        paths = sm_sic_np(d, matrix, cfg)
    label = np.where(paths.is_los, LOS, np.where(paths.valid, NLOS, NOISE))
    classified = ClassifiedPaths(paths.aoa, paths.aod, paths.metric,
                                 label.astype(np.int32), paths.valid)
    if output_path is not None:
        estimation_plot(matrix, ue_ang, bs_ang, classified, output_path,
                        style="v1",
                        title="mmWave Beamspace Heatmap & SM-SIC Path "
                              "Identification")
    keep = paths.valid
    return pd.DataFrame({
        "id": np.arange(1, cfg.max_paths + 1)[keep],
        "type": np.where(paths.is_los[keep], "LoS", "NLoS"),
        "aoa": paths.aoa[keep],
        "aod": paths.aod[keep],
        "metric": paths.metric[keep],
    })
