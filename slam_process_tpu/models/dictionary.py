"""Gaussian-beam response dictionaries for the sparse estimators.

Reference: heatmap_gemini_v1.py:146-166 (arange grids, end-exclusive) and
v1-4+/v1-7.py:177-198 (linspace grids with a >=10-point floor).  The beam
response model is a Gaussian with sigma = FWHM/2.355.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np

from slam_process_tpu.config import DictionaryConfig


def gaussian_beam(x, center, width: float):
    """exp(-(x-c)^2 / (2 sigma^2)), sigma = width/2.355 (FWHM)."""
    import jax.numpy as jnp

    xp = jnp if not isinstance(x, np.ndarray) else np
    sigma = width / 2.355
    d = x - center
    return xp.exp(-(d * d) / (2.0 * sigma * sigma))


class BeamDictionary(NamedTuple):
    aoa_grid: np.ndarray   # [Ga]
    aod_grid: np.ndarray   # [Gd]
    phi_rx: np.ndarray     # [U, Ga] response of UE beam u to AoA grid angle
    phi_tx: np.ndarray     # [B, Gd]


def make_grids(
    ue_angles: np.ndarray, bs_angles: np.ndarray, cfg: DictionaryConfig
) -> Tuple[np.ndarray, np.ndarray]:
    ue_min, ue_max = float(np.min(ue_angles)), float(np.max(ue_angles))
    bs_min, bs_max = float(np.min(bs_angles)), float(np.max(bs_angles))
    if cfg.grid_kind == "linspace":
        n_aoa = max(int((ue_max - ue_min) / cfg.grid_res) + 1, cfg.min_grid_points)
        n_aod = max(int((bs_max - bs_min) / cfg.grid_res) + 1, cfg.min_grid_points)
        return np.linspace(ue_min, ue_max, n_aoa), np.linspace(bs_min, bs_max, n_aod)
    if cfg.grid_kind == "arange":
        return (
            np.arange(ue_min, ue_max, cfg.grid_res),
            np.arange(bs_min, bs_max, cfg.grid_res),
        )
    if cfg.grid_kind == "arange_inclusive":  # heatmap_gemini_v3.py:122-123
        return (
            np.arange(ue_min, ue_max + cfg.grid_res, cfg.grid_res),
            np.arange(bs_min, bs_max + cfg.grid_res, cfg.grid_res),
        )
    raise ValueError(f"unknown grid_kind {cfg.grid_kind!r}")


def make_dictionary(
    ue_angles: np.ndarray,
    bs_angles: np.ndarray,
    cfg: DictionaryConfig = DictionaryConfig(),
    dtype=np.float64,
) -> BeamDictionary:
    aoa_grid, aod_grid = make_grids(ue_angles, bs_angles, cfg)
    phi_rx = gaussian_beam(
        np.asarray(ue_angles, dtype)[:, None], aoa_grid[None, :].astype(dtype),
        cfg.beam_width,
    )
    phi_tx = gaussian_beam(
        np.asarray(bs_angles, dtype)[:, None], aod_grid[None, :].astype(dtype),
        cfg.beam_width,
    )
    return BeamDictionary(aoa_grid.astype(dtype), aod_grid.astype(dtype),
                          phi_rx, phi_tx)
