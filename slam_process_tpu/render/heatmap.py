"""Heatmap rendering orchestration (the excel_heatmap family, L6).

Maps the three excel_heatmap generations onto one engine path
(SURVEY.md section 2.3):

  * v1: Parsed input, mean pivot with NaN cells, optional blur + shifted
    LogNorm render;
  * v2: + keep only FLAG==1 rows (excel_heatmap_v2.py:165-166);
  * v3: filtered-schema input (UE_Beam/BS_Beam/RSS值), log scale default on.

The intensity grid and raster run on device; figure chrome via the shim.
Note the render is AoD x AoA (BS rows, UE cols) — the transpose of the
UE-major scene grid (excel_heatmap.py:272-300 pivots index='AoD').
"""

from __future__ import annotations

from pathlib import Path
from typing import NamedTuple, Union

import numpy as np

from slam_process_tpu.config import RenderConfig, SceneConfig
from slam_process_tpu.ops.raster import colormap_lut, rasterize
from slam_process_tpu.ops.scene import IntensityGrid, compact_grid, fill_grid
from slam_process_tpu.render.figures import save_heatmap_figure


class RenderedHeatmap(NamedTuple):
    rgba: np.ndarray          # [AoD, AoA, 4] device raster (u8 or float)
    blurred: np.ndarray       # [AoD, AoA] blurred matrix (render input)
    aod_angles: np.ndarray
    aoa_angles: np.ndarray


def render_intensity(
    grid: IntensityGrid,
    angle_lut: np.ndarray,
    scene_cfg: SceneConfig = SceneConfig(keep_nan=True, fill_with_min=False),
    render_cfg: RenderConfig = RenderConfig(),
    as_u8: bool = True,
) -> RenderedHeatmap:
    """Intensity grid -> device raster in AoD x AoA orientation."""
    filled = fill_grid(grid, scene_cfg)
    matrix_ue_bs, ue_ang, bs_ang, _, _ = compact_grid(grid, np.asarray(filled), angle_lut)
    matrix = np.asarray(matrix_ue_bs).T  # AoD rows, AoA cols
    rgba, blurred = rasterize(
        matrix,
        blur_sigma=render_cfg.blur_sigma,
        use_log=render_cfg.use_log,
        vmin=render_cfg.vmin,
        vmax=render_cfg.vmax,
        lut=colormap_lut(render_cfg.colormap),
        as_u8=as_u8,
    )
    return RenderedHeatmap(np.asarray(rgba), np.asarray(blurred), bs_ang, ue_ang)


def save_heatmap(
    rendered: RenderedHeatmap,
    output_path: Union[str, Path],
    title: str = "",
    render_cfg: RenderConfig = RenderConfig(),
    axes_rect=None,
) -> Path:
    """Write the human-facing PNG (figure chrome around the device blur)."""
    return save_heatmap_figure(
        rendered.blurred,
        aod_list=rendered.aod_angles,
        aoa_list=rendered.aoa_angles,
        output_path=output_path,
        title=title,
        colormap=render_cfg.colormap,
        use_log=render_cfg.use_log,
        vmin=render_cfg.vmin,
        vmax=render_cfg.vmax,
        dpi=render_cfg.dpi,
        axes_rect=axes_rect,
    )
