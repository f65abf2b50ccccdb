"""Matplotlib figure shim around device-computed rasters.

The engine's parity/throughput surface is the data raster produced on device
(ops/raster.py).  Human-facing PNGs additionally need figure chrome — axes,
colorbar, title, grid — which the reference draws with matplotlib
(excel_heatmap.py:360-461).  This shim feeds matplotlib the *device* results
(blurred matrix + the same norm parameters), so the drawn cells are exactly
the device raster colors while matplotlib contributes only the chrome.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence, Union

import numpy as np


def angle_edges(vals: Sequence[float]) -> np.ndarray:
    """Midpoint bin edges for pcolormesh (excel_heatmap.py:416-426)."""
    vals = np.asarray(vals, dtype=np.float64)
    if len(vals) == 1:
        return np.array([vals[0] - 0.5, vals[0] + 0.5])
    steps = np.diff(vals)
    edges = np.empty(len(vals) + 1)
    edges[1:-1] = (vals[:-1] + vals[1:]) / 2.0
    edges[0] = vals[0] - steps[0] / 2.0
    edges[-1] = vals[-1] + steps[-1] / 2.0
    return edges


def save_heatmap_figure(
    blurred_matrix: np.ndarray,      # [AoD, AoA] device-blurred values
    aod_list: Sequence[float],
    aoa_list: Sequence[float],
    output_path: Union[str, Path],
    title: str = "",
    colormap: str = "viridis",
    use_log: bool = True,
    vmin: Optional[float] = None,
    vmax: Optional[float] = None,
    dpi: int = 150,
    xlabel: str = "AoA（UE侧，度）",
    ylabel: str = "AoD（BS侧，度）",
    cbar_label: Optional[str] = None,
    axes_rect: Optional[Sequence[float]] = None,
) -> Path:
    """Draw the excel_heatmap-style pcolormesh PNG from device results.

    ``blurred_matrix`` must already carry the device blur; the shifted
    LogNorm parameters are recomputed identically to ops/raster.py so cell
    colors equal the device raster (tested in test_render.py).

    ``axes_rect`` pins the axes to an explicit figure-fraction rect
    ``(x0, y0, w, h)`` instead of ``tight_layout`` — reproducing a legacy
    render's exact layout (tight_layout's box depends on the label font's
    metrics, so a figure rendered with Windows SimHei has a slightly
    different axes box than this environment's fallback font; the golden
    parity tests pin to the golden's detected box and then compare the
    plot interior pixel-for-pixel).  The colorbar is placed beside the
    pinned axes.
    """
    import matplotlib

    matplotlib.use("Agg")
    from slam_process_tpu.render.fonts import setup_cjk_font

    setup_cjk_font()
    import matplotlib.pyplot as plt
    from matplotlib.colors import LogNorm

    mat = np.asarray(blurred_matrix, dtype=np.float64)
    finite = np.isfinite(mat)
    if not finite.any():
        raise ValueError("matrix is all-NaN; nothing to render")

    if use_log:
        data_min = np.nanmin(mat[finite])
        plot_data = mat - data_min + 1e-6
        lo = (vmin - data_min + 1e-6) if vmin is not None else np.nanmin(plot_data[finite])
        hi = (vmax - data_min + 1e-6) if vmax is not None else np.nanmax(plot_data[finite])
        norm = LogNorm(vmin=lo, vmax=hi)
    else:
        plot_data = mat
        norm = None

    if axes_rect is not None:
        fig = plt.figure(figsize=(10, 8), dpi=120)
        ax = fig.add_axes(list(axes_rect))
    else:
        fig, ax = plt.subplots(figsize=(10, 8), dpi=120)
    cmap = plt.get_cmap(colormap).copy()
    cmap.set_bad(color=(1, 1, 1, 0))
    im = ax.pcolormesh(
        angle_edges(aoa_list),
        angle_edges(aod_list),
        np.ma.masked_invalid(plot_data),
        cmap=cmap,
        norm=norm,
        vmin=None if use_log else vmin,
        vmax=None if use_log else vmax,
        shading="auto",
    )
    if axes_rect is not None:
        x0, y0, w, h = axes_rect
        cax = fig.add_axes([min(x0 + w + 0.02, 0.96), y0, 0.025, h])
        cbar = fig.colorbar(im, cax=cax)
    else:
        cbar = fig.colorbar(im, ax=ax)
    cbar.set_label(
        cbar_label
        if cbar_label is not None
        else "RSSI强度" + ("（对数刻度）" if use_log else "（线性刻度）")
    )
    ax.set_title(title)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.grid(True, linestyle="--", alpha=0.2)

    output_path = Path(output_path)
    output_path.parent.mkdir(parents=True, exist_ok=True)
    if axes_rect is None:
        fig.tight_layout()
    fig.savefig(output_path, dpi=dpi)
    plt.close(fig)
    return output_path


def save_raster_png(rgba_u8: np.ndarray, output_path: Union[str, Path]) -> Path:
    """Encode a bare device raster (no chrome) as PNG."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    output_path = Path(output_path)
    output_path.parent.mkdir(parents=True, exist_ok=True)
    plt.imsave(output_path, np.asarray(rgba_u8))
    return output_path
