"""v1-3 estimator variant: preprocessing + compare-visualizations figure.

Reference: heatmap_gemini_v1-3.py — the v1 NN-OMP core plus a power-data
preprocessing stage (log/power/quantile/adaptive, :119-197) and a
``compare_visualizations`` dual-panel figure (original vs optimized
heatmap backgrounds, thin-plate RBF + PowerNorm, :420-517).
"""

from __future__ import annotations

import numpy as np

from slam_process_tpu.config import DictionaryConfig, OmpConfig
from slam_process_tpu.models.classifiers import classify_argmax
from slam_process_tpu.models.dictionary import make_dictionary
from slam_process_tpu.models.nn_omp import run_nn_omp
from slam_process_tpu.models.preprocess import preprocess_power
from slam_process_tpu.models.registry import build_scene, paths_dataframe, register


@register("nn_omp_v13")
def _run_v13(session, angle_file, output_path=None,
             preprocess: str = "adaptive", **overrides):
    matrix, ue_ang, bs_ang = build_scene(session, angle_file, log_transform=False)
    processed = preprocess_power(matrix, preprocess)

    d = make_dictionary(
        ue_ang, bs_ang,
        DictionaryConfig(grid_res=overrides.get("grid_res", 0.1),
                         beam_width=overrides.get("beam_width", 1.4),
                         grid_kind="arange"),
    )
    paths = run_nn_omp(d, matrix,
                       OmpConfig(max_paths=overrides.get("max_paths", 3)),
                       keep_rule="positive", stop_nonpositive=False,
                       engine=overrides.get("engine", "host"))
    classified = classify_argmax(paths.aoa, paths.aod, paths.power, paths.valid)

    if output_path is not None:
        _compare_plot(matrix, processed, ue_ang, bs_ang, classified,
                      output_path, preprocess)
    return paths_dataframe(classified)


def _compare_plot(original, processed, ue_ang, bs_ang, classified,
                  output_path, method: str):
    """The reference's ``compare_visualizations`` original-vs-optimized
    dual panel (heatmap_gemini_v1-3.py:420-470): 150x150 thin-plate RBF
    backgrounds; the optimized panel rendered with PowerNorm(gamma=0.5)
    on the 'hot' colormap, the original with plain viridis; LoS marked as
    a red circle with white edge on both panels."""
    from pathlib import Path

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.colors import PowerNorm

    from slam_process_tpu.models.classifiers import LOS
    from slam_process_tpu.ops.interp import rbf_interpolate_grid

    grid_x = np.linspace(float(np.min(bs_ang)), float(np.max(bs_ang)), 150)
    grid_y = np.linspace(float(np.min(ue_ang)), float(np.max(ue_ang)), 150)
    mx, my = np.meshgrid(grid_x, grid_y)

    fig, axes = plt.subplots(1, 2, figsize=(20, 8))
    for ax, mat, use_processed, suffix in (
        (axes[0], original, False, "Original"),
        (axes[1], processed, True, "Optimized"),
    ):
        try:
            heat = np.asarray(rbf_interpolate_grid(
                bs_ang, ue_ang, np.asarray(mat, dtype=np.float64),
                grid_x, grid_y, smooth=0.0, kernel="thin_plate"))
        except Exception:   # RBF failure fallback as in the v1 lineage
            heat = np.zeros((150, 150))
        norm = PowerNorm(gamma=0.5) if use_processed else None
        cmap = "hot" if use_processed else "viridis"
        cf = ax.contourf(mx, my, heat, levels=80, cmap=cmap, norm=norm)
        fig.colorbar(cf, ax=ax, label="RSS Power")
        los = np.nonzero(np.asarray(classified.label) == LOS)[0]
        if los.size:
            ax.scatter(classified.aod[los], classified.aoa[los], c="red",
                       marker="o", s=200, edgecolors="white", linewidth=2,
                       label="LoS", zorder=5)
            ax.legend()
        ax.set_xlabel("AoD [deg]", fontsize=11)
        ax.set_ylabel("AoA [deg]", fontsize=11)
        ax.set_title(f"Heatmap - {suffix} Data", fontsize=13,
                     fontweight="bold")
        ax.grid(alpha=0.3)
    fig.tight_layout()
    output_path = Path(output_path)
    output_path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(output_path, dpi=300, bbox_inches="tight")
    plt.close(fig)
