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
    """Dual panel: original vs preprocessed background + LoS marker."""
    from pathlib import Path

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from slam_process_tpu.models.classifiers import LOS
    from slam_process_tpu.render.estimation import rbf_background

    fig, axes = plt.subplots(1, 2, figsize=(20, 8))
    for ax, mat, title in (
        (axes[0], original, "原始数据热力图"),
        (axes[1], processed, f"优化后热力图 ({method})"),
    ):
        gx, gy, heat = rbf_background(mat, ue_ang, bs_ang, 100, 0.0)
        mx, my = np.meshgrid(gx, gy)
        cf = ax.contourf(mx, my, heat, levels=50, cmap="viridis")
        fig.colorbar(cf, ax=ax, label="RSS Power")
        los = np.nonzero(np.asarray(classified.label) == LOS)[0]
        if los.size:
            ax.scatter(classified.aod[los], classified.aoa[los], c="red",
                       marker="o", s=150, edgecolors="black", linewidth=2,
                       label="LoS Path")
            ax.legend()
        ax.set_xlabel("Angle of Departure (AoD) [deg]")
        ax.set_ylabel("Angle of Arrival (AoA) [deg]")
        ax.set_title(title)
        ax.grid(alpha=0.3)
    fig.tight_layout()
    output_path = Path(output_path)
    output_path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(output_path, dpi=150, bbox_inches="tight")
    plt.close(fig)
