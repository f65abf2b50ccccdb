"""Dense-dictionary OMP sparse deconvolution (heatmap_gemini_v1-2.py).

The reference materializes a [n_samples, Ga*Gd] dense dictionary of
separable Gaussian atoms, column-normalizes it, and runs sklearn
OrthogonalMatchingPursuit with n_nonzero_coefs=N_PATHS (v1-2.py:143-175).
TPU-native formulation: never materialize the dictionary — atom columns are
separable, so

    column_norms^2[g, h] = sum_m rx^2[m, g] * tx^2[m, h]
    correlations[g, h]   = sum_m r[m] * rx[m, g] * tx[m, h]

are each ONE [Ga x M x Gd] two-matmul chain (MXU), and the LS refit runs on
the <=K selected columns only.  Matches sklearn to float tolerance
(tests/test_estimators.py) while using O(M*K) memory instead of O(M*Ga*Gd).

Defaults from the reference Config (v1-2.py:18-33): GRID_RES 0.5,
BEAM_WIDTH 1.4, N_PATHS 5, LOS_POWER_MARGIN 0.8.


Engine note: this family intentionally stays on the host oracle path — it
exists as the sklearn-OMP-equivalence experiment (atoms/coefficients are
parity-tested against sklearn to 1e-6), its Gram/LS refits are tiny and
support-size-dynamic, and the flagship jitted NN-OMP covers the production
matching-pursuit use case.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from slam_process_tpu.models.dictionary import gaussian_beam
from slam_process_tpu.models.registry import register


class DenseOmpPaths(NamedTuple):
    aoa: np.ndarray
    aod: np.ndarray
    power: np.ndarray       # coefficient in the reference's scale
    valid: np.ndarray


def omp_dense_np(
    meas_aoa: np.ndarray,     # [M] observed AoA per sample
    meas_aod: np.ndarray,     # [M]
    y: np.ndarray,            # [M] RSS values
    aoa_grid: np.ndarray,
    aod_grid: np.ndarray,
    beam_width: float = 1.4,
    n_paths: int = 5,
) -> DenseOmpPaths:
    """Separable OMP == sklearn OMP on the normalized dense dictionary.

    sklearn OMP selects argmax |D^T r|, refits LS on the selected columns,
    and returns coefficients in the *normalized* dictionary scale; the
    reference then keeps coefs > 0 (v1-2.py:178-180).
    """
    rx = gaussian_beam(meas_aoa[:, None], aoa_grid[None, :], beam_width)
    tx = gaussian_beam(meas_aod[:, None], aod_grid[None, :], beam_width)
    # Column norms of the implicit dictionary (for normalization).
    norms = np.sqrt(np.einsum("mg,mh->gh", rx**2, tx**2))
    norms = np.maximum(norms, 1e-300)

    Ga, Gd = len(aoa_grid), len(aod_grid)
    selected: list[tuple[int, int]] = []
    cols: list[np.ndarray] = []
    residual = y.astype(np.float64).copy()
    coefs = np.zeros(0)
    for _ in range(n_paths):
        corr = np.einsum("m,mg,mh->gh", residual, rx, tx) / norms
        corr_flat = np.abs(corr).ravel()
        for g, h in selected:          # sklearn never reselects a column
            corr_flat[g * Gd + h] = -np.inf
        j = int(np.argmax(corr_flat))
        g, h = j // Gd, j % Gd
        selected.append((g, h))
        cols.append(rx[:, g] * tx[:, h] / norms[g, h])
        A = np.stack(cols, axis=1)
        coefs, *_ = np.linalg.lstsq(A, y, rcond=None)
        residual = y - A @ coefs

    aoa = np.array([aoa_grid[g] for g, _ in selected])
    aod = np.array([aod_grid[h] for _, h in selected])
    valid = coefs > 0   # reference keeps positive coefficients only
    return DenseOmpPaths(aoa, aod, coefs, valid)


@register("omp_dense")
def _run_omp_dense(session, angle_file, output_path=None, **overrides):
    import pandas as pd

    from slam_process_tpu.io.angles import load_angle_lut

    if session.filtered is None:
        session.correct()
    ue, bs, rss = (session.filtered[:, i] for i in range(3))
    df = pd.DataFrame({"RxBeamID": ue, "TxBeamID": bs, "RSS": rss})
    grouped = df.groupby(["RxBeamID", "TxBeamID"])["RSS"].mean().reset_index()
    lut = load_angle_lut(angle_file)
    grouped["AoA"] = lut[grouped["RxBeamID"].astype(int)]
    grouped["AoD"] = lut[grouped["TxBeamID"].astype(int)]
    grouped = grouped.dropna(subset=["AoA", "AoD"])

    grid_res = overrides.get("grid_res", 0.5)
    beam_width = overrides.get("beam_width", 1.4)
    n_paths = overrides.get("max_paths", 5)
    los_margin = overrides.get("los_power_margin", 0.8)
    aoa_grid = np.arange(grouped["AoA"].min(), grouped["AoA"].max(), grid_res)
    aod_grid = np.arange(grouped["AoD"].min(), grouped["AoD"].max(), grid_res)

    paths = omp_dense_np(
        grouped["AoA"].values, grouped["AoD"].values, grouped["RSS"].values,
        aoa_grid, aod_grid, beam_width, n_paths,
    )
    keep = paths.valid
    out = pd.DataFrame({
        "AoA": paths.aoa[keep],
        "AoD": paths.aod[keep],
        "Power": paths.power[keep],
    })
    if not out.empty:
        max_p = out["Power"].max()
        out["Type"] = np.where(out["Power"] >= max_p * los_margin, "LoS", "NLoS")

    if output_path is not None:
        _plot_comparison(grouped, aoa_grid, aod_grid, out, beam_width,
                         output_path)
    return out


def _plot_comparison(grouped, aoa_grid, aod_grid, path_df, beam_width,
                     output_path):
    """Before/after dual panel (v1-2.py:243-307): linear-interp heatmap vs
    sparse impulse map blurred at sigma=1."""
    from pathlib import Path

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from scipy.interpolate import griddata
    from scipy.ndimage import gaussian_filter

    gx, gy = np.meshgrid(aod_grid, aoa_grid)
    grid_z0 = griddata(
        grouped[["AoD", "AoA"]].values, grouped["RSS"].values, (gx, gy),
        method="linear", fill_value=0,
    )

    clean = np.zeros((len(aoa_grid), len(aod_grid)))
    for _, row in path_df.iterrows():
        i = int(np.abs(aoa_grid - row["AoA"]).argmin())
        j = int(np.abs(aod_grid - row["AoD"]).argmin())
        clean[i, j] = row["Power"]
    if path_df.shape[0]:
        clean = gaussian_filter(clean, sigma=1.0)

    fig, axes = plt.subplots(1, 2, figsize=(18, 8))
    ext = [aod_grid.min(), aod_grid.max(), aoa_grid.min(), aoa_grid.max()]
    im1 = axes[0].imshow(grid_z0, extent=ext, origin="lower", aspect="auto",
                         cmap="viridis")
    axes[0].set_title("1. 原始插值热力图 (含旁瓣干扰)", fontsize=14,
                      fontweight="bold")
    axes[0].set_xlabel("AoD (出发角)", fontsize=12)
    axes[0].set_ylabel("AoA (到达角)", fontsize=12)
    fig.colorbar(im1, ax=axes[0], label="RSS (Linear Power)")
    axes[0].grid(alpha=0.3)

    im2 = axes[1].imshow(clean, extent=ext, origin="lower", aspect="auto",
                         cmap="inferno")
    axes[1].set_title(
        f"2. 稀疏重构热力图 (去噪与锐化)\n发现 {len(path_df)} 条显著路径",
        fontsize=14, fontweight="bold",
    )
    axes[1].set_xlabel("AoD (出发角)", fontsize=12)
    axes[1].set_ylabel("AoA (到达角)", fontsize=12)
    fig.colorbar(im2, ax=axes[1], label="RSS (Linear Power)")
    for label, color, marker, s in (("LoS", "red", "o", 200),
                                    ("NLoS", "cyan", "x", 100)):
        sub = path_df[path_df.get("Type", "") == label]
        if not sub.empty:
            axes[1].scatter(sub["AoD"], sub["AoA"], s=s, c=color,
                            marker=marker, linewidth=2, label=label)
    for _, row in path_df.iterrows():
        axes[1].text(row["AoD"] + 2, row["AoA"] + 2,
                     f"{row.get('Type', '?')}\n({row['AoD']:.1f}, "
                     f"{row['AoA']:.1f})",
                     color="white", fontsize=9, fontweight="bold")
    axes[1].legend(loc="upper right")
    axes[1].grid(alpha=0.2)
    fig.tight_layout()
    output_path = Path(output_path)
    output_path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(output_path, dpi=300, bbox_inches="tight")
    plt.close(fig)
