"""LASSO-refined heatmap pipeline (heatmap_gpt_v2.py).

Pipeline (reference :60-200, :284-352): 1-deg grid linear interpolation
with nearest-neighbor NaN fill; per-row Savitzky-Golay smoothing (window 7,
order 2); percentile-65 local-max peak regions via connected components;
per-peak +-3-cell patch positive-LASSO deconvolution against a Gaussian
beam-gain design (beamwidth 10, alpha 0.1, normalized columns); final map =
0.6*refined + 0.4*initial; re-detect peaks; classify by the strongest/second
ratio (1.5).
"""

from __future__ import annotations

import numpy as np

from slam_process_tpu.models.registry import register
from slam_process_tpu.ops.lasso import lasso_positive_np
from slam_process_tpu.ops.peaks import peak_regions_np, savgol_rows


def beam_gain(angle_deg, center_deg, beamwidth_deg: float = 10.0):
    sigma = beamwidth_deg / 2.355
    return np.exp(-0.5 * ((angle_deg - center_deg) / sigma) ** 2)


def make_heatmap_interpolated(aoa, aod, rss, grid_res: float = 1.0,
                              smooth: bool = True):
    """Linear griddata + nearest fill + savgol rows (reference :60-96).

    Axes convention matches the reference: rows = AoD, cols = AoA
    (meshgrid(aoa_grid, aod_grid, indexing='xy')).
    """
    from scipy.interpolate import griddata

    aoa_grid = np.arange(aoa.min(), aoa.max() + grid_res, grid_res)
    aod_grid = np.arange(aod.min(), aod.max() + grid_res, grid_res)
    AOA, AOD = np.meshgrid(aoa_grid, aod_grid, indexing="xy")
    pts = np.stack([aoa, aod], axis=1)
    gp = np.stack([AOA.ravel(), AOD.ravel()], axis=1)
    lin = griddata(pts, rss, gp, method="linear", fill_value=np.nan)
    near = griddata(pts, rss, gp, method="nearest")
    heat = np.where(np.isnan(lin), near, lin).reshape(AOA.shape)
    if smooth and heat.shape[1] >= 3:
        win = 7 if heat.shape[1] >= 7 else (heat.shape[1] // 2 * 2 + 1)
        if win >= 3:
            heat = savgol_rows(heat, win, min(2, win - 1))
    return aoa_grid, aod_grid, heat


def refine_patches(meas_aoa, meas_aod, meas_rss, aoa_grid, aod_grid,
                   heat_init, peaks, patch_half: int = 3,
                   beamwidth: float = 10.0, alpha: float = 0.1,
                   max_peaks: int = 20):
    """Local positive-LASSO deconvolution around each peak (:135-177)."""
    refined = np.zeros_like(heat_init)
    for pk in peaks[:max_peaks]:
        r0, c0 = pk["idx"]
        r1, r2 = max(0, r0 - patch_half), min(heat_init.shape[0] - 1, r0 + patch_half)
        c1, c2 = max(0, c0 - patch_half), min(heat_init.shape[1] - 1, c0 + patch_half)
        g_aod = aod_grid[r1 : r2 + 1]
        g_aoa = aoa_grid[c1 : c2 + 1]
        cols = []
        for aod in g_aod:
            for aoa in g_aoa:
                cols.append(beam_gain(meas_aoa, aoa, beamwidth)
                            * beam_gain(meas_aod, aod, beamwidth))
        G = np.column_stack(cols)
        norms = np.linalg.norm(G, axis=0) + 1e-8
        coef = lasso_positive_np(G / norms, meas_rss, alpha) / norms
        k = 0
        for i in range(len(g_aod)):
            for j in range(len(g_aoa)):
                refined[r1 + i, c1 + j] += coef[k]
                k += 1
    return refined


def refine_patches_device(meas_aoa, meas_aod, meas_rss, aoa_grid, aod_grid,
                          heat_shape, peaks, patch_half: int = 3,
                          beamwidth: float = 10.0, alpha: float = 0.1,
                          max_peaks: int = 20):
    """Device counterpart of refine_patches: one vmapped LASSO per peak.

    Every patch is padded to the full (2*patch_half+1)^2 window; columns
    outside the clamped bounds are zeroed, which the positive coordinate
    descent provably leaves at zero (gram diagonal 0 -> coordinate
    skipped), so the result equals the host's variable-size patches.  The
    [P, N, 49] design build, gram matmuls, and coordinate-descent scans all
    run in one jitted call; only the [P, 49] coefficient block returns to
    host for the (tiny) scatter-add.
    """
    import jax
    import jax.numpy as jnp

    from slam_process_tpu.ops.lasso import lasso_positive_jax

    H, W = heat_shape
    refined = np.zeros(heat_shape)
    P = min(len(peaks), max_peaks)
    if P == 0:
        return refined
    s = 2 * patch_half + 1
    r0 = np.array([p["idx"][0] for p in peaks[:P]])
    c0 = np.array([p["idx"][1] for p in peaks[:P]])
    r1, r2 = np.maximum(0, r0 - patch_half), np.minimum(H - 1, r0 + patch_half)
    c1, c2 = np.maximum(0, c0 - patch_half), np.minimum(W - 1, c0 + patch_half)
    di = np.arange(s)
    rows = r1[:, None] + di[None, :]                    # [P, s] aod rows
    cols = c1[:, None] + di[None, :]                    # [P, s] aoa cols
    row_ok = rows <= r2[:, None]
    col_ok = cols <= c2[:, None]
    # Row-major (aod, aoa) cell order — the host's cyclic-descent order.
    valid = (row_ok[:, :, None] & col_ok[:, None, :]).reshape(P, s * s)
    aod_c = aod_grid[np.minimum(rows, H - 1)][:, :, None]  # [P, s, 1]
    aoa_c = aoa_grid[np.minimum(cols, W - 1)][:, None, :]  # [P, 1, s]
    aod_flat = np.broadcast_to(aod_c, (P, s, s)).reshape(P, s * s)
    aoa_flat = np.broadcast_to(aoa_c, (P, s, s)).reshape(P, s * s)

    sigma = beamwidth / 2.355
    ma = jnp.asarray(meas_aoa, jnp.float32)
    md = jnp.asarray(meas_aod, jnp.float32)

    def solve(aoa_cent, aod_cent, ok):
        G = jnp.exp(-0.5 * (((ma[:, None] - aoa_cent[None, :]) / sigma) ** 2
                            + ((md[:, None] - aod_cent[None, :]) / sigma) ** 2))
        G = G * ok[None, :]
        norms = jnp.linalg.norm(G, axis=0) + 1e-8
        return lasso_positive_jax(G / norms, jnp.asarray(meas_rss), alpha) / norms

    from slam_process_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    from slam_process_tpu.utils.precision import jit_highest

    coefs = np.asarray(jit_highest(jax.vmap(solve))(
        jnp.asarray(aoa_flat, jnp.float32), jnp.asarray(aod_flat, jnp.float32),
        jnp.asarray(valid, jnp.float32)))
    for p in range(P):
        w = coefs[p].reshape(s, s)
        for i in range(s):
            if not row_ok[p, i]:
                continue
            for j in range(s):
                if col_ok[p, j]:
                    refined[rows[p, i], cols[p, j]] += w[i, j]
    return refined


def classify_peaks(peaks_sorted, ratio_thresh: float = 1.5):
    """Top/second power-ratio classification (reference :183-200)."""
    out = []
    if not peaks_sorted:
        return out
    top = peaks_sorted[0]
    second = peaks_sorted[1]["power"] if len(peaks_sorted) > 1 else -np.inf
    if top["power"] > ratio_thresh * second:
        out.append({**top, "type": "Likely LoS"})
        out.extend({**p, "type": "Likely NLoS"} for p in peaks_sorted[1:6])
    else:
        for i, p in enumerate(peaks_sorted[:6]):
            out.append({**p, "type": "Candidate LoS" if i == 0
                        else "Candidate NLoS"})
    return out


@register("lasso_refine")
def _run_lasso_refine(session, angle_file, output_path=None, **overrides):
    import pandas as pd

    from slam_process_tpu.io.angles import load_angle_lut

    if session.filtered is None:
        session.correct()
    ue, bs, rss = (session.filtered[:, i] for i in range(3))
    df = pd.DataFrame({"UE_Beam": ue, "BS_Beam": bs, "RSS": rss * 1.0})
    lut = load_angle_lut(angle_file)
    df["AoA_deg"] = lut[df["UE_Beam"].astype(int)]
    df["AoD_deg"] = lut[df["BS_Beam"].astype(int)]
    df = df.dropna(subset=["AoA_deg", "AoD_deg"])
    agg = df.groupby(["UE_Beam", "BS_Beam", "AoA_deg", "AoD_deg"]).RSS.mean() \
        .reset_index()

    aoa_grid, aod_grid, heat_init = make_heatmap_interpolated(
        agg["AoA_deg"].values, agg["AoD_deg"].values, agg["RSS"].values,
        grid_res=overrides.get("grid_res", 1.0),
    )
    peaks = peak_regions_np(heat_init,
                            overrides.get("percentile", 65.0))
    if overrides.get("engine") == "device":
        refined = refine_patches_device(
            agg["AoA_deg"].values, agg["AoD_deg"].values, agg["RSS"].values,
            aoa_grid, aod_grid, heat_init.shape, peaks,
            beamwidth=overrides.get("beam_width", 10.0),
            alpha=overrides.get("alpha", 0.1),
        )
    else:
        refined = refine_patches(
            agg["AoA_deg"].values, agg["AoD_deg"].values, agg["RSS"].values,
            aoa_grid, aod_grid, heat_init, peaks,
            beamwidth=overrides.get("beam_width", 10.0),
            alpha=overrides.get("alpha", 0.1),
        )
    heat_final = 0.6 * refined + 0.4 * heat_init
    final_peaks = peak_regions_np(heat_final,
                                  overrides.get("percentile", 65.0))
    classification = classify_peaks(final_peaks,
                                    overrides.get("ratio_thresh", 1.5))

    if output_path is not None:
        _plot(aoa_grid, aod_grid, heat_final, classification, output_path)
    return pd.DataFrame([
        {"AoA": aoa_grid[p["idx"][1]], "AoD": aod_grid[p["idx"][0]],
         "Power": p["power"], "Type": p["type"]}
        for p in classification
    ])


def _plot(aoa_grid, aod_grid, heat, classification, output_path):
    from pathlib import Path

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(12, 9))
    im = plt.imshow(heat, extent=[aoa_grid.min(), aoa_grid.max(),
                                  aod_grid.min(), aod_grid.max()],
                    origin="lower", aspect="auto", cmap="hot",
                    interpolation="bilinear")
    plt.colorbar(im, label="RSS (dBm)")
    plt.xlabel("AoA (deg)", fontsize=12)
    plt.ylabel("AoD (deg)", fontsize=12)
    plt.title("AoA-AoD Heatmap with Multipath Components", fontsize=14,
              fontweight="bold")
    colors = {"Likely LoS": "lime", "Likely NLoS": "cyan",
              "Candidate LoS": "yellow", "Candidate NLoS": "orange"}
    for peak in classification:
        i, j = peak["idx"]
        aoa_v, aod_v = aoa_grid[j], aod_grid[i]
        plt.plot(aoa_v, aod_v, "o", color=colors.get(peak["type"], "white"),
                 markersize=10, markeredgecolor="black", markeredgewidth=1.5)
        plt.text(aoa_v, aod_v + 2, f"{peak['type']}\n{peak['power']:.1f}dBm",
                 color="white", fontsize=9, ha="center",
                 bbox=dict(boxstyle="round,pad=0.3", facecolor="black",
                           alpha=0.6))
    plt.grid(True, alpha=0.3, linestyle="--")
    plt.tight_layout()
    output_path = Path(output_path)
    output_path.parent.mkdir(parents=True, exist_ok=True)
    plt.savefig(output_path, dpi=300, bbox_inches="tight")
    plt.close(fig)
