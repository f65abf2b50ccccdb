"""Peak-picking renderer (heatmap_gpt_v1.py).

Pipeline (reference :40-149): interpolate the aggregated measurements onto
a resolution-1.4 deg grid (cubic), nan -> 0; find 3x3-neighborhood local
maxima above the 90th percentile; strongest peak = LoS, up to 3 NLoS within
8 dB; plot with a y=x diagonal guide.

Interpolation note: the reference calls scipy.griddata(method='cubic')
(Clough-Tocher on a Delaunay triangulation) over what is actually a
rectilinear angle grid; this engine uses the separable bicubic spline on
that grid (ops/interp) — smoother and triangulation-free, validated close
to the scipy surface in tests (the peak set is what matters downstream).
"""

from __future__ import annotations

import numpy as np

from slam_process_tpu.models.registry import register
from slam_process_tpu.ops.peaks import local_max_mask


def build_heatmap_grid(aoa, aod, rss, resolution: float = 1.4):
    """Aggregated samples -> (aod_grid, aoa_grid, heat[len(aoa), len(aod)])."""
    from slam_process_tpu.ops.interp import bicubic_spline_resample

    aod_grid = np.arange(aod.min(), aod.max() + resolution, resolution)
    aoa_grid = np.arange(aoa.min(), aoa.max() + resolution, resolution)
    # Samples form a rectilinear (aoa x aod) grid; assemble it.
    ua = np.unique(aoa)
    ub = np.unique(aod)
    mat = np.full((len(ua), len(ub)), np.nan)
    ia = np.searchsorted(ua, aoa)
    ib = np.searchsorted(ub, aod)
    mat[ia, ib] = rss
    # Fill any holes with nearest finite value (reference nan_to_num(0) comes
    # after cubic interpolation of scattered points; holes are rare).
    if np.isnan(mat).any():
        from scipy.interpolate import griddata

        yy, xx = np.meshgrid(ua, ub, indexing="ij")
        pts = np.stack([yy[~np.isnan(mat)], xx[~np.isnan(mat)]], axis=1)
        mat = griddata(pts, mat[~np.isnan(mat)], (yy, xx), method="nearest")
    heat = np.asarray(bicubic_spline_resample(mat, ub, ua, aod_grid, aoa_grid))
    # scipy.griddata leaves NaN outside the sample hull -> nan_to_num(0);
    # the spline would extrapolate there instead, so zero those cells.
    outside = (
        (aoa_grid[:, None] < ua.min()) | (aoa_grid[:, None] > ua.max())
        | (aod_grid[None, :] < ub.min()) | (aod_grid[None, :] > ub.max())
    )
    heat = np.where(outside, 0.0, heat)
    return aod_grid, aoa_grid, np.nan_to_num(heat, nan=0.0)


def detect_peaks(heat, aod_grid, aoa_grid, threshold):
    """(aod, aoa, power) peaks at local maxima above threshold (:58-74)."""
    mask = local_max_mask(heat, 3) & (heat > threshold)
    out = []
    for i, j in np.argwhere(mask):
        out.append((float(aod_grid[j]), float(aoa_grid[i]), float(heat[i, j])))
    return out


@register("peak_picking")
def _run_peak_picking(session, angle_file, output_path=None, **overrides):
    import pandas as pd

    from slam_process_tpu.io.angles import load_angle_lut

    if session.filtered is None:
        session.correct()
    ue, bs, rss = (session.filtered[:, i] for i in range(3))
    df = pd.DataFrame({"UE_Beam": ue, "BS_Beam": bs, "RSS": rss})
    agg = df.groupby(["UE_Beam", "BS_Beam"], as_index=False)["RSS"].mean()
    lut = load_angle_lut(angle_file)
    agg["AoA"] = lut[agg["UE_Beam"].astype(int)]
    agg["AoD"] = lut[agg["BS_Beam"].astype(int)]
    agg = agg.dropna(subset=["AoA", "AoD"])

    if overrides.get("engine") == "device":
        # Device path: the spline resample (one Wy @ V @ Wx^T matmul pair),
        # the percentile threshold, and the reduce_window local-max mask
        # run jitted; only the tiny (mask, heat) pair crosses to host for
        # the final peak listing.
        import jax
        import jax.numpy as jnp

        aod_grid, aoa_grid, heat_h = build_heatmap_grid(
            agg["AoA"].values, agg["AoD"].values, agg["RSS"].values,
            resolution=overrides.get("resolution", 1.4),
        )
        q = float(overrides.get("percentile", 90))

        from slam_process_tpu.utils.cache import enable_persistent_cache
        enable_persistent_cache()
        @jax.jit
        def device_mask(h):
            thresh = jnp.percentile(h, q)
            return local_max_mask(h, 3) & (h > thresh), thresh

        mask_d, thresh_d = device_mask(jnp.asarray(heat_h, jnp.float32))
        mask = np.asarray(mask_d)
        heat = heat_h
        peaks = sorted(
            ((float(aod_grid[j]), float(aoa_grid[i]), float(heat[i, j]))
             for i, j in np.argwhere(mask)),
            key=lambda p: -p[2],
        )
    else:
        aod_grid, aoa_grid, heat = build_heatmap_grid(
            agg["AoA"].values, agg["AoD"].values, agg["RSS"].values,
            resolution=overrides.get("resolution", 1.4),
        )
        thresh = np.percentile(heat, overrides.get("percentile", 90))
        peaks = sorted(detect_peaks(heat, aod_grid, aoa_grid, thresh),
                       key=lambda p: -p[2])

    rows = []
    if peaks:
        los = peaks[0]
        rows.append({"AoD": los[0], "AoA": los[1], "Power": los[2],
                     "Type": "LoS"})
        power_gap = overrides.get("power_gap", 8.0)
        max_nlos = overrides.get("max_nlos", 3)
        n = 0
        for aod, aoa, p in peaks[1:]:
            if p < los[2] - power_gap or n >= max_nlos:
                break
            rows.append({"AoD": aod, "AoA": aoa, "Power": p, "Type": "NLoS"})
            n += 1
    out = pd.DataFrame(rows)

    if output_path is not None:
        _plot(heat, aod_grid, aoa_grid, out, output_path)
    return out


def _plot(heat, aod_grid, aoa_grid, paths, output_path):
    from pathlib import Path

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(9, 7))
    im = ax.imshow(heat, origin="lower", aspect="auto",
                   extent=[aod_grid.min(), aod_grid.max(),
                           aoa_grid.min(), aoa_grid.max()])
    fig.colorbar(im, ax=ax).set_label("RSS (dB)")
    ax.set_xlabel("AoD (deg)")
    ax.set_ylabel("AoA (deg)")
    ax.set_title("AoA–AoD RSS Heatmap with Dominant Paths")
    for _, row in paths.iterrows():
        if row["Type"] == "LoS":
            ax.scatter(row["AoD"], row["AoA"], s=160, marker="*",
                       edgecolors="k", label="LoS")
            ax.annotate(f"LoS\n({row['AoD']:.1f}°, {row['AoA']:.1f}°)",
                        xy=(row["AoD"], row["AoA"]),
                        xytext=(row["AoD"] + 4, row["AoA"] + 4),
                        arrowprops=dict(arrowstyle="->"), fontsize=10)
        else:
            ax.scatter(row["AoD"], row["AoA"], s=80, marker="o",
                       edgecolors="k")
            ax.annotate(f"NLoS\n({row['AoD']:.1f}°, {row['AoA']:.1f}°)",
                        xy=(row["AoD"], row["AoA"]),
                        xytext=(row["AoD"] + 3, row["AoA"] - 5),
                        arrowprops=dict(arrowstyle="->"), fontsize=9)
    lo = max(aod_grid.min(), aoa_grid.min())
    hi = min(aod_grid.max(), aoa_grid.max())
    ax.plot([lo, hi], [lo, hi], linestyle="--", linewidth=1)
    ax.legend()
    fig.tight_layout()
    output_path = Path(output_path)
    output_path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(output_path, dpi=150)
    plt.close(fig)
