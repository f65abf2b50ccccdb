"""Geometric-LoS compressed-sensing sketch (heatmap_grok_v1.py).

The reference reads BS/UE node positions from a second sheet of
beam_angle.xlsx to compute the geometric LoS angle
``atan2(ue - bs)`` (:20-24), interpolates a dB-normalized grid (:27-36),
finds 1-D peaks over the flattened grid (:51-66), and labels a peak LoS iff
it is the global max AND within 5 deg of the geometric angle.  The shipped
beam_angle.xlsx carries no Sheet2, so positions are an explicit argument
here (with a graceful no-geometry fallback: strongest peak = LoS candidate,
matching the power==max branch of the reference rule).


Engine note: host-only by design — the work is a handful of scipy
find_peaks calls over a 100x100 grid plus geometric angle arithmetic
(microseconds on host); there is no hot loop for a device path to win.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from slam_process_tpu.models.registry import register


def geometric_los_angle(bs_xy: Tuple[float, float],
                        ue_xy: Tuple[float, float]) -> float:
    return float(np.degrees(np.arctan2(ue_xy[1] - bs_xy[1],
                                       ue_xy[0] - bs_xy[0])))


def identify_paths(rss_grid, AOA, AOD, los_aoa: Optional[float],
                   los_aod: Optional[float], thresh: float = -20.0):
    """find_peaks over the flattened grid + geometric matching (:51-66)."""
    import pandas as pd
    from scipy.signal import find_peaks

    flat = np.nan_to_num(rss_grid.ravel(), nan=-1e9)
    peaks, _ = find_peaks(flat, height=thresh, distance=10)
    idx = np.unravel_index(peaks, rss_grid.shape)
    gmax = np.nanmax(rss_grid)
    rows = []
    for i in range(len(peaks)):
        aoa = AOA[idx[0][i], 0]
        aod = AOD[0, idx[1][i]]
        power = rss_grid[idx[0][i], idx[1][i]]
        geo_ok = (
            los_aoa is not None
            and abs(aoa - los_aoa) < 5
            and abs(aod - los_aod) < 5
        )
        is_los = power == gmax and (geo_ok or los_aoa is None)
        rows.append({"AoA": float(aoa), "AoD": float(aod),
                     "Power_dB": float(power),
                     "Type": "LoS" if is_los else "NLoS"})
    return pd.DataFrame(rows)


@register("geometric")
def _run_geometric(session, angle_file, output_path=None,
                   bs_xy=None, ue_xy=None, **overrides):
    import pandas as pd

    from slam_process_tpu.io.angles import load_angle_lut
    from slam_process_tpu.ops.interp import bicubic_spline_resample

    if overrides.get("engine", "host") != "host":
        # Host-only by design (see module docstring) — but never silently:
        # the caller asked for a device run it will not get.
        import warnings

        warnings.warn(
            "geometric estimator has no device engine (microsecond-scale "
            "scipy find_peaks work); running on host", RuntimeWarning,
            stacklevel=2)

    if session.filtered is None:
        session.correct()
    ue, bs, rss = (session.filtered[:, i] for i in range(3))
    lut = load_angle_lut(angle_file)
    df = pd.DataFrame({"UE_Beam": ue, "BS_Beam": bs, "RSS": rss * 1.0})
    df["AoA"] = lut[df["UE_Beam"].astype(int)]
    df["AoD"] = lut[df["BS_Beam"].astype(int)]
    df["RSS_dB"] = 10 * np.log10(df["RSS"] + 1e-6)
    df = df.drop_duplicates(subset=["AoA", "AoD"]).dropna(subset=["AoA", "AoD"])

    res = overrides.get("resolution", 0.1)
    aoa_grid = np.arange(df["AoA"].min() - 5, df["AoA"].max() + 5, res)
    aod_grid = np.arange(df["AoD"].min() - 5, df["AoD"].max() + 5, res)
    ua = np.sort(df["AoA"].unique())
    ub = np.sort(df["AoD"].unique())
    mat = np.full((len(ua), len(ub)), np.nan)
    mat[np.searchsorted(ua, df["AoA"]), np.searchsorted(ub, df["AoD"])] = \
        df["RSS_dB"].values
    if np.isnan(mat).any():
        from scipy.interpolate import griddata

        yy, xx = np.meshgrid(ua, ub, indexing="ij")
        fin = ~np.isnan(mat)
        mat = griddata(np.stack([yy[fin], xx[fin]], 1), mat[fin], (yy, xx),
                       method="nearest")
    # Clamp the padded (+-5 deg) region to the sample hull for the spline.
    aoa_q = np.clip(aoa_grid, ua.min(), ua.max())
    aod_q = np.clip(aod_grid, ub.min(), ub.max())
    grid = np.asarray(bicubic_spline_resample(mat, ub, ua, aod_q, aoa_q))
    grid -= np.nanmax(grid)

    AOA, AOD = np.meshgrid(aoa_grid, aod_grid, indexing="ij")
    if bs_xy is not None and ue_xy is not None:
        los = geometric_los_angle(bs_xy, ue_xy)
        los_aoa = los_aod = los
    else:
        los_aoa = los_aod = None
    paths = identify_paths(grid, AOA, AOD, los_aoa, los_aod,
                           overrides.get("thresh", -20.0))

    if output_path is not None:
        _plot(AOA, AOD, grid, paths, output_path)
    return paths


def _plot(AOA, AOD, rss_grid, paths, output_path, max_annotations: int = 50):
    from pathlib import Path

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(10, 8))
    plt.pcolormesh(AOA, AOD, rss_grid, shading="gouraud", cmap="hot")
    plt.colorbar(label="Normalized RSS (dB)")
    plt.xlabel("AoA (degrees)")
    plt.ylabel("AoD (degrees)")
    plt.title("AoA-AoD Heatmap")
    # The reference annotates every find_peaks hit; on real sessions the
    # -20 dB threshold yields tens of thousands — cap to the strongest few
    # so the figure stays legible (deliberate divergence).
    paths = paths.sort_values("Power_dB", ascending=False).head(max_annotations)
    for _, path in paths.iterrows():
        plt.scatter(path["AoA"], path["AoD"],
                    color="blue" if path["Type"] == "LoS" else "green")
        plt.text(path["AoA"], path["AoD"],
                 f"{path['Type']} {path['Power_dB']:.1f}dB")
    output_path = Path(output_path)
    output_path.parent.mkdir(parents=True, exist_ok=True)
    plt.savefig(output_path)
    plt.close(fig)
