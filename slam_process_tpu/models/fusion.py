"""Fusion estimator: v1 NN-OMP LoS + v3 SM-SIC NLoS (heatmap_gemini_v4.py).

Driver parameters (v4.py:500-529): LoS via NN-OMP (grid 0.1 deg, beam 1.4
deg, max 3 paths, argmax LoS); NLoS via SM-SIC on an inclusive-arange 0.1
deg grid with the LoS position seeding the masks (proximity 10 deg, cross
10 deg, NLoS local mask 1 deg, max 3, stop below 0.1x the FIRST NLoS
metric — note the LoS metric is not in the SM-SIC list).
"""

from __future__ import annotations

import numpy as np

from slam_process_tpu.config import DictionaryConfig, OmpConfig
from slam_process_tpu.models.dictionary import make_dictionary
from slam_process_tpu.models.nn_omp import run_nn_omp
from slam_process_tpu.models.registry import build_scene, register


def fusion_nlos_np(dictionary, rss_matrix, los_aoa, los_aod,
                   max_paths: int = 3, proximity: float = 10.0,
                   cross: float = 10.0, local: float = 1.0,
                   stop_ratio: float = 0.1):
    """NLoSEstimator.estimate_nlos_paths semantics (v4.py:289-364)."""
    corr = dictionary.phi_rx.T @ rss_matrix.astype(np.float64) @ dictionary.phi_tx
    aoa_g, aod_g = dictionary.aoa_grid, dictionary.aod_grid
    AOA, AOD = np.meshgrid(aoa_g, aod_g, indexing="ij")
    mask = np.ones_like(corr)
    if los_aoa is not None:
        dist_sq = (AOA - los_aoa) ** 2 + (AOD - los_aod) ** 2
        mask *= dist_sq > proximity**2
        mask *= np.abs(AOD - los_aod) > cross / 2
        mask *= np.abs(AOA - los_aoa) > cross / 2

    rows = []
    for k in range(max_paths):
        masked = corr * mask
        i, j = np.unravel_index(np.argmax(masked), masked.shape)
        peak = masked[i, j]
        if k > 0 and rows and peak < stop_ratio * rows[0]["metric"]:
            break
        rows.append({"id": k + 1, "type": "NLoS", "aoa": aoa_g[i],
                     "aod": aod_g[j], "metric": float(peak)})
        dist_sq = (AOA - aoa_g[i]) ** 2 + (AOD - aod_g[j]) ** 2
        mask *= dist_sq > local**2
    import pandas as pd

    return pd.DataFrame(rows)


def fusion_nlos_jax(phi_rx, phi_tx, aoa_grid, aod_grid, rss_matrix,
                    los_aoa, los_aod, has_los,
                    max_paths: int = 3, proximity: float = 10.0,
                    cross: float = 10.0, local: float = 1.0,
                    stop_ratio: float = 0.1):
    """Jittable NLoS SIC loop (device counterpart of fusion_nlos_np).

    Returns (aoa[K], aod[K], metric[K], valid[K]); the LoS seed masks are
    applied when ``has_los`` (traced bool).
    """
    import jax
    import jax.numpy as jnp

    corr = jnp.einsum("ug,ub,bh->gh", phi_rx, rss_matrix, phi_tx,
                      preferred_element_type=jnp.float32,
                      precision="highest")
    Ga, Gd = corr.shape
    AOA = aoa_grid[:, None] * jnp.ones((1, Gd), corr.dtype)
    AOD = jnp.ones((Ga, 1), corr.dtype) * aod_grid[None, :]

    dist_sq = (AOA - los_aoa) ** 2 + (AOD - los_aod) ** 2
    los_mask = (
        (dist_sq > proximity**2)
        & (jnp.abs(AOD - los_aod) > cross / 2)
        & (jnp.abs(AOA - los_aoa) > cross / 2)
    ).astype(corr.dtype)
    mask0 = jnp.where(has_los, los_mask, jnp.ones_like(corr))

    def body(carry, k):
        mask, first_metric, stopped = carry
        masked = corr * mask
        flat = jnp.argmax(masked)
        i, j = flat // Gd, flat % Gd
        peak = masked[i, j]
        a, d = aoa_grid[i], aod_grid[j]
        # Reference stop rule (v4.py:340-344): compare against the FIRST
        # NLoS metric, only from the second peak onward.
        stop_now = stopped | ((k > 0) & (peak < stop_ratio * first_metric))
        local_mask = (((AOA - a) ** 2 + (AOD - d) ** 2) > local**2).astype(
            corr.dtype)
        mask_out = jnp.where(stop_now, mask, mask * local_mask)
        first_out = jnp.where((k == 0) & ~stop_now, peak, first_metric)
        return (mask_out, first_out, stop_now), (a, d, peak, ~stop_now)

    init = (mask0, jnp.asarray(0.0, corr.dtype), jnp.bool_(False))
    _, (aoa, aod, metric, valid) = jax.lax.scan(
        body, init, jnp.arange(max_paths))
    return aoa, aod, metric, valid


@register("fusion")
def _run_fusion(session, angle_file, output_path=None, **overrides):
    import pandas as pd

    matrix, ue_ang, bs_ang = build_scene(session, angle_file, log_transform=False)
    engine = overrides.get("engine")

    # LoS: verbatim v1 NN-OMP (arange grid, max 3, argmax LoS).
    d_los = make_dictionary(
        ue_ang, bs_ang,
        DictionaryConfig(grid_res=overrides.get("grid_res", 0.1),
                         beam_width=overrides.get("beam_width", 1.4),
                         grid_kind="arange"),
    )
    los = run_nn_omp(d_los, matrix, OmpConfig(max_paths=3),
                     keep_rule="positive", stop_nonpositive=False,
                     engine=engine or "host")
    kept = np.nonzero(los.valid)[0]
    if kept.size:
        los_idx = kept[np.argmax(los.power[kept])]
        los_aoa, los_aod = float(los.aoa[los_idx]), float(los.aod[los_idx])
        los_power = float(los.power[los_idx])
    else:
        los_aoa = los_aod = los_power = None

    # NLoS: SM-SIC seeded with the LoS masks.
    d_nlos = make_dictionary(
        ue_ang, bs_ang,
        DictionaryConfig(grid_res=overrides.get("grid_res", 0.1),
                         beam_width=overrides.get("beam_width", 1.4),
                         grid_kind="arange_inclusive"),
    )
    if engine == "device":
        import functools

        import jax
        import jax.numpy as jnp
        import pandas as pd_

        from slam_process_tpu.utils.cache import enable_persistent_cache
        enable_persistent_cache()
        from slam_process_tpu.utils.precision import jit_highest

        nlos_fn = jit_highest(functools.partial(
            fusion_nlos_jax,
            max_paths=overrides.get("max_paths", 3),
            proximity=overrides.get("proximity_mask_radius", 10.0),
            cross=overrides.get("cross_mask_width", 10.0),
        ))
        a, d_, m, v = jax.device_get(nlos_fn(
            jnp.asarray(d_nlos.phi_rx, jnp.float32),
            jnp.asarray(d_nlos.phi_tx, jnp.float32),
            jnp.asarray(d_nlos.aoa_grid, jnp.float32),
            jnp.asarray(d_nlos.aod_grid, jnp.float32),
            jnp.asarray(matrix, jnp.float32),
            jnp.float32(los_aoa if los_aoa is not None else 0.0),
            jnp.float32(los_aod if los_aod is not None else 0.0),
            jnp.bool_(los_aoa is not None),
        ))
        keep = np.nonzero(v)[0]
        nlos_df = pd_.DataFrame(
            [{"id": int(k) + 1, "type": "NLoS", "aoa": float(a[k]),
              "aod": float(d_[k]), "metric": float(m[k])} for k in keep]
        )
    else:
        nlos_df = fusion_nlos_np(
            d_nlos, matrix, los_aoa, los_aod,
            max_paths=overrides.get("max_paths", 3),
            proximity=overrides.get("proximity_mask_radius", 10.0),
            cross=overrides.get("cross_mask_width", 10.0),
        )

    if output_path is not None:
        # The bespoke v4 fused-contour figure (v4.py:375-460): LoS circles
        # with dashed cross reference lines + NLoS white X markers.
        from slam_process_tpu.render.estimation import fusion_plot

        los_pts = ([(los_aod, los_aoa)] if los_aoa is not None else [])
        nlos_pts = list(zip(nlos_df.get("aod", []), nlos_df.get("aoa", [])))
        fusion_plot(matrix, ue_ang, bs_ang, los_pts, nlos_pts, output_path)

    rows = []
    if los_aoa is not None:
        rows.append({"id": 0, "type": "LoS", "aoa": los_aoa, "aod": los_aod,
                     "metric": los_power})
    out = pd.concat([pd.DataFrame(rows), nlos_df], ignore_index=True)
    return out
