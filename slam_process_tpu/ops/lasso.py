"""Jittable LASSO (positive coordinate descent, sklearn-compatible).

Reference use: local positive-LASSO patch deconvolution
(heatmap_gpt_v2.py:160-170, sklearn Lasso(alpha=0.1, positive=True,
max_iter=2000)).  sklearn minimizes

    1/(2 n_samples) ||y - X w||^2 + alpha ||w||_1,  w >= 0

by cyclic coordinate descent; here the same update runs as a fixed-trip
``lax.scan`` over sweeps of a ``fori_loop`` over coordinates — problem
sizes are tiny (patch dictionaries of <=49 atoms), so this is scalar-ish
VPU work after one Gram matmul.
"""

from __future__ import annotations

import numpy as np


def lasso_positive_np(X: np.ndarray, y: np.ndarray, alpha: float,
                      n_sweeps: int = 200, tol: float = 1e-10,
                      fit_intercept: bool = True) -> np.ndarray:
    """Host oracle: cyclic positive coordinate descent (float64).

    ``fit_intercept=True`` centers X and y first — sklearn's default, which
    the reference relies on (it never passes fit_intercept).
    """
    if fit_intercept:
        X = X - X.mean(axis=0)
        y = y - y.mean()
    n, k = X.shape
    G = X.T @ X / n
    b = X.T @ y / n
    w = np.zeros(k)
    for _ in range(n_sweeps):
        w_max = 0.0
        d_w_max = 0.0
        for j in range(k):
            gj = G[j, j]
            if gj <= 0:
                continue
            rho = b[j] - G[j] @ w + gj * w[j]
            w_new = max(0.0, (rho - alpha) / gj)
            d_w_max = max(d_w_max, abs(w_new - w[j]))
            w_max = max(w_max, abs(w_new))
            w[j] = w_new
        if w_max == 0.0 or d_w_max / max(w_max, 1e-300) < tol:
            break
    return w


def lasso_positive_jax(X, y, alpha: float, n_sweeps: int = 200,
                       fit_intercept: bool = True):
    """Jittable positive-LASSO coordinate descent (fixed sweep count)."""
    import jax
    import jax.numpy as jnp

    if fit_intercept:
        X = X - X.mean(axis=0)
        y = y - y.mean()
    n, k = X.shape
    G = (X.T @ X) / n
    b = (X.T @ y) / n
    diag = jnp.diag(G)

    def sweep(w, _):
        def coord(j, w):
            gj = diag[j]
            rho = b[j] - G[j] @ w + gj * w[j]
            w_new = jnp.maximum(0.0, (rho - alpha) / jnp.maximum(gj, 1e-30))
            w_new = jnp.where(gj > 0, w_new, w[j])
            return w.at[j].set(w_new)

        w = jax.lax.fori_loop(0, k, coord, w)
        return w, None

    w0 = jnp.zeros(k, dtype=X.dtype)
    w, _ = jax.lax.scan(sweep, w0, None, length=n_sweeps)
    return w
