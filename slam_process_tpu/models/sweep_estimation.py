"""Shared per-sweep estimator construction: config, dictionary, program body.

Per-sweep estimation runs in three places — ``Session.sweep_paths`` (offline
single session), ``sweep_paths_dataset`` (offline batched), and the
device-resident streaming path (parallel/streaming_device with
``collect_paths``).  All three must produce IDENTICAL estimates for the same
sweeps, so the estimator configuration (frozen config + keep rule), the
dictionary construction, and the un-jitted program body live here and are
imported by every consumer; there is exactly one definition of each.

``est_key`` = (name, frozen config, keep_rule, stop_nonpositive) — hashable,
used to cache compiled programs.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from slam_process_tpu.config import DictionaryConfig, OmpConfig, SmSicConfig
from slam_process_tpu.models.dictionary import BeamDictionary, make_dictionary


def sweep_estimator_setup(
    estimator: str,
    ue_ang: np.ndarray,
    bs_ang: np.ndarray,
    **overrides,
) -> Tuple[BeamDictionary, tuple]:
    """Build the (dictionary, est_key) pair for a per-sweep estimator.

    ``ue_ang``/``bs_ang`` are the participating beams' angles (degrees) —
    the dictionary's grid span and atom set derive from them, which is why
    every consumer must agree on the beam set to agree on estimates.
    Unknown override keys are ignored (callers thread a shared overrides
    dict through).
    """
    if estimator == "nn_omp":
        cfg = OmpConfig(max_paths=overrides.get("max_paths", 3))
        d = make_dictionary(ue_ang, bs_ang, DictionaryConfig(
            grid_res=overrides.get("grid_res", 0.1),
            beam_width=overrides.get("beam_width", 1.4),
            grid_kind="linspace"))
        est_key = (estimator, cfg,
                   overrides.get("keep_rule", "positive"),
                   overrides.get("stop_nonpositive", False))
    elif estimator == "sm_sic":
        cfg = SmSicConfig(
            max_paths=overrides.get("max_paths", 3),
            beam_width=overrides.get("beam_width", 10.0),
            grid_res=overrides.get("grid_res", 0.5))
        d = make_dictionary(ue_ang, bs_ang, DictionaryConfig(
            grid_res=cfg.grid_res, beam_width=cfg.beam_width,
            grid_kind="arange_inclusive"))
        est_key = (estimator, cfg, None, None)
    else:
        raise ValueError(f"unknown sweep estimator {estimator!r}")
    return d, est_key


def sweep_estimator_body(est_key):
    """The per-session sweep-estimator callable (un-jitted).

    ``est_key`` = (name, frozen config, keep_rule, stop_nonpositive).
    Signature: (mats [S, U, B], phi_rx, phi_tx, aoa_g, aod_g) ->
    (paths [S, K], sweep_valid [S]).  Shared by the single-session jit,
    its sharded variant, the dataset-level outer vmap, and the streaming
    step's in-program estimation.
    """
    import functools

    import jax
    import jax.numpy as jnp

    name, cfg, keep_rule, stop_np = est_key

    def _fill_per_sweep(mats):
        # Per-sweep fill: empty cells get the sweep's observed min
        # (the v1-7 fillna(min) policy applied per sweep).
        finite = jnp.isfinite(mats)
        fill = jnp.min(jnp.where(finite, mats, jnp.inf), axis=(1, 2))
        fill = jnp.where(jnp.isfinite(fill), fill, 0.0)
        return jnp.where(finite, mats, fill[:, None, None]), finite

    if name == "nn_omp":
        from slam_process_tpu.models.nn_omp import nn_omp_gram_batch_jax

        def run_all(mats, phi_rx, phi_tx, aoa_g, aod_g):
            # Gram-domain batched formulation: the correlation chain runs
            # once instead of K times, and the batched GEMMs beat the
            # vmapped per-sweep form ~20x on the chip (see the
            # nn_omp_gram_batch_jax / nn_omp_batch_jax docstrings).
            filled, finite = _fill_per_sweep(mats)
            out = nn_omp_gram_batch_jax(phi_rx, phi_tx, aoa_g, aod_g, filled,
                                        cfg=cfg, keep_rule=keep_rule,
                                        stop_nonpositive=stop_np)
            return out, finite.any(axis=(1, 2))
    else:
        from slam_process_tpu.models.sm_sic import sm_sic_jax

        est = functools.partial(sm_sic_jax, cfg=cfg)

        def run_all(mats, phi_rx, phi_tx, aoa_g, aod_g):
            filled, finite = _fill_per_sweep(mats)
            return (jax.vmap(lambda m: est(phi_rx, phi_tx, aoa_g, aod_g, m))(
                filled), finite.any(axis=(1, 2)))

    return run_all
