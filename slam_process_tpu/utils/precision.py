"""Matmul-precision pinning for value-carrying contractions.

TPU matmuls default to bf16 inputs (~8 mantissa bits).  For FLOP-bound
neural workloads that is the right default; for this pipeline's
*value-carrying* contractions it is not: the estimators' correlation chains
(``phi_rx.T @ residual @ phi_tx``) feed an argmax whose winner can flip
between near-tied atoms at 0.4% error, changing the selected path set — the
same failure mode as round 2's blur-conv LUT-bin flips (commit 5a7403b).
Measured on the chip: the flagship v1-7 NN-OMP selects a different FIRST
atom under bf16 than the float64 oracle.

:func:`jit_highest` is ``jax.jit`` with ``default_matmul_precision`` pinned
to HIGHEST for everything traced inside — use it for every estimator /
scene-value program.  Throughput note: HIGHEST runs the 6-pass bf16
composition on the MXU; these programs are tiny-matmul dominated and
dispatch-bound, so the cost is noise next to a wrong path set.
"""

from __future__ import annotations

import functools


def jit_highest(fn, **jit_kwargs):
    """``jax.jit(fn)`` with matmul precision pinned to HIGHEST at trace time."""
    import jax

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return jax.jit(wrapped, **jit_kwargs)
