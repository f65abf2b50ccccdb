"""Multi-host (DCN) scaling for the batched session pipeline.

The reference has no distributed layer (SURVEY.md §2); within one host
this package scales over ICI with a ``data × model`` mesh
(``parallel/mesh.py``, ``parallel/batch.py``).  This module extends the
same programs across PROCESSES — the multi-host axis where collectives
ride DCN on a real TPU pod:

  * :func:`initialize_multihost` — process-group setup.  On a TPU pod
    slice it is a thin passthrough to ``jax.distributed.initialize``
    (coordinator + process count auto-detected from the TPU runtime).
    For hermetic testing (and CPU-only deployments) it pins a virtual
    cluster: N processes × K virtual CPU devices with gloo cross-process
    collectives — the same code path JAX uses for real DCN, minus the
    wire speed.
  * :func:`global_data_mesh` — the canonical ``data × model`` mesh over
    ALL processes' devices (``parallel.mesh.make_mesh`` over
    ``jax.devices()``).
  * :func:`run_batched_multihost` — the batched summary pipeline
    (``parallel.batch.batched_session_pipeline``) over a process-spanning
    mesh: every process contributes its LOCAL sessions, the global
    [S_total, N] array is assembled shard-wise (no session's bytes ever
    leave its host), and each process reads back only its local shard of
    the per-session summaries.

Tested end-to-end in ``tests/test_multihost.py``: two real OS processes
with 4 virtual devices each run the sharded dataset pipeline over an
(8,)-device global mesh and every per-session result equals the
single-process oracle bit-for-bit.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

__all__ = [
    "initialize_multihost",
    "global_data_mesh",
    "run_batched_multihost",
    "local_shard",
]


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_count: Optional[int] = None,
    cpu_collectives: str = "gloo",
) -> None:
    """Join (or create) the JAX process group.  Call BEFORE any backend
    initializes (before the first jnp/jit touch in the process).

    Real pod: call with no arguments — ``jax.distributed.initialize``
    auto-detects the coordinator and process topology from the TPU
    runtime environment.

    Virtual cluster (tests / CPU deployments): pass all four arguments;
    the process pins ``local_device_count`` virtual CPU devices and gloo
    cross-process collectives, then joins the coordinator.
    """
    import os

    import jax

    if local_device_count is not None:
        # REPLACE any inherited device-count flag (a worker spawned from
        # the test runner inherits conftest's 8-device XLA_FLAGS).
        flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
                 if "xla_force_host_platform_device_count" not in f]
        flags.append("--xla_force_host_platform_device_count="
                     f"{local_device_count}")
        os.environ["XLA_FLAGS"] = " ".join(flags)
        # The environment's sitecustomize overrides JAX_PLATFORMS, so the
        # config update (effective until backend init) is the real pin.
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_cpu_collectives_implementation",
                          cpu_collectives)
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def global_data_mesh(model: int = 1):
    """``data × model`` mesh over every device of every process."""
    import jax

    from slam_process_tpu.parallel.mesh import make_mesh

    n = len(jax.devices())
    assert n % model == 0, (n, model)
    return make_mesh((n // model, model), devices=jax.devices())


def run_batched_multihost(
    mesh,
    raw_list_local: Sequence[np.ndarray],
    n_bytes_padded: Optional[int] = None,
    **pipeline_kwargs,
):
    """Run the batched summary pipeline over a process-spanning mesh.

    ``raw_list_local``: this process's tokenized sessions.  Every process
    must pass the same NUMBER of sessions (pad with a zero-length session
    if ragged — zero bytes decode to zero frames) and call this
    collectively.  The per-session byte bucket is agreed globally
    (all-gather of the local maxima), the [S_total, N] batch is assembled
    with :func:`jax.experimental.multihost_utils.
    host_local_array_to_global_array` — each host's bytes stay on its own
    devices — and the jitted program is the SAME
    ``batched_session_pipeline`` executable the single-host path uses,
    with its 'data'-sharded inputs now spanning DCN.

    Returns the global ``SessionSummaryOut`` (shards addressable per
    process — see :func:`local_shard`).
    """
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    from slam_process_tpu.ops.raster import colormap_lut
    from slam_process_tpu.parallel.batch import (
        batched_session_pipeline,
        stack_sessions,
    )

    local_max = max((len(r) for r in raw_list_local), default=0)
    if n_bytes_padded is None:
        n_bytes_padded = int(np.max(
            multihost_utils.process_allgather(np.int32(local_max))))
    batch, lengths = stack_sessions(raw_list_local, n_bytes_padded)
    batch_g = multihost_utils.host_local_array_to_global_array(
        batch, mesh, P("data", None))
    len_g = multihost_utils.host_local_array_to_global_array(
        lengths, mesh, P("data"))
    lut = np.asarray(colormap_lut("viridis"), np.float32)
    lut_g = multihost_utils.host_local_array_to_global_array(
        lut, mesh, P())
    fn = batched_session_pipeline(mesh, n_bytes_padded,
                                  outputs="summary", **pipeline_kwargs)
    return fn(batch_g, len_g, lut_g)


def local_shard(x) -> np.ndarray:
    """This process's rows of a 'data'-sharded global output, stacked in
    row order (matches the local session order fed in).

    Deduplicates model-axis replicas: on a ``data × model`` mesh a
    'data'-sharded array has one addressable shard per local DEVICE, so
    each data row appears ``model`` times."""
    seen = {}
    for s in x.addressable_shards:
        start = s.index[0].start or 0
        if start not in seen:
            seen[start] = np.asarray(s.data)
    return np.concatenate([seen[k] for k in sorted(seen)], axis=0)
