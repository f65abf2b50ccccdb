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
  * :func:`estimate_sessions_multihost` — the sharded flagship NN-OMP
    estimator (sessions over 'data', dictionary grid over 'model') over
    the same process-spanning mesh.

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
    "estimate_sessions_multihost",
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


def estimate_sessions_multihost(
    sessions,
    angle_file,
    mesh,
    flavor: str = "v1-7",
    **overrides,
):
    """Flagship NN-OMP estimation over a process-spanning mesh.

    The multi-host form of ``models.batch_estimation.estimate_sessions
    (..., mesh=...)``: every process preps only ITS sessions (scene pivot
    + dictionary on host), the pad shape is agreed globally, and the SAME
    sharded one-program estimator (sessions over 'data', AoA grid over
    'model') runs once across all hosts.  Call collectively with the same
    number of sessions per process; global N must divide the 'data' axis.

    Returns the global OmpPaths (read this process's rows with
    :func:`local_shard`).
    """
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    from slam_process_tpu.models.batch_estimation import (
        _batched_nn_omp_sharded_fn,
        flavor_config,
        pack_scenes,
    )
    from slam_process_tpu.models.dictionary import make_dictionary
    from slam_process_tpu.models.registry import build_scene

    dict_cfg, cfg, log_transform, keep_rule, stop_np = flavor_config(
        flavor, **overrides)
    mats, dicts = [], []
    for s in sessions:
        matrix, ue_ang, bs_ang = build_scene(s, angle_file, log_transform)
        mats.append(matrix)
        dicts.append(make_dictionary(ue_ang, bs_ang, dict_cfg))

    local_dims = np.asarray(
        [max(m.shape[0] for m in mats), max(m.shape[1] for m in mats),
         max(len(d.aoa_grid) for d in dicts),
         max(len(d.aod_grid) for d in dicts)], np.int32)
    dims = np.max(multihost_utils.process_allgather(local_dims), axis=0)
    packed = pack_scenes(mats, dicts, pad_to=tuple(dims))

    # Same inert-padding layout as nn_omp_sessions_sharded, applied
    # process-locally so the global arrays agree: the 'model'-sharded Ga
    # axis pads to a multiple of tp with zero-phi columns + edge grid
    # angles (zero-correlation atoms never win a selection).
    tp = mesh.shape.get("model", 1)
    gpad = (-packed.phi_rx.shape[2]) % tp
    phi_rx = np.pad(packed.phi_rx, ((0, 0), (0, 0), (0, gpad)))
    aoa_grid = np.pad(packed.aoa_grid, ((0, 0), (0, gpad)), mode="edge")

    import jax

    n_total = len(sessions) * jax.process_count()
    dp = mesh.shape["data"]
    assert n_total % dp == 0, (
        f"global session count {n_total} must divide the data axis {dp}; "
        "pad every process with a dummy session")
    specs = (P("data", None, None), P("data", None, "model"),
             P("data", None, None), P("data", "model"), P("data", None))
    leaves = (packed.matrices, phi_rx, packed.phi_tx, aoa_grid,
              packed.aod_grid)
    args = tuple(
        multihost_utils.host_local_array_to_global_array(x, mesh, sp)
        for x, sp in zip(leaves, specs))
    fn = _batched_nn_omp_sharded_fn(cfg, keep_rule, stop_np, mesh)
    with mesh:
        return fn(*args)


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
