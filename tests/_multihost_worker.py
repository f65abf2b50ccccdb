"""Worker process for tests/test_multihost.py.

Usage: python -m tests._multihost_worker <process_id> <num_processes>
       <coordinator> <log1> <log2> ...

Joins the virtual cluster (4 CPU devices per process, gloo collectives),
runs the process-spanning batched pipeline over ITS logs, and prints one
JSON line with this process's local per-session summaries (checksums) so
the parent can compare against the single-process oracle.
"""

import json
import sys


def main() -> None:
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    coordinator = sys.argv[3]
    logs = sys.argv[4:]

    from slam_process_tpu.parallel.multihost import (
        global_data_mesh,
        initialize_multihost,
        local_shard,
        run_batched_multihost,
    )

    initialize_multihost(coordinator_address=coordinator,
                         num_processes=nproc, process_id=pid,
                         local_device_count=4)

    from slam_process_tpu.io import read_hex_log

    raws = [read_hex_log(p) for p in logs]
    # (4, 2) data x model over the 8 global devices: 4 sessions, one per
    # data row; each process's 2 sessions live on its own 4 devices.
    mesh = global_data_mesh(model=2)
    out = run_batched_multihost(mesh, raws)

    import numpy as np

    print(json.dumps({
        "pid": pid,
        "n_frames": local_shard(out.n_frames).tolist(),
        "n_kept": local_shard(out.n_kept).tolist(),
        "norm_t_sum": np.nansum(local_shard(out.norm_t),
                                axis=(1, 2)).astype(float).tolist(),
        "counts_sum": local_shard(out.counts).sum(
            axis=(1, 2)).astype(int).tolist(),
    }), flush=True)


if __name__ == "__main__":
    main()
