"""Worker process for the driver's multi-host dry run.

Usage: python -m slam_process_tpu.parallel._dryrun_worker <pid> <nproc>
       <coordinator>

Joins a 2-virtual-device-per-process gloo cluster and advances 2 local
synthetic streams through ONE global ``MultihostMultiStream`` window round
(the process-spanning collective live-ingest path — the newest DCN code
surface).  Prints one JSON line on success; exits non-zero otherwise.

Spawned by ``__graft_entry__.dryrun_multichip`` so the multi-host ingest
program is compile+execute-validated by the round driver without real
multi-host hardware (mirrors tests/_multihost_stream_worker.py, which
additionally asserts exact per-stream parity in the slow suite).
"""

from __future__ import annotations

import json
import sys

import numpy as np


def synthetic_stream_bytes(n_frames: int, seed: int) -> bytes:
    """A tiny valid 11-byte-format stream (FLAG/UE/BS/CLK*5/RSS*3 tags)."""
    rng = np.random.default_rng(seed)
    out = []
    clk = 500_000
    for k in range(n_frames):
        ue = k % 64
        clk += 61_000 + int(rng.integers(-100, 100))
        rss = int(rng.integers(1, 1 << 18))
        flag = 1 if ue % 16 == 1 else 0
        bs = (7 + clk // 61_000) % 64 if flag else 0x3F
        out.append(0xCC if flag else 0x33)
        out.append(ue & 0x3F)
        out.append(0xC0 | (bs & 0x3F))
        for i in range(5):
            out.append(0x40 | ((clk >> (6 * i)) & 0x3F))
        for i in range(3):
            out.append(0x80 | ((rss >> (6 * i)) & 0x3F))
    return bytes(out)


def main() -> None:
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    coordinator = sys.argv[3]

    from slam_process_tpu.parallel.multihost import (
        MultihostMultiStream,
        global_data_mesh,
        initialize_multihost,
    )

    initialize_multihost(coordinator_address=coordinator,
                         num_processes=nproc, process_id=pid,
                         local_device_count=2)

    n_local = 2
    mesh = global_data_mesh(model=1)   # (2*nproc,) data over all processes
    mh = MultihostMultiStream(mesh, n_local, chunk_bytes=4096,
                              group_capacity=1024, max_groups=8,
                              max_baselines_per_group=16)

    streams = [synthetic_stream_bytes(180, seed=10 * pid + i)
               for i in range(n_local)]
    # Two feed rounds then a collective finalize: exercises the lockstep
    # window agreement, the sharded step program, and the flush path.
    half = len(streams[0]) // 2
    mh.feed([s[:half] for s in streams])
    mh.feed([s[half:] for s in streams])
    mh.finalize()
    nf, _nk, ng, _sums, _counts, ovf = mh.local_results()
    n_frames = [int(v) for v in np.asarray(nf)]
    ok = all(v > 0 for v in n_frames) and not np.asarray(ovf).any()
    print(json.dumps({"pid": pid, "ok": ok, "n_frames": n_frames}),
          flush=True)
    sys.exit(0 if ok else 3)


if __name__ == "__main__":
    main()
