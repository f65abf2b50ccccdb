#!/bin/bash
# The on-chip work queue for when the axon relay comes back up.
# Round-4 items blocked on the relay outage, in priority order:
#   1. pallas_compact first real-chip compile + parity + timing
#      (ops/pallas_compact.py awaits this before "auto" can select it —
#       docs/STATUS.md "Pallas carry-compaction kernel")
#   2. the on-chip sentinel lane (-m tpu)
#   3. a fresh bench.py run (device-plane numbers for the round)
#
# Usage: bash tools/tpu_return_queue.sh   (from /root/repo)
# Expect a multi-minute first-read stall in each fresh process (the
# relay's fresh-process stall grows with relay age — docs/STATUS.md).
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo

# 0. Probe (subprocess + timeout; relay-down hangs backend init forever).
python -c "
from slam_process_tpu.utils.transport import probe_default_backend
import sys
up = probe_default_backend(timeout_s=120)
print('tpu_up:', up)
sys.exit(0 if up else 1)
" || { echo "relay still down"; exit 1; }

# 1. pallas_compact on-chip: compile, bit-exact parity vs the XLA
#    formulation, and device-plane timing at the production shape.
timeout 900 python tools/diag_pallas_compact_chip.py

# 2. On-chip sentinel lane.
timeout 1800 env SLAM_PROCESS_TPU_TEST_TPU=1 python -m pytest tests/ -q -m tpu

# 3. Fresh bench (writes docs/bench_local_*.json via stdout capture).
timeout 2400 python bench.py | tail -1 | tee /tmp/bench_tpu_latest.json
